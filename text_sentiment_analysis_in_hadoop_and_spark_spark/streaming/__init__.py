from . import windowed

__all__ = ["windowed"]
