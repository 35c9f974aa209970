from . import sessions, windowed

__all__ = ["sessions", "windowed"]
