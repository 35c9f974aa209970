from . import scoring, sessions, windowed

__all__ = ["scoring", "sessions", "windowed"]
