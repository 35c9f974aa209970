from . import dedup, scoring, sessions, windowed

__all__ = ["dedup", "scoring", "sessions", "windowed"]
