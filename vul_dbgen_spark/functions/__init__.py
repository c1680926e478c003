from . import priority, ranges, text, version  # noqa: F401
