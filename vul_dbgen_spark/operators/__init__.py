from . import asof, dedup, similarity  # noqa: F401
