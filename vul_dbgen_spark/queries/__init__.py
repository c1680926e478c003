from .catalog import REGISTRY, bench_queries, oracle_sql, queries  # noqa: F401
