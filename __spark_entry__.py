"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()``/``oracle_sql()`` expose the engine's graded catalog
(vul_dbgen_spark/queries/catalog.py) — one entry per operator family from
SURVEY.md §2 plus the LLM-pipeline operators (dedup, similarity, text,
streaming), each with an exactly-mirrored DuckDB oracle where the
semantics are SQL-expressible.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from vul_dbgen_spark.queries import catalog as _catalog  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return _catalog.q3_shipping_priority(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _catalog.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle for every SQL-expressible query."""
    return _catalog.oracle_sql()
