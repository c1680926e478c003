"""Shared helpers for source parsers.

Conventions (see schemas.py):

- The canonical ``version`` column holds the *raw* source string, except
  the sentinels ``#MINV#`` / ``#MAXV#`` (``common/version.go:24-26``).
  Comparisons always go through functions/version.py which parses lazily,
  so normalization (epoch stripping etc.) happens at compare time exactly
  like the reference's ``NewVersion``.
- Scalar merge determinism: where the reference's result depends on Go
  map-iteration order we pick an explicit deterministic order instead
  (SURVEY.md §4.3) — always documented at the call site.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import OS_VULNS

MINV = "#MINV#"
MAXV = "#MAXV#"

# dpkg version validity, mirrored from common/version.go:38-133 as a pure
# column predicate so malformed-version rows can be skipped JVM-side
# without a UDF. parse() accepts [epoch:]version[-revision]; chars allowed
# in version: 0-9A-Za-z.-+~:_ ; revision: 0-9A-Za-z.+~_
_VERSION_RE = r"^(\d+:)?[0-9A-Za-z.\-+~:_]+$"


def version_is_parseable(col: Column) -> Column:
    """True when ``NewVersion`` would accept the string (version.go:38-133)."""
    s = F.trim(col)
    epoch_ok = ~s.contains(":") | s.rlike(r"^\d+:")
    return (
        (s != "")
        & ~s.isin("NA", "N/A")
        & s.rlike(_VERSION_RE)
        & epoch_ok
    ) | s.isin(MINV, MAXV)


def read_wholetext(spark: SparkSession, path: str | list[str]) -> DataFrame:
    """One row per file: (path, value). Distributed text read; accepts a
    path list so multi-file sources scan once (one plan) instead of
    building one plan per file."""
    return spark.read.text(path, wholetext=True).withColumn(
        "path", F.input_file_name()
    )


# Memoized SQL-string map literals (round 9, the similarity-module
# _cached_expr pattern applied to the source parsers): a k-entry
# F.create_map(*[F.lit(x) ...]) costs ~2k+1 py4j round trips PER CALL
# and the pipeline's build phase is round-trip-bound (measured: the
# whole composed build is ~2.2k RPCs/source × ~0.35 ms). The SQL text
# parses to the identical CreateMap(Literal…) expression in ONE RPC,
# and an unresolved Column is plan-independent, so one cached instance
# serves every plan that uses the same (frozen, module-level) dict.
_MAP_EXPR_CACHE: dict[tuple, Column] = {}


def _sql_str(s: str) -> str:
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def map_literal(m: dict[str, str]) -> Column:
    key = tuple(m.items())
    col = _MAP_EXPR_CACHE.get(key)
    if col is None:
        body = ", ".join(f"{_sql_str(k)}, {_sql_str(v)}" for k, v in m.items())
        col = F.expr(f"map({body})")
        _MAP_EXPR_CACHE[key] = col
    return col


def exists(source_root: str, rel: str) -> bool:
    return os.path.exists(os.path.join(source_root, rel))


def empty_os_vulns(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([], OS_VULNS)


def conform(df: DataFrame, schema) -> DataFrame:
    """Project/pad/cast to a canonical schema (also normalizes the
    nullability flags Spark infers from literals/structs).

    Built as ONE selectExpr call (round 9): the per-field
    F.col/F.lit → .cast → .alias chain cost ~150 py4j round trips per
    source and conform runs in every parser's tail — the SQL strings
    are assembled Python-side and parse to the identical Cast/Alias
    expressions in a single RPC batch. ``simpleString`` round-trips
    every canonical type (struct/array included) through the DDL
    parser."""
    present = set(df.columns)
    exprs = [
        (
            f"CAST(`{f.name}` AS {f.dataType.simpleString()}) AS `{f.name}`"
            if f.name in present
            else f"CAST(NULL AS {f.dataType.simpleString()}) AS `{f.name}`"
        )
        for f in schema.fields
    ]
    # .to() relaxes nullability so every source emits the byte-identical
    # canonical schema regardless of literal inference
    return df.selectExpr(*exprs).to(schema)


def finish_os_vulns(df: DataFrame) -> DataFrame:
    """Project/pad to the canonical os_vulns column set, in order."""
    return conform(df, OS_VULNS)
