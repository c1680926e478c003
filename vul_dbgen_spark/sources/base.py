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


def read_wholetext(spark: SparkSession, path: str) -> DataFrame:
    """One row per file: (path, value). Distributed text read."""
    return spark.read.text(path, wholetext=True).withColumn("path", F.input_file_name())


def exists(source_root: str, rel: str) -> bool:
    return os.path.exists(os.path.join(source_root, rel))


def empty_os_vulns(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([], OS_VULNS)


def conform(df: DataFrame, schema) -> DataFrame:
    """Project/pad/cast to a canonical schema (also normalizes the
    nullability flags Spark infers from literals/structs)."""
    present = set(df.columns)
    cols = []
    for f in schema.fields:
        c = F.col(f.name) if f.name in present else F.lit(None)
        cols.append(c.cast(f.dataType).alias(f.name))
    # .to() relaxes nullability so every source emits the byte-identical
    # canonical schema regardless of literal inference
    return df.select(*cols).to(schema)


def finish_os_vulns(df: DataFrame) -> DataFrame:
    """Project/pad to the canonical os_vulns column set, in order."""
    return conform(df, OS_VULNS)
