"""Deterministic sampling / dataset splitting for training pipelines.

Random seeds don't survive engine changes, retries, or re-partitioning —
a training split must be a pure function of the record key so that every
engine, every rerun, and every incremental refresh lands each record on
the same side. The standard trick: hash the key, threshold the hash.

Hash = md5 (engine-independent, already the fingerprint primitive used
by the dedup operators); the first 4 hex chars give 65536 buckets, and
the split threshold is expressed AS a hex string so both Spark and the
DuckDB oracle compare strings — no numeric hex conversion needed on
either side. Row-local, zero shuffle; the test fraction granularity is
1/65536.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def split_threshold_hex(test_frac: float) -> str:
    """The 4-hex-char cutoff under which a key lands in the test split."""
    if not 0.0 <= test_frac <= 1.0:
        raise ValueError("test_frac must be in [0, 1]")
    return format(int(round(test_frac * 0x10000)), "04x")


def split_col(key: Column | str, test_frac: float) -> Column:
    """'test' / 'train' label column, deterministic in the key."""
    key = F.col(key) if isinstance(key, str) else key
    bucket = F.substring(F.md5(key.cast("string")), 1, 4)
    return F.when(bucket < split_threshold_hex(test_frac), F.lit("test")).otherwise(
        F.lit("train")
    )


def deterministic_split(
    df: DataFrame, key_col: str, test_frac: float = 0.1
) -> DataFrame:
    """Tag every row with its split; filter on ``split`` downstream.

    Key-hashed (not row-hashed): all rows of one key land on one side,
    which is what prevents train/test leakage of near-identical records
    sharing a key (the same reason dedup precedes splitting in a real
    pipeline)."""
    return df.withColumn("split", split_col(key_col, test_frac))
