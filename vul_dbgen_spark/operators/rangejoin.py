"""Range join via bucket expansion — the scale pattern for interval joins.

Spark has no native range-join operator; a naive ``a JOIN b ON b.ts
BETWEEN a.lo AND a.hi`` plans as BroadcastNestedLoopJoin (O(|a|·|b|)).
The standard distributed strategy: quantize time into fixed buckets,
explode the (bounded-width) left interval into its covering buckets,
equi-join on the bucket — a plain shuffled/broadcast hash join — then
re-apply the exact predicate. Work drops from |a|·|b| to
sum-over-buckets(|a_bucket|·|b_bucket|), and the equi-join shuffles/
prunes like any other key join at 100 TB.

Each right row lands in exactly one bucket, so a matching pair meets in
exactly one bucket — no post-join dedup needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    left_lo: Column,
    left_hi: Column,
    right_ts: Column,
    bucket: str = "1 day",
) -> DataFrame:
    """Inner join of ``left`` × ``right`` on ``left_lo <= right_ts <
    left_hi``, executed as a bucket equi-join.

    ``bucket`` must be a day/hour/minute-granularity interval string; pick
    it near the typical interval width so the expansion factor (interval
    width / bucket) stays small. Columns of both inputs are preserved
    (names must not collide).
    """
    b = F.expr(f"INTERVAL {bucket}")
    lo_b = F.date_trunc(_grain(bucket), left_lo)
    # covering buckets of [lo, hi): sequence is inclusive, so step back one
    # bucket from hi when hi lands exactly on a boundary
    buckets = F.sequence(lo_b, F.date_trunc(_grain(bucket), left_hi - F.expr("INTERVAL 1 microsecond")), b)
    l_exp = left.withColumn("__lo", left_lo).withColumn("__hi", left_hi).withColumn(
        "__bucket", F.explode(buckets)
    )
    r_b = right.withColumn("__bucket", F.date_trunc(_grain(bucket), right_ts)).withColumn(
        "__ts", right_ts
    )
    return (
        l_exp.join(r_b, "__bucket")
        .filter((F.col("__ts") >= F.col("__lo")) & (F.col("__ts") < F.col("__hi")))
        .drop("__bucket", "__lo", "__hi", "__ts")
    )


def _grain(bucket: str) -> str:
    unit = bucket.split()[-1].rstrip("s")
    if unit not in {"day", "hour", "minute"}:
        raise ValueError(f"unsupported bucket grain: {bucket!r}")
    return unit
