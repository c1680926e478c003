"""Time-series operators: gap-filled bucket rollup with LOCF, and
OHLC downsampling — the hypertable-rollup shapes (TimescaleDB's
``time_bucket_gapfill`` + ``locf`` and the classic finance OHLC
continuous aggregate) re-expressed as pure DataFrame plans.

Scale contract (100 TB): everything is keyed by the series key — the
bucket aggregate is one map-side-combinable shuffle on (key, bucket),
the spine explode fans out at most (retention window / bucket) rows per
key, the gap join is a (key, bucket) equi-join, and LOCF is a per-key
ordered window (no global sort anywhere). Per-key spine size is bounded
by the retention window, not by corpus size — the operator's cost is
O(active keys × buckets), independent of raw event volume after the
first aggregate.

Reference parity note: the reference (neuvector/vul-dbgen) has no
time-series surface; this belongs to the beyond-reference analytics
layer (the brief's "hypertable rollup" custom-operator family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _round2_double(c: F.Column) -> F.Column:
    # exact decimal in, identical nearest-double out on every engine
    return F.round(c, 2).cast("double")


def gapfill_locf(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    value: str = "value",
    bucket: str = "hour",
    bucket_interval: str = "1 hour",
) -> DataFrame:
    """Dense per-key bucket grid between each key's first and last
    observed bucket, with the bucket aggregate left-joined on and the
    value forward-filled (last-observation-carried-forward).

    The sum is decimal-exact before the single rounding (the repo's
    money-sum discipline — a double sum's engine-order noise can flip
    the last cent). ``locf_value`` is never null: the spine starts at
    each key's first OBSERVED bucket, so the running ignore-nulls
    last() always has a seed."""
    agg = events.groupBy(
        F.col(key), F.date_trunc(bucket, F.col(ts)).alias("bucket_ts")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col(value).cast("decimal(12,2)")).alias("_sv"),
    )
    span = agg.groupBy(key).agg(
        F.min("bucket_ts").alias("_b0"), F.max("bucket_ts").alias("_b1")
    )
    spine = span.select(
        key,
        F.explode(
            F.expr(f"sequence(_b0, _b1, interval {bucket_interval})")
        ).alias("bucket_ts"),
    )
    j = spine.join(agg, [key, "bucket_ts"], "left")
    w = (
        Window.partitionBy(key)
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        key,
        "bucket_ts",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        _round2_double(F.col("_sv")).alias("sum_value"),
        _round2_double(F.last("_sv", ignorenulls=True).over(w)).alias(
            "locf_value"
        ),
        F.col("n_events").isNull().alias("is_gap"),
    )


def ohlc_downsample(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    value: str = "value",
    bucket: str = "day",
) -> DataFrame:
    """Per-(key, bucket) open/high/low/close rollup in ONE hash
    aggregate — open/close ride a min/max over struct(ts, tie, value),
    whose lexicographic order is (ts, event_id) with the unique
    event_id making ties impossible, so no window pass and no second
    shuffle. The oracle mirrors with explicit row_number windows; the
    results agree because the orderings are identical and total."""
    b = F.date_trunc(bucket, F.col(ts)).alias("bucket_ts")
    o = F.min(F.struct(F.col(ts), F.col("event_id"), F.col(value)))
    c = F.max(F.struct(F.col(ts), F.col("event_id"), F.col(value)))
    return events.groupBy(F.col(key), b).agg(
        F.count(F.lit(1)).alias("n_events"),
        o.getField(value).alias("open_v"),
        F.max(value).alias("high_v"),
        F.min(value).alias("low_v"),
        c.getField(value).alias("close_v"),
    )
