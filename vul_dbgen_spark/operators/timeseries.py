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


def gapfill_interpolate(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    value: str = "value",
    bucket: str = "hour",
    bucket_interval: str = "1 hour",
) -> DataFrame:
    """Linear-interpolation gap fill (the ``interpolate()`` counterpart
    to LOCF): every gap row gets the straight line between its
    surrounding observed buckets. Because the spine spans exactly
    [first observed, last observed] per key, every gap row has BOTH a
    previous and a next observation — the interpolation is total, never
    null. Two per-key ordered windows (one backward ignore-nulls last,
    one forward ignore-nulls first) over the same partitioning — one
    shuffle, two sorts sharing it.

    Engine parity: the line is evaluated in PURE int64 arithmetic —
    cents × bucket indexes — with ONE explicit half-up rounding to
    micro-units via the floor-division identity
    ``round(a/d) = (2a + d) div (2d)`` (operands kept positive by a
    constant cents shift, which a linear interpolant passes through
    unchanged). A double formula rounded to 6dp is NOT enough here:
    hour-fraction denominators are powers of two, so interpolated
    values land EXACTLY on 5e-7 boundaries and Spark (HALF_UP) and
    DuckDB disagree on 1e-6-scale rounding — observed 9 flipped rows
    in 105k at sf0.01 before this integer formulation. int64 budget:
    |cents|·buckets_per_key·20000 must stay < 2^63 — fine for any
    realistic retention window."""
    _shift = 10_000_000  # cents; keeps the div operands positive
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
    back = (
        Window.partitionBy(key)
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy(key)
        .orderBy("bucket_ts")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    cents = F.expr(f"CAST(_sv * 100 AS BIGINT) + {_shift}")
    hidx = F.expr("unix_timestamp(bucket_ts) div 3600")
    obs_h = F.when(F.col("_sv").isNotNull(), hidx)
    j = (
        j.withColumn("_h", hidx)
        .withColumn("_c", cents)
        .withColumn("_pc", F.last("_c", ignorenulls=True).over(back))
        .withColumn("_ph", F.last(obs_h, ignorenulls=True).over(back))
        .withColumn("_nc", F.first("_c", ignorenulls=True).over(fwd))
        .withColumn("_nh", F.first(obs_h, ignorenulls=True).over(fwd))
    )
    # interp (micro-units) = round(10000 * [pc*(nh-h) + nc*(h-ph)] / (nh-ph))
    interp_e6 = F.expr(
        "CASE WHEN _nh = _ph THEN (_pc - {s}) * 10000 "
        "ELSE ((_pc * (_nh - _h) + _nc * (_h - _ph)) * 20000 + (_nh - _ph)) "
        "     div (2 * (_nh - _ph)) - {s6} END".format(
            s=_shift, s6=_shift * 10000  # one bigint literal: int*int overflows
        )
    )
    return j.select(
        key,
        "bucket_ts",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        _round2_double(F.col("_sv")).alias("sum_value"),
        (interp_e6 / F.lit(1000000.0)).alias("interp_value"),
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
