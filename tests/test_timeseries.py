"""Unit tests for operators/timeseries.py. Oracle parity is covered by
the full-parity suite; these pin the semantics: spine density (no
missing/extra buckets), LOCF carrying the right value, gap bookkeeping,
OHLC agreeing with a brute-force reference, and partitioning
invariance."""

import datetime as dt
from decimal import Decimal

from pyspark.sql import functions as F

from vul_dbgen_spark.operators.timeseries import gapfill_locf, ohlc_downsample

SF = "/root/testdata/sf0.001"


def _events(spark, repart=None):
    from vul_dbgen_spark.queries.catalog import load

    e = load(spark, SF, "events")
    return e.repartition(repart) if repart else e


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )


def test_gapfill_dense_spine_and_locf(spark):
    t0 = dt.datetime(2024, 1, 1, 0, 30)
    rows = [
        (1, t0, 7, 10.0),                              # hour 0
        (2, t0 + dt.timedelta(hours=3), 7, 2.5),       # hour 3
        (3, t0 + dt.timedelta(hours=3, minutes=10), 7, 1.0),
        (4, t0 + dt.timedelta(hours=1), 9, 5.0),       # other key
    ]
    got = {
        (r.user_id, r.bucket_ts.hour): r
        for r in gapfill_locf(_mk(spark, rows)).collect()
    }
    assert len(got) == 5  # key 7: hours 0..3 dense; key 9: hour 1
    assert got[(7, 0)].n_events == 1 and not got[(7, 0)].is_gap
    assert got[(7, 1)].is_gap and got[(7, 1)].n_events == 0
    assert got[(7, 1)].sum_value is None
    assert got[(7, 1)].locf_value == 10.0  # carried forward
    assert got[(7, 2)].locf_value == 10.0
    assert got[(7, 3)].sum_value == 3.5 and got[(7, 3)].locf_value == 3.5
    assert got[(9, 1)].n_events == 1 and not got[(9, 1)].is_gap


def test_gapfill_locf_never_null_and_spine_bounds(spark):
    out = gapfill_locf(_events(spark)).collect()
    assert out and all(r.locf_value is not None for r in out)
    # per key: first and last spine rows are observations, interior
    # rows are hour-dense
    by_key = {}
    for r in out:
        by_key.setdefault(r.user_id, []).append(r)
    for rows in by_key.values():
        rows.sort(key=lambda r: r.bucket_ts)
        assert not rows[0].is_gap and not rows[-1].is_gap
        for a, b in zip(rows, rows[1:]):
            assert (b.bucket_ts - a.bucket_ts) == dt.timedelta(hours=1)


def test_gapfill_sum_matches_decimal_groupby(spark):
    e = _events(spark)
    want = {
        (r.user_id, r.b): float(r.s)
        for r in e.groupBy(
            "user_id", F.date_trunc("hour", "ts").alias("b")
        )
        .agg(F.round(F.sum(F.col("value").cast("decimal(12,2)")), 2).alias("s"))
        .collect()
    }
    got = gapfill_locf(e).filter(~F.col("is_gap")).collect()
    assert len(got) == len(want)
    for r in got:
        assert r.sum_value == want[(r.user_id, r.bucket_ts)]


def test_interpolate_line_and_endpoints(spark):
    from vul_dbgen_spark.operators.timeseries import gapfill_interpolate

    t0 = dt.datetime(2024, 1, 1, 0, 15)
    rows = [
        (1, t0, 7, 10.0),                          # hour 0: 10
        (2, t0 + dt.timedelta(hours=4), 7, 2.0),   # hour 4: 2
    ]
    got = {
        r.bucket_ts.hour: r
        for r in gapfill_interpolate(_mk(spark, rows)).collect()
    }
    assert len(got) == 5
    # observation rows reproduce their own value
    assert got[0].interp_value == 10.0 and not got[0].is_gap
    assert got[4].interp_value == 2.0 and not got[4].is_gap
    # gap rows sit on the line 10 -> 2 over 4 hours (slope -2/hour)
    assert got[1].interp_value == 8.0 and got[1].is_gap
    assert got[2].interp_value == 6.0
    assert got[3].interp_value == 4.0
    assert all(r.sum_value is None for h, r in got.items() if h in (1, 2, 3))


def test_interpolate_total_and_invariant(spark):
    from vul_dbgen_spark.operators.timeseries import gapfill_interpolate

    out = gapfill_interpolate(_events(spark)).collect()
    assert out and all(r.interp_value is not None for r in out)
    r2 = gapfill_interpolate(_events(spark, repart=13)).collect()
    assert sorted(tuple(r) for r in out) == sorted(tuple(r) for r in r2)


def test_ohlc_matches_bruteforce(spark):
    e = _events(spark)
    rows = e.select("user_id", "ts", "event_id", "value").collect()
    brute = {}
    for r in rows:
        day = r.ts.replace(hour=0, minute=0, second=0, microsecond=0)
        brute.setdefault((r.user_id, day), []).append(
            (r.ts, r.event_id, r.value)
        )
    got = ohlc_downsample(e).collect()
    assert len(got) == len(brute)
    for r in got:
        evs = sorted(brute[(r.user_id, r.bucket_ts)])
        assert r.n_events == len(evs)
        assert r.open_v == evs[0][2] and r.close_v == evs[-1][2]
        vals = [v for _, _, v in evs]
        assert r.high_v == max(vals) and r.low_v == min(vals)


def test_both_partitioning_invariant(spark):
    for fn in (gapfill_locf, ohlc_downsample):
        r1 = sorted(tuple(r) for r in fn(_events(spark)).collect())
        r2 = sorted(tuple(r) for r in fn(_events(spark, repart=13)).collect())
        assert r1 == r2
