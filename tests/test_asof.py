"""As-of join semantics on hand data: last-before matching, inclusive
boundary, deterministic tie-break, and the tolerance (bounded-staleness)
variant — a stale match must null out exactly like no match, while the
plan stays the single window pass (no re-window for the bound)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from vul_dbgen_spark.operators.asof import asof_join


def _ts(day: int) -> datetime.datetime:
    return datetime.datetime(2024, 1, day)


def _frames(spark):
    left = spark.createDataFrame(
        [(1, 100, _ts(10)), (2, 100, _ts(20)), (3, 200, _ts(15)), (4, 300, _ts(5))],
        "eid: long, k: long, ts: timestamp",
    )
    right = spark.createDataFrame(
        [
            (11, 100, _ts(2)),   # old for eid 1/2
            (12, 100, _ts(18)),  # fresh for eid 2 only
            (13, 200, _ts(15)),  # simultaneous with eid 3
        ],
        "rid: long, rk: long, rts: timestamp",
    )
    return left, right


def test_asof_basic_and_inclusive(spark):
    left, right = _frames(spark)
    out = {
        r["eid"]: r["rid"]
        for r in asof_join(
            left, right, "k", "rk", "ts", "rts", payload_cols=["rid"]
        ).collect()
    }
    assert out == {1: 11, 2: 12, 3: 13, 4: None}
    excl = {
        r["eid"]: r["rid"]
        for r in asof_join(
            left, right, "k", "rk", "ts", "rts",
            payload_cols=["rid"], inclusive=False,
        ).collect()
    }
    assert excl[3] is None  # simultaneous row invisible when exclusive


def test_asof_tolerance_nulls_stale_matches(spark):
    left, right = _frames(spark)
    out = {
        r["eid"]: r["rid"]
        for r in asof_join(
            left, right, "k", "rk", "ts", "rts",
            payload_cols=["rid"], tolerance="5 days",
        ).collect()
    }
    # eid 1's only candidate (day 2) is 8 days stale -> nulled;
    # eid 2's candidate (day 18) is 2 days old -> kept;
    # eid 3 simultaneous -> kept; eid 4 never matched
    assert out == {1: None, 2: 12, 3: 13, 4: None}


def test_asof_tolerance_boundary_is_inclusive(spark):
    left, right = _frames(spark)
    out = {
        r["eid"]: r["rid"]
        for r in asof_join(
            left, right, "k", "rk", "ts", "rts",
            payload_cols=["rid"], tolerance="8 days",
        ).collect()
    }
    # eid 1: match at ts - 8 days exactly -> >= bound keeps it
    assert out[1] == 11


def test_asof_tolerance_multiple_payloads_null_together(spark):
    left, right = _frames(spark)
    right2 = right.withColumn("extra", F.col("rid") * 10)
    rows = {
        r["eid"]: (r["rid"], r["extra"])
        for r in asof_join(
            left, right2, "k", "rk", "ts", "rts",
            payload_cols=["rid", "extra"], tolerance="5 days",
        ).collect()
    }
    assert rows[1] == (None, None)
    assert rows[2] == (12, 120)


def test_asof_carry_is_row_atomic_with_null_payloads(spark):
    # the matched row travels as ONE struct: a null payload field on the
    # newest matching row must be returned as null, never backfilled
    # from an older row (the chimera bug)
    left = spark.createDataFrame(
        [(1, 100, _ts(10))], "eid: long, k: long, ts: timestamp"
    )
    right = spark.createDataFrame(
        [(11, 100, _ts(1), 5), (12, 100, _ts(9), None)],
        "rid: long, rk: long, rts: timestamp, extra: int",
    )
    row = asof_join(
        left, right, "k", "rk", "ts", "rts", payload_cols=["rid", "extra"]
    ).collect()[0]
    assert row["rid"] == 12          # newest match
    assert row["extra"] is None      # its null field, NOT 5 from rid=11


def test_asof_tolerance_judges_the_matched_row(spark):
    # freshness is judged on the SAME row the payload comes from
    left = spark.createDataFrame(
        [(1, 100, _ts(10))], "eid: long, k: long, ts: timestamp"
    )
    right = spark.createDataFrame(
        [(11, 100, _ts(1), 5), (12, 100, _ts(9), None)],
        "rid: long, rk: long, rts: timestamp, extra: int",
    )
    row = asof_join(
        left, right, "k", "rk", "ts", "rts",
        payload_cols=["rid", "extra"], tolerance="3 days",
    ).collect()[0]
    assert row["rid"] == 12  # day-9 row is fresh; day-1 row never leaks in
