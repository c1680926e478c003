"""Bucketed range join (operators/rangejoin.py) must equal the naive
inequality join, including boundary semantics [lo, hi)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from vul_dbgen_spark.operators.rangejoin import range_join_bucketed


@pytest.fixture(scope="module")
def frames(spark):
    base = dt.datetime(2024, 1, 10)
    left = spark.createDataFrame(
        [
            (1, base),  # window [10th, 13th)
            (2, base + dt.timedelta(days=5)),
            (3, base + dt.timedelta(hours=12)),  # mid-day start
        ],
        ["lid", "lo_ts"],
    )
    right = spark.createDataFrame(
        [
            (10, base),  # == lo: in
            (11, base + dt.timedelta(days=3)),  # == hi of lid=1: out
            (12, base + dt.timedelta(days=2, hours=23)),  # in for 1, in for 3
            (13, base + dt.timedelta(days=7, hours=1)),  # in for 2
            (14, base - dt.timedelta(seconds=1)),  # just before: out
        ],
        ["rid", "ts"],
    )
    return left, right


def test_matches_naive_inequality_join(frames):
    left, right = frames
    hi = F.col("lo_ts") + F.expr("INTERVAL 3 DAYS")
    got = range_join_bucketed(left, right, F.col("lo_ts"), hi, F.col("ts"))
    naive = left.join(
        right,
        (F.col("ts") >= F.col("lo_ts")) & (F.col("ts") < F.col("lo_ts") + F.expr("INTERVAL 3 DAYS")),
    )
    assert sorted((r.lid, r.rid) for r in got.collect()) == sorted(
        (r.lid, r.rid) for r in naive.collect()
    )


def test_boundaries_half_open(frames):
    left, right = frames
    hi = F.col("lo_ts") + F.expr("INTERVAL 3 DAYS")
    pairs = {
        (r.lid, r.rid)
        for r in range_join_bucketed(left, right, F.col("lo_ts"), hi, F.col("ts")).collect()
    }
    assert (1, 10) in pairs  # ts == lo included
    assert (1, 11) not in pairs  # ts == hi excluded
    assert (1, 14) not in pairs
    assert (3, 12) in pairs  # mid-day interval start


def test_no_duplicate_pairs(frames):
    left, right = frames
    hi = F.col("lo_ts") + F.expr("INTERVAL 3 DAYS")
    got = range_join_bucketed(left, right, F.col("lo_ts"), hi, F.col("ts"))
    rows = [(r.lid, r.rid) for r in got.collect()]
    assert len(rows) == len(set(rows))


def test_plan_is_hash_join_not_nested_loop(frames):
    left, right = frames
    hi = F.col("lo_ts") + F.expr("INTERVAL 3 DAYS")
    plan = range_join_bucketed(
        left, right, F.col("lo_ts"), hi, F.col("ts")
    )._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan


def test_approx_distinct_error_bound(spark):
    df = spark.range(0, 20000).select(
        (F.col("id") % 4).cast("string").alias("g"), (F.col("id") % 3000).alias("u")
    )
    got = {
        r.g: r.n
        for r in df.groupBy("g")
        .agg(F.approx_count_distinct("u", 0.02).alias("n"))
        .collect()
    }
    exact = {
        r.g: r.n
        for r in df.groupBy("g").agg(F.countDistinct("u").alias("n")).collect()
    }
    for g in exact:
        assert abs(got[g] - exact[g]) / exact[g] < 0.05
