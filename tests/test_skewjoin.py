"""Skew-mitigation operators (operators/skewjoin.py): salted results
must equal their unsalted equivalents exactly, row for row."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vul_dbgen_spark.operators.skewjoin import salted_groupby_agg, salted_join

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def li(spark):
    return spark.read.parquet(f"{SF}/lineitem.parquet")


@pytest.fixture(scope="module")
def orders(spark):
    return spark.read.parquet(f"{SF}/orders.parquet")


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_salted_join_equals_plain_join(li, orders):
    o = orders.withColumnRenamed("o_orderkey", "l_orderkey")
    cols = ["l_orderkey", "l_linenumber", "o_orderpriority"]
    salted = salted_join(li, o, "l_orderkey", ["l_orderkey", "l_linenumber"], n_salts=4)
    plain = li.join(o, "l_orderkey")
    assert _rows(salted.select(*cols)) == _rows(plain.select(*cols))


def test_salted_left_join_keeps_unmatched_skewed_rows_once(spark):
    left = spark.createDataFrame([(1, "a"), (1, "b"), (2, "c")], ["k", "v"])
    right = spark.createDataFrame([(1, "x")], ["k", "w"])
    out = salted_join(left, right, "k", ["v"], n_salts=4, how="left")
    assert _rows(out.select("k", "v", "w")) == [(1, "a", "x"), (1, "b", "x"), (2, "c", None)]


def test_salted_join_rejects_right_and_full(spark):
    df = spark.createDataFrame([(1, "a")], ["k", "v"])
    for how in ("right", "full", "full_outer"):
        with pytest.raises(ValueError):
            salted_join(df, df, "k", ["v"], how=how)


def test_salted_agg_equals_plain_groupby(li):
    got = salted_groupby_agg(
        li,
        keys=["l_returnflag"],
        spread_cols=["l_orderkey", "l_linenumber"],
        aggs={
            "sum_qty": ("l_quantity", "sum"),
            "n_rows": ("l_quantity", "count"),
            "min_disc": ("l_discount", "min"),
            "max_disc": ("l_discount", "max"),
        },
        n_salts=8,
    )
    want = li.groupBy("l_returnflag").agg(
        F.sum("l_quantity").alias("sum_qty"),
        F.count("l_quantity").alias("n_rows"),
        F.min("l_discount").alias("min_disc"),
        F.max("l_discount").alias("max_disc"),
    )
    got_rows = {r.l_returnflag: (round(r.sum_qty, 6), r.n_rows, r.min_disc, r.max_disc) for r in got.collect()}
    want_rows = {r.l_returnflag: (round(r.sum_qty, 6), r.n_rows, r.min_disc, r.max_disc) for r in want.collect()}
    assert got_rows == want_rows
