"""Bucketed co-located join: the plan-level proof that the bucketing
path removes both the Exchange and the Sort from repeated equi-joins,
and that bucket pruning reaches the scan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vul_dbgen_spark.operators.bucketing import colocated_join, write_bucketed

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    lineitem = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    write_bucketed(orders, "orders_b", "o_orderkey", 8, path=str(base / "orders"))
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "lineitem_b", "o_orderkey", 8, path=str(base / "lineitem"),
    )
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_colocated_join_has_no_exchange_and_no_sort(spark, bucketed_tables):
    lt, rt = bucketed_tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # in-bucket sortedness is only consumed behind this flag since Spark
    # 3.0 (concatenated multi-file buckets would break it; our writer
    # guarantees one file per bucket, which is the flag's precondition)
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try:
        joined = colocated_join(spark, lt, rt, "o_orderkey")
        plan = _executed_plan(joined)
        assert "SortMergeJoin" in plan, plan
        # co-located buckets: neither side shuffles...
        assert "Exchange" not in plan, plan
        # ...and sortBy at write time removes the per-task sort too
        assert "Sort " not in plan.replace("SortMergeJoin", ""), plan
        # result parity with the plain shuffled join
        got = joined.count()
        want = (
            spark.read.parquet(f"{SF}/orders.parquet")
            .select("o_orderkey")
            .join(
                spark.read.parquet(f"{SF}/lineitem.parquet").withColumnRenamed(
                    "l_orderkey", "o_orderkey"
                ),
                "o_orderkey",
            )
            .count()
        )
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "false")


def test_bucketed_agg_has_no_exchange(spark, bucketed_tables):
    _, rt = bucketed_tables
    # groupBy on the bucket key reuses the bucketing as the partitioning
    plan = _executed_plan(
        spark.table(rt).groupBy("o_orderkey").agg(F.sum("l_quantity"))
    )
    assert "Exchange" not in plan, plan


def test_bucket_pruning_reaches_scan(spark, bucketed_tables):
    import contextlib
    import io

    lt, _ = bucketed_tables
    # a lone filter-scan doesn't need the bucket distribution, so the
    # planner auto-disables bucketed reading and pruning with it; a real
    # point-lookup workload pins it on to scan 1/n of the files
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        df = spark.table(lt).filter(F.col("o_orderkey") == 1)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        assert "SelectedBucketsCount: 1 out of 8" in buf.getvalue(), buf.getvalue()
    finally:
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
