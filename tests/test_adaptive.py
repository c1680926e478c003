"""Runtime re-planning the 100 TB story leans on, made executable:
AQE skew-join splitting (the automatic complement to the hand-salted
operators in skewjoin.py) and runtime bloom-filter pushdown (the
decontamination/semi-join refinement noted in dedup.ngram_containment).
"""

from __future__ import annotations

from contextlib import contextmanager

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


@contextmanager
def confs(spark, **kv):
    old = {}
    try:
        for k, v in kv.items():
            key = k.replace("__", ".")
            try:
                old[key] = spark.conf.get(key)
            except Exception:
                old[key] = None
            spark.conf.set(key, v)
        yield
    finally:
        for key, v in old.items():
            if v is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, v)


def test_aqe_splits_skewed_join_partitions(spark):
    """One hot key must trigger AQE's skew-join split (skew=true in the
    final plan) — the runtime guard for skew we did NOT hand-salt."""
    n_hot = 200_000
    pad = "x" * 64
    fact = spark.range(n_hot + 10_000).select(
        F.when(F.col("id") < n_hot, F.lit(0)).otherwise(F.col("id") % 100).alias("k"),
        F.concat(F.lit(pad), F.col("id").cast("string")).alias("payload"),
    )
    dim = spark.range(100).select(F.col("id").alias("k"), F.lit("d").alias("d"))
    with confs(
        spark,
        **{
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "256KB",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "256KB",
        },
    ):
        joined = fact.join(dim, "k")
        # collect() (not count()) — count builds a different plan tree;
        # AQE finalizes skew handling only on the executed tree itself
        assert len(joined.collect()) == n_hot + 10_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan, plan
        assert "skew=true" in plan, plan


def test_runtime_bloom_filter_injected_for_selective_join(spark):
    """A selective dim filter should inject a runtime bloom filter on the
    fact side (might_contain in the final plan), cutting shuffled fact
    rows before the join — the built-in form of the bloom refinement."""
    with confs(
        spark,
        **{
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
            "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        },
    ):
        li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
            "l_partkey", "l_quantity"
        )
        p = (
            spark.read.parquet(f"{SF}/part.parquet")
            .filter(F.col("p_brand") == "Brand#23")
            .select("p_partkey")
        )
        joined = li.join(p, li.l_partkey == p.p_partkey)
        plan = joined._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan, plan
        assert joined.count() > 0
