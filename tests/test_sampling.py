"""Deterministic split: stability across reruns/partitionings, fraction
accuracy, and key-coherence (all rows of a key land on one side)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vul_dbgen_spark.operators.sampling import (
    deterministic_split,
    split_threshold_hex,
)

SF = "/root/testdata/sf0.01"


def test_threshold_hex():
    assert split_threshold_hex(0.0) == "0000"
    assert split_threshold_hex(0.1) == "199a"
    assert split_threshold_hex(0.5) == "8000"
    assert split_threshold_hex(1.0) == "10000"  # > any 4-hex prefix → all test
    with pytest.raises(ValueError):
        split_threshold_hex(1.5)


def test_split_is_stable_and_partition_independent(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet")
    a = {r.doc_id: r.split for r in deterministic_split(d, "doc_id", 0.1).collect()}
    b = {
        r.doc_id: r.split
        for r in deterministic_split(d.repartition(7), "doc_id", 0.1).collect()
    }
    assert a == b  # pure function of the key — no rng, no partition order


def test_split_fraction_close(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet")
    out = deterministic_split(d, "doc_id", 0.2).groupBy("split").count().collect()
    frac = {r.split: r["count"] for r in out}
    total = sum(frac.values())
    assert abs(frac.get("test", 0) / total - 0.2) < 0.08  # md5 is uniform-ish


def test_split_is_key_coherent(spark):
    # duplicate keys (multiple rows per user) never straddle the split
    ev = spark.read.parquet(f"{SF}/events.parquet").select("user_id")
    out = deterministic_split(ev, "user_id", 0.3)
    straddle = (
        out.groupBy("user_id")
        .agg(F.countDistinct("split").alias("k"))
        .filter(F.col("k") > 1)
        .count()
    )
    assert straddle == 0


def test_containment_within_matches_two_df_form(spark):
    """ngram_containment_within (single tokenization pass) must return
    exactly what the general two-DataFrame form returns on split slices."""
    from vul_dbgen_spark.operators.dedup import (
        ngram_containment,
        ngram_containment_within,
    )
    from vul_dbgen_spark.operators.sampling import deterministic_split

    d = deterministic_split(
        spark.read.parquet(f"{SF}/documents.parquet"), "doc_id", 0.1
    )
    within = ngram_containment_within(d, "doc_id", "text", "split", "test", n=5)
    two_df = ngram_containment(
        d.filter("split = 'test'"), d.filter("split = 'train'"), "doc_id", "text", n=5
    )
    key = lambda r: (r.doc_id, r.n_grams, r.n_hit, r.containment, r.contaminated)
    assert sorted(map(key, within.collect())) == sorted(map(key, two_df.collect()))
    # the synthetic corpus contains real cross-split leakage — the screen
    # must actually fire
    assert within.filter("contaminated").count() > 0
