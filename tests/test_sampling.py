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
    # 1.0 must compare ABOVE every 4-hex bucket; the numeric rendering
    # '10000' would sort below 'ffff' lexicographically ('1' < 'f') and
    # silently select nothing
    assert split_threshold_hex(1.0) == "zzzz"
    assert "ffff" < split_threshold_hex(1.0)
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


def test_stratified_sample_rates_and_weights(spark):
    from vul_dbgen_spark.operators.sampling import stratified_sample

    d = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "lang")
    rates = {"en": 0.5, "de": 1.0, "fr": 0.25}
    s = stratified_sample(d, "doc_id", "lang", rates, default_rate=0.0)
    got = {r["lang"]: r for r in s.groupBy("lang").count().collect()}
    base = {r["lang"]: r["count"] for r in d.groupBy("lang").count().collect()}
    # rate 1.0 keeps everything; rate 0.0 (default) keeps nothing
    assert got["de"]["count"] == base["de"]
    assert set(got) == {"en", "de", "fr"}
    # sampled fractions land near their targets (binomial tolerance)
    assert abs(got["en"]["count"] / base["en"] - 0.5) < 0.2
    assert abs(got["fr"]["count"] / base["fr"] - 0.25) < 0.2
    # inverse-probability weights
    w = {r["lang"]: r["weight"] for r in s.select("lang", "weight").distinct().collect()}
    assert w == {"en": 2.0, "de": 1.0, "fr": 4.0}


def test_stratified_sample_is_subset_and_stable(spark):
    from vul_dbgen_spark.operators.sampling import stratified_sample

    d = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "lang")
    rates = {"en": 0.3}
    a = stratified_sample(d, "doc_id", "lang", rates, default_rate=0.2)
    b = stratified_sample(d.repartition(13), "doc_id", "lang", rates, default_rate=0.2)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # a sampled doc stays sampled when its stratum's rate only increases
    # (nested samples: thresholds are monotone in the rate)
    wider = stratified_sample(d, "doc_id", "lang", {"en": 0.6}, default_rate=0.4)
    assert a.select("doc_id").exceptAll(wider.select("doc_id")).count() == 0


def test_sqrt_cap_quotas_and_passthrough(spark):
    from vul_dbgen_spark.operators.sampling import sqrt_cap_sample
    import math

    d = spark.read.parquet(f"{SF}/documents.parquet")
    kept = sqrt_cap_sample(d, "doc_id", "source", scale=10.0)
    n_by = {r.source: r.n for r in d.groupBy("source").agg(F.count("*").alias("n")).collect()}
    k_by = {r.source: r.n for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()}
    for src, n in n_by.items():
        quota = math.ceil(10.0 * math.sqrt(n))
        # quota binds exactly: min(n, quota) survive, never more
        assert k_by.get(src, 0) == min(n, quota), (src, n, quota, k_by.get(src))


def test_sqrt_cap_stable_and_partition_independent(spark):
    from vul_dbgen_spark.operators.sampling import sqrt_cap_sample

    d = spark.read.parquet(f"{SF}/documents.parquet")
    a = sorted(r.doc_id for r in sqrt_cap_sample(d, "doc_id", "source").select("doc_id").collect())
    b = sorted(
        r.doc_id
        for r in sqrt_cap_sample(d.repartition(13), "doc_id", "source")
        .select("doc_id")
        .collect()
    )
    assert a == b  # survivor set is a pure function of (key, domain)


def test_priority_sample_matches_reference_computation(spark):
    """Top-k by w/u must agree with a driver-side md5 recomputation."""
    import hashlib

    from vul_dbgen_spark.operators.sampling import priority_sample

    d = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", F.length("text").cast("bigint").alias("w"))
    )
    rows = {r.doc_id: r.w for r in d.collect()}

    def prio(doc_id, w):
        v = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:6], 16)
        return w * 16777216.0 / (v + 1)

    want = sorted(rows, key=lambda k: (-prio(k, rows[k]), k))[:50]
    got = [r.doc_id for r in priority_sample(d, "doc_id", "w", k=50).collect()]
    assert sorted(got) == sorted(want)


def test_priority_sample_weight_monotone_and_stable(spark):
    """Same u (same key set): scaling one row's weight up can only pull it
    INTO the sample, never out; result is partition-independent."""
    from vul_dbgen_spark.operators.sampling import priority_sample

    d = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", F.length("text").cast("bigint").alias("w")
    )
    a = {r.doc_id for r in priority_sample(d, "doc_id", "w", k=30).collect()}
    b = {
        r.doc_id
        for r in priority_sample(d.repartition(11), "doc_id", "w", k=30).collect()
    }
    assert a == b
    boosted = d.withColumn(
        "w", F.when(F.col("doc_id").isin(*list(a)[:5]), F.col("w") * 100).otherwise(F.col("w"))
    )
    c = {r.doc_id for r in priority_sample(boosted, "doc_id", "w", k=30).collect()}
    assert set(list(a)[:5]) <= c  # boosting a sampled row keeps it sampled


def test_priority_sample_is_topk_plan(spark):
    """The global top-k must compile to TakeOrderedAndProject — no full
    sort, no exchange of the data."""
    from vul_dbgen_spark.operators.sampling import priority_sample

    d = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", F.length("text").cast("bigint").alias("w")
    )
    plan = priority_sample(d, "doc_id", "w", k=10)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan


def test_priority_sample_per_stratum_caps_and_agrees_with_global(spark):
    """Each domain yields min(k, n); within a domain, survivors are
    exactly the global sampler's order restricted to that domain."""
    from vul_dbgen_spark.operators.sampling import (
        priority_sample,
        priority_sample_per_stratum,
    )

    d = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "source", F.length("text").cast("bigint").alias("w")
    )
    out = priority_sample_per_stratum(d, "doc_id", "w", "source", k=20)
    n_by = {r.source: r.n for r in d.groupBy("source").agg(F.count("*").alias("n")).collect()}
    k_by = {r.source: r.n for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert k_by == {s: min(20, n) for s, n in n_by.items()}
    # restrict the whole table to one domain: global top-k == stratum rows
    src = sorted(n_by)[0]
    only = {
        r.doc_id
        for r in priority_sample(d.filter(F.col("source") == src), "doc_id", "w", k=20).collect()
    }
    strat = {r.doc_id for r in out.filter(F.col("source") == src).collect()}
    assert only == strat


def test_shard_assignment_stable_and_partitioning_invariant(spark):
    """Shard/sort-key assignment is a pure function of the key: the
    layout survives repartitioning, rerun, and appends (existing rows
    keep their shard when new rows arrive)."""
    from vul_dbgen_spark.operators.sampling import shard_assignment

    d = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id")
    shard, key = shard_assignment("doc_id", 8)

    def layout(df):
        return {
            r.doc_id: (r.shard, r.k)
            for r in df.select(
                "doc_id", shard.alias("shard"), key.alias("k")
            ).collect()
        }

    base = layout(d)
    assert layout(d.repartition(13)) == base
    assert set(s for s, _ in base.values()) <= set(range(8))
    # append-stability: assignment over a subset matches the full corpus
    half = layout(d.limit(100))
    assert all(base[i] == v for i, v in half.items())
    # sort key is unique (md5 of distinct ids) → within-shard order total
    assert len({k for _, k in base.values()}) == len(base)
