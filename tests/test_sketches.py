"""Preconditions of the exactly-graded sketch entries.

heavy_hitters_tokens is hash-graded against an exact oracle on the
strength of one precondition: approx_top_k(item, 1000, 1000) tracks the
ENTIRE vocabulary, making the sketch provably exact. If the corpus
vocabulary ever exceeds maxItemsTracked (a bigger SF, a generator
change), the sketch silently becomes approximate and the oracle
mismatch would surface as an inscrutable hash red — this test turns
that into a named failure at every SF the driver touches."""

import duckdb
import pytest

from vul_dbgen_spark.queries.catalog import _TOKS_SQL

HH_MAX_ITEMS_TRACKED = 1000


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01", "sf0.1"])
def test_vocab_within_heavy_hitters_sketch_capacity(sf):
    con = duckdb.connect()
    vocab = con.sql(
        f"""
        WITH toks AS (SELECT {_TOKS_SQL} AS toks
                      FROM '/root/testdata/{sf}/documents.parquet')
        SELECT count(DISTINCT item) FROM (SELECT unnest(toks) AS item FROM toks)
        """
    ).fetchone()[0]
    con.close()
    assert vocab <= HH_MAX_ITEMS_TRACKED, (
        f"{sf}: vocabulary {vocab} exceeds approx_top_k maxItemsTracked "
        f"{HH_MAX_ITEMS_TRACKED} — heavy_hitters_tokens is no longer exact; "
        f"raise the sketch size in the catalog entry"
    )


# ---------------------------------------------------------------------------
# relational Bloom filter / Count-Min sketch (operators/sketches.py)
# ---------------------------------------------------------------------------

from pyspark.sql import functions as F

from vul_dbgen_spark.operators.sketches import (
    bloom_build,
    bloom_member_expr,
    bloom_pack,
    bloom_screen,
    cms_build,
    cms_estimate,
)


def test_bloom_no_false_negatives_and_bounded_size(spark):
    members = spark.createDataFrame([(i,) for i in range(200)], "k: long")
    bits = bloom_build(members, "k", m=1 << 12, k=4)
    assert bits.count() <= min(1 << 12, 4 * 200)
    screened = bloom_screen(members, "k", bits, m=1 << 12, k=4)
    # every true member must screen positive
    assert screened.filter(~F.col("maybe_member")).count() == 0


def test_bloom_rejects_most_nonmembers(spark):
    members = spark.createDataFrame([(i,) for i in range(200)], "k: long")
    bits = bloom_build(members, "k", m=1 << 12, k=4)
    probes = spark.createDataFrame([(i,) for i in range(10_000, 12_000)], "k: long")
    fp = bloom_screen(probes, "k", bits, m=1 << 12, k=4).filter(
        F.col("maybe_member")
    ).count()
    # 800 set bits max of 4096 -> per-probe fp rate <= (800/4096)^4 ~ 0.15%;
    # allow generous slack over 2000 probes
    assert fp <= 40


def test_bloom_merge_is_union_of_bits(spark):
    a = spark.createDataFrame([(i,) for i in range(50)], "k: long")
    b = spark.createDataFrame([(i,) for i in range(50, 100)], "k: long")
    merged = bloom_build(a, "k").union(bloom_build(b, "k")).distinct()
    whole = bloom_build(a.union(b), "k")
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0


def test_cms_overestimates_never_under(spark):
    rows = [("a",)] * 50 + [("b",)] * 7 + [("c",)] * 1
    items = spark.createDataFrame(rows, "tok: string")
    cms = cms_build(items, "tok", depth=4, width=32)
    qs = spark.createDataFrame([("a",), ("b",), ("c",), ("zzz",)], "tok: string")
    est = {
        r["item"]: r["cms_count"]
        for r in cms_estimate(cms, qs, "tok", depth=4, width=32).collect()
    }
    truth = {"a": 50, "b": 7, "c": 1, "zzz": 0}
    for k, t in truth.items():
        assert est[k] >= t, (k, est[k], t)
    # total counter mass per row equals the input size exactly
    per_row = cms.groupBy("row").agg(F.sum("cnt").alias("s")).collect()
    assert all(r["s"] == len(rows) for r in per_row)


def test_cms_exact_when_width_exceeds_vocab(spark):
    # with width >> vocab there are (almost surely) no collisions for
    # this fixed md5 hash family and tiny vocab; estimates are exact
    rows = [(w,) for w in ["x", "y", "z"] * 9]
    items = spark.createDataFrame(rows, "tok: string")
    cms = cms_build(items, "tok", depth=4, width=4096)
    qs = items.distinct()
    est = cms_estimate(cms, qs, "tok", depth=4, width=4096)
    assert {(r["item"], r["cms_count"]) for r in est.collect()} == {
        ("x", 9), ("y", 9), ("z", 9)
    }


def test_cms_merge_additive(spark):
    a = spark.createDataFrame([("a",)] * 5 + [("b",)] * 2, "tok: string")
    b = spark.createDataFrame([("a",)] * 3, "tok: string")
    merged = (
        cms_build(a, "tok", depth=2, width=64)
        .union(cms_build(b, "tok", depth=2, width=64))
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = cms_build(a.union(b), "tok", depth=2, width=64)
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0


def test_bloom_packed_expr_matches_join_screen(spark):
    members = spark.createDataFrame([(i * 3,) for i in range(300)], "k: long")
    bits = bloom_build(members, "k", m=1 << 14, k=4)
    packed = bloom_pack(bits, m=1 << 14)
    assert len(packed) == (1 << 14) // 64
    probes = spark.createDataFrame([(i,) for i in range(1200)], "k: long")
    via_expr = {
        r["k"]
        for r in probes.filter(
            bloom_member_expr(F.col("k"), packed, m=1 << 14, k=4)
        ).collect()
    }
    via_join = {
        r["k"]
        for r in bloom_screen(probes, "k", bits, m=1 << 14, k=4)
        .filter(F.col("maybe_member"))
        .collect()
    }
    assert via_expr == via_join
    # no false negatives
    assert {i * 3 for i in range(300) if i * 3 < 1200} <= via_expr


def test_bloom_prefiltered_join_identical_to_plain_join(spark, sf_dir):
    # the semi-join reduction: prefilter the fact side with the dim's
    # bloom, then exact-join — provably identical results, smaller
    # shuffle. This is the operator composition bloom_prefilter_join
    # grades in the catalog.
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet").filter(
        F.col("s_acctbal") > 5000
    )
    bits = bloom_build(supp.select("s_suppkey"), "s_suppkey", m=1 << 14, k=4)
    packed = bloom_pack(bits, m=1 << 14)
    pre = li.filter(bloom_member_expr(F.col("l_suppkey"), packed, m=1 << 14, k=4))
    plain = li.join(supp, li["l_suppkey"] == supp["s_suppkey"]).count()
    reduced = pre.join(supp, pre["l_suppkey"] == supp["s_suppkey"]).count()
    assert plain == reduced
    # and the prefilter actually prunes (dim is a strict subset of keys)
    assert pre.count() < li.count()


def test_bloom_screen_no_false_negatives_on_duplicate_probes(spark):
    # membership must be decided per distinct KEY: duplicated probe rows
    # previously multiplied the per-key bit count and rejected true
    # members (a false negative — the one forbidden failure)
    members = spark.createDataFrame([(i,) for i in range(100)], "k: long")
    bits = bloom_build(members, "k", m=1 << 12, k=4)
    dup_probes = spark.createDataFrame(
        [(i % 50,) for i in range(400)], "k: long"  # each key 8 times
    )
    out = bloom_screen(dup_probes, "k", bits, m=1 << 12, k=4)
    assert out.count() == 400  # row multiplicity preserved
    assert out.filter(~F.col("maybe_member")).count() == 0
