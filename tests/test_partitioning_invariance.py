"""Rerun-stability under arbitrary partitioning — the property every
md5-keyed sampler/dedup design in this repo claims: output is a pure
function of the DATA, never of how Spark happened to split it. Each test
runs the operator on repartition(1) vs repartition(64) (and a skewed
range-partitioning for the samplers) and requires bit-identical rows.

This is the contract that makes incremental refreshes and cross-cluster
reruns safe at 100 TB: a re-shuffle, an executor-count change, or AQE
re-planning must never move a document in or out of a sample/split."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _partitionings(df):
    return [
        df.repartition(1),
        df.repartition(64),
        # skewed: everything through few range-partitions on a
        # non-uniform key, the adversarial layout for per-partition state
        df.repartitionByRange(3, F.col("doc_id") % 2),
    ]


def test_priority_sample_partitioning_invariant(docs):
    from vul_dbgen_spark.operators.sampling import priority_sample

    d = docs.select("doc_id", F.length("text").cast("bigint").alias("w"))
    base = _rows(priority_sample(_partitionings(d)[0], "doc_id", "w", k=100))
    assert len(base) == 100
    for part in _partitionings(d)[1:]:
        assert _rows(priority_sample(part, "doc_id", "w", k=100)) == base


def test_sqrt_cap_sample_partitioning_invariant(docs):
    from vul_dbgen_spark.operators.sampling import sqrt_cap_sample

    d = docs.select("doc_id", "source")
    base = _rows(sqrt_cap_sample(_partitionings(d)[0], "doc_id", "source"))
    assert base
    for part in _partitionings(d)[1:]:
        assert _rows(sqrt_cap_sample(part, "doc_id", "source")) == base


def test_split_partitioning_invariant(docs):
    from vul_dbgen_spark.operators.sampling import deterministic_split

    d = docs.select("doc_id")
    base = _rows(deterministic_split(_partitionings(d)[0], "doc_id", 0.1))
    tags = {t for _, t in base}
    assert tags == {"train", "test"}
    for part in _partitionings(d)[1:]:
        assert _rows(deterministic_split(part, "doc_id", 0.1)) == base


def test_minhash_lsh_pairs_partitioning_invariant(docs):
    from vul_dbgen_spark.operators.dedup import minhash_lsh_pairs

    d = docs.select("doc_id", "text")
    base = _rows(minhash_lsh_pairs(d.repartition(1), "doc_id", "text"))
    assert base
    assert _rows(minhash_lsh_pairs(d.repartition(64), "doc_id", "text")) == base


def test_cell_balanced_sample_partitioning_invariant(spark):
    from vul_dbgen_spark.operators.similarity import cell_balanced_sample

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    parts = [
        emb.repartition(1),
        emb.repartition(64),
        emb.repartitionByRange(3, F.col("vec_id") % 2),
    ]
    base = _rows(cell_balanced_sample(parts[0], "vec_id", "embedding", cap=10))
    # the cap must actually bind somewhere (avg cell size > 10 at sf0.001)
    assert 0 < len(base) <= 8 * 10
    for part in parts[1:]:
        assert (
            _rows(cell_balanced_sample(part, "vec_id", "embedding", cap=10)) == base
        )


def test_cdc_chunks_partitioning_invariant(docs):
    from vul_dbgen_spark.operators.chunking import cdc_chunk_fps

    d = docs.select("doc_id", "text")
    base = _rows(cdc_chunk_fps(_partitionings(d)[0], "doc_id", "text"))
    assert len(base) > 0
    for part in _partitionings(d)[1:]:
        assert _rows(cdc_chunk_fps(part, "doc_id", "text")) == base


def test_bloom_bits_partitioning_invariant(spark):
    from vul_dbgen_spark.operators.sketches import bloom_build, bloom_pack

    cust = spark.read.parquet(f"{SF}/customer.parquet").select("c_custkey")
    packs = []
    for part in [cust.repartition(1), cust.repartition(64)]:
        packs.append(bloom_pack(bloom_build(part, "c_custkey", m=1 << 14, k=4), m=1 << 14))
    # bloom_pack returns numpy int64 arrays (round-7 Arrow pack)
    assert (packs[0] == packs[1]).all() and len(packs[0]) == (1 << 14) // 64


def test_pagerank_partitioning_stable_at_grading_precision(spark):
    # FP sums re-associate across partitionings; the CONTRACT is
    # stability at the 6-dp precision every graded float is held to
    from vul_dbgen_spark.operators.graph import pagerank

    e = spark.createDataFrame(
        [(i % 97, (i * 7) % 97) for i in range(500)], "src: long, dst: long"
    )
    outs = []
    for part in [e.repartition(1), e.repartition(64)]:
        outs.append({
            r["node"]: round(r["rank"], 6)
            for r in pagerank(part, iterations=5).collect()
        })
    assert outs[0] == outs[1]
