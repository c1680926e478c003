"""Similarity search over embedding columns (array<float>).

- :func:`cosine` — pure column expression (zip_with + aggregate), stays
  JVM-side; doubles throughout so the DuckDB oracle matches bit-for-bit
  given the same summation order.
- :func:`brute_force_topk` — exact baseline: query×corpus join, windowed
  top-k. Fine for small query sets; the corpus side streams.
- :func:`lsh_bucket_topk` — the scale path: random-hyperplane LSH buckets
  (deterministic seeded planes), candidates only within matching buckets,
  then exact re-rank. Misses are possible (approximate by design).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import Column


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    query_vec: str,
    corpus_vec: str,
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    The (small) query side is broadcast; the corpus is scanned once with
    the cosine computed in codegen — no shuffle until the final per-query
    top-k window over |queries|·k candidates.
    """
    q = queries.select(F.col(query_id).alias("qid"), F.col(query_vec).alias("qv"))
    c = corpus.select(F.col(corpus_id).alias("cid"), F.col(corpus_vec).alias("cv"))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("qid") != F.col("cid"))
        .select("qid", "cid", cosine(F.col("qv"), F.col("cv")).alias("cos"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("cid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "cid", F.round("cos", 4).alias("cos"), "rank")
    )


def _plane(dim: int, seed: int) -> list[float]:
    """Deterministic pseudo-random unit hyperplane (LCG, no numpy needed
    at plan-build time; executed driver-side once)."""
    state = seed * 6364136223846793005 + 1442695040888963407
    vals = []
    for _ in range(dim):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        vals.append(((state >> 11) / float(1 << 53)) * 2.0 - 1.0)
    n = math.sqrt(sum(v * v for v in vals)) or 1.0
    return [v / n for v in vals]


def lsh_bucket_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    query_vec: str,
    corpus_vec: str,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
) -> DataFrame:
    """Approximate top-k: sign-of-projection LSH bucket join + exact
    re-rank within buckets. Bucket = n_planes-bit signature; at scale the
    equi-join on bucket replaces the cross join."""

    def signature(vec_col: str):
        bits = []
        for p in range(n_planes):
            plane = F.array(*[F.lit(x) for x in _plane(dim, p + 1)])
            bits.append(F.when(dot(F.col(vec_col), plane) >= 0, F.lit("1")).otherwise(F.lit("0")))
        return F.concat(*bits)

    q = queries.select(
        F.col(query_id).alias("qid"), F.col(query_vec).alias("qv"), signature(query_vec).alias("sig")
    )
    c = corpus.select(
        F.col(corpus_id).alias("cid"), F.col(corpus_vec).alias("cv"), signature(corpus_vec).alias("sig")
    )
    scored = (
        q.join(c, "sig")
        .filter(F.col("qid") != F.col("cid"))
        .select("qid", "cid", cosine(F.col("qv"), F.col("cv")).alias("cos"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("cid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "cid", F.round("cos", 4).alias("cos"), "rank")
    )


def _argmin_centroid(vec_col: Column, centroids: list[tuple[int, list[float]]]) -> Column:
    """centroid id with the highest cosine to ``vec_col`` (ties → lowest id).

    Pure column expression: array of (-)similarity structs, array_min picks
    the best lexicographically — stays in codegen for any centroid count.
    """
    entries = []
    for cid, cvec in centroids:
        plane = F.array(*[F.lit(x) for x in cvec])
        entries.append(
            F.struct(
                (-cosine(vec_col, plane)).alias("negsim"), F.lit(cid).alias("cid")
            )
        )
    return F.array_min(F.array(*entries))["cid"]


def _top_centroids(vec_col: Column, centroids: list[tuple[int, list[float]]], nprobe: int) -> Column:
    """ids of the ``nprobe`` most-similar centroids (array column)."""
    entries = []
    for cid, cvec in centroids:
        plane = F.array(*[F.lit(x) for x in cvec])
        entries.append(
            F.struct(
                (-cosine(vec_col, plane)).alias("negsim"), F.lit(cid).alias("cid")
            )
        )
    ranked = F.array_sort(F.array(*entries))
    return F.transform(F.slice(ranked, 1, nprobe), lambda s: s["cid"])


def train_ivf_centroids(
    corpus: DataFrame,
    vec_col: str,
    n_centroids: int = 8,
    seed: int = 42,
    max_iter: int = 10,
    sample_fraction: float | None = None,
) -> list[tuple[int, list[float]]]:
    """Spherical-ish k-means centroids for IVF cells via pyspark.ml.

    Vectors are L2-normalized before training so Euclidean k-means
    approximates cosine clustering (on the unit sphere, Euclidean argmin
    = cosine argmax). At 100 TB, train on ``sample_fraction`` of the
    corpus — centroid quality converges long before full-data training,
    and the fit is one pass per iteration over the sample only. The
    model is tiny (n_centroids × dim floats) and lives driver-side, like
    the reference's broadcast dimension maps.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    v = F.col("__v")
    train = corpus.select(F.col(vec_col).cast("array<double>").alias("__v"))
    if sample_fraction is not None:
        train = train.sample(fraction=sample_fraction, seed=seed)
    train = train.select(
        array_to_vector(F.transform(v, lambda x: x / norm(v))).alias("features")
    )
    model = KMeans(k=n_centroids, seed=seed, maxIter=max_iter).fit(train)
    return [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    query_vec: str,
    corpus_vec: str,
    k: int = 5,
    n_centroids: int = 8,
    nprobe: int = 2,
    centroids: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """IVF-style approximate top-k: coarse-quantize the corpus into
    centroid cells, search only the query's ``nprobe`` nearest cells.

    ``centroids`` normally comes from :func:`train_ivf_centroids`
    (k-means); when omitted, the ``n_centroids`` lowest-id corpus
    vectors serve as a deterministic zero-training fallback. The
    centroid table is tiny and driver-collected once; assignment is a
    pure column expression, so the corpus is scanned once and shuffled
    once on ``centroid_id`` — at 100 TB the cell join replaces the
    all-pairs cross join, and cells can be written
    partitioned-by-centroid so repeated queries prune to nprobe/k of the
    data at the parquet-scan level.
    """
    if centroids is None:
        cent_rows = (
            corpus.select(F.col(corpus_id).alias("cid"), F.col(corpus_vec).alias("cv"))
            .orderBy("cid")
            .limit(n_centroids)
            .collect()
        )
        centroids = [(int(r.cid), [float(x) for x in r.cv]) for r in cent_rows]

    c = corpus.select(
        F.col(corpus_id).alias("cid"),
        F.col(corpus_vec).alias("cv"),
        _argmin_centroid(F.col(corpus_vec), centroids).alias("centroid_id"),
    )
    q = queries.select(
        F.col(query_id).alias("qid"),
        F.col(query_vec).alias("qv"),
        F.explode(_top_centroids(F.col(query_vec), centroids, nprobe)).alias(
            "centroid_id"
        ),
    )
    scored = (
        F.broadcast(q)
        .join(c, "centroid_id")
        .filter(F.col("qid") != F.col("cid"))
        .select("qid", "cid", cosine(F.col("qv"), F.col("cv")).alias("cos"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("cid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "cid", F.round("cos", 4).alias("cos"), "rank")
    )


def embedding_near_dup_pairs(
    df: DataFrame, id_col: str, vec_col: str, threshold: float = 0.95
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine >= threshold (exact
    all-pairs baseline; swap in lsh buckets for the 100 TB path)."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", cosine(F.col("va"), F.col("vb")))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", 4).alias("cos"))
    )
