"""Unit tests for operators/kmeans.py — the integer-exact in-engine
Lloyd trainer. Oracle parity for train_kmeans_lloyd is covered by the
full-parity suite; these pin the properties the bit-exactness claim
rests on: partitioning invariance of the full report, Lloyd descent,
deterministic tie-breaks, and empty-cluster carry-over."""

from pyspark.sql import functions as F

from vul_dbgen_spark.operators.kmeans import (
    assign,
    kmeans_report,
    kmeans_train,
    quantize_sql,
    seed_centroids,
    update,
)

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )


def _q(spark, rows):
    # rows: [(vec_id, [float...])] with a tiny dim — quantize directly
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )
    dim = len(rows[0][1])
    return df.select(
        "vec_id", F.expr(quantize_sql("embedding", dim)).alias("v")
    )


def test_report_partitioning_invariant(spark):
    emb = _emb(spark)
    a1, c1 = kmeans_train(emb)
    a2, c2 = kmeans_train(emb.repartition(17))
    r1 = [tuple(r) for r in kmeans_report(a1, c1).collect()]
    r2 = [tuple(r) for r in kmeans_report(a2, c2).collect()]
    assert r1 == r2
    assert len(r1) == 8 and sum(r[1] for r in r1) == emb.count()


def test_inertia_descends_across_rounds(spark):
    emb = _emb(spark)
    inertias = []
    for rounds in (1, 2, 3):
        a, c = kmeans_train(emb, rounds=rounds)
        inertias.append(
            kmeans_report(a, c).agg(F.sum("inertia")).first()[0]
        )
    assert inertias[0] >= inertias[1] >= inertias[2]
    assert inertias[2] < inertias[0]  # it actually moved


def test_assignment_argmin_and_tie_break(spark):
    # 2 centroids, point equidistant from both -> lower cid wins
    q = _q(spark, [(0, [0.0, 0.0]), (10, [2.0, 0.0]), (5, [1.0, 0.0])])
    cent = seed_centroids(q.filter(F.col("vec_id") != 5), k=2)
    got = {
        r.vec_id: (r.cid, r.d2)
        for r in assign(
            q.filter(F.col("vec_id") == 5), cent, dim=2
        ).collect()
    }
    # seeds: cid 0 = vec 0 at x=0, cid 1 = vec 10 at x=2e6 micro; point
    # at 1e6 micro is 1e12 from both -> tie -> cid 0
    assert got[5] == (0, 10**12)


def test_empty_cluster_keeps_previous_centroid(spark):
    # both points sit at the cid-0 seed; cid 1's cluster is empty after
    # assignment and must carry its previous centroid through update()
    q = _q(spark, [(1, [0.0, 0.0]), (2, [0.0, 0.0])])
    cent = seed_centroids(
        _q(spark, [(1, [0.0, 0.0]), (2, [5.0, 5.0])]), k=2
    )
    new = update(assign(q, cent, dim=2), cent)
    got = {r.cid: r.c for r in new.collect()}
    assert got[0] == [0, 0]
    assert got[1] == [5000000, 5000000]


def test_quantize_round_not_truncate(spark):
    # 0.0000015 * 1e6 = 1.5 -> must round (2), not truncate (1): the
    # cross-engine agreement depends on round-then-cast
    q = _q(spark, [(1, [0.0000015])])
    assert q.first()["v"] == [2]
