"""Connected components: correctness on adversarial shapes (paths,
cliques, isolated nodes), determinism, and the plan property that the
per-round join stays equi-join shaped."""

from __future__ import annotations

from pyspark.sql import functions as F

from vul_dbgen_spark.operators.graph import component_summary, connected_components


def _cc(spark, edges, vertices=None):
    e = spark.createDataFrame(edges, "src: long, dst: long")
    v = (
        spark.createDataFrame([(x,) for x in vertices], "id: long")
        if vertices is not None
        else None
    )
    out = connected_components(e, "src", "dst", vertices=v, id_col="id")
    return {r["node"]: r["component"] for r in out.collect()}


def test_two_triangles_and_a_bridge(spark):
    edges = [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12), (12, 10), (3, 10)]
    got = _cc(spark, edges)
    assert got == {k: 1 for k in [1, 2, 3, 10, 11, 12]}


def test_long_path_exceeding_one_round(spark):
    # a 12-node path needs ~11 propagation rounds — exercises the
    # fixpoint loop well past round one
    edges = [(i, i + 1) for i in range(100, 111)]
    got = _cc(spark, edges)
    assert got == {k: 100 for k in range(100, 112)}


def test_isolated_vertices_become_singletons(spark):
    got = _cc(spark, [(1, 2)], vertices=[1, 2, 7, 9])
    assert got == {1: 1, 2: 1, 7: 7, 9: 9}


def test_edge_orientation_is_irrelevant(spark):
    a = _cc(spark, [(5, 3), (3, 8)])
    b = _cc(spark, [(3, 5), (8, 3)])
    assert a == b == {3: 3, 5: 3, 8: 3}


def test_component_summary_filters_singletons(spark):
    e = spark.createDataFrame([(1, 2), (2, 3), (7, 8)], "src: long, dst: long")
    v = spark.createDataFrame([(x,) for x in [1, 2, 3, 7, 8, 99]], "id: long")
    cc = connected_components(e, "src", "dst", vertices=v, id_col="id")
    summary = {
        r["component"]: (r["n_docs"], r["max_doc"])
        for r in component_summary(cc).collect()
    }
    assert summary == {1: (3, 3), 7: (2, 8)}


def test_round_join_is_equijoin_not_cartesian(spark):
    e = spark.createDataFrame([(1, 2), (2, 3)], "src: long, dst: long")
    out = connected_components(e, "src", "dst")
    # the returned label table is checkpointed, but building one more
    # message round over it shows the join shape the loop uses
    msgs = e.join(out, e["src"] == out["node"])
    plan = msgs._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_star_contraction_path_1000_in_log_rounds(spark):
    """Kiveris et al. convergence bound: a 1000-node path — the
    adversarial O(diameter) case for label propagation — must contract in
    <= 2*log2(n) alternating rounds."""
    import math

    from vul_dbgen_spark.operators.graph import _star_contraction, _symmetrize

    n = 1000
    e = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], "src: long, dst: long")
    stars, rounds = _star_contraction(_symmetrize(e, "src", "dst"), max_iter=40)
    assert rounds <= 2 * math.log2(n), rounds
    got = {r["u"]: r["v"] for r in stars.collect()}
    assert got == {i: 0 for i in range(1, n)}


def test_star_and_label_agree_on_random_graph(spark):
    """The two algorithms are interchangeable: identical labels on a
    seeded random graph (the differential contract the docstring claims)."""
    import random

    rng = random.Random(7)
    edges = [(rng.randrange(200), rng.randrange(200)) for _ in range(150)]
    e = spark.createDataFrame(edges, "src: long, dst: long")
    v = spark.createDataFrame([(x,) for x in range(200)], "id: long")
    a = connected_components(e, "src", "dst", vertices=v, id_col="id", algorithm="star")
    b = connected_components(e, "src", "dst", vertices=v, id_col="id", algorithm="label")
    assert {(r.node, r.component) for r in a.collect()} == {
        (r.node, r.component) for r in b.collect()
    }


def test_star_and_label_agree_on_clique_union(spark):
    # the common near-dup shape: LSH-bucket cliques sharing members
    cliq = [(a, b) for grp in ([4, 9, 17], [17, 30, 31], [50, 51])
            for i, a in enumerate(grp) for b in grp[i + 1:]]
    e = spark.createDataFrame(cliq, "src: long, dst: long")
    a = connected_components(e, algorithm="star")
    b = connected_components(e, algorithm="label")
    assert {(r.node, r.component) for r in a.collect()} == {
        (r.node, r.component) for r in b.collect()
    }
