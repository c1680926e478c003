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


# ---------------------------------------------------------------------------
# triangle census / PageRank / k-hop BFS
# ---------------------------------------------------------------------------

from vul_dbgen_spark.operators.graph import khop_levels, pagerank, triangle_stats


def test_triangle_stats_hand_graph(spark):
    # K4 on {1,2,3,4} (4 triangles, 12 wedges) plus a pendant 4-5
    # (adds 3 wedges at node 4's neighbors... recompute: deg(4)=4 so
    # wedges at 4 = C(4,2)=6; total wedges = 3*C(3,2) + 6 + 0 = 15)
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)]
    e = spark.createDataFrame(edges, "src: long, dst: long")
    row = triangle_stats(e).collect()[0]
    assert row["n_triangles"] == 4
    assert row["n_wedges"] == 15
    assert row["clustering_coeff"] == round(12 / 15, 6)


def test_triangle_stats_triangle_free(spark):
    # star graph: wedges but no triangles
    e = spark.createDataFrame([(0, i) for i in range(1, 6)], "src: long, dst: long")
    row = triangle_stats(e).collect()[0]
    assert row["n_triangles"] == 0
    assert row["n_wedges"] == 10
    assert row["clustering_coeff"] == 0.0


def test_triangle_stats_duplicate_and_reversed_edges_ignored(spark):
    e = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 1), (1, 3), (3, 3)], "src: long, dst: long"
    )
    row = triangle_stats(e).collect()[0]
    assert row["n_triangles"] == 1
    assert row["n_wedges"] == 3


def test_pagerank_star_closed_form(spark):
    # directed star 1->2, 1->3, 1->4; nodes 2,3,4 are dangling.
    # Symmetry: r(2)=r(3)=r(4) every iteration; total mass 1.
    e = spark.createDataFrame([(1, 2), (1, 3), (1, 4)], "src: long, dst: long")
    got = {r["node"]: r["rank"] for r in pagerank(e, iterations=3).collect()}
    assert abs(sum(got.values()) - 1.0) < 1e-9
    assert abs(got[2] - got[3]) < 1e-12 and abs(got[3] - got[4]) < 1e-12
    # hand-iterate the same recurrence
    n, d = 4, 0.85
    r1, ro = 1 / n, 1 / n  # rank of node 1 / of each leaf
    for _ in range(3):
        dangling = 3 * ro
        r1_new = (1 - d) / n + d * (dangling / n)
        ro_new = (1 - d) / n + d * (r1 / 3 + dangling / n)
        r1, ro = r1_new, ro_new
    assert abs(got[1] - r1) < 1e-12
    assert abs(got[2] - ro) < 1e-12


def test_pagerank_nonsuperset_vertices_keeps_mass(spark):
    # edges reference nodes 1..4 but the caller's vertex frame only
    # lists 1..2: the endpoint union (ADVICE r3) must pull 3 and 4 into
    # the node base so no contribution mass vanishes — Σ rank = 1 holds
    # for ANY vertices input unless vertices_are_superset waives it
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1)], "src: long, dst: long"
    )
    v = spark.createDataFrame([(1,), (2,)], "id: long")
    got = {r["node"]: r["rank"] for r in pagerank(e, vertices=v, iterations=3).collect()}
    assert set(got) == {1, 2, 3, 4}
    assert abs(sum(got.values()) - 1.0) < 1e-9
    # a 4-cycle is rank-uniform regardless of the vertex frame handed in
    assert all(abs(x - 0.25) < 1e-12 for x in got.values())


def test_pagerank_cycle_uniform(spark):
    # a directed cycle is rank-uniform at every iteration
    e = spark.createDataFrame(
        [(i, (i + 1) % 5) for i in range(5)], "src: long, dst: long"
    )
    got = [r["rank"] for r in pagerank(e, iterations=4).collect()]
    assert all(abs(x - 0.2) < 1e-12 for x in got)


def test_khop_levels_directed_path(spark):
    e = spark.createDataFrame([(i, i + 1) for i in range(10)], "src: long, dst: long")
    seeds = spark.createDataFrame([(0,)], "id: long")
    got = {r["node"]: r["min_hop"] for r in khop_levels(e, seeds, k=3).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}


def test_khop_levels_min_hop_on_diamond(spark):
    # two routes to node 4: length 2 (0-1-4) and length 3 (0-2-3-4)
    e = spark.createDataFrame(
        [(0, 1), (1, 4), (0, 2), (2, 3), (3, 4)], "src: long, dst: long"
    )
    seeds = spark.createDataFrame([(0,)], "id: long")
    got = {r["node"]: r["min_hop"] for r in khop_levels(e, seeds, k=3).collect()}
    assert got[4] == 2
    assert got == {0: 0, 1: 1, 2: 1, 4: 2, 3: 2}


def test_khop_levels_early_exit_and_direction(spark):
    # edges point AWAY from 5; BFS from 5 follows direction only
    e = spark.createDataFrame([(5, 6), (7, 5)], "src: long, dst: long")
    seeds = spark.createDataFrame([(5,)], "id: long")
    got = {r["node"]: r["min_hop"] for r in khop_levels(e, seeds, k=4).collect()}
    assert got == {5: 0, 6: 1}


def test_triangle_stats_wedge_bloom_path_identical(spark):
    # the >20M-edge scale path (packed xxhash bloom prefilter on the
    # wedge table) must be a pure optimization: identical census
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6)]
    e = spark.createDataFrame(edges, "src: long, dst: long")
    plain = triangle_stats(e, wedge_bloom=False).collect()[0]
    bloomed = triangle_stats(e, wedge_bloom=True).collect()[0]
    assert plain == bloomed
    assert plain["n_triangles"] == 4


def test_rcte_khop_equals_iterative_bfs(spark):
    """Spark's native WITH RECURSIVE (catalog: graph_khop_reach_rcte)
    and the hand-rolled frontier loop must produce identical min-hop
    labelings on the same graph/seeds."""
    from vul_dbgen_spark.queries.catalog import (
        graph_khop_reach,
        graph_khop_reach_rcte,
    )

    sf = "/root/testdata/sf0.001"
    a = sorted(map(tuple, graph_khop_reach(spark, sf).collect()))
    b = sorted(map(tuple, graph_khop_reach_rcte(spark, sf).collect()))
    assert a == b and len(a) > 0


def test_connected_components_string_node_ids(spark):
    # the label path must converge correctly for NON-numeric ids (the
    # numeric label-sum probe cannot apply; the fallback join probe
    # must): a 6-node string path needs ~5 propagation rounds
    edges = [(f"doc{i:02d}", f"doc{i + 1:02d}") for i in range(5)]
    e = spark.createDataFrame(edges, "src: string, dst: string")
    for algo in ("label", "star"):
        got = {
            r["node"]: r["component"]
            for r in connected_components(e, algorithm=algo).collect()
        }
        assert got == {f"doc{i:02d}": "doc00" for i in range(6)}, algo


def test_pagerank_empty_graph_returns_empty(spark):
    e = spark.createDataFrame([], "src: long, dst: long")
    assert pagerank(e).count() == 0
    # self-loops only: filtered out, still empty, still no crash
    e2 = spark.createDataFrame([(1, 1), (2, 2)], "src: long, dst: long")
    assert pagerank(e2).count() == 0


def test_triangle_stats_huge_ids_fallback_identical(spark):
    # ids past 2^31 (and a negative id) force the two-column closing
    # join; shifting the same graph into packable range takes the
    # packed-long path — the census must be identical on both
    base = [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5), (3, 5), (2, 4)]
    big = 1 << 33
    shifted = [(u + big, v + big) for u, v in base]
    shifted[0] = (-(1 << 32), shifted[0][1])  # negative id too
    small = spark.createDataFrame(base, "src: long, dst: long")
    huge = spark.createDataFrame(shifted, "src: long, dst: long")
    rs = triangle_stats(small).collect()[0]
    rh = triangle_stats(huge).collect()[0]
    # the negative-id rewrite moves one endpoint of edge (1,2): node 1
    # splits into {-2^32, 1+2^33} — recompute expectations directly
    # instead: equality is checked on the UNshifted graph vs a purely
    # shifted copy (drop the negative-id edge from both)
    assert rs["n_triangles"] == 3 and rs["n_wedges"] == 14

    pure_shift = [(u + big, v + big) for u, v in base]
    huge2 = spark.createDataFrame(pure_shift, "src: long, dst: long")
    rh2 = triangle_stats(huge2).collect()[0]
    assert (
        rh2["n_triangles"],
        rh2["n_wedges"],
        rh2["clustering_coeff"],
    ) == (rs["n_triangles"], rs["n_wedges"], rs["clustering_coeff"])
    # the negative-id variant still runs (fallback path) and counts the
    # same wedges minus those lost by splitting node 1
    assert rh["n_triangles"] >= 2


def test_label_propagation_two_communities(spark):
    from vul_dbgen_spark.operators.graph import label_propagation

    # two triangles joined by one bridge edge; hand-unrolled recurrence:
    # l1 = {1:2, 2:1, 3:1, 4:3, 5:4, 6:4}
    # l2 = {1:1, 2:1, 3:1, 4:4, 5:3, 6:3}
    # l3 = {1:1, 2:1, 3:1, 4:3, 5:3, 6:3}
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)],
        "src: long, dst: long",
    )
    got = {
        r["node"]: r["label"]
        for r in label_propagation(edges, iterations=3).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 3, 5: 3, 6: 3}


def test_label_propagation_isolated_and_superset(spark):
    from vul_dbgen_spark.operators.graph import label_propagation

    # a triangle (converges to all-1 by round 2: r1={1:2,2:1,3:1},
    # r2 = everyone's neighborhood majority/min is 1) plus an isolated
    # vertex, which must keep its own label. NB a single edge would
    # OSCILLATE under synchronous LPA (the classic 2-cycle) — that
    # behavior is inherent to the synchronous variant, not a bug.
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3)], "src: long, dst: long"
    )
    verts = spark.createDataFrame([(1,), (2,), (3,), (9,)], "id: long")
    got = {
        r["node"]: r["label"]
        for r in label_propagation(edges, vertices=verts, iterations=2).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 9: 9}


def test_label_propagation_min_label_tie_break(spark):
    from vul_dbgen_spark.operators.graph import label_propagation

    # star center 5 with leaves 1..4: round 1 gives the center a 4-way
    # tie -> min label 1; each leaf sees only {5} -> 5
    edges = spark.createDataFrame(
        [(5, 1), (5, 2), (5, 3), (5, 4)], "src: long, dst: long"
    )
    got = {
        r["node"]: r["label"]
        for r in label_propagation(edges, iterations=1).collect()
    }
    assert got == {5: 1, 1: 5, 2: 5, 3: 5, 4: 5}


def test_label_propagation_fallback_plan_identical(spark):
    # the two physical postures — broadcast labels over a v-partitioned
    # edge list (below the 20M-node gate) vs shuffled labels over a
    # u-partitioned one (above it) — must label identically; the
    # integer-count argmax has no accumulation-order sensitivity, so
    # this is exact equality, not tolerance
    from vul_dbgen_spark.operators.graph import label_propagation

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)],
        "src: long, dst: long",
    )
    verts = spark.createDataFrame([(i,) for i in range(1, 8)], "id: long")

    def run(flag):
        return {
            r["node"]: r["label"]
            for r in label_propagation(
                edges, vertices=verts, iterations=3, broadcast_labels=flag
            ).collect()
        }

    bc, shuffled = run(True), run(False)
    assert bc == shuffled
    assert bc == {1: 1, 2: 1, 3: 1, 4: 3, 5: 3, 6: 3, 7: 7}


def test_label_propagation_gate_comment_matches_constant(spark):
    # the 50M→20M→10M gate changes (round 7: hashed-relation expansion
    # vs the fixed 8g heap; round 8, ADVICE: the broadcast posture
    # holds TWO concurrent node-scale relations per round — labels +
    # argmax result — with prior rounds released only lazily) must not
    # silently drift back up
    from vul_dbgen_spark.operators.graph import LPA_BROADCAST_NODE_GATE

    assert LPA_BROADCAST_NODE_GATE == 10_000_000


def test_wedge_bloom_sizing_invariant():
    # round-6's latent scale bug: a 2^24 cap shipped for five rounds
    # because nothing asserted bits/edge at the ACTIVATION boundary —
    # the bloom only exists past the 20M-edge gate, so that is where
    # the density promise must hold. Pin: >=8 bits/edge from the gate
    # up to the documented ~134M-edge point where the 2^30 cap binds,
    # and power-of-two size throughout.
    from vul_dbgen_spark.operators.graph import (
        WEDGE_BLOOM_EDGE_GATE,
        WEDGE_BLOOM_MAX_BITS,
        wedge_bloom_bits,
    )

    assert WEDGE_BLOOM_EDGE_GATE == 20_000_000
    for n_edges in (
        WEDGE_BLOOM_EDGE_GATE + 1,
        25_000_000,
        60_000_000,
        134_000_000,
    ):
        m = wedge_bloom_bits(n_edges)
        assert m & (m - 1) == 0, f"not a power of two: {m}"
        assert m / n_edges >= 8, f"{n_edges} edges: {m / n_edges:.2f} bits/edge"
        assert m <= WEDGE_BLOOM_MAX_BITS
    # past the cap the size saturates (degradation documented in the
    # operator docstring) rather than growing past broadcast scale
    assert wedge_bloom_bits(1_000_000_000) == WEDGE_BLOOM_MAX_BITS
    # and below the gate triangle_stats hands the closing join to a
    # broadcast semi-join instead of activating the bloom at all — the
    # auto-gate decision is n_edges > WEDGE_BLOOM_EDGE_GATE, pinned by
    # the plan snapshot in tests/test_plans.py


def test_edge_helper_consumers_are_pinned():
    """_cooc_edges/_seq_edges return NON-DEDUPED pair streams (round 8
    dropped their trailing .distinct() because every consumer dedups
    internally) while their DuckDB oracles keep SELECT DISTINCT — so
    correctness depends on every FUTURE consumer remembering to dedup.
    Pin the exact consumer set (round-8 VERDICT directive #7): a new
    call site must either appear here WITH a verified internal dedup, or
    add .distinct() at the call site like graph_khop_reach_rcte does."""
    import ast
    import inspect

    from vul_dbgen_spark.queries import catalog

    tree = ast.parse(inspect.getsource(catalog))
    consumers: set[tuple[str, str]] = set()
    for fn in ast.walk(tree):
        if not isinstance(fn, (ast.FunctionDef, ast.AsyncFunctionDef)):
            continue
        for node in ast.walk(fn):
            if (
                isinstance(node, ast.Call)
                and isinstance(node.func, ast.Name)
                and node.func.id in ("_cooc_edges", "_seq_edges")
                and fn.name not in ("_cooc_edges", "_seq_edges")
            ):
                consumers.add((node.func.id, fn.name))
    assert consumers == {
        # triangle_stats: canon .distinct() (operators/graph.py)
        ("_cooc_edges", "graph_triangle_stats"),
        # label_propagation: _symmetrize ends in .distinct()
        ("_cooc_edges", "graph_label_propagation"),
        # pagerank: e.distinct() on the canonicalized frame
        ("_seq_edges", "graph_pagerank_parts"),
        # khop_levels: e .distinct() before the checkpoint
        ("_seq_edges", "graph_khop_reach"),
        # rcte twin: call-site .distinct() (load-bearing there)
        ("_seq_edges", "graph_khop_reach_rcte"),
    }, (
        "edge-helper consumer set changed: verify the new consumer "
        "dedups the non-deduped pair stream (or add .distinct() at the "
        "call site) before updating this pin"
    )


def test_cc_label_broadcast_postures_identical(spark):
    """Round 9: the label loop's broadcast-hook posture (v-partitioned
    edges + broadcast neighbor-min/jump) and the past-gate union form
    must produce identical assignments — on a shape that mixes chains
    (jump-dependent), cliques, isolated vertices, and a vertices=None
    derivation."""
    edges = (
        [(i, i + 1) for i in range(1, 14)]          # 14-node chain
        + [(100, 101), (101, 102), (102, 100)]       # triangle
        + [(200, 201)]
    )
    e = spark.createDataFrame(edges, "src: long, dst: long")
    v = spark.createDataFrame(
        [(x,) for x in range(1, 15)]
        + [(x,) for x in (100, 101, 102, 200, 201, 999)],  # 999 isolated
        "id: long",
    )
    a = connected_components(
        e, "src", "dst", vertices=v, id_col="id", algorithm="label",
        broadcast_labels=True,
    ).collect()
    b = connected_components(
        e, "src", "dst", vertices=v, id_col="id", algorithm="label",
        broadcast_labels=False,
    ).collect()
    got_a = {r["node"]: r["component"] for r in a}
    got_b = {r["node"]: r["component"] for r in b}
    assert got_a == got_b
    assert got_a[14] == 1 and got_a[102] == 100 and got_a[999] == 999
    # vertices=None (auto resolves to the legacy shape) still agrees
    c = connected_components(e, "src", "dst", algorithm="label").collect()
    got_c = {r["node"]: r["component"] for r in c}
    assert all(got_a[k] == v2 for k, v2 in got_c.items())
