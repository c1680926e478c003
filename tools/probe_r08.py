#!/usr/bin/env python
"""Round-8 one-off measurement probes (VERDICT r7 directives #3-#6, #8).

Each subcommand runs in its own fresh JVM (one invocation = one probe),
takes warm+timed draws with full state release between them (the
bench.py protocol), and merges its result under its own key into the
committed BENCH_probes_r08.json with loadavg evidence. Run with the box
idled per the bench protocol.

Subcommands:
  ab_sf01      directive #3 — clean A/B of the dedup-family sf0.1 drift
               (minhash-capped / embedding-lsh / bm25 / incremental)
  ab_sf1       directive #4 — clean A/B of graph_triangle_stats and
               graph_pagerank_parts at sf1
  wedge_bloom  directive #5 — one recorded census PAST the 20M-edge
               wedge-bloom gate on a synthetic graph: bloom transfer
               bytes + pack wall + census wall under the fixed 8g heap
  lpa_postures directive #6 — LPA at sf1 in BOTH postures (broadcast
               gate vs forced fallback): what the gate buys, and that
               the fallback's union-seed rounds don't regress
  e2e_stages   directive #8 — pipeline_e2e attribution: sources+enrich
               +upsert compute vs the container sink
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

OUT = os.path.join(_REPO, "BENCH_probes_r08.json")


def _loadavg() -> float | None:
    try:
        return round(os.getloadavg()[0], 2)
    except OSError:  # pragma: no cover
        return None


def _release_state(spark) -> None:
    spark.catalog.clearCache()
    jsc = spark.sparkContext._jsc
    for rdd in list(jsc.getPersistentRDDs().values()):
        rdd.unpersist()
    spark.sparkContext._jvm.System.gc()


def _merge(key: str, result: dict) -> None:
    data = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            data = json.load(f)
    result["loadavg_end"] = _loadavg()
    data[key] = result
    with open(OUT, "w") as f:
        json.dump(data, f, indent=1)
        f.write("\n")
    print(json.dumps({key: result}))


def _timed(fn, spark, n_timed: int, warm: int = 1) -> list[float]:
    draws = []
    for i in range(warm + n_timed):
        _release_state(spark)
        t0 = time.perf_counter()
        fn()
        if i >= warm:
            draws.append(round(time.perf_counter() - t0, 3))
    return draws


def ab_sf01() -> None:
    from vul_dbgen_spark.queries.catalog import REGISTRY
    from vul_dbgen_spark.session import get_spark

    spark = get_spark("probe_ab_sf01")
    sf_dir = "/root/testdata/sf0.1"
    names = [
        "q1_pricing_summary",  # canary context for the record
        "dedup_minhash_lsh_pairs_capped",
        "dedup_embedding_lsh",
        "bm25_topk",
        "dedup_incremental",
    ]
    res: dict[str, dict] = {"loadavg_start": _loadavg()}
    for n in names:
        spec = REGISTRY[n]
        draws = _timed(lambda: spec.fn(spark, sf_dir).count(), spark, 3)
        res[n] = {"draws": draws, "best": min(draws)}
        print(f"# {n}: {min(draws):.3f}s {draws}", file=sys.stderr)
    res["reference"] = {
        "r6_committed": {"dedup_minhash_lsh_pairs_capped": 1.55,
                         "dedup_embedding_lsh": 2.71, "bm25_topk": 1.12,
                         "dedup_incremental": 0.58},
        "r7_driver": {"dedup_minhash_lsh_pairs_capped": 2.82,
                      "dedup_embedding_lsh": 4.10, "bm25_topk": 1.66,
                      "dedup_incremental": 0.92},
    }
    _merge("ab_sf01_dedup_drift", res)


def ab_sf1() -> None:
    from vul_dbgen_spark.queries.catalog import REGISTRY
    from vul_dbgen_spark.session import get_spark

    spark = get_spark("probe_ab_sf1")
    sf1 = os.path.join(_REPO, "fixtures", "sf1")
    assert os.path.isdir(sf1), "fixtures/sf1 missing — run bench.py once"
    res: dict[str, dict] = {"loadavg_start": _loadavg()}
    for n in ("graph_triangle_stats", "graph_pagerank_parts"):
        spec = REGISTRY[n]
        draws = _timed(lambda: spec.fn(spark, sf1).count(), spark, 2)
        res[n] = {"draws": draws, "best": min(draws)}
        print(f"# {n}@sf1: {min(draws):.3f}s {draws}", file=sys.stderr)
    res["reference"] = {
        "r6_committed": {"graph_triangle_stats": 22.8,
                         "graph_pagerank_parts": 12.2},
        "r7_committed": {"graph_triangle_stats": 26.9,
                         "graph_pagerank_parts": 14.5},
    }
    _merge("ab_sf1_graph_drift", res)


def wedge_bloom() -> None:
    """One recorded run past the 20M-edge gate: a seeded synthetic
    ~26M-edge graph (xxhash64 endpoints over 5M nodes — deterministic,
    no RNG) so the auto-gate activates the Arrow bloom_pack path and
    the driver transfer + census wall are MEASURED under the fixed 8g
    heap instead of only unit-pinned (tests/test_graph.py sizing
    invariant)."""
    from pyspark.sql import functions as F

    from vul_dbgen_spark.operators.graph import (
        WEDGE_BLOOM_EDGE_GATE,
        triangle_stats,
        wedge_bloom_bits,
    )
    from vul_dbgen_spark.operators.sketches import bloom_pack, xx_bloom_bits
    from vul_dbgen_spark.session import get_spark

    spark = get_spark("probe_wedge_bloom")
    n_nodes, n_draws = 5_000_000, 26_000_000
    edges = (
        spark.range(n_draws)
        .select(
            F.pmod(F.xxhash64(F.col("id")), F.lit(n_nodes)).alias("src"),
            F.pmod(F.xxhash64(F.col("id") + F.lit(1_000_000_007)),
                   F.lit(n_nodes)).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
    )
    canon = (
        edges.select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .distinct()
        .persist()
    )
    n_edges = canon.count()
    assert n_edges > WEDGE_BLOOM_EDGE_GATE, n_edges
    m = wedge_bloom_bits(n_edges)
    res: dict = {
        "loadavg_start": _loadavg(),
        "n_nodes": n_nodes,
        "n_canonical_edges": n_edges,
        "bloom_bits": m,
        "bloom_transfer_bytes": m // 8,
    }
    # (a) the driver transfer in isolation: the bloom aggregate + Arrow
    # pack is exactly what rides driver-side at the gate
    t0 = time.perf_counter()
    packed = bloom_pack(xx_bloom_bits(canon, ["u", "v"], m, k=3), m)
    res["bloom_build_pack_sec"] = round(time.perf_counter() - t0, 3)
    res["packed_words"] = int(len(packed))
    canon.unpersist()
    # (b) the full census with the auto-gate making the same decision
    draws = []
    rows = None
    for i in range(2):
        _release_state(spark)
        t0 = time.perf_counter()
        rows = triangle_stats(edges).collect()
        draws.append(round(time.perf_counter() - t0, 3))
    res["census_draws_sec"] = draws
    res["census_best_sec"] = min(draws)
    res["census_row"] = {k: str(v) for k, v in rows[0].asDict().items()}
    print(f"# wedge_bloom past-gate: {n_edges} edges, m=2^{m.bit_length()-1}, "
          f"transfer {m // 8 / 1e6:.1f} MB, pack {res['bloom_build_pack_sec']}s, "
          f"census {draws}", file=sys.stderr)
    _merge("wedge_bloom_past_gate", res)


def lpa_postures() -> None:
    from pyspark.sql import functions as F

    from vul_dbgen_spark.operators.graph import label_propagation
    from vul_dbgen_spark.queries.catalog import _cooc_edges, load
    from vul_dbgen_spark.session import get_spark

    spark = get_spark("probe_lpa_postures")
    sf1 = os.path.join(_REPO, "fixtures", "sf1")
    assert os.path.isdir(sf1), "fixtures/sf1 missing — run bench.py once"
    res: dict = {"loadavg_start": _loadavg()}
    counts: dict[str, int] = {}

    def run(flag: bool) -> int:
        parts = load(spark, sf1, "part").select("p_partkey")
        out = label_propagation(
            _cooc_edges(spark, sf1), "u", "v",
            vertices=parts, id_col="p_partkey", iterations=3,
            broadcast_labels=flag,
        )
        return out.select(F.sum(F.col("label"))).first()[0]

    for tag, flag in (("broadcast", True), ("fallback", False)):
        sums = []

        def once():
            sums.append(run(flag))

        draws = _timed(once, spark, 2)
        res[tag] = {"draws": draws, "best": min(draws)}
        counts[tag] = sums[-1]
        print(f"# lpa {tag}@sf1: {min(draws):.3f}s {draws}", file=sys.stderr)
    # label-sum equality across postures — the probe doubles as an at-
    # scale equality check on top of the unit test's hand graph
    res["label_sum_equal"] = counts["broadcast"] == counts["fallback"]
    assert res["label_sum_equal"], counts
    _merge("lpa_postures_sf1", res)


def e2e_stages() -> None:
    import shutil
    import tempfile

    from vul_dbgen_spark.plans import pipeline as _pipeline
    from vul_dbgen_spark.session import get_spark
    from vul_dbgen_spark.sinks import memdb as _memdb

    spark = get_spark("probe_e2e_stages")
    fixture_root = os.path.join(_REPO, "fixtures", "vul-source")
    res: dict = {"loadavg_start": _loadavg()}
    # undivided reference run (matches the bench row's shape)
    undivided = []
    for i in range(3):
        _release_state(spark)
        t0 = time.perf_counter()
        os_out, app_out = _pipeline.run(spark, fixture_root)
        tmp = tempfile.mkdtemp(prefix="probe_e2e_")
        try:
            _memdb.update_db(os_out, app_out, tmp, version="0.0")
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
        if i > 0:
            undivided.append(round(time.perf_counter() - t0, 3))
    res["undivided_draws_sec"] = undivided
    # staged attribution: force-materialize the upsert outputs first
    # (persist+count), then run the sink over the cached frames — the
    # split double-counts nothing and its sum approximates the
    # undivided run
    staged = []
    for i in range(3):
        _release_state(spark)
        t0 = time.perf_counter()
        os_out, app_out = _pipeline.run(spark, fixture_root)
        os_out = os_out.persist()
        app_out = app_out.persist()
        os_out.count()
        app_out.count()
        t1 = time.perf_counter()
        tmp = tempfile.mkdtemp(prefix="probe_e2e_")
        try:
            _memdb.update_db(os_out, app_out, tmp, version="0.0")
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
        t2 = time.perf_counter()
        if i > 0:
            staged.append(
                {"compute_sec": round(t1 - t0, 3), "sink_sec": round(t2 - t1, 3)}
            )
    res["staged_draws"] = staged
    res["attribution"] = {
        "compute_best_sec": min(d["compute_sec"] for d in staged),
        "sink_best_sec": min(d["sink_sec"] for d in staged),
        "undivided_best_sec": min(undivided),
    }
    print(f"# e2e stages: {res['attribution']}", file=sys.stderr)
    _merge("e2e_stage_attribution", res)


if __name__ == "__main__":
    {
        "ab_sf01": ab_sf01,
        "ab_sf1": ab_sf1,
        "wedge_bloom": wedge_bloom,
        "lpa_postures": lpa_postures,
        "e2e_stages": e2e_stages,
    }[sys.argv[1]]()
