#!/usr/bin/env python
"""Round-9 interleaved A/B harness for the iterative-graph loop shapes.

Usage: python tools/ab_r09.py <family> [reps]
Families: cc, khop, pagerank, lpa, seqedges

Each rep runs every variant once, interleaved (A B C, A B C, ...) so
box-tenancy drift hits all variants equally; full state release between
runs; wall time + scheduled-job count per run. Variants must produce
IDENTICAL results — each family asserts a result signature per run.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark import StorageLevel  # noqa: E402
from pyspark.sql import DataFrame, Observation  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _release(spark):
    spark.catalog.clearCache()
    jsc = spark.sparkContext._jsc
    for rdd in list(jsc.getPersistentRDDs().values()):
        rdd.unpersist()
    spark.sparkContext._jvm.System.gc()


def _jobs(spark) -> int:
    return int(spark.sparkContext._jsc.sc().dagScheduler().nextJobId())


def _spark():
    from vul_dbgen_spark.session import get_spark

    return get_spark("ab_r09")


# ---------------------------------------------------------------------------
# cc: the hook+jump label loop on dedup_clusters' LSH candidate graph
# ---------------------------------------------------------------------------

def _cc_inputs(spark):
    from vul_dbgen_spark.operators.dedup import minhash_lsh_pairs
    from vul_dbgen_spark.queries.catalog import load

    docs = load(spark, SF_DIR, "documents")
    pairs = minhash_lsh_pairs(docs, "doc_id", "text")
    return pairs, docs.select("doc_id")


def _cc_sym(pairs) -> DataFrame:
    return (
        pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
        .union(pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def cc_current(spark) -> int:
    """Mirror of connected_components(algorithm=label) at HEAD."""
    pairs, verts = _cc_inputs(spark)
    sym = _cc_sym(pairs).persist(StorageLevel.MEMORY_AND_DISK)
    lbl = (
        verts.select(F.col("doc_id").alias("node")).distinct()
        .select("node", F.col("node").alias("component"))
        .localCheckpoint()
    )
    prev_sum = None
    for _ in range(30):
        msgs = sym.join(lbl, sym["u"] == lbl["node"]).select(
            F.col("v").alias("node"), F.col("component")
        )
        hooked = (
            lbl.unionByName(msgs)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        )
        jump = lbl.select(
            F.col("node").alias("component"), F.col("component").alias("jumped")
        )
        step = hooked.join(jump, "component", "left").select(
            "node", F.coalesce("jumped", F.col("component")).alias("component")
        )
        obs = Observation()
        new_lbl = step.observe(
            obs, F.sum(F.col("component").cast("decimal(38,0)")).alias("s")
        ).localCheckpoint()
        s = obs.get["s"]
        if prev_sum is not None and s == prev_sum:
            lbl = new_lbl
            break
        prev_sum = s
        lbl = new_lbl
    n = lbl.count()
    sym.unpersist()
    return (n, s)


def _cc_bcast_loop(spark, n_jumps: int) -> int:
    """LPA-shape hook (broadcast nbr-min + least) + n_jumps pointer
    jumps per round, sym partitioned by v so the neighbor-min aggregate
    inherits HashPartitioning(v)."""
    pairs, verts = _cc_inputs(spark)
    sym = (
        _cc_sym(pairs).repartition("v").persist(StorageLevel.MEMORY_AND_DISK)
    )
    lbl = (
        verts.select(F.col("doc_id").alias("node")).distinct()
        .select("node", F.col("node").alias("component"))
        .localCheckpoint()
    )
    prev_sum = None
    for _ in range(30):
        nbr = (
            sym.join(F.broadcast(lbl), sym["u"] == lbl["node"])
            .select(F.col("v").alias("node"), F.col("component"))
            .groupBy("node")
            .agg(F.min("component").alias("nbr_min"))
        )
        step = lbl.join(F.broadcast(nbr), "node", "left").select(
            "node",
            F.least(
                F.col("component"), F.coalesce("nbr_min", F.col("component"))
            ).alias("component"),
        )
        jump = lbl.select(
            F.col("node").alias("component"), F.col("component").alias("jumped")
        )
        for _j in range(n_jumps):
            step = step.join(F.broadcast(jump), "component", "left").select(
                "node",
                F.coalesce("jumped", F.col("component")).alias("component"),
            )
        obs = Observation()
        new_lbl = step.observe(
            obs, F.sum(F.col("component").cast("decimal(38,0)")).alias("s")
        ).localCheckpoint()
        s = obs.get["s"]
        if prev_sum is not None and s == prev_sum:
            lbl = new_lbl
            break
        prev_sum = s
        lbl = new_lbl
    n = lbl.count()
    sym.unpersist()
    return (n, s)


def cc_bcast_j1(spark) -> int:
    return _cc_bcast_loop(spark, 1)


def cc_bcast_j2(spark) -> int:
    return _cc_bcast_loop(spark, 2)


def cc_current_j2(spark) -> int:
    """Current union+groupBy hook, but TWO pointer jumps per round."""
    pairs, verts = _cc_inputs(spark)
    sym = _cc_sym(pairs).persist(StorageLevel.MEMORY_AND_DISK)
    lbl = (
        verts.select(F.col("doc_id").alias("node")).distinct()
        .select("node", F.col("node").alias("component"))
        .localCheckpoint()
    )
    prev_sum = None
    for _ in range(30):
        msgs = sym.join(lbl, sym["u"] == lbl["node"]).select(
            F.col("v").alias("node"), F.col("component")
        )
        hooked = (
            lbl.unionByName(msgs)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        )
        jump = lbl.select(
            F.col("node").alias("component"), F.col("component").alias("jumped")
        )
        step = hooked
        for _j in range(2):
            step = step.join(F.broadcast(jump), "component", "left").select(
                "node", F.coalesce("jumped", F.col("component")).alias("component")
            )
        obs = Observation()
        new_lbl = step.observe(
            obs, F.sum(F.col("component").cast("decimal(38,0)")).alias("s")
        ).localCheckpoint()
        s = obs.get["s"]
        if prev_sum is not None and s == prev_sum:
            lbl = new_lbl
            break
        prev_sum = s
        lbl = new_lbl
    n = lbl.count()
    sym.unpersist()
    return (n, s)


CC_VARIANTS = {
    "current": cc_current,
    "current_j2": cc_current_j2,
    "bcast_j1": cc_bcast_j1,
    "bcast_j2": cc_bcast_j2,
}


# ---------------------------------------------------------------------------
# khop: BFS loop shapes
# ---------------------------------------------------------------------------

def _khop_seeds(spark):
    from vul_dbgen_spark.queries.catalog import load

    return (
        load(spark, SF_DIR, "part")
        .filter(F.col("p_size") == 50)
        .select(F.col("p_partkey").alias("node"))
    )


def khop_current(spark) -> int:
    from vul_dbgen_spark.queries.catalog import _seq_edges

    e = (
        _seq_edges(spark, SF_DIR)
        .filter(F.col("s") != F.col("d"))
        .distinct()
        .localCheckpoint()
    )
    frontier = _khop_seeds(spark).distinct().localCheckpoint()
    visited = frontier.select("node", F.lit(0).alias("min_hop")).localCheckpoint()
    for hop in range(1, 4):
        nxt = (
            e.join(frontier, e["s"] == frontier["node"])
            .select(F.col("d").alias("node"))
            .distinct()
            .join(visited, "node", "left_anti")
            .localCheckpoint()
        )
        if nxt.limit(1).count() == 0:
            break
        visited = visited.union(
            nxt.select("node", F.lit(hop).alias("min_hop"))
        ).localCheckpoint()
        frontier = nxt
    r = visited.agg(
        F.count(F.lit(1)), F.sum("node"), F.sum("min_hop")
    ).first()
    return tuple(r)


def khop_lean(spark) -> int:
    """Frontier count rides observe on the expansion checkpoint (no
    separate probe action); the visited set stays a LAZY union of
    checkpointed frontiers (no per-hop union job)."""
    from vul_dbgen_spark.queries.catalog import _seq_edges

    e = (
        _seq_edges(spark, SF_DIR)
        .filter(F.col("s") != F.col("d"))
        .distinct()
        .localCheckpoint()
    )
    frontier = _khop_seeds(spark).distinct().localCheckpoint()
    visited = frontier.select("node", F.lit(0).alias("min_hop"))
    for hop in range(1, 4):
        obs = Observation()
        nxt = (
            e.join(frontier, e["s"] == frontier["node"])
            .select(F.col("d").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .observe(obs, F.count(F.lit(1)).alias("n"))
            .localCheckpoint()
        )
        if obs.get["n"] == 0:
            break
        visited = visited.union(nxt.select("node", F.lit(hop).alias("min_hop")))
        frontier = nxt
    r = visited.agg(
        F.count(F.lit(1)), F.sum("node"), F.sum("min_hop")
    ).first()
    return tuple(r)


KHOP_VARIANTS = {
    "current": khop_current,
    "lean": khop_lean,
}


# ---------------------------------------------------------------------------
# seqedges: self-join vs window-lead derivation
# ---------------------------------------------------------------------------

def seqedges_join(spark) -> int:
    from vul_dbgen_spark.queries.catalog import _seq_edges

    return _seq_edges(spark, SF_DIR).distinct().count()


def seqedges_window(spark) -> int:
    from pyspark.sql import Window

    from vul_dbgen_spark.queries.catalog import load

    li = load(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey"
    )
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber")
    return (
        li.select(
            F.col("l_partkey").alias("s"),
            F.lead("l_partkey").over(w).alias("d"),
            (F.lead("l_linenumber").over(w) - F.col("l_linenumber")).alias("__dl"),
        )
        .filter((F.col("__dl") == 1) & (F.col("s") != F.col("d")))
        .select("s", "d")
        .distinct()
        .count()
    )


SEQ_VARIANTS = {
    "join": seqedges_join,
    "window": seqedges_window,
}


# ---------------------------------------------------------------------------
# pagerank: checkpoint/persist round materialization shapes
# ---------------------------------------------------------------------------

def _pagerank_loop(spark, mode: str) -> float:
    """mode: 'current' (lazy interior ckpt), 'persist' (per-round lazy
    persist, one final eager ckpt), 'obs_dang' (eager ckpt rounds with
    the dangling mass read from the previous round's observe)."""
    from vul_dbgen_spark.queries.catalog import _seq_edges, load

    e = (
        _seq_edges(spark, SF_DIR)
        .select("s", "d")
        .filter(F.col("s") != F.col("d"))
        .distinct()
    )
    outdeg = e.groupBy("s").agg(F.count(F.lit(1)).alias("outdeg"))
    ew = (
        e.join(outdeg, "s").repartition("d").persist(StorageLevel.MEMORY_AND_DISK)
    )
    ew.count()
    has_out = ew.select(F.col("s").alias("node")).distinct()
    base = load(spark, SF_DIR, "part").select(F.col("p_partkey").alias("node")).distinct()
    nodes = (
        base.join(has_out.withColumn("__h", F.lit(True)), "node", "left")
        .select("node", F.coalesce("__h", F.lit(False)).alias("has_out"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n = nodes.count()
    damping = 0.85
    iterations = 5

    kept: list[DataFrame] = []
    if mode == "obs_dang":
        obs0 = Observation()
        ranks = (
            nodes.select("node", "has_out", F.lit(1.0 / n).alias("rank"))
            .observe(
                obs0,
                F.sum(F.when(~F.col("has_out"), F.col("rank"))).alias("dang"),
            )
            .localCheckpoint()
        )
        dang_val = obs0.get["dang"]
    else:
        ranks = nodes.select(
            "node", "has_out", F.lit(1.0 / n).alias("rank")
        ).localCheckpoint()
        dang_val = None

    for i in range(iterations):
        last = i == iterations - 1
        if mode == "obs_dang":
            dang_term = F.lit(float(dang_val or 0.0)) / n
        else:
            dang = ranks.filter(~F.col("has_out")).agg(
                F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dang")
            )
            dang_term = F.col("__dang") / n
        contrib = (
            ew.join(F.broadcast(ranks), ew["s"] == ranks["node"])
            .select(F.col("d"), (F.col("rank") / F.col("outdeg")).alias("c"))
            .groupBy("d")
            .agg(F.sum("c").alias("contrib"))
        )
        upd = nodes.join(
            F.broadcast(contrib), nodes["node"] == contrib["d"], "left"
        )
        if mode != "obs_dang":
            upd = upd.join(F.broadcast(dang))
        upd = upd.select(
            "node",
            "has_out",
            (
                F.lit((1.0 - damping) / n)
                + F.lit(damping)
                * (F.coalesce(F.col("contrib"), F.lit(0.0)) + dang_term)
            ).alias("rank"),
        )
        if mode == "persist":
            if last:
                ranks = upd.localCheckpoint(eager=True)
            else:
                ranks = upd.persist(StorageLevel.MEMORY_AND_DISK)
                kept.append(ranks)
        elif mode == "obs_dang":
            if last:
                ranks = upd.localCheckpoint(eager=True)
            else:
                obs = Observation()
                ranks = upd.observe(
                    obs,
                    F.sum(F.when(~F.col("has_out"), F.col("rank"))).alias(
                        "dang"
                    ),
                ).localCheckpoint(eager=True)
                dang_val = obs.get["dang"]
        else:
            ranks = upd.localCheckpoint(eager=last)
    out = ranks.select("node", "rank")
    cnt = out.count()
    chk = out.agg(F.sum("rank")).first()[0]
    nodes.unpersist()
    ew.unpersist()
    for df in kept:
        df.unpersist()
    assert cnt == n
    return chk


def pr_current(spark):
    return _pagerank_loop(spark, "current")


def pr_persist(spark):
    return _pagerank_loop(spark, "persist")


def pr_obs_dang(spark):
    return _pagerank_loop(spark, "obs_dang")


PR_VARIANTS = {
    "current": pr_current,
    "persist": pr_persist,
    "obs_dang": pr_obs_dang,
}


# ---------------------------------------------------------------------------
# lpa: setup shapes (superset vertices) and round batching
# ---------------------------------------------------------------------------

def _lpa_loop(spark, superset: bool, batch: int) -> int:
    from vul_dbgen_spark.operators.graph import _symmetrize
    from vul_dbgen_spark.queries.catalog import _cooc_edges, load

    sym = (
        _symmetrize(_cooc_edges(spark, SF_DIR), "u", "v")
        .repartition("v")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    sym.count()
    parts = load(spark, SF_DIR, "part").select(F.col("p_partkey").alias("node"))
    if superset:
        nodes = parts
    else:
        endpoints = sym.select(F.col("u").alias("node")).distinct()
        nodes = parts.union(endpoints).distinct()
    nodes = nodes.persist(StorageLevel.MEMORY_AND_DISK)
    nodes.count()
    labels = nodes.select("node", F.col("node").alias("label")).localCheckpoint()
    INV = (1 << 31) - 1
    kept = []
    for i in range(3):
        cnt = (
            sym.join(F.broadcast(labels), sym["u"] == labels["node"])
            .select(F.col("v").alias("n2"), "label")
            .groupBy("n2", "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        arg = (
            cnt.groupBy("n2")
            .agg(
                F.max(
                    F.shiftleft(F.col("c"), 32).bitwiseOR(
                        F.lit(INV) - F.col("label")
                    )
                ).alias("p")
            )
            .select(
                F.col("n2").alias("node"),
                (F.lit(INV) - F.col("p").bitwiseAND(F.lit((1 << 32) - 1))).alias(
                    "new_label"
                ),
            )
        )
        nxt = labels.join(F.broadcast(arg), "node", "left").select(
            "node", F.coalesce("new_label", "label").alias("label")
        )
        if batch > 1 and i % batch == 0 and i < 2:
            labels = nxt.persist(StorageLevel.MEMORY_AND_DISK)
            kept.append(labels)
        else:
            labels = nxt.localCheckpoint()
    n = labels.agg(F.sum("label")).first()[0]
    nodes.unpersist()
    sym.unpersist()
    for df in kept:
        df.unpersist()
    return n


def lpa_current(spark):
    return _lpa_loop(spark, superset=False, batch=1)


def lpa_superset(spark):
    return _lpa_loop(spark, superset=True, batch=1)


def lpa_superset_batch2(spark):
    return _lpa_loop(spark, superset=True, batch=2)


LPA_VARIANTS = {
    "current": lpa_current,
    "superset": lpa_superset,
    "superset_batch2": lpa_superset_batch2,
}


FAMILIES = {
    "cc": CC_VARIANTS,
    "khop": KHOP_VARIANTS,
    "seqedges": SEQ_VARIANTS,
    "pagerank": PR_VARIANTS,
    "lpa": LPA_VARIANTS,
}


def main():
    fam = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    variants = FAMILIES[fam]
    spark = _spark()
    warm = spark.read.parquet(os.path.join(SF_DIR, "region.parquet"))
    warm.join(
        warm.selectExpr("r_regionkey as k"), warm.r_regionkey == F.col("k")
    ).groupBy("r_name").count().collect()

    results: dict[str, list] = {k: [] for k in variants}
    sigs: dict[str, set] = {k: set() for k in variants}
    # one untimed warm pass per variant (plan codegen)
    for name, fn in variants.items():
        _release(spark)
        spark.sparkContext.setJobDescription(f"warm:{name}")
        sigs[name].add(repr(fn(spark)))
    for rep in range(reps):
        for name, fn in variants.items():
            _release(spark)
            spark.sparkContext.setJobDescription(f"{name}:rep{rep}")
            j0 = _jobs(spark)
            t0 = time.perf_counter()
            sig = fn(spark)
            dt = time.perf_counter() - t0
            dj = _jobs(spark) - j0
            sigs[name].add(repr(sig))
            results[name].append((round(dt, 3), dj))
            print(
                f"# rep{rep} {name}: {dt:.3f}s {dj} jobs "
                f"(loadavg {os.getloadavg()[0]:.1f})",
                file=sys.stderr,
            )
    sig_vals = {k: sorted(v) for k, v in sigs.items()}
    print(json.dumps({"family": fam, "sf_dir": SF_DIR,
                      "results": results, "sigs": sig_vals}))
    first = next(iter(sig_vals.values()))
    assert all(v == first for v in sig_vals.values()), (
        f"variant result signatures differ: {sig_vals}"
    )


if __name__ == "__main__":
    main()
