#!/usr/bin/env python
"""Round-9 optimization measurement harness.

Usage:
  python tools/profile_r09.py time <query> [<query> ...]  # warm+best-of-3
  python tools/profile_r09.py phases <family>             # decomposition
  python tools/profile_r09.py jobs <query> [<query> ...]  # job-count audit

Timed protocol mirrors bench.py (untimed warm draw, then timed draws with
full state release between draws). `jobs` additionally reports how many
Spark jobs each query schedules — the per-round scheduled-job floor the
round-8 VERDICT names as the iterative graph family's remaining cost.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark import StorageLevel  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def _release(spark):
    spark.catalog.clearCache()
    jsc = spark.sparkContext._jsc
    for rdd in list(jsc.getPersistentRDDs().values()):
        rdd.unpersist()
    spark.sparkContext._jvm.System.gc()


def _spark():
    from vul_dbgen_spark.session import get_spark

    return get_spark("profile_r09")


def _next_job_id(spark) -> int:
    """Total jobs submitted so far (DAGScheduler's monotone counter)."""
    return int(spark.sparkContext._jsc.sc().dagScheduler().nextJobId())


def timed(spark, fn, sf_dir, n_draws=3):
    draws, jobs, n = [], [], 0
    for i in range(n_draws + 1):
        _release(spark)
        j0 = _next_job_id(spark)
        t0 = time.perf_counter()
        n = fn(spark, sf_dir).count()
        if i > 0:
            draws.append(round(time.perf_counter() - t0, 3))
            jobs.append(_next_job_id(spark) - j0)
    return draws, jobs, n


def _warm(spark, sf_dir):
    warm = spark.read.parquet(os.path.join(sf_dir, "region.parquet"))
    warm.join(
        warm.selectExpr("r_regionkey as k"), warm.r_regionkey == F.col("k")
    ).groupBy("r_name").count().collect()


def cmd_time(names, with_jobs=False):
    from vul_dbgen_spark.queries.catalog import REGISTRY

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = _spark()
    _warm(spark, sf_dir)
    out = {}
    for name in names:
        spec = REGISTRY[name]
        spark.sparkContext.setJobDescription(name)
        draws, jobs, n = timed(spark, spec.fn, sf_dir)
        out[name] = {"draws": draws, "best": min(draws), "rows": n,
                     "jobs": jobs}
        print(f"# {name}: best {min(draws):.3f}s draws={draws} "
              f"jobs={jobs} rows={n}", file=sys.stderr)
    print(json.dumps({"sf_dir": sf_dir, "loadavg": os.getloadavg()[0],
                      "timings": out}))


def _phase(spark, label, thunk):
    j0 = _next_job_id(spark)
    _t0 = time.perf_counter()
    r = thunk()
    dt = time.perf_counter() - _t0
    dj = _next_job_id(spark) - j0
    print(f"#   phase {label}: {dt:.3f}s ({dj} jobs)", file=sys.stderr)
    return r, (round(dt, 3), dj)


def phases_cc(spark, sf_dir):
    """Decompose dedup_clusters: LSH pair generation vs the CC loop,
    with per-round timing and job counts."""
    from pyspark.sql import Observation

    from vul_dbgen_spark.operators.dedup import minhash_lsh_pairs
    from vul_dbgen_spark.queries.catalog import load

    res = {}
    _release(spark)
    t0 = time.perf_counter()
    docs = load(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, "doc_id", "text")
    # mirror connected_components(algorithm="label") inline
    sym = (
        pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
        .union(pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    _, res["sym_materialize(LSH pairs)"] = _phase(
        spark, "sym.count (LSH)", lambda: sym.count()
    )
    allv = docs.select(F.col("doc_id").alias("node")).distinct()
    lbl, res["init_ckpt"] = _phase(
        spark,
        "labels init",
        lambda: allv.select("node", F.col("node").alias("component")).localCheckpoint(),
    )
    prev_sum = None
    for i in range(30):
        def _round(lbl=lbl):
            msgs = sym.join(lbl, sym["u"] == lbl["node"]).select(
                F.col("v").alias("node"), F.col("component")
            )
            hooked = (
                lbl.unionByName(msgs)
                .groupBy("node")
                .agg(F.min("component").alias("component"))
            )
            jump = lbl.select(
                F.col("node").alias("component"),
                F.col("component").alias("jumped"),
            )
            step = hooked.join(jump, "component", "left").select(
                "node", F.coalesce("jumped", F.col("component")).alias("component")
            )
            obs = Observation()
            new_lbl = step.observe(
                obs, F.sum(F.col("component").cast("decimal(38,0)")).alias("s")
            ).localCheckpoint()
            return new_lbl, obs.get["s"]

        (lbl, s), res[f"round_{i}"] = _phase(spark, f"round {i}", _round)
        if prev_sum is not None and s == prev_sum:
            break
        prev_sum = s
    res["total_inline"] = round(time.perf_counter() - t0, 3)
    sym.unpersist()
    return res


def phases_khop(spark, sf_dir):
    from vul_dbgen_spark.queries.catalog import _seq_edges, load

    res = {}
    _release(spark)
    t0 = time.perf_counter()
    e, res["edges_ckpt"] = _phase(
        spark,
        "edges ckpt",
        lambda: _seq_edges(spark, sf_dir)
        .select("s", "d")
        .filter(F.col("s") != F.col("d"))
        .distinct()
        .localCheckpoint(),
    )
    seeds = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_size") == 50)
        .select(F.col("p_partkey").alias("node"))
    )
    frontier, res["frontier_ckpt"] = _phase(
        spark, "frontier ckpt", lambda: seeds.distinct().localCheckpoint()
    )
    visited, res["visited_ckpt"] = _phase(
        spark,
        "visited ckpt",
        lambda: frontier.select("node", F.lit(0).alias("min_hop")).localCheckpoint(),
    )
    for hop in range(1, 4):
        def _expand(frontier=frontier, visited=visited):
            return (
                e.join(frontier, e["s"] == frontier["node"])
                .select(F.col("d").alias("node"))
                .distinct()
                .join(visited, "node", "left_anti")
                .localCheckpoint()
            )

        nxt, res[f"hop{hop}_expand"] = _phase(spark, f"hop {hop} expand", _expand)
        _, res[f"hop{hop}_probe"] = _phase(
            spark, f"hop {hop} probe", lambda: nxt.limit(1).count()
        )
        def _union(visited=visited, nxt=nxt, hop=hop):
            return visited.union(
                nxt.select("node", F.lit(hop).alias("min_hop"))
            ).localCheckpoint()

        visited, res[f"hop{hop}_union_ckpt"] = _phase(
            spark, f"hop {hop} union ckpt", _union
        )
        frontier = nxt
    _, res["final_count"] = _phase(spark, "final count", lambda: visited.count())
    res["total_inline"] = round(time.perf_counter() - t0, 3)
    return res


FAMILIES = {
    "cc": phases_cc,
    "khop": phases_khop,
}


def cmd_phases(fam):
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = _spark()
    _warm(spark, sf_dir)
    fn = FAMILIES[fam]
    for tag in ("warm", "measured"):
        print(f"# --- {fam} ({tag}) ---", file=sys.stderr)
        res = fn(spark, sf_dir)
        print(json.dumps({"family": fam, "pass": tag, "sf_dir": sf_dir,
                          "loadavg": os.getloadavg()[0], "phases": res}))


if __name__ == "__main__":
    if sys.argv[1] == "time":
        cmd_time(sys.argv[2:])
    elif sys.argv[1] == "jobs":
        cmd_time(sys.argv[2:], with_jobs=True)
    elif sys.argv[1] == "phases":
        cmd_phases(sys.argv[2])
    else:
        raise SystemExit(f"unknown subcommand {sys.argv[1]}")
