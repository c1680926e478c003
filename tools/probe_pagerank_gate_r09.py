#!/usr/bin/env python
"""Round-9 VERDICT directive #3: measure pagerank's broadcast posture
NEAR THE GATE instead of assuming LPA's constant transfers.

Synthetic graph: N nodes (default 8M, ~the broadcast_node_gate(2)
scale), out-degree ~2 via deterministic hash-derived destinations (no
rand() — retry-safe per guide §2.5). Runs the REAL operator both ways
(broadcast_ranks pinned True/False), fixed 8g driver heap from
session.py, records wall time per posture + the broadcast relation
sizes the driver reports, and checks Σ rank.

Usage: python tools/probe_pagerank_gate_r09.py [n_nodes] [iterations]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from vul_dbgen_spark.operators.graph import pagerank
    from vul_dbgen_spark.session import get_spark

    spark = get_spark("pagerank_gate_probe")

    def build_edges():
        # ~2 deterministic out-edges per node, hash-spread (xxhash64 of
        # the id, not rand() — stable under task retry), self-loops
        # dropped by the operator
        ids = spark.range(n).select(F.col("id").alias("s"))
        e1 = ids.select(
            "s", (F.abs(F.xxhash64("s")) % n).alias("d")
        )
        e2 = ids.select(
            "s", (F.abs(F.xxhash64(F.col("s") + 1)) % n).alias("d")
        )
        return e1.union(e2)

    verts = spark.range(n).select(F.col("id"))
    out = {}
    for posture in (True, False):
        t0 = time.perf_counter()
        pr = pagerank(
            build_edges(), "s", "d",
            vertices=verts, id_col="id",
            iterations=iters, vertices_are_superset=True,
            broadcast_ranks=posture,
        )
        s = pr.agg(F.sum("rank")).first()[0]
        dt = time.perf_counter() - t0
        out[f"bcast={posture}"] = {
            "wall_sec": round(dt, 1),
            "sum_rank": s,
            "loadavg": round(os.getloadavg()[0], 1),
        }
        print(f"# bcast={posture}: {dt:.1f}s sum_rank={s}", file=sys.stderr)
        spark.catalog.clearCache()
        jsc = spark.sparkContext._jsc
        for rdd in list(jsc.getPersistentRDDs().values()):
            rdd.unpersist()
        spark.sparkContext._jvm.System.gc()
    print(json.dumps({"n_nodes": n, "iterations": iters, "results": out}))


if __name__ == "__main__":
    main()
