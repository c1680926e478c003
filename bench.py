#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from pyspark.sql import functions as F

    from vul_dbgen_spark.queries.catalog import REGISTRY
    from vul_dbgen_spark.session import get_spark

    spark = get_spark("vul_dbgen_spark_bench")
    # warm the JVM once so per-query numbers measure the engine, not
    # first-call classloading: codegen, the parquet reader, a shuffle,
    # and a broadcast join each lazily load classes on first use
    warm = spark.read.parquet(os.path.join(sf_dir, "region.parquet"))
    warm.join(warm.selectExpr("r_regionkey as k"), warm.r_regionkey == F.col("k")).groupBy(
        "r_name"
    ).count().collect()

    # best of 2 runs per query: this box shares the machine with other
    # load (observed ±20% run-to-run noise), so a single sample measures
    # the neighbor's compile job as often as the engine. The cache is
    # cleared between repeats, so each run re-executes the full lineage
    # (persist() calls inside operators never carry over) — the repeat
    # only removes load spikes, not work.
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2"))
    timings: dict[str, float] = {}
    total = 0.0
    for name, spec in REGISTRY.items():
        if not spec.bench:
            continue
        best, n = float("inf"), 0
        for _ in range(repeats):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = spec.fn(spark, sf_dir)
            n = df.count()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        total += best
        print(f"# {name}: {best:.3f}s ({n} rows)", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
