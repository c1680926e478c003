#!/usr/bin/env python
"""Round-9 VERDICT directive #4: close the recurring dedup/fuzzy drift
question. One fresh JVM per invocation; runs the five wobbling queries
(warm + best-of-2 timed draws each, full state release between draws)
against the repo tree given as argv[1] and prints one JSON line.

Drive it interleaved:  for rep: run <r9 tree>; run <r7 worktree>.
"""
from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.abspath(sys.argv[1])
sys.path.insert(0, ROOT)

QUERIES = [
    "more_like_this_tfidf",
    "fuzzy_pairs_edit1_capped",
    "fuzzy_pairs_hamming_capped",
    "semdedup_incremental",
    "dedup_ngram_jaccard_capped",
]


def main() -> None:
    from pyspark.sql import functions as F

    from vul_dbgen_spark.queries.catalog import REGISTRY
    from vul_dbgen_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab_drift_r09")
    warm = spark.read.parquet(os.path.join(sf_dir, "region.parquet"))
    warm.join(
        warm.selectExpr("r_regionkey as k"), warm.r_regionkey == F.col("k")
    ).groupBy("r_name").count().collect()

    def release():
        spark.catalog.clearCache()
        jsc = spark.sparkContext._jsc
        for rdd in list(jsc.getPersistentRDDs().values()):
            rdd.unpersist()
        spark.sparkContext._jvm.System.gc()

    out = {}
    for name in QUERIES:
        spec = REGISTRY[name]
        draws = []
        for i in range(3):
            release()
            t0 = time.perf_counter()
            n = spec.fn(spark, sf_dir).count()
            if i > 0:
                draws.append(round(time.perf_counter() - t0, 3))
        out[name] = {"best": min(draws), "draws": draws, "rows": n}
    print(json.dumps({"tree": ROOT, "loadavg": round(os.getloadavg()[0], 2),
                      "timings": {k: v["best"] for k, v in out.items()},
                      "detail": out}))
    spark.stop()


if __name__ == "__main__":
    main()
