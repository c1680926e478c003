#!/usr/bin/env python
"""Quiet-box A/B for the pipeline_e2e row (round-8 follow-up).

Two measurements, both on a fresh JVM like bench.py's e2e section:
1. undivided draws — bench-identical protocol (1 untimed warm + 2 timed
   draws of sources -> enrich -> upsert -> container, full state release
   between draws, best-of-2);
2. staged draws — force-materialize the upsert outputs (persist+count),
   then sink over the cached frames, for compute-vs-sink attribution
   (pipeline.run is fully lazy, so an un-staged mid-point timestamp
   attributes all compute to the sink).
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _release_state(spark):
    spark.catalog.clearCache()
    jsc = spark.sparkContext._jsc
    for rdd in list(jsc.getPersistentRDDs().values()):
        rdd.unpersist()
    spark.sparkContext._jvm.System.gc()


def main() -> None:
    from vul_dbgen_spark.session import get_spark
    from vul_dbgen_spark.plans import pipeline as _pipeline
    from vul_dbgen_spark.sinks import memdb as _memdb

    fixture_root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "fixtures", "vul-source",
    )
    spark = get_spark("ab_e2e_r08")
    la_start = os.getloadavg()
    draws = []
    for i in range(3):
        _release_state(spark)
        t0 = time.perf_counter()
        os_out, app_out = _pipeline.run(spark, fixture_root)
        tmp = tempfile.mkdtemp(prefix="ab_e2e_")
        try:
            shas = _memdb.update_db(os_out, app_out, tmp, version="0.0")
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
        dt = time.perf_counter() - t0
        assert shas, "empty container"
        if i > 0:
            draws.append(round(dt, 3))

    staged = []
    for _ in range(2):
        _release_state(spark)
        t0 = time.perf_counter()
        os_out, app_out = _pipeline.run(spark, fixture_root)
        os_out = os_out.persist()
        app_out = app_out.persist()
        os_out.count()
        app_out.count()
        t1 = time.perf_counter()
        tmp = tempfile.mkdtemp(prefix="ab_e2e_")
        try:
            _memdb.update_db(os_out, app_out, tmp, version="0.0")
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
        t2 = time.perf_counter()
        staged.append(
            {"compute_sec": round(t1 - t0, 3), "sink_sec": round(t2 - t1, 3)}
        )

    print(
        json.dumps(
            {
                "e2e_best": min(draws),
                "draws": draws,
                "staged": staged,
                "loadavg_start": [round(x, 2) for x in la_start],
                "loadavg_end": round(os.getloadavg()[0], 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
