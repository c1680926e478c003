#!/usr/bin/env python
"""One fresh-JVM e2e measurement: 1 untimed warm draw + 2 timed
undivided draws (sources -> enrich -> upsert -> container), best-of-2.
Used interleaved (changed tree vs stashed baseline) for A/B decisions.
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
    spark = get_spark("ab_e2e_quick")
    la = [os.getloadavg()[0]]
    draws = []
    for i in range(3):
        _release_state(spark)
        t0 = time.perf_counter()
        os_out, app_out = _pipeline.run(spark, fixture_root)
        tmp = tempfile.mkdtemp(prefix="ab_e2e_q_")
        try:
            shas = _memdb.update_db(os_out, app_out, tmp, version="0.0")
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
        dt = time.perf_counter() - t0
        assert shas
        la.append(round(os.getloadavg()[0], 2))
        if i > 0:
            draws.append(round(dt, 3))
    print(json.dumps({"best": min(draws), "draws": draws, "loadavg": la}))
    spark.stop()


if __name__ == "__main__":
    main()
