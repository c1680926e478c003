#!/usr/bin/env python
"""Phase decomposition of the pipeline_e2e row (round-8 follow-up).

Splits one undivided draw into the phases update_db actually executes:
  build      — _pipeline.run() lazy plan construction (driver/py4j only)
  guard      — the bad-bucket limit(1).collect() action over the os side
  os_iter    — orderBy + toLocalIterator over os lines (full os compute)
  app_iter   — orderBy + toLocalIterator over app lines (full app compute)
  assemble   — driver-side tar/gzip/AES container build (no Spark)

Fresh JVM, 1 untimed warm draw + N timed, full state release between
draws — same hygiene as bench.py's e2e section.
"""
from __future__ import annotations

import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _release_state(spark):
    spark.catalog.clearCache()
    jsc = spark.sparkContext._jsc
    for rdd in list(jsc.getPersistentRDDs().values()):
        rdd.unpersist()
    spark.sparkContext._jvm.System.gc()


def main() -> None:
    from pyspark.sql import functions as F

    from vul_dbgen_spark.session import get_spark
    from vul_dbgen_spark.plans import pipeline as _pipeline
    from vul_dbgen_spark.sinks import memdb as _memdb

    fixture_root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "fixtures", "vul-source",
    )
    spark = get_spark("profile_e2e_phases_r08")
    la_start = os.getloadavg()
    reps = []
    for i in range(3):
        _release_state(spark)
        t0 = time.perf_counter()
        os_out, app_out = _pipeline.run(spark, fixture_root)
        lines = _memdb.os_vuln_lines(os_out)
        t1 = time.perf_counter()
        bad = lines.filter(F.col("bucket").isNull()).limit(1).collect()
        assert not bad
        t2 = time.perf_counter()
        index_bufs = [io.BytesIO() for _ in _memdb.BUCKETS]
        full_bufs = [io.BytesIO() for _ in _memdb.BUCKETS]
        n_os = 0
        for row in (
            lines.orderBy("namespace", "name")
            .select("bucket", "index_line", "full_line")
            .toLocalIterator()
        ):
            n_os += 1
            index_bufs[row["bucket"]].write(row["index_line"].encode() + b"\n")
            full_bufs[row["bucket"]].write(row["full_line"].encode() + b"\n")
        t3 = time.perf_counter()
        app_buf = io.BytesIO()
        n_app = 0
        for row in (
            _memdb.app_vuln_lines(app_out)
            .orderBy("module_name", "vul_name")
            .toLocalIterator()
        ):
            n_app += 1
            app_buf.write(row["line"].encode() + b"\n")
        t4 = time.perf_counter()
        # driver-side assembly cost: reuse update_db's primitives on the
        # buffers we already hold (compact + regular, like update_db)
        files = []
        for bi, (_, idx_name, full_name) in enumerate(_memdb.BUCKETS):
            files.append((idx_name, index_bufs[bi].getvalue()))
            files.append((full_name, full_bufs[bi].getvalue()))
        files.append(("apps.tb", app_buf.getvalue()))
        blob1 = _memdb._encrypt(_memdb._make_tar(files))
        blob2 = _memdb._encrypt(_memdb._make_tar(files))
        assert blob1 and blob2
        t5 = time.perf_counter()
        rep = {
            "build": round(t1 - t0, 3),
            "guard": round(t2 - t1, 3),
            "os_iter": round(t3 - t2, 3),
            "app_iter": round(t4 - t3, 3),
            "assemble": round(t5 - t4, 3),
            "total": round(t5 - t0, 3),
            "n_os": n_os,
            "n_app": n_app,
        }
        if i > 0:
            reps.append(rep)
    print(json.dumps({
        "reps": reps,
        "loadavg_start": [round(x, 2) for x in la_start],
        "loadavg_end": round(os.getloadavg()[0], 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
