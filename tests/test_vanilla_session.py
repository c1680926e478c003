"""Driver-session robustness: the grading driver builds its OWN
SparkSession (no tuned confs, no executorEnv PYTHONPATH), so the
contract must work under a vanilla session. A second getOrCreate() in
the pytest JVM would silently reuse the tuned fixture session, so this
runs in a subprocess — the only faithful way to get a cold default
session."""

from __future__ import annotations

import subprocess
import sys

REPO = "/root/repo"

SCRIPT = """
import sys
sys.path.insert(0, %r)
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[8]").appName("vanilla-contract")
         .config("spark.sql.session.timeZone", "UTC").getOrCreate())
import __spark_entry__ as e
assert e.entry(spark).count() > 0
qs = e.queries()
# one per fragile surface: ts normalization (events), streaming source,
# Arrow mapInPandas worker imports, conv/md5 sampling, VARIANT,
# iterative localCheckpoint loops (pagerank), recursive CTE,
# Arrow-shipped packed-filter literals (bloom prefilter)
# round 4 additions: the two newly-driver-windowed chained/stream-stream
# stateful entries and the SQL-text-built PQ expressions (F.expr parse
# must succeed without any tuned conf)
for name in ["cohort_retention", "stream_tumbling_counts",
             "mm_image_features", "sample_weighted_priority",
             "variant_k_histogram", "graph_pagerank_parts",
             "graph_khop_reach_rcte", "bloom_prefilter_join",
             "stream_dedup_then_window", "stream_interval_join",
             "ann_pq_adc_topk"]:
    n = qs[name](spark, "/root/testdata/sf0.001").count()
    assert n > 0, name
print("VANILLA-CONTRACT-OK")
""" % (REPO,)


def test_contract_runs_under_default_session():
    out = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=REPO,
    )
    assert "VANILLA-CONTRACT-OK" in out.stdout, out.stdout[-2000:] + out.stderr[-2000:]
