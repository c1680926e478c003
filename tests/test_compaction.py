"""Compaction: small-file rewrite preserves contents exactly and lands
the expected file count; the health check fires only when warranted."""

from __future__ import annotations

from vul_dbgen_spark.operators.compaction import (
    compact_parquet,
    dataset_bytes,
    needs_compaction,
)

SF = "/root/testdata/sf0.001"


def test_compaction_restores_file_sizing(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("compact")
    frag, out = str(base / "frag"), str(base / "out")

    ev = spark.read.parquet(f"{SF}/events.parquet")
    ev.repartition(40).write.parquet(frag)  # simulate a fragmented sink
    assert len(spark.read.parquet(frag).inputFiles()) == 40

    total = dataset_bytes(spark, frag)
    assert total > 0
    # target a third of the dataset per file → expect exactly 3 files
    n = compact_parquet(spark, frag, out, target_file_bytes=(total + 2) // 3)
    assert n == 3
    assert len(spark.read.parquet(out).inputFiles()) == 3

    # contents preserved exactly
    key = lambda r: (r.event_id,)
    got = sorted(map(key, spark.read.parquet(out).collect()))
    want = sorted(map(key, ev.collect()))
    assert got == want


def test_needs_compaction_health_check(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("health")
    frag, ok = str(base / "frag"), str(base / "ok")
    ev = spark.read.parquet(f"{SF}/events.parquet")
    ev.repartition(40).write.parquet(frag)
    ev.coalesce(1).write.parquet(ok)
    total = dataset_bytes(spark, frag)
    # at a one-file-per-dataset target, 40 files is 40× the ideal
    assert needs_compaction(spark, frag, target_file_bytes=total * 2, slack=4.0)
    assert not needs_compaction(spark, ok, target_file_bytes=total * 2, slack=4.0)
