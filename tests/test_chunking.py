"""Chunking semantics: coverage, overlap, tail handling, empty docs."""

from __future__ import annotations

import pytest

from vul_dbgen_spark.operators.chunking import chunk_documents


def test_chunk_overlap_and_tail(spark):
    df = spark.createDataFrame(
        [(1, "abcdefghij"), (2, "xy"), (3, "")], ["id", "text"]
    )
    out = chunk_documents(df, "id", "text", size=4, overlap=1).collect()
    by_doc = {}
    for r in sorted(out, key=lambda r: (r.id, r.chunk_idx)):
        by_doc.setdefault(r.id, []).append(r.chunk)
    # step=3: starts 0,3,6,9 → last chunk is the 1-char tail
    assert by_doc[1] == ["abcd", "defg", "ghij", "j"]
    # consecutive chunks share exactly `overlap` chars
    for a, b in zip(by_doc[1], by_doc[1][1:]):
        assert a[3:] == b[: len(a[3:])]
    assert by_doc[2] == ["xy"]
    assert 3 not in by_doc  # empty docs produce no chunks
    # full reconstruction: stitching step-prefixes + last chunk = original
    stitched = "".join(c[:3] for c in by_doc[1][:-1]) + by_doc[1][-1]
    assert stitched == "abcdefghij"


def test_chunk_param_validation(spark):
    df = spark.createDataFrame([(1, "abc")], ["id", "text"])
    with pytest.raises(ValueError):
        chunk_documents(df, "id", "text", size=4, overlap=4)


def test_chunk_plan_has_no_shuffle(spark):
    df = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    plan = (
        chunk_documents(df, "doc_id", "text")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan
