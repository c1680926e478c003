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


# ---------------------------------------------------------------------------
# content-defined chunking
# ---------------------------------------------------------------------------

from pyspark.sql import functions as F

from vul_dbgen_spark.operators.chunking import cdc_chunk_fps


def test_cdc_boundaries_are_shift_invariant(spark):
    """THE content-defined property: prepend text to a document and the
    chunk fingerprints after the first (damaged) chunk are unchanged —
    a fixed-stride chunker would shift every boundary and share zero
    fingerprints."""
    base = "the quick brown fox jumps over the lazy dog " * 12
    shifted = "INSERTED-HEADER:" + base
    df = spark.createDataFrame(
        [(1, base), (2, shifted)], "doc_id: long, text: string"
    )
    out = cdc_chunk_fps(df, "doc_id", "text")
    fps = {
        i: [r["chunk_fp"] for r in rows]
        for i, rows in (
            (i, sorted(
                out.filter(F.col("doc_id") == i).collect(),
                key=lambda r: r["chunk_idx"],
            ))
            for i in (1, 2)
        )
    }
    # all but the first chunk of the original reappear verbatim in the
    # shifted document's chunk stream
    tail = fps[1][1:]
    assert len(tail) >= 3
    assert set(tail) <= set(fps[2])


def test_cdc_chunks_cover_document_exactly(spark):
    text = "abcdefghij" * 40
    df = spark.createDataFrame([(7, text)], "doc_id: long, text: string")
    rows = sorted(
        cdc_chunk_fps(df, "doc_id", "text").collect(), key=lambda r: r["chunk_idx"]
    )
    assert sum(r["chunk_len"] for r in rows) == len(text)
    assert all(r["chunk_len"] > 0 for r in rows)
    # periodic text => periodic chunking => interior chunks all dedup
    interior = [r["chunk_fp"] for r in rows[1:-1]]
    assert len(set(interior)) <= 2


def test_cdc_short_document_single_chunk(spark):
    # shorter than the hash window: no boundary positions exist, the
    # whole doc is one chunk
    df = spark.createDataFrame([(3, "tiny text")], "doc_id: long, text: string")
    rows = cdc_chunk_fps(df, "doc_id", "text").collect()
    assert len(rows) == 1 and rows[0]["chunk_len"] == 9
