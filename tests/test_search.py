"""BM25 top-k search (operators/search.py): hand-computed scores on a
tiny corpus, determinism of the tie-break, and term filtering."""

from __future__ import annotations

import math

from vul_dbgen_spark.operators.search import bm25_topk


def _score(tf: int, dl: int, n_docs: int, dfreq: int, avgdl: float, k1=1.2, b=0.75) -> float:
    idf = math.log(1 + (n_docs - dfreq + 0.5) / (dfreq + 0.5))
    return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))


def test_bm25_hand_computed(spark):
    docs = spark.createDataFrame(
        [
            (1, "spark shuffle join join"),
            (2, "join once and nothing else here"),
            (3, "no relevant terms at all whatsoever"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r.score for r in bm25_topk(docs, "doc_id", "text", ["join"], k=10).collect()}
    # doc 3 has no query term -> absent from postings, never scored
    assert set(out) == {1, 2}
    avgdl = (4 + 6 + 6) / 3
    assert out[1] == round(_score(tf=2, dl=4, n_docs=3, dfreq=2, avgdl=avgdl), 4)
    assert out[2] == round(_score(tf=1, dl=6, n_docs=3, dfreq=2, avgdl=avgdl), 4)
    assert out[1] > out[2]


def test_bm25_tie_breaks_on_doc_id(spark):
    # identical docs -> identical scores; cutoff must keep lowest doc_ids
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma") for i in range(6)], ["doc_id", "text"]
    )
    rows = bm25_topk(docs, "doc_id", "text", ["alpha"], k=3).collect()
    assert [r.doc_id for r in rows] == [0, 1, 2]
    assert len({r.score for r in rows}) == 1


def test_bm25_multi_term_additivity(spark):
    docs = spark.createDataFrame(
        [(1, "x y"), (2, "x x"), (3, "y y"), (4, "z z")], ["doc_id", "text"]
    )
    both = {r.doc_id: r.score for r in bm25_topk(docs, "doc_id", "text", ["x", "y"], k=10).collect()}
    only_x = {r.doc_id: r.score for r in bm25_topk(docs, "doc_id", "text", ["x"], k=10).collect()}
    only_y = {r.doc_id: r.score for r in bm25_topk(docs, "doc_id", "text", ["y"], k=10).collect()}
    assert set(both) == {1, 2, 3}
    # doc 1's two-term score is the sum of its single-term scores
    assert abs(both[1] - (only_x[1] + only_y[1])) <= 2e-4
