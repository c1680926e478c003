"""The slice-based n-gram builder must agree exactly with the original
element_at formulation (functions/text.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from vul_dbgen_spark.functions.text import (
    _word_ngrams_elementwise,
    tokens,
    word_ngrams_from_tokens,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "one two"),  # shorter than n=3 → no grams
    (2, ""),
    (3, "a a a a a"),  # distinct collapses repeats
    (4, "Punct,markers! don't   split... weirdly?"),
]


def test_slice_matches_elementwise(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"]).select(
        "doc_id", tokens("text").alias("toks")
    )
    for n in (2, 3):
        got = df.select(
            "doc_id", word_ngrams_from_tokens(F.col("toks"), n).alias("g")
        ).collect()
        want = df.select(
            "doc_id", _word_ngrams_elementwise(F.col("toks"), n).alias("g")
        ).collect()
        assert {r.doc_id: r.g for r in got} == {r.doc_id: r.g for r in want}


def test_expected_grams(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"]).select(
        "doc_id", tokens("text").alias("toks")
    )
    out = {
        r.doc_id: r.g
        for r in df.select(
            "doc_id", word_ngrams_from_tokens(F.col("toks"), 3).alias("g")
        ).collect()
    }
    assert out[0][0] == "the quick brown"
    assert out[1] == []
    assert out[2] == []
    assert out[3] == ["a a a"]
