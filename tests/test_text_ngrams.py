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


def test_bpe_token_count_semantics(spark):
    from vul_dbgen_spark.functions.text import bpe_token_count, token_count

    cases = [
        # (text, expected BPE pieces, note)
        (0, "don't stop", 3),           # don / 't / (sp)stop — 't binds as contraction
        (1, "hello world", 2),
        (2, "x=1; y=2;", 8),            # x / = / 1 / ; / (sp)y / = / 2 / ;
        (3, "   ", 0),                  # pure whitespace → no pieces
        (4, "", 0),
        (5, "abc123", 2),               # letters then digits split
    ]
    df = spark.createDataFrame([(i, t) for i, t, _ in cases], ["id", "text"])
    got = {
        r.id: r.n
        for r in df.select("id", bpe_token_count("text").alias("n")).collect()
    }
    for i, t, want in cases:
        assert got[i] == want, (t, got[i], want)
    # code-ish text: BPE pieces exceed whitespace tokens (the undercount
    # whitespace tokenization suffers on punctuation-heavy text)
    ws = df.select("id", token_count("text").alias("n")).collect()
    ws = {r.id: r.n for r in ws}
    assert got[2] > ws[2]
