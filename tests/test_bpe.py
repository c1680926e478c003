"""Unit tests for operators/bpe.py — the in-engine BPE tokenizer
trainer. Catalog-level oracle parity for train_bpe_merges /
bpe_compression_eval is covered by the full-parity suite; these tests
pin the merge-application SEMANTICS against a Python reference
implementation of the classic non-overlapping left-to-right merge pass
(the loop body of Sennrich+ ACL'16), including the run-alternation
edge cases the fold must reproduce exactly for the oracle's
list_reduce mirror to stay bit-identical."""

from pyspark.sql import functions as F

from vul_dbgen_spark.operators.bpe import (
    END_MARK,
    _merge_fold_sql,
    bpe_train,
    compression_summary,
    init_symbols,
    word_counts,
)


def _ref_merge(sym: list[str], left: str, right: str) -> list[str]:
    """Reference: single left-to-right non-overlapping merge pass."""
    out: list[str] = []
    i = 0
    while i < len(sym):
        if i + 1 < len(sym) and sym[i] == left and sym[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return out


def _fold(spark, sym: list[str], left: str, right: str) -> list[str]:
    df = spark.createDataFrame([(sym,)], "sym array<string>")
    return df.select(
        F.expr(_merge_fold_sql(left, right)).alias("m")
    ).first()["m"]


def test_fold_matches_reference_on_edge_cases(spark):
    cases = [
        (["a", "b", "c"], "a", "b"),            # simple head merge
        (["a", "b", "a", "b"], "a", "b"),        # two disjoint merges
        (["a", "a", "a"], "a", "a"),             # odd identical run → aa a
        (["a", "a", "a", "a"], "a", "a"),        # even run → aa aa
        (["b", "a", "a", "b"], "a", "a"),        # interior run
        (["x"], "a", "b"),                        # single symbol, no-op
        (["a", "b", "b"], "a", "b"),             # merged token blocks next
        (["t", "h", "e", END_MARK], "e", END_MARK),  # marker participates
    ]
    for sym, l, r in cases:
        assert _fold(spark, sym, l, r) == _ref_merge(sym, l, r), (sym, l, r)


def test_train_learns_top_pair_first(spark):
    # corpus: 'ab' ×3, 'abc' ×1 → char pairs weighted by word counts:
    # (a,b): 4, (b,</w>): 3, (b,c): 1, (c,</w>): 1 → first merge (a,b)
    docs = spark.createDataFrame(
        [(["ab"],), (["ab"],), (["ab", "abc"],)], "toks array<string>"
    )
    words = word_counts(docs)
    merges, syms = bpe_train(words, 2)
    assert merges[0][1:] == ("a", "b", 4)
    # second merge: after (a,b)→ab, pairs are (ab,</w>):3, (ab,c):1,
    # (c,</w>):1 → (ab, </w>) with count 3
    assert merges[1][1:] == ("ab", END_MARK, 3)
    got = {r["word"]: r["sym"] for r in syms.collect()}
    assert got["ab"] == ["ab" + END_MARK]
    assert got["abc"] == ["ab", "c", END_MARK]


def test_train_stops_when_fully_collapsed(spark):
    # one 1-char word: a </w> — round 1 merges it into a single symbol,
    # round 2 finds no pairs and must stop early instead of wiping the
    # dictionary through an empty-argmax cross join
    docs = spark.createDataFrame([(["a"],)], "toks array<string>")
    merges, syms = bpe_train(word_counts(docs), 5)
    assert [m[1:] for m in merges] == [("a", END_MARK, 1)]
    assert syms.first()["sym"] == ["a" + END_MARK]


def test_compression_summary_exact(spark):
    docs = spark.createDataFrame(
        [(["ab"],), (["ab"],), (["ab", "abc"],)], "toks array<string>"
    )
    _, syms = bpe_train(word_counts(docs), 2)
    row = compression_summary(syms).first()
    # before: ab→3 syms ×3 + abc→4 syms ×1 = 13; after: ab→1 ×3 +
    # abc→3 ×1 = 6
    assert row["n_words"] == 2 and row["n_tokens"] == 4
    assert row["syms_before"] == 13 and row["syms_after"] == 6
    assert row["compression"] == round(13 / 6, 6)


def test_init_symbols_chars_plus_marker(spark):
    words = spark.createDataFrame([("the", 1)], "word string, n long")
    assert init_symbols(words).first()["sym"] == ["t", "h", "e", END_MARK]
