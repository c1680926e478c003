"""Winnowing fingerprints (Schleimer/Wilkerson/Aiken SIGMOD'03):
constructed-case guarantees beyond the oracle parity check."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from vul_dbgen_spark.operators.dedup import (
    winnow_duplicate_pairs,
    winnow_fingerprints,
)

K, W = 7, 8


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _py_winnow(text: str, k: int = K, w: int = W) -> set[int]:
    """Reference implementation: distinct window-min 60-bit md5 k-gram
    hashes — the value set is tie-rule independent."""
    if len(text) < k:
        return set()
    hs = [
        int(hashlib.md5(text[i : i + k].encode()).hexdigest()[:15], 16)
        for i in range(len(text) - k + 1)
    ]
    n_win = max(1, len(hs) - w + 1)
    return {min(hs[j : j + w]) for j in range(n_win)}


def _unique_text(seed: int, n_words: int = 30) -> str:
    # deterministic per-seed word soup with no cross-seed k-gram overlap
    return " ".join(f"z{seed}q{i}x" for i in range(n_words))


def test_fingerprints_match_reference_implementation(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, ""),
        (3, "short"),  # < k chars -> empty
        (4, "exactly7"),  # 8 chars -> 2 grams, 1 window
        (5, _unique_text(5)),
    ]
    got = {
        r["doc"]: set(r["fps"])
        for r in winnow_fingerprints(_docs(spark, rows), "doc_id", "text").collect()
    }
    for doc_id, text in rows:
        assert got[doc_id] == _py_winnow(text), doc_id


def test_winnowing_guarantee_planted_match(spark):
    """Any shared substring of length >= k + w - 1 must share >= 1
    selected fingerprint — at ANY offset (the alignment-robustness the
    strided-span operator lacks)."""
    planted = "commonplantedsubstringABCDEF"  # 28 >= K + W - 1
    rows = [(1, _unique_text(1) + planted + _unique_text(11))] + [
        # plant at deliberately misaligned offsets via different prefixes
        (i, _unique_text(i) [: 13 * i % 37 + 20] + planted + _unique_text(100 + i))
        for i in range(2, 6)
    ]
    fps = {
        r["doc"]: set(r["fps"])
        for r in winnow_fingerprints(_docs(spark, rows), "doc_id", "text").collect()
    }
    for i in range(2, 6):
        assert fps[1] & fps[i], f"doc {i} lost the planted match"


def test_pairs_capped_subset_and_threshold(spark):
    base = "the quick brown fox jumps over the lazy dog " * 3
    rows = [
        (1, base),
        (2, "xx " + base + " yy"),
        (3, _unique_text(3)),
        (4, _unique_text(4)),
    ]
    d = _docs(spark, rows)
    uncapped = {
        (r.doc_a, r.doc_b)
        for r in winnow_duplicate_pairs(d, "doc_id", "text", min_shared=2).collect()
    }
    assert (1, 2) in uncapped
    assert not any(3 in p or 4 in p for p in uncapped)
    capped = {
        (r.doc_a, r.doc_b)
        for r in winnow_duplicate_pairs(
            d, "doc_id", "text", min_shared=2, max_fp_df=3
        ).collect()
    }
    assert capped <= uncapped
