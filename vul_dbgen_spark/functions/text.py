"""Text-analysis primitives for large-scale training-data pipelines.

All pure Column expressions (JVM-side, whole-stage codegen — no UDFs), each
with an exact ANSI-SQL mirror so the DuckDB oracle can verify them:

- normalization + whitespace tokenization,
- token statistics / quality scoring (length, punctuation, stopword ratios),
- n-gram shingling (word n-grams for Jaccard / MinHash dedup),
- document fingerprinting (md5 of the normalized text),
- n-gram-heuristic language ID (stopword hit counts, argmax).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small per-language stopword marker sets for the heuristic language ID.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "und", "das", "ist", "nicht"],
    "fr": ["le", "les", "des", "est", "une"],
    "es": ["el", "los", "que", "es", "una"],
}

STOPWORDS_EN = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]


def normalize_text(col: Column | str) -> Column:
    """lower → strip non-alnum → collapse whitespace → trim."""
    col = F.col(col) if isinstance(col, str) else col
    t = F.lower(col)
    t = F.regexp_replace(t, r"[^a-z0-9]+", " ")
    return F.trim(t)


def tokens(col: Column | str) -> Column:
    """Whitespace tokens of the normalized text (array<string>)."""
    norm = normalize_text(col)
    return F.when(norm == "", F.array().cast("array<string>")).otherwise(
        F.split(norm, " ")
    )


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


# GPT-2-style pre-tokenizer pattern, constrained to constructs both Java
# regex (Spark) and RE2 (DuckDB) support: no lookahead, ASCII classes
# (the corpus is ASCII; swap in \p{L}/\p{N} for unicode deployments).
# Order matters — contractions bind before the word branch.
BPE_SPLIT_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+|\s+"


def bpe_tokens(col: Column | str) -> Column:
    """BPE-ish pre-tokenization (array<string>): the GPT-2 split regex
    over raw (un-normalized) text. This is the piece-count basis LLM
    data pipelines budget by — whitespace tokens undercount code and
    punctuation-heavy text badly."""
    col = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(col, F.lit(BPE_SPLIT_PATTERN), 0)


# counting variant: drop the \s+ branch — non-overlapping scan then skips
# whitespace runs, yielding exactly the non-whitespace piece count (pure
# whitespace pieces are noise for token budgeting; a real BPE merges them)
BPE_COUNT_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+"


def bpe_token_count(col: Column | str) -> Column:
    """Count of BPE-ish pieces (whitespace runs excluded)."""
    col = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(col, F.lit(BPE_COUNT_PATTERN))


# --- "from_tokens" variants -------------------------------------------------
# Use these when the token array is already projected as a column: lambda
# bodies (filter/transform/aggregate) inline captured expressions, so an
# inline tokens(text) would re-run its regexps per array element.


def stopword_ratio_from_tokens(toks: Column, stopwords: list[str] | None = None) -> Column:
    sw = F.array(*[F.lit(w) for w in (stopwords or STOPWORDS_EN)])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(hits / F.size(toks))


def avg_token_len_from_tokens(toks: Column) -> Column:
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
        total.cast("double") / F.size(toks)
    )


def lang_scores_from_tokens(toks: Column) -> dict[str, Column]:
    out = {}
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(w) for w in markers])
        out[lang] = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
    return out


def lang_id_from_tokens(toks: Column) -> Column:
    scores = lang_scores_from_tokens(toks)
    best = F.greatest(*scores.values())
    expr = F.when(best == 0, F.lit("und"))
    for lang in LANG_MARKERS:
        expr = expr.when(scores[lang] == best, F.lit(lang))
    return expr


def punct_ratio(col: Column | str) -> Column:
    """Fraction of characters that are not alphanumeric/space."""
    col = F.col(col) if isinstance(col, str) else col
    n = F.length(col)
    stripped = F.length(F.regexp_replace(col, r"[^A-Za-z0-9 ]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise((n - stripped) / n)


def stopword_ratio(col: Column | str, stopwords: list[str] | None = None) -> Column:
    """Fraction of tokens that are stopwords."""
    toks = tokens(col)
    sw = F.array(*[F.lit(w) for w in (stopwords or STOPWORDS_EN)])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(hits / F.size(toks))


def avg_token_len(col: Column | str) -> Column:
    toks = tokens(col)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
        total.cast("double") / F.size(toks)
    )


def quality_score(col: Column | str) -> Column:
    """Composite [0,1] quality heuristic: long enough, low punctuation,
    some (but not all) stopwords, sane token lengths."""
    nt = token_count(col).cast("double")
    len_score = F.least(nt / F.lit(100.0), F.lit(1.0))
    punct_pen = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio(col) * 4)
    sw = stopword_ratio(col)
    sw_score = F.lit(1.0) - F.abs(sw - F.lit(0.3))
    atl = avg_token_len(col)
    atl_score = F.when((atl >= 3) & (atl <= 10), F.lit(1.0)).otherwise(F.lit(0.5))
    return (len_score * 0.4 + punct_pen * 0.2 + sw_score * 0.2 + atl_score * 0.2)


def fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint: md5 hex of the normalized text."""
    return F.md5(normalize_text(col))


def word_ngrams_from_tokens(toks: Column, n: int = 3) -> Column:
    """Distinct word n-grams from a token-array column.

    One ``slice`` + ``array_join`` per gram instead of n ``element_at``
    calls — fewer references to the captured ``toks`` expression (which
    CollapseProject may inline and re-evaluate per reference) and no
    per-element index arithmetic; measured equal-or-better warm runtime.
    """
    idx = _gram_indices(toks, n)
    grams = F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " "))
    return F.array_distinct(grams)


def _gram_indices(toks: Column, n: int) -> Column:
    """1-based start indices of the n-grams; EMPTY when size < n.

    sequence(1, size-n+1) alone is wrong for short docs: sequence counts
    DOWN when the stop is below the start, so size < n would yield [1, 0]
    and index-0 array access errors under ANSI mode.
    """
    return F.when(
        F.size(toks) >= n, F.sequence(F.lit(1), F.size(toks) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))


def _word_ngrams_elementwise(toks: Column, n: int = 3) -> Column:
    """Previous element_at formulation — kept for the regression test."""
    idx = _gram_indices(toks, n)
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + k).cast("int")) for k in range(n)]
        ),
    )
    return F.array_distinct(grams)


def word_ngrams(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-grams (space-joined) of the normalized text.

    NOTE: prefer projecting ``tokens(col)`` first and calling
    ``word_ngrams_from_tokens`` (see its docstring for why).
    """
    return word_ngrams_from_tokens(tokens(col), n)


def lang_scores(col: Column | str) -> dict[str, Column]:
    """Per-language stopword hit counts over the token multiset."""
    toks = tokens(col)
    out = {}
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(w) for w in markers])
        out[lang] = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
    return out


def lang_id(col: Column | str) -> Column:
    """Argmax language by marker hits; 'und' when no marker hits at all.
    Ties break by the fixed language order of LANG_MARKERS (same CASE chain
    is trivially mirrored in the oracle SQL)."""
    scores = lang_scores(col)
    best = F.greatest(*scores.values())
    expr = F.when(best == 0, F.lit("und"))
    for lang, s in scores.items():
        expr = expr.when(s == best, F.lit(lang))
    return expr


# ---------------------------------------------------------------------------
# hashed linear scorer (fastText-style classifier inference)
# ---------------------------------------------------------------------------

HASHED_SCORER_DIM = 1024


def hashed_scorer_weights(dim: int = HASHED_SCORER_DIM) -> list[float]:
    """Deterministic pseudo-random weight vector for the hashed linear
    scorer — md5-derived so any engine (or the oracle) regenerates the
    identical floats. A real deployment replaces this with trained
    weights; the INFERENCE path below is what the engine contributes."""
    import hashlib

    return [
        int(hashlib.md5(f"w:{i}".encode()).hexdigest()[:6], 16) / 16777216.0 - 0.5
        for i in range(dim)
    ]


def hashed_linear_score(
    toks: Column, weights: list[float], bias: float = 0.0
) -> Column:
    """Linear-classifier inference over the hashing trick: each token
    indexes md5(token) mod dim into the weight vector; the document
    logit is a row-local LEFT FOLD over the token list (engine-
    mirrorable: DuckDB's list_reduce folds in the same order), squashed
    by a sigmoid. No shuffle, no UDF — model inference as a column
    expression, the cheapest possible quality-classifier pass over a
    100 TB corpus. Weight lookup is element_at into a literal array
    (dim ≈ 1k floats — plan-sized, not bloom-sized)."""
    dim = len(weights)
    w = F.lit(weights)

    def step(acc: Column, t: Column) -> Column:
        idx = F.conv(F.substring(F.md5(t), 1, 6), 16, 10).cast("int") % dim
        return acc + F.element_at(w, idx + 1)

    z = F.aggregate(toks, F.lit(float(bias)), step)
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
