"""Full-text relevance search: distributed BM25 top-k.

The retrieval primitive a training-data pipeline needs next to dedup
(e.g. decontamination sweeps — "find the corpus documents most similar
to this eval question" — and targeted quality audits).

Scale shape (the reference has no search; this is a beyond-reference
operator per SURVEY §7.2 step 8):

- postings are built by exploding ONLY the query's terms out of each
  document (``F.filter`` before ``F.explode``), so the shuffled posting
  table is proportional to matching docs, not corpus tokens;
- each posting carries its doc length, so no join back to a per-doc
  length table (same trick as dedup.ngram_jaccard_pairs);
- corpus stats (N, avgdl) are a 1-row aggregate cross-joined via
  broadcast; per-term document frequencies are a ≤|query|-row aggregate,
  also broadcast — no shuffle grows with the corpus except the two
  hash aggregations (per-(doc,term) tf, per-doc score), both map-side
  combinable;
- ranking rounds the score to 4 decimals BEFORE the (score, doc) sort so
  mathematically-tied docs order identically on any engine (float ulp
  noise from summation order would otherwise flip ranks at the k
  boundary).

Everything is Column expressions — JVM codegen, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens
from .dedup import spread_small_scan


def bm25_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents by BM25 (Robertson idf: ln(1 + (N-df+0.5)/(df+0.5))).

    Returns (doc_id, score) with score rounded to 4 decimals; ties break
    on doc_id ascending so the cutoff is deterministic.
    """
    qt = F.array(*[F.lit(t) for t in query_terms])
    # ONE tokenization pass total: the persisted compact table holds one
    # row per doc with just (dl, query-matching terms) — ≤|query| terms
    # per row, so the cache is bounded by doc count, never token volume.
    # Corpus stats (over ALL docs — dl is kept even for non-matching
    # docs), postings, and dfreq all derive from it; without the cache
    # each consumer re-runs the tokenizer regexes over the full corpus,
    # the dominant cost at any scale.
    from pyspark import StorageLevel

    compact = (
        spread_small_scan(df)
        .select(F.col(id_col).alias("doc_id"), tokens(text_col).alias("toks"))
        .select(
            "doc_id",
            F.size("toks").alias("dl"),
            F.filter("toks", lambda t: F.array_contains(qt, t)).alias("terms"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    stats = compact.agg(F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl"))
    post = (
        compact.select("doc_id", "dl", F.explode("terms").alias("term"))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # post is unique per (doc, term) → document frequency is a plain count
    dfreq = post.groupBy("term").agg(F.count(F.lit(1)).alias("dfreq"))
    idf = F.log(1 + (F.col("n_docs") - F.col("dfreq") + 0.5) / (F.col("dfreq") + 0.5))
    term_score = idf * (
        F.col("tf") * (k1 + 1)
        / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl")))
    )
    return (
        post.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.round(F.sum(term_score), 4).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
    )
