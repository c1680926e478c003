"""Deduplication operators for large-scale document pipelines.

All shapes are shuffle-minimal and skew-aware:

- exact:      one hash-groupBy on a fingerprint (md5 of normalized text).
- ngram Jaccard: explode distinct shingles → self-join on shingle →
              per-pair intersection counts → Jaccard; hot shingles are
              droppable via a document-frequency cap (stopword shingles
              produce quadratic pair blowup at scale).
- MinHash+LSH: per-doc signature = min over shingle hashes per band salt
              (md5-based, engine-independent and deterministic); candidate
              pairs only within equal LSH band buckets — the scale path
              that avoids the all-pairs join entirely.
- SimHash:    64-bit weighted fingerprint from shingle md5 bits; near-dups
              = equal 16-bit bands → hamming check.
- embedding near-dup: see operators/similarity.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import fingerprint, word_ngrams


def exact_dedup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Group exact duplicates by normalized-text fingerprint.

    Returns one row per fingerprint: canonical (min) id, group size.
    Single hash-aggregation; at scale the fingerprint is computed map-side
    and only (fp, id) shuffles.
    """
    return (
        df.select(F.col(id_col), fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("group_size"),
        )
    )


def spread_small_scan(df: DataFrame) -> DataFrame:
    """Repartition only when the scan is too small to feed every core.

    A small single-file parquet scan otherwise pins every downstream
    CPU-heavy projection to one task; a 100 TB scan already has thousands
    of input files and must NOT be reshuffled. Decided from DataFrame
    metadata only (``inputFiles`` — no RDD materialization): fewer files
    than cores ⇒ spread. A single huge file that Spark would split by
    maxPartitionBytes repartitions harmlessly (one extra round-robin
    exchange of already-parallel data); thousands of files skip it."""
    target = df.sparkSession.sparkContext.defaultParallelism
    try:
        n_inputs = len(df.inputFiles())
    except Exception:  # non-file-backed plan (e.g., in-memory fixture)
        return df
    if n_inputs and n_inputs < target:
        return df.repartition(target)
    return df


def _doc_shingles(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    # two projections: tokens materialize once per row, then the gram
    # builder indexes the materialized array. CollapseProject keeps them
    # separate because toks is referenced many times — collapsing would
    # re-run the tokenizer regexps per element_at (word_ngrams_from_tokens).
    from ..functions.text import tokens, word_ngrams_from_tokens

    toked = spread_small_scan(df).select(
        F.col(id_col).alias("doc"), tokens(text_col).alias("toks")
    )
    return toked.select("doc", word_ngrams_from_tokens(F.col("toks"), n).alias("grams"))


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.2,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """All-pairs n-gram Jaccard similarity >= threshold.

    ``max_shingle_df`` drops shingles appearing in more than that many docs
    before the self-join — the standard guard against quadratic blowup on
    stopword shingles at 100 TB scale (documented-droppable, off by
    default so the DuckDB oracle can mirror exactly).

    The cap stays a tiny-aggregate + broadcast anti-join on purpose: the
    tempting "group postings by gram, cap via size() filter, explode
    pairs from the list" alternative removes the anti-join but measured
    4-8× SLOWER here — the double explode re-materializes the per-gram
    array for every outer row (O(d²) struct copies through two Generate
    operators), while the hash self-join streams the same pairs through
    codegen without materializing lists. Keep joins for pair generation.
    (Also measured: replacing the cap's agg+anti-join with a
    count-over-gram-partition window — hoping to reuse the join's hash
    partitioning — is ~7% slower at sf0.1: WindowExec's per-partition
    sort costs more than the tiny hot-gram aggregate it replaces.)

    Each posting carries its doc's gram count, so the pair aggregation
    groups on (doc_a, doc_b, na, nb) and Jaccard falls out directly — no
    post-join against a per-doc size table (two fewer joins over the
    pair table, the big intermediate at scale).
    """
    from pyspark import StorageLevel

    # persist: the posting table feeds both self-join sides (and the
    # hot-shingle aggregate) — without it the tokenize/shingle DAG
    # recomputes per consumer. Cache the compact pre-explode table (one
    # row per doc), not the exploded postings — ~n× less data to
    # materialize; MEMORY_AND_DISK spills rather than OOMs.
    sh = _doc_shingles(df, id_col, text_col, n).persist(StorageLevel.MEMORY_AND_DISK)
    ex = sh.select("doc", F.size("grams").alias("ng"), F.explode("grams").alias("gram"))
    if max_shingle_df is not None:
        # hot-shingle cap: DF counts are a tiny aggregate (one row per
        # distinct hot gram) — broadcast anti-join, no extra big shuffle.
        hot = ex.groupBy("gram").count().filter(F.col("count") > max_shingle_df)
        ex = ex.join(F.broadcast(hot.select("gram")), "gram", "left_anti")
    return (
        ex.alias("a")
        .join(ex.alias("b"), "gram")
        .filter(F.col("a.doc") < F.col("b.doc"))
        .groupBy(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            F.col("a.ng").alias("na"),
            F.col("b.ng").alias("nb"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 4).alias("jaccard"))
    )


def duplicated_substring_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    span_len: int = 64,
    stride: int = 32,
) -> DataFrame:
    """Cross-document duplicated substring spans (the character-level
    dedup signal behind suffix-array substring dedup, Lee et al. 2021's
    "Deduplicating Training Data Makes Language Models Better" — here as
    the Spark-shaped strided-fingerprint approximation: exact suffix
    arrays don't distribute, fingerprinted windows do).

    Every ``span_len``-char window at ``stride`` offsets is fingerprinted
    (md5 — engine-independent); a span is "duplicated" when the same
    fingerprint occurs in more than one distinct document. Returns one
    row per duplicated fingerprint: span occurrence count, number of
    distinct docs, and the canonical (min doc, min offset) witness.

    Scale shape: explode is row-local (len/stride windows per doc, ~2×
    text volume at stride=len/2); one hash aggregation on the
    fingerprint; no joins. Stride trades recall for volume — a
    duplicated region ≥ span_len + stride chars always contains an
    aligned duplicated window when the copies share alignment modulo
    stride (guaranteed for whole-document or paragraph-boundary copies;
    arbitrary-offset copies need stride=1, the full Lee et al. regime).
    """
    n_spans = F.greatest(
        F.lit(0),
        F.ceil((F.length(text_col) - F.lit(span_len - 1)) / F.lit(stride)).cast("int"),
    )
    span = F.substring(F.col(text_col), F.col("off") * stride + 1, F.lit(span_len))
    spans = (
        spread_small_scan(df)
        .filter(F.length(text_col) >= span_len)
        .select(
            F.col(id_col).alias("doc"),
            F.col(text_col),
            F.explode(F.sequence(F.lit(0), n_spans - 1)).alias("off"),
        )
        .select("doc", (F.col("off") * stride).alias("offset"), F.md5(span).alias("fp"))
    )
    return (
        spans.groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.countDistinct("doc").alias("n_docs"),
            F.min(F.struct("doc", "offset")).alias("w"),
        )
        .filter(F.col("n_docs") > 1)
        .select(
            "fp",
            "n_spans",
            "n_docs",
            F.col("w.doc").alias("witness_doc"),
            F.col("w.offset").cast("int").alias("witness_offset"),
        )
    )


def winnow_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 7,
    w: int = 8,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    "Winnowing: Local Algorithms for Document Fingerprinting",
    SIGMOD'03 — the MOSS fingerprinter). Returns one row per document:
    (doc, fps array<bigint>) — the distinct set of selected k-gram
    hashes.

    Scheme: hash every character k-gram (md5 → first 15 hex digits →
    60-bit int, the engine-independent hash used across this module),
    slide a window of ``w`` consecutive hashes, select each window's
    minimum. The winnowing guarantee: any substring match of length
    ≥ k + w − 1 shares at least one selected fingerprint (every such
    match spans a full hash window, and both copies select the same
    minimum inside it); expected density is 2/(w+1) of the grams. The
    classic tie rule (rightmost minimal hash) only affects selected
    POSITIONS — the selected hash-value SET is tie-rule-independent, so
    ``array_distinct`` over the window minima is exactly the
    fingerprint set and is mirrorable in any engine.

    Scale shape: entirely row-local — one narrow projection computes
    the hash array, the window minima, and the distinct set in a single
    whole-stage-codegen pass (O(len·w) comparisons per doc, no explode
    until the caller joins on fingerprints, no shuffle at all here).
    Compare ``duplicated_substring_spans`` (strided, alignment-
    sensitive) — winnowing is the alignment-ROBUST variant: a copied
    region ≥ k+w−1 chars is caught at ANY offset, which is why it is
    the standard scheme for plagiarism/clone detection and char-level
    near-dup mining.
    """
    n_grams = F.length("__t") - F.lit(k - 1)
    # SQL-text expressions (the house rule for literal-heavy lambdas —
    # one parse, pure codegen), textually mirrored by the DuckDB oracle
    hs_sql = (
        f"transform(sequence(1, length(__t) - {k - 1}), i -> "
        f"CAST(conv(substr(md5(substr(__t, i, {k})), 1, 15), 16, 10)"
        f" AS BIGINT))"
    )
    mins_sql = (
        f"transform(sequence(1, greatest(1, size(__hs) - {w - 1})), "
        f"j -> array_min(slice(__hs, j, {w})))"
    )
    return (
        spread_small_scan(
            df.select(F.col(id_col).alias("doc"), F.col(text_col).alias("__t"))
        )
        .select(
            "doc",
            F.when(n_grams >= 1, F.expr(hs_sql))
            .otherwise(F.expr("CAST(array() AS ARRAY<BIGINT>)"))
            .alias("__hs"),
        )
        .select(
            "doc",
            F.when(
                F.size("__hs") > 0,
                F.array_distinct(F.expr(mins_sql)),
            )
            .otherwise(F.expr("CAST(array() AS ARRAY<BIGINT>)"))
            .alias("fps"),
        )
    )


def winnow_duplicate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 7,
    w: int = 8,
    min_shared: int = 3,
    max_fp_df: int | None = None,
) -> DataFrame:
    """Candidate near-duplicate pairs by shared winnowing fingerprints:
    documents sharing ≥ ``min_shared`` selected hashes, with the count.
    Same pair-generation shape as ``ngram_jaccard_pairs`` (explode →
    equi-join on the fingerprint → pair aggregate), and the same hot-key
    remedy: ``max_fp_df`` drops fingerprints present in more than that
    many documents before the self-join (tiny aggregate + broadcast
    anti-join) — a boilerplate fingerprint shared by d docs otherwise
    emits d² pair rows, the standard quadratic cliff of every
    posting-list pair generator in this module."""
    from pyspark import StorageLevel

    # persist the compact per-doc fingerprint table: the posting explode
    # feeds the hot-fp aggregate AND both self-join sides — without this
    # the O(len) md5 chain + window minima recompute per consumer (the
    # same rule as ngram_jaccard_pairs' shingle persist). Release is
    # deferred to the caller's session hygiene (bench/parity
    # _release_state unpersists every persistent RDD between queries) —
    # the returned frame is lazy, so an eager unpersist here would undo
    # the sharing before anything executed
    fps = winnow_fingerprints(df, id_col, text_col, k=k, w=w).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    ex = fps.select("doc", F.explode("fps").alias("fp"))
    if max_fp_df is not None:
        hot = ex.groupBy("fp").count().filter(F.col("count") > max_fp_df)
        ex = ex.join(F.broadcast(hot.select("fp")), "fp", "left_anti")
    return (
        ex.alias("a")
        .join(ex.alias("b"), "fp")
        .filter(F.col("a.doc") < F.col("b.doc"))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def ngram_containment(
    eval_df: DataFrame,
    train_df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    threshold: float = 0.5,
) -> DataFrame:
    """Eval-set decontamination screen: per eval document, the fraction
    of its distinct word n-grams that appear ANYWHERE in the training
    corpus (asymmetric containment — Jaccard would dilute a fully-leaked
    short eval doc inside a long training doc, which is exactly the case
    that matters).

    Returns (id, n_grams, n_hit, containment, contaminated). Documents
    with fewer than ``n`` tokens have no grams and are omitted.

    Scale shape: the training side reduces to a DISTINCT gram set (one
    hash agg, map-side combinable) before the join, so the join keys on
    grams, not documents; the eval side is typically tiny (benchmarks).
    At 100 TB the distinct-gram table is still large — a bloom filter
    built from the eval grams pushed into the train scan
    (`Filter.. might_contain`) is the next refinement; the equi-join
    form here is the exact baseline.
    """
    tr = (
        _doc_shingles(train_df, id_col, text_col, n)
        .select(F.explode("grams").alias("gram"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    ev = _doc_shingles(eval_df, id_col, text_col, n).select(
        "doc", F.explode("grams").alias("gram")
    )
    return (
        ev.join(tr, "gram", "left")
        .groupBy("doc")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count("hit").alias("n_hit"),
        )
        .select(
            F.col("doc").alias(id_col),
            "n_grams",
            "n_hit",
            F.round(F.col("n_hit") / F.col("n_grams"), 4).alias("containment"),
            (F.col("n_hit") / F.col("n_grams") > threshold).alias("contaminated"),
        )
    )


def ngram_containment_within(
    df: DataFrame,
    id_col: str,
    text_col: str,
    split_col: str,
    eval_value: str = "test",
    n: int = 5,
    threshold: float = 0.5,
) -> DataFrame:
    """:func:`ngram_containment` when eval and train are split slices of
    ONE table: tokenize/shingle the corpus once (persisted compact, one
    row per doc) and derive both sides from the cache — the two-DataFrame
    form re-tokenizes the full corpus per side, which at 100 TB doubles
    the dominant scan+regex cost for no reason."""
    from pyspark import StorageLevel

    from ..functions.text import tokens, word_ngrams_from_tokens

    toked = spread_small_scan(df).select(
        F.col(id_col).alias("doc"), F.col(split_col).alias("split"), tokens(text_col).alias("toks")
    )
    sh = toked.select(
        "doc", "split", word_ngrams_from_tokens(F.col("toks"), n).alias("grams")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    tr = (
        sh.filter(F.col("split") != eval_value)
        .select(F.explode("grams").alias("gram"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    ev = sh.filter(F.col("split") == eval_value).select(
        "doc", F.explode("grams").alias("gram")
    )
    return (
        ev.join(tr, "gram", "left")
        .groupBy("doc")
        .agg(F.count(F.lit(1)).alias("n_grams"), F.count("hit").alias("n_hit"))
        .select(
            F.col("doc").alias(id_col),
            "n_grams",
            "n_hit",
            F.round(F.col("n_hit") / F.col("n_grams"), 4).alias("containment"),
            (F.col("n_hit") / F.col("n_grams") > threshold).alias("contaminated"),
        )
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, num_hashes: int = 8
) -> DataFrame:
    """Per-doc MinHash signature columns ``mh0..mh{k-1}``.

    Hash family = md5 over salted shingle strings (deterministic across
    engines — the DuckDB oracle reproduces it bit-for-bit; no Python UDF,
    everything stays in codegen). Docs with no shingles get null mins.
    """
    sh = _doc_shingles(df, id_col, text_col, n)

    def salted(j: int):
        # one-arg closure: a two-parameter lambda would be (element, index)
        salt = f"{j}:"
        return lambda g: F.md5(F.concat(F.lit(salt), g))

    sig = {
        f"mh{j}": F.array_min(F.transform(F.col("grams"), salted(j)))
        for j in range(num_hashes)
    }
    return sh.withColumns(sig).drop("grams").withColumnRenamed("doc", id_col)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 8,
    band_size: int = 2,
    max_band_df: int | None = None,
) -> DataFrame:
    """Candidate near-dup pairs that agree on at least one LSH band.

    Bands of ``band_size`` signature slots are concatenated and used as
    join buckets — the join fans out only within identical-band groups.
    That bound is NOT |docs|², but it is also not "true near-duplicate
    clusters": a hot band (boilerplate header, near-empty docs) of b
    members still emits b²/2 candidate rows before ``distinct()``. At
    100 TB one boilerplate bucket of 10⁶ docs is 5·10¹¹ join rows.

    ``max_band_df`` is the scale guard: bands occurring in more than
    that many docs are dropped before the self-join — the same
    tiny-aggregate + broadcast-anti-join design as
    ``ngram_jaccard_pairs``'s ``max_shingle_df`` (the band-count
    aggregate has one row per distinct band, and only over-cap rows are
    broadcast). Dropping a hot band only loses pairs whose EVERY shared
    band is hot — with num_hashes//band_size independent bands, genuine
    near-dups keep colliding on the non-degenerate bands, while the
    boilerplate bucket's quadratic fan-out disappears. Off by default so
    the uncapped path remains the exact-recall verifier at small SF.
    """
    sig = minhash_signatures(df, id_col, text_col, n, num_hashes)
    bands = [
        F.concat_ws("|", F.lit(str(b)), *[F.col(f"mh{j}") for j in range(b, b + band_size)])
        .alias(f"band{b // band_size}")
        for b in range(0, num_hashes, band_size)
    ]
    banded = sig.select(F.col(id_col).alias("doc"), *bands)
    if max_band_df is not None:
        # capped path has three consumers of the band table (hot agg,
        # anti-join probe, self-join build) — persist the compact one-row-
        # per-doc form so the tokenize/shingle/minhash DAG runs once.
        # (Uncapped path left unpersisted: its two consumers share one
        # exchange and the plan is snapshot-pinned.)
        from pyspark import StorageLevel

        banded = banded.persist(StorageLevel.MEMORY_AND_DISK)
    stacked = banded.selectExpr(
        "doc",
        "stack({}, {}) as (band_idx, band)".format(
            num_hashes // band_size,
            ", ".join(
                f"'{i}', band{i}" for i in range(num_hashes // band_size)
            ),
        ),
    )
    if max_band_df is not None:
        # hot-band cap: per-band doc counts are a tiny aggregate (one row
        # per distinct band value); only the over-cap bands ship to the
        # executors as a broadcast anti-join — no extra big shuffle. The
        # band string embeds band_idx, so "band" alone keys the bucket.
        hot = stacked.groupBy("band").count().filter(F.col("count") > max_band_df)
        stacked = stacked.join(F.broadcast(hot.select("band")), "band", "left_anti")
    return (
        stacked.alias("a")
        .join(stacked.alias("b"), ["band_idx", "band"])
        .filter(F.col("a.doc") < F.col("b.doc"))
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()
    )


def minhash_bands(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 8,
    band_size: int = 2,
) -> DataFrame:
    """Stacked LSH band rows ``(doc, band)`` — the band string embeds the
    band index, so equality on ``band`` alone is the bucket condition.

    This is the persistable index form: at scale the corpus's band table
    is written once (partitioned by a band prefix) and only APPENDED as
    new batches arrive — incremental dedup never recomputes old
    signatures."""
    sig = minhash_signatures(df, id_col, text_col, n, num_hashes)
    bands = [
        F.concat_ws("|", F.lit(str(b)), *[F.col(f"mh{j}") for j in range(b, b + band_size)])
        .alias(f"band{b // band_size}")
        for b in range(0, num_hashes, band_size)
    ]
    banded = sig.select(F.col(id_col).alias("doc"), *bands)
    return banded.selectExpr(
        "doc",
        "stack({}, {}) as (band)".format(
            num_hashes // band_size,
            ", ".join(f"band{i}" for i in range(num_hashes // band_size)),
        ),
    )


def incremental_minhash_dedup(
    corpus: DataFrame,
    delta: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 8,
    band_size: int = 2,
) -> DataFrame:
    """Screen a NEW batch against an EXISTING corpus: one boolean per
    delta doc — does it share at least one MinHash band with any corpus
    doc?

    This is the production shape of dedup for continuously-ingested
    training data: the corpus is never re-paired against itself (that
    cost was paid when each batch arrived), and the delta is screened
    with a LEFT SEMI join into the corpus band table — no pair
    enumeration at all, so a delta doc matching a million corpus docs
    costs one probe, not a million output rows. At 100 TB the corpus
    band table is a bucketed/partitioned-by-band-prefix parquet index
    maintained append-only (see minhash_bands); the screen reads only
    the delta's bands plus the matched band buckets.
    """
    c_bands = minhash_bands(corpus, id_col, text_col, n, num_hashes, band_size)
    d_bands = minhash_bands(delta, id_col, text_col, n, num_hashes, band_size)
    hit = (
        d_bands.join(c_bands, "band", "left_semi")
        .select(F.col("doc").alias(id_col))
        .distinct()
        .withColumn("__hit", F.lit(True))
    )
    return (
        delta.select(id_col)
        .join(hit, id_col, "left")
        .select(id_col, F.coalesce(F.col("__hit"), F.lit(False)).alias("is_dup"))
    )


def simhash64(df: DataFrame, id_col: str, text_col: str, n: int = 2, bits: int = 60) -> DataFrame:
    """SimHash fingerprint of the shingle set (unweighted, 60 bits).

    Bit i of the fingerprint = majority vote of bit i across shingle
    md5-derived hash values (first 15 hex chars -> 60 bits, so the value
    stays exactly representable in a signed 64-bit long on every engine).
    Pure column expressions: per-bit vote = ±1 fold via aggregate().
    """
    sh = _doc_shingles(df, id_col, text_col, n)
    h = F.transform(
        F.col("grams"),
        lambda g: F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast("decimal(20,0)").cast("long"),
    )

    def vote(i: int):
        return lambda acc, x: acc + F.when(
            F.shiftright(x, i).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    votes = [F.aggregate(h, F.lit(0), vote(i)) for i in range(bits)]
    fp = None
    for i, v in enumerate(votes):
        bit = F.when(v > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, i)
        fp = term if fp is None else fp.bitwiseOR(term)
    return sh.select(F.col("doc").alias(id_col), fp.alias("simhash"))


def hamming_neighbor_pairs(
    df: DataFrame,
    id_col: str,
    s_col: str,
    d: int = 1,
    max_key_df: int | None = None,
) -> DataFrame:
    """All pairs of equal-length strings within Hamming distance ``d``
    (pigeonhole segment blocking — the partition-signature idea of
    PassJoin, Li/Deng/Wang/Feng, VLDB'12, specialized to the
    substitution-only case where it is EXACT for any fixed partition of
    positions).

    Recall argument: split the position set into ``d+1`` classes; a pair
    with at most ``d`` mismatching positions leaves at least one class
    untouched (pigeonhole), so the pair shares that class's extracted
    substring verbatim and meets in its equi-join bucket. Interleaved
    classes (position ``i`` → class ``(i-1) mod (d+1)``) are used instead
    of contiguous segments deliberately: identifier-like corpora
    ("Customer#000000042") share long contiguous prefixes, which would
    make the prefix segment one gigantic bucket, while interleaving
    spreads the varying suffix digits across every class — the same
    hot-key reasoning as the banded LSH joins above.

    Plan shape (100 TB story): one narrow projection computes all d+1
    class keys per row (pure codegen — transform over sequence, no UDF),
    posexplode stacks them, and candidates come from an equi-join on
    (class, key, length) — never an all-pairs comparison. The verify
    step counts mismatching positions with a codegen filter/size
    expression (exact integer, oracle-mirrorable via DuckDB's
    ``hamming``); ``distinct`` collapses pairs that met in several
    classes. Candidate volume is Θ(Σ bucket²) over class-key buckets;
    dense sequential-ID corpora give bucket sizes ≈ N/10^(digits per
    class), and genuinely hot keys (many rows identical in a whole
    class) are the same pathology as ``minhash_lsh_pairs``' hot bands —
    and take the same remedy: ``max_key_df`` drops class-key buckets
    larger than the cap before the self-join (tiny per-key aggregate +
    broadcast anti-join, no extra big shuffle). The cap trades the
    exactness guarantee for scale — a pair is lost only if EVERY class
    it agrees on is hot (with d+1 independent classes, near-misses on
    organic text keep a cold class; a corpus where 10⁶ rows agree on a
    whole position class is boilerplate, the thing dedup drops anyway).
    Off by default so the uncapped path stays the exact-recall verifier.

    Returns distinct (``id_a``, ``id_b``) with ``id_a`` < ``id_b``.
    """
    n_cls = d + 1
    # the class-key projection is built as SQL text (one parse, pure
    # codegen — the house rule for literal-heavy expressions): class r's
    # key keeps exactly the characters at positions ≡ r (mod d+1)
    key_sql = (
        f"transform(sequence(0, {n_cls - 1}), r -> "
        f"array_join(transform(sequence(1, length(__s)), i -> "
        f"IF(((i - 1) % {n_cls}) = r, substr(__s, i, 1), '')), ''))"
    )
    # spread_small_scan: a single-file scan would otherwise pin the
    # ENTIRE candidate join to one task — a broadcast hash join has no
    # shuffle to re-parallelize the probe side, so the verify work for
    # every candidate lands on however many partitions the scan had
    # (measured: 21.2 s at sf0.1 on 1 task vs ~1 s spread over 32).
    # __ch (the split char array) is computed ONCE per base row and
    # carried through the join: each row verifies against many
    # candidates, and the per-candidate cost drops from O(len²)
    # repeated substr scans to one O(len) zip_with over materialized
    # arrays.
    base = spread_small_scan(
        df.select(F.col(id_col).alias("__id"), F.col(s_col).alias("__s"))
    ).select(
        "__id",
        F.length("__s").alias("__len"),
        F.split("__s", "").alias("__ch"),
        F.posexplode(F.expr(key_sql)),
    ).select(
        "__id", "__ch", "__len", F.col("pos").alias("__cls"), F.col("col").alias("__key")
    )
    if max_key_df is not None:
        hot = (
            base.groupBy("__cls", "__key", "__len")
            .count()
            .filter(F.col("count") > max_key_df)
        )
        base = base.join(
            F.broadcast(hot.select("__cls", "__key", "__len")),
            ["__cls", "__key", "__len"],
            "left_anti",
        )
    left = base
    right = base.select(
        F.col("__id").alias("__id2"),
        F.col("__ch").alias("__ch2"),
        F.col("__len").alias("__len2"),
        F.col("__cls").alias("__cls2"),
        F.col("__key").alias("__key2"),
    )
    mism = F.expr(
        "size(array_remove(zip_with(__ch, __ch2, (x, y) -> x <> y), false))"
    )
    return (
        left.join(
            right,
            (F.col("__cls") == F.col("__cls2"))
            & (F.col("__key") == F.col("__key2"))
            & (F.col("__len") == F.col("__len2"))
            & (F.col("__id") < F.col("__id2")),
        )
        .filter(mism <= d)
        .select(F.col("__id").alias("id_a"), F.col("__id2").alias("id_b"))
        .distinct()
    )


def edit_neighbor_pairs(
    df: DataFrame,
    id_col: str,
    s_col: str,
    max_key_df: int | None = None,
) -> DataFrame:
    """All pairs of strings within Levenshtein distance 1 — including
    insertions and deletions, which ``hamming_neighbor_pairs`` cannot
    see (deletion-neighborhood blocking, the FastSS/SymSpell family:
    Bocek et al., "Fast Similarity Search in Large Dictionaries", 2007).

    Recall argument (exact, not probabilistic): block each string on
    ``{s} ∪ deletes1(s)`` — itself plus every single-character deletion.
    If ed(s,t) ≤ 1 the pair shares a block key verbatim: equality shares
    ``s``; a substitution at position i shares the delete-at-i variant
    of both; an insertion (t = s plus one char) shares ``s`` itself,
    which is also a deletion variant of t. So an equi-join on the
    variant finds every qualifying pair, and the exact
    ``levenshtein(s, t) ≤ 1`` verify (same function in Spark and
    DuckDB — integer, engine-exact) discards the false candidates that
    shared-variant blocking admits (two different deletions can
    coincide, a distance-2 shape).

    Plan shape (100 TB story): variant generation is one codegen array
    expression per row (``array_distinct`` collapses the duplicate
    variants a run of identical characters produces — deleting any of
    five zeros yields the same string — so repeated-char identifiers
    don't inflate their own block lists); candidates come from an
    equi-join on the variant string, never an all-pairs scan; the
    verify is O(len²) row-local work on candidates only. Block-key
    volume is (len+1)·n rows; hot variants (shared by many rows) are
    the same pathology as ``minhash_lsh_pairs``' hot bands and take the
    same remedy: ``max_key_df`` drops variant buckets larger than the
    cap before the self-join (tiny per-variant aggregate + broadcast
    anti-join). Capping trades exact recall for scale — a pair is lost
    only if its EVERY shared variant is hot, and a variant shared by
    more than the cap's worth of rows means that many near-identical
    strings, i.e. a duplicate cluster the cheaper exact/canonical dedup
    passes already collapse. Off by default (exact-recall verifier).

    Returns distinct (``id_a``, ``id_b``) with ``id_a`` < ``id_b``.
    """
    # guard the degenerate empty string: Spark's sequence(1, 0) counts
    # DOWN ([1, 0]), it is not empty — gate on length explicitly
    var_sql = (
        "array_distinct(IF(length(__s) < 1, array(__s), "
        "concat(array(__s), transform(sequence(1, length(__s)), "
        "i -> concat(substr(__s, 1, i - 1), substr(__s, i + 1, length(__s)))))))"
    )
    # spread_small_scan: same single-task-broadcast-probe hazard as the
    # Hamming join — without it a small scan serializes every candidate
    # verify onto one core
    base = (
        spread_small_scan(
            df.select(F.col(id_col).alias("__id"), F.col(s_col).alias("__s"))
        )
        .select("__id", "__s", F.explode(F.expr(var_sql)).alias("__v"))
    )
    if max_key_df is not None:
        hot = base.groupBy("__v").count().filter(F.col("count") > max_key_df)
        base = base.join(F.broadcast(hot.select("__v")), "__v", "left_anti")
    right = base.select(
        F.col("__id").alias("__id2"),
        F.col("__s").alias("__s2"),
        F.col("__v").alias("__v2"),
    )
    return (
        base.join(
            right,
            (F.col("__v") == F.col("__v2")) & (F.col("__id") < F.col("__id2")),
        )
        .filter(F.levenshtein("__s", "__s2") <= 1)
        .select(F.col("__id").alias("id_a"), F.col("__id2").alias("id_b"))
        .distinct()
    )


def ppjoin_pairs(
    df: DataFrame,
    id_col: str,
    toks_col: str,
    num: int = 19,
    den: int = 20,
) -> DataFrame:
    """Exact set-similarity self-join: all pairs with token-set Jaccard
    ≥ ``num/den``, via prefix filtering (the AllPairs/PPJoin family —
    Bayardo/Ma/Srikant WWW'07, Xiao et al. WWW'08). This is the
    LOSSLESS scalable set join: unlike the df-caps on the LSH/fuzzy
    joins above (which trade recall for boundedness), prefix filtering
    is an exact-recall reduction — every qualifying pair survives, by
    theorem, not by luck.

    Prefix theorem: order all tokens by a global total order (here
    ascending document frequency, rarest first, ties by token — the
    order that makes prefixes selective); give each set ``s`` a prefix
    of its first ``|s| - ⌈τ·|s|⌉ + 1`` tokens. If jacc(a,b) ≥ τ then
    |a∩b| ≥ ⌈τ·|a|⌉ and ≥ ⌈τ·|b|⌉, so the smallest common token (in
    the global order) must sit inside BOTH prefixes — otherwise the
    common tokens all fall in a suffix too short to reach the required
    overlap. Hence an equi-join on prefix tokens alone has exact
    recall, and the exact integer verify (``den·i ≥ num·(na+nb−i)``,
    cross-multiplied — no float thresholds) discards the rest.

    The threshold is a rational ``num/den`` so prefix lengths
    (⌈num·n/den⌉ as ``(num·n + den − 1) div den``) and the verify are
    pure integer arithmetic — bit-identical across engines, no
    ``ceil(0.95·n)`` float hazards.

    Plan shape (100 TB story): token df is one map-side-combinable
    aggregate; the global order ships as a zero-padded ``df|token``
    sort key, so per-set ordering is one row-local ``sort_array`` —
    no broadcast vocabulary needed; candidates come from an equi-join
    on prefix tokens only (on a Zipfian corpus the rarest-first prefix
    puts most sets behind low-df postings — candidate volume tracks
    Σ prefix-posting², a small fraction of Σ posting²); the verify
    joins candidate ids back to the doc arrays and runs one O(n)
    ``array_intersect`` per pair. Size-compatibility predicates
    (``den·na ≥ num·nb`` and symmetric) prune length-mismatched
    candidates before the verify. On a LOW-entropy vocabulary (this
    synthetic corpus: ~100 words) prefixes are less selective — the
    probe measured 124,750 brute pairs reduced to ~5k candidates at
    19/20 — while real Zipfian text does far better; the theorem is
    unconditional either way.

    Returns (``id_a``, ``id_b``, ``jaccard``) with ``id_a`` < ``id_b``,
    jaccard rounded to 4 decimals.
    """
    base = spread_small_scan(
        df.select(
            F.col(id_col).alias("__id"),
            F.array_distinct(F.col(toks_col)).alias("__toks"),
        )
    )
    t = base.select("__id", F.explode("__toks").alias("__tok"))
    dft = t.groupBy("__tok").agg(F.count(F.lit(1)).alias("__df"))
    keyed = t.join(dft, "__tok").select(
        "__id",
        F.concat(
            F.lpad(F.col("__df").cast("string"), 8, "0"),
            F.lit("|"),
            F.col("__tok"),
        ).alias("__key"),
    )
    sk = keyed.groupBy("__id").agg(
        F.sort_array(F.collect_list("__key")).alias("__skeys")
    )
    prefix_len = (
        f"size(__skeys) - (({num} * size(__skeys) + {den} - 1) div {den}) + 1"
    )
    pfx = sk.select(
        "__id",
        F.size("__skeys").alias("__n"),
        F.explode(F.expr(f"slice(__skeys, 1, {prefix_len})")).alias("__pk"),
    )
    right = pfx.select(
        F.col("__id").alias("__id2"),
        F.col("__n").alias("__n2"),
        F.col("__pk").alias("__pk2"),
    )
    cand = (
        pfx.join(
            right,
            (F.col("__pk") == F.col("__pk2"))
            & (F.col("__id") < F.col("__id2"))
            & (F.lit(den) * F.col("__n2") >= F.lit(num) * F.col("__n"))
            & (F.lit(den) * F.col("__n") >= F.lit(num) * F.col("__n2")),
        )
        .select(F.col("__id").alias("id_a"), F.col("__id2").alias("id_b"))
        .distinct()
    )
    a = base.select(F.col("__id").alias("id_a"), F.col("__toks").alias("__ta"))
    b = base.select(F.col("__id").alias("id_b"), F.col("__toks").alias("__tb"))
    i = F.size(F.array_intersect("__ta", "__tb"))
    na, nb = F.size("__ta"), F.size("__tb")
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .filter(F.lit(den + num) * i >= F.lit(num) * (na + nb))
        .select(
            "id_a",
            "id_b",
            F.round(i / (na + nb - i), 4).alias("jaccard"),
        )
    )
