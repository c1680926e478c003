"""Candidate-verify near-dup, canonicalization dedup, and length-decile
stratification: constructed-case semantics beyond the oracle parity check."""

from __future__ import annotations

from pyspark.sql import functions as F

from vul_dbgen_spark.queries.catalog import (
    dedup_canonical_text,
    dedup_lsh_edit_verify,
    text_length_deciles,
)

SF = "/root/testdata/sf0.001"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_edit_verify_flags_near_dups_only(spark, tmp_path):
    base = (
        "the quick brown fox jumps over the lazy dog and runs far away "
        "into the deep green forest tonight"
    )
    rows = [
        (1, base),
        (2, base.replace("tonight", "today")),  # near-dup of 1
        (3, "completely unrelated text about spark query planning engines"),
    ] + [(10 + i, f"filler document number {i} with unique words w{i} x{i}") for i in range(5)]
    d = _docs(spark, [(i, t) for i, t in rows])
    out_dir = str(tmp_path / "docs")
    d.write.parquet(f"{out_dir}/documents.parquet")
    out = dedup_lsh_edit_verify(spark, out_dir).collect()
    pairs = {(r.doc_a, r.doc_b): r for r in out}
    assert (1, 2) in pairs
    r = pairs[(1, 2)]
    assert r.is_dup and r.edit_dist > 0 and r.rel_edit <= 0.4
    # the unrelated doc never reaches the verify stage with doc 1 or 2
    assert not any(3 in p for p in pairs)


def test_canonical_links_formatting_variants(spark, tmp_path):
    d = _docs(
        spark,
        [
            (1, "Hello, World!"),
            (2, "hello   world"),
            (3, "HELLO WORLD."),
            (4, "goodbye world"),
        ],
    )
    out_dir = str(tmp_path / "docs")
    d.write.parquet(f"{out_dir}/documents.parquet")
    got = {r.doc_id: (r.canonical_id, r.n_canon) for r in dedup_canonical_text(spark, out_dir).collect()}
    assert got[1] == (1, 3) and got[2] == (1, 3) and got[3] == (1, 3)
    assert got[4] == (4, 1)


def test_length_deciles_partition_and_bounds(spark):
    out = text_length_deciles(spark, SF)
    rows = out.collect()
    by_source: dict[str, list] = {}
    for r in rows:
        by_source.setdefault(r.source, []).append(r)
    for src, rs in by_source.items():
        rs = sorted(rs, key=lambda r: r.decile)
        assert [r.decile for r in rs] == list(range(1, len(rs) + 1))
        # deciles tile the length axis: non-overlapping, ordered ranges
        for a, b in zip(rs, rs[1:]):
            assert a.max_chars <= b.min_chars
        # decile sizes differ by at most one row (ntile contract)
        sizes = [r.n_docs for r in rs]
        assert max(sizes) - min(sizes) <= 1
    # full partition: every doc is in exactly one decile
    total = sum(r.n_docs for r in rows)
    docs = out.sparkSession.read.parquet(f"{SF}/documents.parquet").count()
    assert total == docs


def test_ngram_doc_freq_topk_contract(spark):
    from vul_dbgen_spark.queries.catalog import ngram_doc_freq

    rows = ngram_doc_freq(spark, SF).collect()
    assert len(rows) == 50
    counts = [r.n_docs for r in rows]
    assert counts == sorted(counts, reverse=True)
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    # per-doc-distinct grams: document frequency can never exceed |docs|
    assert counts[0] <= n_docs


def test_centroid_confusion_total_and_separability(spark):
    from vul_dbgen_spark.queries.catalog import centroid_assign_confusion

    rows = centroid_assign_confusion(spark, SF).collect()
    total = sum(r.n for r in rows)
    n_vecs = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    assert total == n_vecs  # every vector assigned to exactly one centroid
    diag = sum(r.n for r in rows if r.label == r.pred_label)
    # the synthetic labels are noisy but not random — nearest-centroid
    # must beat the 10-class chance floor by a wide margin (observed
    # ~0.37 at sf0.001)
    assert diag / total > 0.25


def test_incremental_dedup_consistent_with_full_lsh(spark):
    # the delta screen must flag EXACTLY the delta docs that the full
    # corpus-wide LSH pair join links to at least one corpus doc — the
    # semi-join is an optimization, never a semantics change
    from pyspark.sql import functions as F

    from vul_dbgen_spark.operators.dedup import (
        incremental_minhash_dedup,
        minhash_lsh_pairs,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    delta = docs.filter(F.col("doc_id") % 2 == 1)

    flagged = {
        r.doc_id
        for r in incremental_minhash_dedup(corpus, delta, "doc_id", "text")
        .filter("is_dup")
        .collect()
    }

    pairs = minhash_lsh_pairs(docs, "doc_id", "text").collect()
    cross = set()
    for r in pairs:
        if r.doc_a % 2 != r.doc_b % 2:  # one side delta, one side corpus
            cross.add(r.doc_a if r.doc_a % 2 == 1 else r.doc_b)
    assert flagged == cross
    assert flagged  # non-vacuous: the testdata contains cross-parity dups


def test_band_cap_pairs_subset_of_uncapped(spark):
    # capped pairs ⊆ uncapped pairs on the real testdata corpus: the cap
    # may only DROP candidates, never invent one (the band-cap analog of
    # the capped-shingle conservatism contract)
    from vul_dbgen_spark.operators.dedup import minhash_lsh_pairs

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    uncapped = {
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_pairs(docs, "doc_id", "text").collect()
    }
    capped = {
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_pairs(docs, "doc_id", "text", max_band_df=5).collect()
    }
    assert capped <= uncapped
    assert uncapped  # non-vacuous


def test_band_cap_drops_only_hot_band_pairs(spark):
    # every pair the cap drops must have ALL of its shared bands hot
    # (df > cap): a pair with even one cold shared band must survive.
    # Constructed corpus: a 12-doc boilerplate cluster (every band
    # identical and hot at cap=5) plus one genuine near-dup pair whose
    # bands are unique to the pair (cold).
    from vul_dbgen_spark.operators.dedup import minhash_bands, minhash_lsh_pairs

    base = (
        "the quick brown fox jumps over the lazy dog and runs far away "
        "into the deep green forest tonight"
    )
    rows = [(i, "boilerplate header text repeated verbatim across documents") for i in range(12)]
    rows += [(100, base), (101, base.replace("tonight", "today"))]
    d = _docs(spark, rows)

    cap = 5
    uncapped = {
        (r.doc_a, r.doc_b) for r in minhash_lsh_pairs(d, "doc_id", "text").collect()
    }
    capped = {
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_pairs(d, "doc_id", "text", max_band_df=cap).collect()
    }
    assert capped <= uncapped

    bands = minhash_bands(d, "doc_id", "text").collect()
    by_doc: dict[int, set[str]] = {}
    band_df: dict[str, set[int]] = {}
    for r in bands:
        by_doc.setdefault(r.doc, set()).add(r.band)
        band_df.setdefault(r.band, set()).add(r.doc)
    hot = {b for b, ds in band_df.items() if len(ds) > cap}

    dropped = uncapped - capped
    assert dropped  # the boilerplate cluster must actually trip the cap
    for a, b in dropped:
        shared = by_doc[a] & by_doc[b]
        assert shared and shared <= hot, (a, b, shared - hot)
    # and the cold near-dup pair survives the cap
    assert (100, 101) in capped


def _hamming(a: str, b: str) -> int:
    return sum(x != y for x, y in zip(a, b))


def test_hamming_neighbor_pairs_exact_recall_d1(spark):
    from vul_dbgen_spark.operators.dedup import hamming_neighbor_pairs

    names = [
        "Customer#000000001",
        "Customer#000000002",
        "Customer#000000011",  # dist 1 from ...001 (one digit)
        "Customer#000000101",
        "Customer#999999999",
        "Customer#00000001",  # shorter — never pairs with the 18-char ones
        "Supplier#000000001",  # shares length but differs in many positions
        "Customer#000000001",  # exact duplicate of id 1 (distance 0)
    ]
    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(names)], ["id", "name"]
    )
    got = {
        (r.id_a, r.id_b)
        for r in hamming_neighbor_pairs(df, "id", "name", d=1).collect()
    }
    brute = {
        (i, j)
        for i in range(len(names))
        for j in range(i + 1, len(names))
        if len(names[i]) == len(names[j]) and _hamming(names[i], names[j]) <= 1
    }
    assert got == brute
    assert (0, 7) in got  # identical pair (distance 0) found
    assert not any(5 in p for p in got)  # unequal length excluded


def test_hamming_neighbor_pairs_exact_recall_d2(spark):
    """Pigeonhole with 3 interleaved classes: exact for any ≤2-substitution
    pair, including mismatches landing in two different classes."""
    from vul_dbgen_spark.operators.dedup import hamming_neighbor_pairs

    base = "abcdefghij"
    variants = [base]
    # all single substitutions at positions 0, 4, 9; doubles at (0,1), (2,5), (8,9)
    for pos in [(0,), (4,), (9,), (0, 1), (2, 5), (8, 9), (0, 4, 8)]:
        s = list(base)
        for p in pos:
            s[p] = "Z"
        variants.append("".join(s))
    df = spark.createDataFrame(list(enumerate(variants)), ["id", "s"])
    got = {
        (r.id_a, r.id_b)
        for r in hamming_neighbor_pairs(df, "id", "s", d=2).collect()
    }
    brute = {
        (i, j)
        for i in range(len(variants))
        for j in range(i + 1, len(variants))
        if _hamming(variants[i], variants[j]) <= 2
    }
    assert got == brute
    # the triple-substitution variant pairs with singles at shared positions
    # only where true distance ≤ 2 — brute is the spec; containment both ways
    assert (0, 7) not in got  # distance 3 from base: correctly excluded


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_edit_neighbor_pairs_exact_recall_all_edit_kinds(spark):
    """Brute-force containment both ways on a corpus exercising every
    edit kind: substitution, insertion, deletion, identity, distance-2
    near-misses (incl. two deletions that share a variant but must be
    verified away), and the empty/1-char degenerate lengths."""
    from vul_dbgen_spark.operators.dedup import edit_neighbor_pairs

    strings = [
        "kitten",
        "mitten",    # substitution
        "kitte",     # deletion
        "kittens",   # insertion
        "kitchen",   # distance 2 — excluded
        "kiten",     # deletion (of one 't'); also dist 1 from "kitte"? no: lev=2
        "sitting",   # far
        "kitten",    # exact duplicate
        "a",
        "",          # empty — pairs with "a" (one deletion), sequence guard
        "b",         # "a"~"b" substitution, ""~"b" deletion
    ]
    df = spark.createDataFrame(list(enumerate(strings)), ["id", "s"])
    got = {
        (r.id_a, r.id_b)
        for r in edit_neighbor_pairs(df, "id", "s").collect()
    }
    brute = {
        (i, j)
        for i in range(len(strings))
        for j in range(i + 1, len(strings))
        if _lev(strings[i], strings[j]) <= 1
    }
    assert got == brute
    assert (0, 2) in got and (0, 3) in got and (0, 7) in got  # del, ins, dup
    assert (0, 4) not in got  # kitchen: distance 2 despite shared variants
    assert (8, 9) in got and (9, 10) in got  # empty-string edge cases


def test_edit1_equals_hamming1_on_fixed_width_corpus(spark):
    """On an equal-length corpus ed ≤ 1 ⟺ one substitution, so the
    SymSpell blocking and the PassJoin pigeonhole blocking must return
    the identical pair set from structurally different plans — the
    cross-operator differential check fuzzy_pairs_edit1 relies on."""
    from vul_dbgen_spark.operators.dedup import (
        edit_neighbor_pairs,
        hamming_neighbor_pairs,
    )

    names = [f"Customer#{n:09d}" for n in [1, 2, 11, 101, 110, 21, 999999999]]
    df = spark.createDataFrame(list(enumerate(names)), ["id", "s"])
    ed = {(r.id_a, r.id_b) for r in edit_neighbor_pairs(df, "id", "s").collect()}
    hm = {
        (r.id_a, r.id_b)
        for r in hamming_neighbor_pairs(df, "id", "s", d=1).collect()
    }
    assert ed == hm
    assert ed  # non-vacuous: the dense ids do produce neighbors


def test_hamming_key_cap_drops_only_hot_bucket_pairs(spark):
    """max_key_df containment property (the band-cap analog): capped
    pairs ⊆ uncapped pairs; a pair is dropped iff every class it agrees
    on is hot; cold near-dup pairs survive."""
    from vul_dbgen_spark.operators.dedup import hamming_neighbor_pairs

    def interleave(even: str, odd: str) -> str:
        # class 0 holds positions 1,3,5,7 (1-based, (i-1)%2==0) = even arg
        return "".join(a + b for a, b in zip(even, odd))

    rows = []
    # hot class-0 bucket: 16 strings share even-class key "abcd"; two of
    # them ("wxyz"/"wxyQ") are a true distance-1 pair whose OTHER class
    # keys differ — their only meeting bucket is the hot one
    # fillers are pairwise distance-4 in every odd position (sliding
    # alphabet windows) so they add bucket heat without adding pairs
    odds = ["wxyz", "wxyQ"] + [
        chr(65 + i) + chr(70 + i) + chr(75 + i) + chr(80 + i) for i in range(14)
    ]
    for k, o in enumerate(odds):
        rows.append((k, interleave("abcd", o)))
    # cold pair: distinct even-class key "efgh", also distance 1
    rows.append((100, interleave("efgh", "stuv")))
    rows.append((101, interleave("efgh", "stuQ")))
    df = spark.createDataFrame(rows, ["id", "s"])

    uncapped = {
        (r.id_a, r.id_b)
        for r in hamming_neighbor_pairs(df, "id", "s", d=1).collect()
    }
    capped = {
        (r.id_a, r.id_b)
        for r in hamming_neighbor_pairs(df, "id", "s", d=1, max_key_df=10).collect()
    }
    assert capped <= uncapped
    assert (0, 1) in uncapped and (0, 1) not in capped  # hot-only pair dropped
    assert (100, 101) in capped  # cold pair survives
    # nothing else differs: the only dropped pairs are hot-bucket-only
    assert uncapped - capped == {(0, 1)}


def test_edit_key_cap_drops_only_hot_variant_pairs(spark):
    """Same containment property for the SymSpell join: a duplicate
    cluster bigger than the cap loses its intra-cluster pairs (exact
    dedup's job anyway); cold near-dup pairs survive."""
    from vul_dbgen_spark.operators.dedup import edit_neighbor_pairs

    rows = [(i, "duplicate") for i in range(15)]  # hot: all variants shared
    rows += [(100, "kitten"), (101, "mitten")]    # cold substitution pair
    df = spark.createDataFrame(rows, ["id", "s"])
    uncapped = {
        (r.id_a, r.id_b) for r in edit_neighbor_pairs(df, "id", "s").collect()
    }
    capped = {
        (r.id_a, r.id_b)
        for r in edit_neighbor_pairs(df, "id", "s", max_key_df=10).collect()
    }
    assert capped <= uncapped
    assert (100, 101) in capped
    # every dropped pair is intra-hot-cluster (both ids < 100)
    assert all(a < 100 and b < 100 for a, b in uncapped - capped)
    assert len(uncapped - capped) == 15 * 14 // 2  # the whole hot clique


def test_ppjoin_exact_recall_and_boundary(spark):
    """Prefix-filter join vs brute force, including the exact rational
    boundary (38 shared of 39|39 → jaccard 38/40 = 19/20 exactly, must
    be KEPT by the integer verify)."""
    from vul_dbgen_spark.operators.dedup import ppjoin_pairs

    base = [f"t{i}" for i in range(39)]
    rows = [
        (0, base),
        (1, list(base)),                    # identical → 1.0
        (2, base[:-1] + ["x1"]),            # 38/40 = 0.95 → boundary keep
        (3, base[:-2] + ["x1", "x2"]),      # 37/41 < 0.95 → drop
        (4, [f"z{i}" for i in range(10)]),  # disjoint
    ]
    df = spark.createDataFrame(rows, ["id", "toks"])
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in ppjoin_pairs(df, "id", "toks", num=19, den=20).collect()
    }
    brute = {}
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            sa, sb = set(rows[i][1]), set(rows[j][1])
            inter = len(sa & sb)
            if 39 * inter >= 19 * (len(sa) + len(sb)):
                brute[(rows[i][0], rows[j][0])] = round(
                    inter / (len(sa) + len(sb) - inter), 4
                )
    assert got == brute
    assert (0, 2) in got and abs(got[(0, 2)] - 0.95) < 1e-9
    assert (0, 3) not in got and (0, 1) in got


def test_ppjoin_exact_recall_low_threshold_brute(spark):
    """Containment both ways vs brute force at tau = 1/2 over a
    structured family of overlapping subsets."""
    import itertools

    from vul_dbgen_spark.operators.dedup import ppjoin_pairs

    vocab = [f"w{i}" for i in range(12)]
    rows = []
    for i in range(16):
        toks = sorted({vocab[(i * 5 + k * 3) % 12] for k in range(4 + (i % 5))})
        rows.append((i, toks))
    df = spark.createDataFrame(rows, ["id", "toks"])
    got = {
        (r.id_a, r.id_b)
        for r in ppjoin_pairs(df, "id", "toks", num=1, den=2).collect()
    }
    brute = set()
    for (i, a), (j, b) in itertools.combinations(rows, 2):
        sa, sb = set(a), set(b)
        if 3 * len(sa & sb) >= len(sa) + len(sb):
            brute.add((i, j))
    assert got == brute and brute
