#!/usr/bin/env python
"""Generate a deterministic sf1 dataset (10x sf0.1) into fixtures/sf1.

The driver ships sf{0.001,0.01,0.1}; every sf0.1 number in the bench is
overhead-dominated (nothing exceeds ~2.4 s on local[32]), so the scaling
slope the 100 TB claims rest on needs at least one 10x point. This
script builds it locally, seeded, without touching /root/testdata:

- region/nation: copied (fixed-size dimensions, like TPC-H).
- customer/supplier/part/orders/lineitem/events: the sf0.1 table
  replicated 10x with key offsets (keys are dense 0..N-1, stride = N).
  Foreign keys are offset consistently, so join fan-outs, group sizes,
  filter selectivities (e.g. q9's '%red%' parts), per-user event
  densities, and the event time range are preserved EXACTLY — each
  replica is an independent shard of the same world, which is how a
  10x-bigger day of traffic actually looks.
- documents/embeddings: freshly SAMPLED from the sf0.1 empirical
  distributions (unigram token frequencies + per-source token-count
  histogram; per-label embedding mean/std), NOT replicated — replicating
  text/vectors would make every row a near-duplicate of its 9 clones and
  blow the dedup/LSH pair counts quadratically, benchmarking an input
  pathology instead of the operator. Exact-duplicate documents are
  injected at the observed sf0.1 rate (~16/10k docs).

Output sizes: lineitem 6M, orders 1.5M, events 1M, customer 150k,
part 200k, supplier 10k, documents 50k, embeddings 20k.

Usage: python tools/gen_sf1.py [outdir]   (default fixtures/sf1)
Deterministic: numpy PCG64 seed 42 throughout.
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
REPS = 10

# (table, [(key_column, stride)]) — stride = dense key-space size at sf0.1
OFFSET_TABLES = {
    "customer": [("c_custkey", 15_000)],
    "supplier": [("s_suppkey", 1_000)],
    "part": [("p_partkey", 20_000)],
    "orders": [("o_orderkey", 150_000), ("o_custkey", 15_000)],
    "lineitem": [
        ("l_orderkey", 150_000),
        ("l_partkey", 20_000),
        ("l_suppkey", 1_000),
    ],
    "events": [("event_id", 100_000), ("user_id", 1_500)],
}


def replicate_offset(con, name: str, outdir: str) -> None:
    tbl = pq.read_table(f"{SRC}/{name}.parquet")
    cols = {c: tbl.column(c) for c in tbl.column_names}
    pieces = []
    for rep in range(REPS):
        shifted = {}
        for c in tbl.column_names:
            arr = cols[c]
            stride = dict(OFFSET_TABLES[name]).get(c)
            if stride is not None and rep > 0:
                arr = pa.compute.add(arr, rep * stride)
            shifted[c] = arr
        pieces.append(pa.table(shifted, schema=tbl.schema))
    out = pa.concat_tables(pieces)
    pq.write_table(out, f"{outdir}/{name}.parquet")
    print(f"{name}: {out.num_rows} rows")


def gen_documents(
    con, outdir: str, rng: np.random.Generator, n: int = 50_000, n_dup: int = 80
) -> None:
    # empirical unigram distribution + per-source token-count histogram
    toks = con.sql(
        f"""
        SELECT tok, count(*) c FROM (
          SELECT unnest(string_split(text, ' ')) AS tok
          FROM '{SRC}/documents.parquet')
        WHERE tok <> '' GROUP BY tok ORDER BY tok
        """
    ).fetchall()
    vocab = np.array([t for t, _ in toks])
    freq = np.array([c for _, c in toks], dtype=np.float64)
    freq /= freq.sum()
    lens = con.sql(
        f"SELECT len(string_split(text, ' ')) FROM '{SRC}/documents.parquet'"
    ).df().iloc[:, 0].to_numpy()
    langs, lang_p = np.unique(
        con.sql(f"SELECT lang FROM '{SRC}/documents.parquet'").df().iloc[:, 0],
        return_counts=True,
    )
    lang_p = lang_p / lang_p.sum()

    n_sources = 20
    doc_len = rng.choice(lens, size=n)
    doc_lang = rng.choice(langs, size=n, p=lang_p)
    texts = []
    for i in range(n):
        texts.append(" ".join(rng.choice(vocab, size=int(doc_len[i]), p=freq)))
    # exact-duplicate injection at the observed sf0.1 rate (~16 per 10k):
    # duplicate doc i's text onto doc i+1 for ~80 sampled positions
    for i in rng.choice(n - 1, size=n_dup, replace=False):
        texts[i + 1] = texts[i]
    out = pa.table(
        {
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(doc_lang.tolist()),
            "source": pa.array([f"src{i % n_sources}" for i in range(n)]),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(out, f"{outdir}/documents.parquet")
    print(f"documents: {n} rows")


def gen_embeddings(con, outdir: str, rng: np.random.Generator) -> None:
    """sf1 embeddings (20k) + a matched 2k baseline under sf0.1syn/.

    Near-duplicate injection (2%): the driver's synthetic vectors are
    near-uniform on the sphere — zero pairs above cos 0.55 at any SF —
    so a high-threshold dedup there is vacuous and a low-threshold one
    has Θ(n²) TRUE pairs (701 @ 2k vecs → ~70k @ 20k), making any
    exact-recall candidate generator quadratic by problem statement.
    Real corpora look different: duplicates are a small rate of
    high-cosine pairs. 2% of vectors are near-copies (cos ≈ 0.995) of
    an earlier vector, so the production LSH config (0.9 threshold,
    12x12 bands) has a linear-in-n output to measure, and the 2k
    baseline shares the generator + dup rate for an apples-to-apples
    sf1/sf0.1 ratio."""
    df = con.sql(f"SELECT label, embedding FROM '{SRC}/embeddings.parquet'").df()
    by_label = {}
    for lbl, grp in df.groupby("label"):
        m = np.vstack(grp["embedding"].to_numpy())
        by_label[int(lbl)] = (m.mean(axis=0), m.std(axis=0))

    def make(n: int, subdir: str) -> None:
        labels = rng.integers(0, len(by_label), size=n)
        vecs = np.empty((n, 64), dtype=np.float32)
        for lbl, (mu, sd) in by_label.items():
            mask = labels == lbl
            vecs[mask] = rng.normal(mu, sd, size=(mask.sum(), 64)).astype(np.float32)
        # 2% near-copies: vector i duplicates an earlier vector j with
        # ~0.5% relative noise (cos >= ~0.99)
        n_dup = n // 50
        dup_dst = rng.choice(np.arange(1, n), size=n_dup, replace=False)
        for i in dup_dst:
            j = rng.integers(0, i)
            noise = rng.normal(0, 0.005 * np.abs(vecs[j]).mean(), size=64)
            vecs[i] = vecs[j] + noise.astype(np.float32)
            labels[i] = labels[j]
        os.makedirs(subdir, exist_ok=True)
        out = pa.table(
            {
                "vec_id": pa.array(np.arange(n), pa.int64()),
                "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
                "label": pa.array(labels.astype(np.int32), pa.int32()),
            }
        )
        pq.write_table(out, f"{subdir}/embeddings.parquet")
        print(f"embeddings[{subdir}]: {n} rows ({n_dup} near-dups injected)")

    make(20_000, outdir)
    make(2_000, os.path.join(os.path.dirname(outdir), "sf0.1syn"))


def main() -> None:
    outdir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures", "sf1"
    )
    os.makedirs(outdir, exist_ok=True)
    con = duckdb.connect()
    rng = np.random.default_rng(42)
    for name in ["region", "nation"]:
        tbl = pq.read_table(f"{SRC}/{name}.parquet")
        pq.write_table(tbl, f"{outdir}/{name}.parquet")
        print(f"{name}: {tbl.num_rows} rows (copied)")
    for name in OFFSET_TABLES:
        replicate_offset(con, name, outdir)
    gen_documents(con, outdir, rng)
    gen_embeddings(con, outdir, rng)
    con.close()
    print(f"sf1 written to {outdir}")


if __name__ == "__main__":
    main()
