#!/usr/bin/env python
"""Generate a documents-only sf3 slice (3x sf1 = 150k docs) into
fixtures/sf3docs — the third scale point for the incremental
delta-vs-corpus dedup screen (round-3 directive #8).

dedup_incremental at sf1 measured 0.9x vs sf0.1: pure fixed-overhead
amortization, proving nothing about the LEFT-SEMI screen's slope. This
slice reuses gen_sf1's document sampler (same empirical unigram
distribution, same per-source histogram, exact-duplicate injection at
the same observed rate — 240 per 150k) so the per-row semantics match
the sf1 point exactly and only the corpus size moves.

A second, 10x-of-sf1 slice (500k docs → fixtures/sf10docs) exists for
the same reason one level up: 150k docs still runs in <1 s on local[32]
(fixed overhead dominates), so the slope needs a point where data cost
is visible.

Usage: python tools/gen_sf3_docs.py [sf3|sf10] [outdir]
Deterministic: numpy PCG64 seed 43/44 (distinct from sf1's 42 so the
corpora are independent draws from the same distribution).
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gen_sf1 import gen_documents  # noqa: E402

SLICES = {
    # tag -> (n_docs, n_dup at the observed ~16/10k rate, rng seed)
    "sf3": (150_000, 240, 43),
    "sf10": (500_000, 800, 44),
}


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "sf3"
    n, n_dup, seed = SLICES[tag]
    outdir = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "fixtures",
        f"{tag}docs",
    )
    os.makedirs(outdir, exist_ok=True)
    con = duckdb.connect()
    rng = np.random.default_rng(seed)
    gen_documents(con, outdir, rng, n=n, n_dup=n_dup)
    con.close()
    print(f"{tag} documents written to {outdir}")


if __name__ == "__main__":
    main()
