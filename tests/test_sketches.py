"""Preconditions of the exactly-graded sketch entries.

heavy_hitters_tokens is hash-graded against an exact oracle on the
strength of one precondition: approx_top_k(item, 1000, 1000) tracks the
ENTIRE vocabulary, making the sketch provably exact. If the corpus
vocabulary ever exceeds maxItemsTracked (a bigger SF, a generator
change), the sketch silently becomes approximate and the oracle
mismatch would surface as an inscrutable hash red — this test turns
that into a named failure at every SF the driver touches."""

import duckdb
import pytest

from vul_dbgen_spark.queries.catalog import _TOKS_SQL

HH_MAX_ITEMS_TRACKED = 1000


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01", "sf0.1"])
def test_vocab_within_heavy_hitters_sketch_capacity(sf):
    con = duckdb.connect()
    vocab = con.sql(
        f"""
        WITH toks AS (SELECT {_TOKS_SQL} AS toks
                      FROM '/root/testdata/{sf}/documents.parquet')
        SELECT count(DISTINCT item) FROM (SELECT unnest(toks) AS item FROM toks)
        """
    ).fetchone()[0]
    con.close()
    assert vocab <= HH_MAX_ITEMS_TRACKED, (
        f"{sf}: vocabulary {vocab} exceeds approx_top_k maxItemsTracked "
        f"{HH_MAX_ITEMS_TRACKED} — heavy_hitters_tokens is no longer exact; "
        f"raise the sketch size in the catalog entry"
    )
