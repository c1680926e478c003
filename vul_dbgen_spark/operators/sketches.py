"""Relational probabilistic sketches: Bloom filter and Count-Min.

Both sketches are built as ordinary DataFrames of deterministic
md5-derived hash cells, which buys three things at once:

- **mergeability for free** — a Bloom filter is the DISTINCT of its
  set-bit positions and a CMS is a SUM over (row, bucket) cells, so
  partial sketches from every partition / day / source combine with the
  same hash aggregation Spark already does map-side; this is exactly how
  a 100 TB pipeline maintains them incrementally (union yesterday's cell
  table with today's delta, re-aggregate);
- **engine independence** — md5 is bit-identical everywhere, so a DuckDB
  oracle reproduces the sketch cell-for-cell and the catalog can grade
  these entries with the same exact hash compare as a relational query
  (no "approximately equal" escape hatch);
- **plan transparency** — membership probes and point estimates are
  equi-joins against a bounded cell table (≤ m bits / d·w counters),
  which Spark broadcasts; nothing here is a UDF or a driver loop.

The in-catalog parameters (m = 2^16 bits, d×w = 4×512) are sized for the
graded corpus; the 100 TB deployment note is in each docstring: the cell
table stays broadcastable into the billions of keys (m = 2^30 bits is
128 MiB packed, and the relational form would pack 64 positions per long
with a bit_or aggregate before broadcast — same algebra, 64× fewer rows).

Distinct from `queries/catalog.py`'s sketch entries built on Spark's
native HLL/approx_top_k aggregates: those grade Spark's own sketch
implementations against exactness preconditions; these two are
sketches-as-dataflow, verifiable with no precondition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _hash_mod(col: F.Column, salt: int, mod: int) -> F.Column:
    """Deterministic hash of a string column into [0, mod): the first 8
    hex chars of md5("{salt}:{value}") as an integer. 8 hex chars = 32
    bits, far above any mod used here, and computable verbatim in ANSI
    SQL (('0x' || substr(md5(...), 1, 8))::BIGINT % mod) for the oracle."""
    h = F.md5(F.concat(F.lit(f"{salt}:"), col.cast("string")))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % mod).alias(
        f"h{salt}"
    )


def bloom_build(keys: DataFrame, key_col: str, m: int = 1 << 16, k: int = 4) -> DataFrame:
    """Build a Bloom filter over a key set as its table of set bit
    positions: one row per distinct bit, ≤ min(m, k·|keys|) rows.

    Each key sets k bits h_i(key) = md5-hash_i mod m. The build is a
    stack of k narrow projections plus one DISTINCT — fully map-side
    partial-aggregated, no join. The result is the sketch: union two
    builds and re-DISTINCT to merge filters (same m, k)."""
    key = F.col(key_col)
    bits = None
    for i in range(k):
        b = keys.select(_hash_mod(key, i, m).alias("bit"))
        bits = b if bits is None else bits.union(b)
    return bits.distinct()


def bloom_screen(
    probes: DataFrame,
    probe_col: str,
    bits: DataFrame,
    m: int = 1 << 16,
    k: int = 4,
) -> DataFrame:
    """Probe a Bloom filter: adds ``maybe_member`` (true iff all k bits
    of the probe key are set — no false negatives, tunable false
    positives).

    The probe is relational: explode each key to its k bit positions,
    LEFT SEMI-join the (broadcast) bit table, and a key is a member iff
    all k positions survived. The bit table is bounded by m rows — at
    the catalog's m = 2^16 it broadcasts outright; production m = 2^30
    packs 64 bits/long first (see module docstring) and still
    broadcasts. The big probe side is never shuffled: broadcast join +
    one map-side count-distinct-free aggregation on the probe key."""
    key = F.col(probe_col)
    # membership is decided per distinct KEY: exploding raw probe ROWS
    # would multiply the per-key bit count by the key's multiplicity and
    # the == k test would reject true members — a false NEGATIVE, the
    # one failure a Bloom filter must never have
    pos = probes.select(key.alias("_probe")).distinct().select(
        "_probe",
        F.explode(
            F.array(*[_hash_mod(F.col("_probe"), i, m) for i in range(k)])
        ).alias("bit"),
    )
    hits = (
        pos.join(F.broadcast(bits), "bit", "left_semi")
        .groupBy("_probe")
        .agg(F.count(F.lit(1)).alias("_nbits"))
        .filter(F.col("_nbits") == k)
        .select(F.col("_probe"), F.lit(True).alias("maybe_member"))
    )
    return (
        probes.join(hits, probes[probe_col] == hits["_probe"], "left")
        .drop("_probe")
        .fillna(False, subset=["maybe_member"])
    )


def xx_bloom_bits(df: DataFrame, cols: list[str], m: int, k: int = 3) -> DataFrame:
    """Bit positions of a Bloom filter keyed on a COLUMN TUPLE, hashed
    with xxhash64 — the JVM-cheap family for ENGINE-INTERNAL prefilters
    (join reductions, wedge closing) where no cross-engine oracle needs
    to reproduce the bits. The md5 family above stays the graded path."""
    pos = df.select(
        F.explode(
            F.array(
                *[
                    F.pmod(F.xxhash64(*[F.col(c) for c in cols], F.lit(i)), F.lit(m))
                    for i in range(k)
                ]
            )
        ).alias("bit")
    )
    return pos


def xx_bloom_member_expr(
    cols: list[F.Column], words: F.Column, m: int, k: int = 3
) -> F.Column:
    """Membership test against an xx_bloom_bits/bloom_pack filter: pure
    codegen xxhash + shift/AND — same contract as bloom_member_expr but
    keyed on a column tuple and hashed cheap. ``words`` is a COLUMN
    holding the packed array (broadcast-joined as a 1-row DataFrame via
    :func:`packed_words_df`): a large packed filter must NOT be inlined
    with ``F.lit`` — literal construction walks the list element-wise
    over py4j, minutes for a 2^24-bit filter, where the Arrow path ships
    it in one batch."""
    cond = None
    for i in range(k):
        h = F.pmod(F.xxhash64(*cols, F.lit(i)), F.lit(m))
        bit = (
            F.call_function(
                "shiftrightunsigned",
                F.element_at(words, (h / 64).cast("int") + 1),
                (h % 64).cast("int"),
            ).bitwiseAND(F.lit(1))
            == F.lit(1)
        )
        cond = bit if cond is None else (cond & bit)
    return cond


def packed_words_df(spark, packed, col_name: str = "__bloom_words"):
    """A 1-row DataFrame carrying a packed filter as one array<long>
    cell — Arrow-serialized in one batch, then broadcast-joined next to
    the probe side (the scalar-broadcast shape). This is how a
    multi-megabyte filter rides to executors; F.lit would rebuild it
    element-wise over py4j. Accepts a list or a numpy int64 array (the
    form :func:`bloom_pack` returns); the numpy path never materializes
    a Python object per word."""
    import numpy as np
    import pandas as pd

    arr = np.ascontiguousarray(packed, dtype=np.int64)
    return spark.createDataFrame(pd.DataFrame({col_name: [arr]}))


def bloom_pack(bits: DataFrame, m: int = 1 << 16):
    """Collapse a bit-position table into a packed little-endian word
    array (m/64 signed 64-bit ints, returned as a numpy int64 array) —
    the form a Bloom filter actually ships in. The pack is one tiny
    aggregation (≤ m/64 rows): bounded METADATA, not data — the same
    budget as a broadcast dimension; the packed filter then rides into
    executors via :func:`packed_words_df` (large) or an inlined literal
    (small), exactly like Spark's own runtime bloom pushdown.

    The transfer is Arrow-batched (``toPandas``) and the scatter is one
    numpy indexed assignment: at the triangle census's 2^30-bit cap the
    word table is 16.7M rows, which a row-at-a-time py4j ``collect()``
    would walk in minutes and buffer as Row objects on an 8g driver —
    the Arrow path streams it as a handful of columnar batches
    (~200 MB) and the packed array itself is a single 128 MiB buffer,
    never a per-element Python list."""
    import numpy as np

    words = (
        bits.select(
            (F.col("bit") / 64).cast("int").alias("w"),
            # call_function: the python shiftleft wrapper only takes a
            # literal int shift; the SQL function itself takes a column
            F.call_function(
                "shiftleft", F.lit(1).cast("bigint"), (F.col("bit") % 64).cast("int")
            ).alias("mask"),
        )
        .groupBy("w")
        .agg(F.bit_or("mask").alias("word"))
        .toPandas()
    )
    packed = np.zeros(m // 64, dtype=np.int64)
    if len(words):
        packed[words["w"].to_numpy(dtype=np.int64)] = words["word"].to_numpy(
            dtype=np.int64
        )
    return packed


def bloom_member_expr(
    key: F.Column, packed, m: int = 1 << 16, k: int = 4
) -> F.Column:
    """Pure column-expression membership test against a packed Bloom
    filter: true iff all k bit positions of ``key`` are set. No join, no
    UDF — shifts and ANDs inside whole-stage codegen, so it composes as
    a pre-shuffle semi-join REDUCTION: filter the fact side with the
    dimension's bloom before the shuffle join, shipping only rows that
    can possibly match (plus the filter's false-positive sliver, which
    the exact join then removes — results are provably identical). This
    is the manual form of Spark's runtime row-group bloom pushdown, for
    when the dimension is too big to broadcast but its bloom is not.

    The literal-inline form is for SMALL filters (≤ ~2^20 bits): F.lit
    walks the word list element-wise over py4j. Larger filters ride via
    :func:`packed_words_df` + :func:`xx_bloom_member_expr` instead.
    ``packed`` may be a list or the numpy array :func:`bloom_pack`
    returns (numpy scalars are converted — F.lit rejects np.int64)."""
    words = F.lit([int(w) for w in packed])
    cond = None
    for i in range(k):
        h = _hash_mod(key, i, m)
        bit = (
            F.call_function(
                "shiftrightunsigned",
                F.element_at(words, (h / 64).cast("int") + 1),
                (h % 64).cast("int"),
            ).bitwiseAND(F.lit(1))
            == F.lit(1)
        )
        cond = bit if cond is None else (cond & bit)
    return cond


def cms_build(
    items: DataFrame, item_col: str, depth: int = 4, width: int = 512
) -> DataFrame:
    """Count-Min sketch of an item multiset as its counter table:
    (row, bucket, cnt), ≤ depth·width rows regardless of input size.

    One narrow explode (each item to its depth cells) and one hash
    aggregation — map-side combinable, so the shuffle carries at most
    depth·width·partitions partial counters, not the data. Merging two
    sketches = union + re-sum (same depth/width)."""
    item = F.col(item_col)
    cells = items.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"), _hash_mod(item, i, width).alias("bucket")
                    )
                    for i in range(depth)
                ]
            )
        ).alias("cell")
    )
    return (
        cells.select("cell.row", "cell.bucket")
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    cms: DataFrame,
    queries: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 512,
) -> DataFrame:
    """Point-estimate item frequencies from a CMS counter table: the
    minimum over the item's depth cells. Guaranteed ≥ the true count
    (one-sided error; collisions only ever inflate).

    The counter table is ≤ depth·width rows → broadcast; the probe side
    explodes to depth rows per item and min-reduces back — one
    broadcast join + one map-side-combinable aggregation."""
    item = F.col(item_col)
    probe = queries.select(
        item.alias("item"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"), _hash_mod(item, i, width).alias("bucket")
                    )
                    for i in range(depth)
                ]
            )
        ).alias("cell"),
    ).select("item", "cell.row", "cell.bucket")
    return (
        probe.join(F.broadcast(cms), ["row", "bucket"], "left")
        .groupBy("item")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_count"))
    )
