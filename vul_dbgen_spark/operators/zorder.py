"""Z-order (Morton-curve) data layout: multi-column clustering for
min/max file skipping.

Bucketing (`operators/bucketing.py`) co-locates ONE join key; compaction
(`operators/compaction.py`) fixes file sizes. This operator fixes a
third, orthogonal layout problem: point/range predicates over SEVERAL
columns. Parquet readers skip whole files/row-groups via footer min/max
statistics, but those stats only prune when the writer clustered the
data — a round-robin write leaves every file spanning the full value
range of every column, so nothing is ever skipped. Sorting by one column
prunes that column only. Interleaving the bits of k columns into one
Morton key and range-partitioning + sorting by it keeps files tight in
ALL k dimensions at once (each file covers a small hyper-rectangle of
the value space) — the layout trick behind Delta/Iceberg OPTIMIZE
ZORDER, built here from plain DataFrame expressions.

Scale shape:

- the per-column min/max used for grid scaling is one tiny aggregate
  (driver-side scalars — planning metadata, same footing as the IVF
  centroid table);
- the Morton key itself is pure bit arithmetic in whole-stage codegen
  (no UDF);
- the write is `repartitionByRange` on the key (sampled range
  boundaries — one shuffle, balanced output files) plus an in-partition
  sort, so the cost is exactly one extra shuffle over the rewrite that
  compaction would do anyway;
- readers need NO cooperation: pruning comes from standard parquet
  row-group stats on the original columns.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZKEY = "_zkey"


def column_ranges(df: DataFrame, cols: list[str]) -> dict[str, tuple[float, float]]:
    """Per-column (min, max) in one aggregate pass — the only
    driver-side materialization in this module (k scalars)."""
    aggs = []
    for c in cols:
        aggs.append(F.min(F.col(c).cast("double")).alias(f"min_{c}"))
        aggs.append(F.max(F.col(c).cast("double")).alias(f"max_{c}"))
    row = df.agg(*aggs).collect()[0]
    return {c: (row[f"min_{c}"], row[f"max_{c}"]) for c in cols}


def _grid_cell(col: str, lo: float, hi: float, bits: int) -> Column:
    """Linear min-max scale to an integer cell in [0, 2**bits)."""
    span = hi - lo
    if span <= 0:  # constant column: every row in cell 0
        return F.lit(0).cast("long")
    cells = 1 << bits
    raw = F.floor((F.col(col).cast("double") - F.lit(lo)) / F.lit(span) * cells)
    # x == hi lands on 2**bits; nulls sort with the minimum
    clamped = F.least(F.greatest(raw, F.lit(0)), F.lit(cells - 1))
    return F.coalesce(clamped, F.lit(0)).cast("long")


def morton_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    ranges: dict[str, tuple[float, float]] | None = None,
) -> Column:
    """Bit-interleaved Morton key over ``cols`` (pure codegen bitwise
    expressions: ((cell_j >> i) & 1) << (i*k + j), OR-folded)."""
    if ranges is None:
        ranges = column_ranges(df, cols)
    k = len(cols)
    cells = [_grid_cell(c, *ranges[c], bits) for c in cols]
    terms: list[Column] = []
    for i in range(bits):
        for j, cell in enumerate(cells):
            bit = F.shiftright(cell, i).bitwiseAND(F.lit(1))
            terms.append(F.shiftleft(bit, i * k + j))
    return reduce(lambda a, b: a.bitwiseOR(b), terms).alias(ZKEY)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int,
    bits: int = 16,
) -> None:
    """Rewrite ``df`` at ``path`` clustered on the Morton key of
    ``cols``: range-partition into ``n_files`` key ranges (balanced via
    sampled boundaries), sort within each, drop the key. The files keep
    the clustered row order, so parquet min/max stats on the ORIGINAL
    columns become tight per file."""
    keyed = df.withColumn(ZKEY, morton_key(df, cols, bits))
    (
        keyed.repartitionByRange(n_files, F.col(ZKEY))
        .sortWithinPartitions(ZKEY)
        .drop(ZKEY)
        .write.mode("overwrite")
        .parquet(path)
    )
