"""Sequence packing — assign documents to fixed-token-budget training
bins. The pretraining data loader wants ~budget-token concatenations;
assigning each document a (shard, bin) pair IS the distributable part of
that job (the in-bin concatenation is a row-local downstream step).

Strategy: *offset binning*. Documents are ordered deterministically
(by id) within deterministic shards (id mod n_shards), a running token
cumsum is taken per shard, and a document's bin is
``floor(start_offset / budget)`` where start_offset is the cumsum before
the document. A document that straddles a budget boundary belongs to the
bin it starts in (the loader truncates or spills the tail — standard
practice; exact first-fit bin packing is NP-hard and, worse for us, its
greedy approximations are inherently sequential state machines).

Why this shape and not greedy first-fit:

- It is a pure window function — one shuffle on ``shard``, then a
  sorted cumsum per partition; Spark executes it as a single
  WindowExec with no UDF, and it scales to any corpus that hashes
  evenly over shards (pick n_shards >= cluster cores).
- It is deterministic and engine-independent, so a SQL oracle verifies
  it bit-for-bit — greedy packing's bin state cannot be expressed
  without a sequential recursion.
- Packing quality: every bin except the last per shard receives at
  least ``budget`` tokens of starts, so average fill is within one
  document of budget — the same bound greedy next-fit gives.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import token_count


def pack_offset_bins(
    df: DataFrame,
    id_col: str,
    text_col: str,
    budget: int = 2048,
    n_shards: int = 16,
) -> DataFrame:
    """Per-document packing assignment: (id, shard, bin, n_tokens,
    start_offset). Deterministic in (id, budget, n_shards) only.

    One shuffle (hash on shard), one sort per partition — the plan is a
    single Exchange + WindowExec. At 100 TB the shard count is the
    parallelism knob: shards are independent, skew-free (mod over a
    dense id is uniform), and a bin never crosses a shard, so bins can
    be written out partitioned by shard with no further movement.
    """
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.select(
            F.col(id_col),
            (F.col(id_col) % n_shards).alias("shard"),
            token_count(text_col).cast("bigint").alias("n_tokens"),
        )
        .withColumn("start_offset", F.sum("n_tokens").over(w) - F.col("n_tokens"))
        .withColumn("bin", F.floor(F.col("start_offset") / budget))
        .select(id_col, "shard", "bin", "n_tokens", "start_offset")
    )


def pack_bin_summary(assignment: DataFrame) -> DataFrame:
    """Fill statistics per (shard, bin): doc count and token sum — the
    packing-quality monitor (map-side-combinable hash agg)."""
    return assignment.groupBy("shard", "bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("bin_tokens"),
    )
