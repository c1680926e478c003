"""Bucketed-table co-located joins: the shuffle-free repeated-join path.

At 100 TB the dominant recurring cost of the star joins (orders ⋈
lineitem, vulns ⋈ nvd) is re-shuffling both sides on the join key for
every run. Spark's datasource bucketing amortizes that: write each side
``bucketBy(n, key)`` once, and every subsequent equi-join on that key
reads co-located buckets — the physical plan contains NO Exchange on
either side (asserted in tests/test_bucketing.py). This is the batch
analog of the reference's long-lived keyed memdb (it re-reads the same
keyed store every update cycle instead of re-grouping, memdb.go:288-316).

Rules that make it work (and that the helpers enforce):

- both sides bucketed with the SAME bucket count on the join key
  (mismatched counts shuffle the smaller side in Spark <4; equal counts
  never shuffle);
- ``sortBy`` the key within buckets so the sort-merge join also skips
  the per-task Sort (consumed behind
  ``spark.sql.legacy.bucketedTableScan.outputOrdering`` since 3.0, and
  only when every bucket is a single file — which the writer here
  guarantees by pre-repartitioning on the bucket column);
- bucket pruning: equality filters on the bucket key scan 1/n of the
  files (Catalyst's BucketPruning rule — visible as "SelectedBucketsCount"
  in the scan node).

Bucket count sizing at 100 TB: target ~128 MB of post-compression data
per bucket per side, i.e. thousands of buckets — the same arithmetic as
shuffle partitions, but paid once at write time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and in-bucket sorted) table.

    Bucketing metadata lives in the session catalog — ``saveAsTable`` is
    required (a bare parquet write loses the bucket spec). ``path`` makes
    it an external table so tests can target a tmp dir.

    The pre-write ``repartition`` on the bucket column produces exactly
    one file per bucket: with multiple files per bucket Spark cannot
    trust in-bucket sortedness and reinstates the per-task Sort under
    the sort-merge join. (At 100 TB, one file per bucket is the point
    of sizing thousands of buckets at ~128 MB each.)
    """
    from pyspark.sql import functions as F

    df = df.repartition(n_buckets, F.col(bucket_col))
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, on: str | list[str]
) -> DataFrame:
    """Equi-join two same-bucketed tables; with both sides bucketed on
    the join key at equal counts this plans as an Exchange-free
    sort-merge join (bucket = pre-shuffled partition)."""
    return spark.table(left_table).join(spark.table(right_table), on)
