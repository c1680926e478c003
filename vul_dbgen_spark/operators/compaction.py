"""Small-file compaction: rewrite a parquet dataset into sized files.

The silent killer of 100 TB table scans is not data volume but file
count: a stream/foreachBatch sink or an over-partitioned write leaves
thousands of KB-scale files, and every downstream scan pays per-file
open/footer costs plus task-scheduling overhead (one task per tiny
split). Periodic compaction to ~target-size files restores scan
efficiency; this is the maintenance operator every long-lived dataset
needs (the batch analog of a streaming sink's file retention policy).

Sizing is measured, not guessed: the actual on-disk byte size is listed
through the Hadoop FileSystem API (works for file://, hdfs://, s3a://
alike), and the rewrite repartitions to ceil(bytes / target). Contents
are preserved exactly (asserted in tests/test_compaction.py).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession


def dataset_bytes(spark: SparkSession, path: str) -> int:
    """Total on-disk bytes of a dataset directory via the Hadoop FS API
    (driver-side metadata listing — no data read)."""
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(jsc.hadoopConfiguration())
    return fs.getContentSummary(hpath).getLength()


def compact_parquet(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite ``in_path`` into ``out_path`` with ~target-sized files.

    Returns the number of output files requested. Round-robin
    repartition (no column) spreads rows evenly regardless of the input
    skew; partition-column layouts should compact per-partition instead
    (pass the partition subdirectory as ``in_path``).
    """
    df = spark.read.parquet(in_path)
    total = dataset_bytes(spark, in_path)
    n_files = max(1, math.ceil(total / target_file_bytes))
    df.repartition(n_files).write.mode("overwrite").parquet(out_path)
    return n_files


def needs_compaction(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    slack: float = 4.0,
) -> bool:
    """True when the dataset has ``slack``× more files than its byte
    size warrants — the cheap health check a maintenance job runs before
    paying for a rewrite."""
    df = spark.read.parquet(path)
    n_files = len(df.inputFiles())
    total = dataset_bytes(spark, path)
    ideal = max(1, math.ceil(total / target_file_bytes))
    return n_files > slack * ideal
