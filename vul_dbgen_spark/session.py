"""SparkSession factory tuned for this engine.

Local test profile: one JVM, ``local[N]`` threads. The same settings scale
to a real cluster — AQE handles runtime coalescing/skew, shuffle partition
count is a starting point that AQE re-plans, and the UTC session timezone
pins timestamp semantics to the DuckDB oracle's UTC-naive timestamps.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _pythonpath_with_repo() -> str:
    existing = os.environ.get("PYTHONPATH", "")
    return f"{_REPO_ROOT}:{existing}" if existing else _REPO_ROOT


def apply_testdata_confs(spark: SparkSession) -> None:
    """Defensive runtime confs for sessions we didn't build (the driver
    harness hands us its own). Both are read at schema-inference time, so
    setting them immediately before a read is sufficient."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")


def normalize_event_ts(df):
    """Return ``df`` with ``ts`` as session-tz TimestampType regardless of
    how the parquet stored it: long nanos (TIMESTAMP(NANOS) under
    ``nanosAsLong`` — round-1 testdata), TIMESTAMP_NTZ (tz-less
    timestamp[us] when NTZ inference is on), or already TimestampType.
    All conversions are JVM-side column expressions."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    t = df.schema["ts"].dataType
    if isinstance(t, LongType):
        # microsecond-aligned nanos → lossless div
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if isinstance(t, TimestampNTZType):
        # wall-clock-preserving under the UTC session timezone
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def get_spark(
    app_name: str = "vul_dbgen_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    ``SPARK_GRAFT_CPUS`` overrides parallelism (driver harness contract).
    On a real cluster the master/memory settings come from spark-submit and
    everything here except local[] still applies.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if shuffle_partitions is None:
        # local mode: ~cores, not the 200 default (right for 100TB clusters,
        # wrong for one box). AQE coalesces further at runtime.
        shuffle_partitions = max(cpus, 8)

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # 24g (was 64g, before that 48g): on this box the GC-heavy sf1
        # graph rows swing 2-4x run to run at big heaps — the wobble the
        # round-4 verdict spent a forensic section on — and the A/B is
        # decisive: LPA@sf1 draws (79, 34, 75) s at 64g and (105, 26) s
        # mid-range at 32g vs (24, 21, 23) s at 24g; triangle census
        # (59, 31) → (34, 22, 21) s. A 64g G1 heap accumulates a huge
        # live+garbage region set between collections and the evacuation
        # pauses land mid-query; at 24g collections are frequent and
        # short, and every sf1 query still fits with head-room (peak
        # observed usage is broadcast relations + shuffle buffers, ~2g).
        # The round-3 note about 48g GCLocker stalls ("Retried waiting
        # for GCLocker too often") did NOT reproduce at 24g across 30+
        # heavy draws; if it ever returns, prefer tuning young-gen /
        # pause targets over growing the heap past the pause cliff.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # events.parquet uses TIMESTAMP(NANOS) which Spark's vectorized
        # reader rejects; read as long and convert (lossless: the data is
        # microsecond-aligned). Keeps the scan distributed.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # testdata timestamps are tz-less timestamp[us]; read them as
        # session-tz TimestampType (legacy behavior) so literal compares,
        # window functions, and the DuckDB oracle (UTC-naive) all agree
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        # Python workers must import this package for the Arrow UDFs
        # (version comparator, range parsers) regardless of the driver's
        # cwd; on a real cluster the equivalent is --py-files
        .config("spark.executorEnv.PYTHONPATH", _pythonpath_with_repo())
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
