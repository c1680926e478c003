"""Dataset-lifecycle integration: stream landing → compaction → z-order.

The three maintenance operators are tested individually elsewhere
(test_streaming, test_compaction, test_zorder); this exercises them as
the pipeline a long-lived 100 TB dataset actually runs — a streaming
foreachBatch sink lands many small partitioned files, compaction
rewrites them into sized files, the z-order rewrite clusters the result
for multi-column pruning — and asserts the one invariant that matters
across every stage: no row lost, no row duplicated, layout measurably
improved."""

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from vul_dbgen_spark import streaming as ST
from vul_dbgen_spark.operators.compaction import compact_parquet
from vul_dbgen_spark.operators.zorder import column_ranges, write_zordered

SF = "/root/testdata/sf0.001"


def _ids(df):
    return sorted(r.event_id for r in df.select("event_id").collect())


def test_stream_compact_zorder_lifecycle(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("lifecycle")
    raw, compacted, zpath = str(base / "raw"), str(base / "compact"), str(base / "z")

    # stage 1: stream lands as partitioned parquet (many small files)
    ST.stream_to_partitioned_sink(ST.events_stream(spark, SF), raw, "event_type")
    landed = spark.read.parquet(raw)
    source = spark.read.parquet(f"{SF}/events.parquet")
    assert landed.count() == source.count()

    # stage 2: compact to ~sized files (tiny target → deterministic >1)
    n_files = compact_parquet(spark, raw, compacted, target_file_bytes=64 * 1024)
    comp = spark.read.parquet(compacted)
    assert comp.count() == source.count()
    assert len(glob.glob(f"{compacted}/*.parquet")) == n_files
    assert _ids(comp) == _ids(source)

    # stage 3: z-order the compacted set on (user_id, value)
    write_zordered(comp, zpath, ["user_id", "value"], n_files=4)
    z = spark.read.parquet(zpath)
    assert _ids(z) == _ids(source)
    assert z.filter(F.col("batch_id").isNull()).count() == 0  # lineage stamp survives

    # layout improved: per-file user_id spans in the z layout are
    # tighter than the compacted (round-robin) layout
    def spans(path):
        out = []
        for f in sorted(glob.glob(f"{path}/*.parquet")):
            md = pq.ParquetFile(f).metadata
            idx = md.schema.names.index("user_id")
            st = md.row_group(0).column(idx).statistics
            lo, hi = st.min, st.max
            for rg in range(1, md.num_row_groups):
                s = md.row_group(rg).column(idx).statistics
                lo, hi = min(lo, s.min), max(hi, s.max)
            out.append(hi - lo)
        return out

    lo_z, hi_z = column_ranges(z, ["user_id"])["user_id"]
    full_span = hi_z - lo_z
    z_spans = spans(zpath)
    comp_spans = spans(compacted)
    assert sum(z_spans) / len(z_spans) < sum(comp_spans) / len(comp_spans)
    assert min(z_spans) < full_span  # at least one genuinely tight file
