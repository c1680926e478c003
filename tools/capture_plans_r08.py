#!/usr/bin/env python
"""Capture .explain("formatted") for catalog queries into plans/r08/.

Usage: python tools/capture_plans_r08.py <suffix> <query> [<query> ...]
Writes plans/r08/<query>_<suffix>.txt  (suffix: before | after)

For iterative operators whose catalog entry returns a checkpointed
result (the final explain is just an RDD scan), the capture ALSO renders
the representative inner lazy plans where the operator exposes them
(triangle census via materialize=False, one pagerank/LPA round, the LSH
candidate plans) so the join strategies/exchanges are visible.
"""
from __future__ import annotations

import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r08"
)


def _fmt(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _inner_plans(spark, sf_dir, name) -> list[tuple[str, str]]:
    """Representative lazy inner plans for iterative/eager entries."""
    from vul_dbgen_spark.queries import catalog as C

    out = []
    if name == "graph_triangle_stats":
        from vul_dbgen_spark.operators.graph import triangle_stats

        lazy = triangle_stats(
            C._cooc_edges(spark, sf_dir), "u", "v", materialize=False
        )
        out.append(("full census plan (materialize=False)", _fmt(lazy)))
    elif name == "graph_pagerank_parts":
        from pyspark import StorageLevel

        e = C._seq_edges(spark, sf_dir).filter(F.col("s") != F.col("d")).distinct()
        outdeg = e.groupBy("s").agg(F.count(F.lit(1)).alias("outdeg"))
        ew = e.join(outdeg, "s").repartition("d").persist(StorageLevel.MEMORY_AND_DISK)
        ew.count()
        nodes = (
            C.load(spark, sf_dir, "part")
            .select(F.col("p_partkey").alias("node"))
            .withColumn("has_out", F.lit(True))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        nodes.count()
        ranks = nodes.select("node", "has_out", F.lit(0.1).alias("rank")).localCheckpoint()
        dang = ranks.filter(~F.col("has_out")).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dang")
        )
        # round-8 broadcast posture: ranks broadcast into the d-partitioned
        # edge cache, contribution table broadcast into the update join
        contrib = (
            ew.join(F.broadcast(ranks), ew["s"] == ranks["node"])
            .select(F.col("d"), (F.col("rank") / F.col("outdeg")).alias("c"))
            .groupBy("d")
            .agg(F.sum("c").alias("contrib"))
        )
        rnd = (
            nodes.join(F.broadcast(contrib), nodes["node"] == contrib["d"], "left")
            .join(F.broadcast(dang))
            .select(
                "node",
                "has_out",
                (
                    F.lit(0.15 / 1000.0)
                    + F.lit(0.85)
                    * (
                        F.coalesce(F.col("contrib"), F.lit(0.0))
                        + F.col("__dang") / 1000.0
                    )
                ).alias("rank"),
            )
        )
        out.append(("one power-iteration round (pre-checkpoint)", _fmt(rnd)))
        ew.unpersist()
        nodes.unpersist()
    elif name == "graph_label_propagation":
        from pyspark import StorageLevel
        from vul_dbgen_spark.operators.graph import _symmetrize

        sym = (
            _symmetrize(C._cooc_edges(spark, sf_dir), "u", "v")
            .repartition("v")
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        sym.count()
        nodes = C.load(spark, sf_dir, "part").select(
            F.col("p_partkey").alias("node")
        )
        labels = nodes.select("node", F.col("node").alias("label")).localCheckpoint()
        cnt = (
            sym.join(F.broadcast(labels), sym["u"] == labels["node"])
            .select(F.col("v").alias("n2"), "label")
            .groupBy("n2", "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        # round-8 packed-long argmax (HashAggregate instead of the
        # struct-max SortAggregate)
        INV = (1 << 31) - 1
        arg = (
            cnt.groupBy("n2")
            .agg(
                F.max(
                    F.shiftleft(F.col("c"), 32).bitwiseOR(F.lit(INV) - F.col("label"))
                ).alias("p")
            )
            .select(
                F.col("n2").alias("node"),
                (F.lit(INV) - F.col("p").bitwiseAND(F.lit((1 << 32) - 1))).alias(
                    "new_label"
                ),
            )
        )
        rnd = labels.join(F.broadcast(arg), "node", "left").select(
            "node", F.coalesce("new_label", "label").alias("label")
        )
        out.append(("one LPA round (broadcast posture, pre-checkpoint)", _fmt(rnd)))
        sym.unpersist()
    elif name == "graph_khop_reach":
        e = (
            C._seq_edges(spark, sf_dir)
            .filter(F.col("s") != F.col("d"))
            .distinct()
            .localCheckpoint()
        )
        seeds = (
            C.load(spark, sf_dir, "part")
            .filter(F.col("p_size") == 50)
            .select(F.col("p_partkey").alias("node"))
            .distinct()
            .localCheckpoint()
        )
        nxt = (
            e.join(seeds, e["s"] == seeds["node"])
            .select(F.col("d").alias("node"))
            .distinct()
            .join(seeds.select("node"), "node", "left_anti")
        )
        out.append(("one BFS expansion round (pre-checkpoint)", _fmt(nxt)))
    elif name == "dedup_clusters":
        from vul_dbgen_spark.operators.dedup import minhash_lsh_pairs

        docs = C.load(spark, sf_dir, "documents")
        pairs = minhash_lsh_pairs(docs, "doc_id", "text")
        out.append(("LSH candidate-pair plan", _fmt(pairs)))
    return out


def main():
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(OUT_DIR, exist_ok=True)
    from vul_dbgen_spark.queries.catalog import REGISTRY
    from vul_dbgen_spark.session import get_spark

    spark = get_spark("capture_plans_r08")
    for name in names:
        spec = REGISTRY[name]
        buf = io.StringIO()
        buf.write(f"# {name} — explain('formatted') at {sf_dir} ({suffix})\n")
        df = spec.fn(spark, sf_dir)
        buf.write("\n## top-level returned plan\n")
        buf.write(_fmt(df))
        for title, text in _inner_plans(spark, sf_dir, name):
            buf.write(f"\n## {title}\n")
            buf.write(text)
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}", file=sys.stderr)
        spark.catalog.clearCache()
        jsc = spark.sparkContext._jsc
        for rdd in list(jsc.getPersistentRDDs().values()):
            rdd.unpersist()


if __name__ == "__main__":
    main()
