#!/usr/bin/env python
"""Capture .explain("formatted") for catalog queries into plans/r09/.

Usage: python tools/capture_plans_r09.py <suffix> <query> [<query> ...]
Writes plans/r09/<query>_<suffix>.txt  (suffix: before | after)

For iterative operators whose catalog entry returns a checkpointed
result (the final explain is just an RDD scan), the capture ALSO renders
the representative inner lazy plans — ONE loop round / gradient pass —
hand-built to match the operator code of the tree being captured
(suffix "before" renders the round-8 shapes, "after" the round-9 ones),
so the claimed plan deltas are visible and checkable.
"""
from __future__ import annotations

import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Observation  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r09"
)


def _fmt(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _cc_round(spark, sf_dir, after: bool):
    from pyspark import StorageLevel

    from vul_dbgen_spark.operators.dedup import minhash_lsh_pairs
    from vul_dbgen_spark.queries import catalog as C

    docs = C.load(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, "doc_id", "text")
    sym = (
        pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
        .union(pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    if after:
        sym = sym.repartition("v")
    sym = sym.persist(StorageLevel.MEMORY_AND_DISK)
    sym.count()
    lbl = (
        docs.select(F.col("doc_id").alias("node"))
        .select("node", F.col("node").alias("component"))
        .localCheckpoint()
    )
    jump = lbl.select(
        F.col("node").alias("component"), F.col("component").alias("jumped")
    )
    if after:
        nbr = (
            sym.join(F.broadcast(lbl), sym["u"] == lbl["node"])
            .select(F.col("v").alias("node"), F.col("component"))
            .groupBy("node")
            .agg(F.min("component").alias("__nbr"))
        )
        hooked = lbl.join(F.broadcast(nbr), "node", "left").select(
            "node",
            F.least(
                F.col("component"), F.coalesce("__nbr", F.col("component"))
            ).alias("component"),
        )
        step = hooked.join(F.broadcast(jump), "component", "left").select(
            "node", F.coalesce("jumped", F.col("component")).alias("component")
        )
    else:
        msgs = sym.join(lbl, sym["u"] == lbl["node"]).select(
            F.col("v").alias("node"), F.col("component")
        )
        hooked = (
            lbl.unionByName(msgs)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        )
        step = hooked.join(jump, "component", "left").select(
            "node", F.coalesce("jumped", F.col("component")).alias("component")
        )
    out = [("one hook+jump CC round (pre-checkpoint)", _fmt(step))]
    sym.unpersist()
    return out


def _khop_round(spark, sf_dir, after: bool):
    from vul_dbgen_spark.queries import catalog as C

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
    if after:
        obs = Observation()
        nxt = nxt.observe(obs, F.count(F.lit(1)).alias("n"))
    return [("one BFS expansion round (pre-checkpoint)", _fmt(nxt))]


def _lpa_parts(spark, sf_dir, after: bool):
    from pyspark import StorageLevel

    from vul_dbgen_spark.operators.graph import _symmetrize
    from vul_dbgen_spark.queries import catalog as C

    sym = (
        _symmetrize(C._cooc_edges(spark, sf_dir), "u", "v")
        .repartition("v")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    sym.count()
    parts = C.load(spark, sf_dir, "part").select(F.col("p_partkey").alias("node"))
    if after:
        nodes = parts  # vertices_are_superset: dimension PK, FK-clean
    else:
        endpoints = sym.select(F.col("u").alias("node")).distinct()
        nodes = parts.union(endpoints).distinct()
    out = [("node-table derivation", _fmt(nodes))]
    labels = nodes.select("node", F.col("node").alias("label")).localCheckpoint()
    INV = (1 << 31) - 1
    cnt = (
        sym.join(F.broadcast(labels), sym["u"] == labels["node"])
        .select(F.col("v").alias("n2"), "label")
        .groupBy("n2", "label")
        .agg(F.count(F.lit(1)).alias("c"))
    )
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
    return out


def _pagerank_round(spark, sf_dir, after: bool):
    from pyspark import StorageLevel

    from vul_dbgen_spark.queries import catalog as C

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
    ranks = nodes.select(
        "node", "has_out", F.lit(0.1).alias("rank")
    ).localCheckpoint()
    contrib = (
        ew.join(F.broadcast(ranks), ew["s"] == ranks["node"])
        .select(F.col("d"), (F.col("rank") / F.col("outdeg")).alias("c"))
        .groupBy("d")
        .agg(F.sum("c").alias("contrib"))
    )
    upd = nodes.join(F.broadcast(contrib), nodes["node"] == contrib["d"], "left")
    if after:
        # round 9: dangling mass is a plan literal read from the
        # previous round's observe — no dang subplan, no broadcast
        dang_term = F.lit(0.025) / 1000.0
    else:
        dang = ranks.filter(~F.col("has_out")).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dang")
        )
        upd = upd.join(F.broadcast(dang))
        dang_term = F.col("__dang") / 1000.0
    rnd = upd.select(
        "node",
        "has_out",
        (
            F.lit(0.15 / 1000.0)
            + F.lit(0.85) * (F.coalesce(F.col("contrib"), F.lit(0.0)) + dang_term)
        ).alias("rank"),
    )
    if after:
        obs = Observation()
        rnd = rnd.observe(
            obs,
            F.coalesce(
                F.sum(F.when(~F.col("has_out"), F.col("rank"))), F.lit(0.0)
            ).alias("dang"),
        )
    out = [("one power-iteration round (pre-checkpoint)", _fmt(rnd))]
    ew.unpersist()
    nodes.unpersist()
    return out


def _logreg_pass(spark, sf_dir, after: bool):
    from vul_dbgen_spark.functions.text import tokens
    from vul_dbgen_spark.operators import training as T
    from vul_dbgen_spark.queries import catalog as C

    docs = C.load(spark, sf_dir, "documents")
    base = docs.select(
        tokens("text").alias("toks"), F.expr(T.LOGREG_LABEL_SQL).alias("y")
    )
    hb = T._prehash_tokens(base, 1024)
    w = [0.0] * 1024
    if after and hasattr(T, "_grad_map"):
        grads = T._grad_map(hb, w, 0.0, 1024)
    else:
        s = T._sigmoid_arrow(w, 0.0)(F.col("hs"))
        d = hb.select(
            F.concat(F.col("hs"), F.array(F.lit(-1))).alias("hs2"),
            (s - F.col("y")).alias("r"),
        )
        grads = (
            d.select(F.explode("hs2").alias("dim"), "r")
            .groupBy("dim")
            .agg(F.sum("r").alias("g"))
        )
    return [("one GD gradient pass (pre-collect)", _fmt(grads))]


INNER = {
    "dedup_clusters": _cc_round,
    "graph_khop_reach": _khop_round,
    "graph_label_propagation": _lpa_parts,
    "graph_pagerank_parts": _pagerank_round,
    "train_logreg_hashed": _logreg_pass,
}


def main():
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(OUT_DIR, exist_ok=True)
    from vul_dbgen_spark.queries.catalog import REGISTRY
    from vul_dbgen_spark.session import get_spark

    spark = get_spark("capture_plans_r09")
    after = suffix != "before"
    for name in names:
        spec = REGISTRY[name]
        buf = io.StringIO()
        buf.write(f"# {name} — explain('formatted') at {sf_dir} ({suffix})\n")
        df = spec.fn(spark, sf_dir)
        buf.write("\n## top-level returned plan\n")
        buf.write(_fmt(df))
        if name in INNER:
            for title, text in INNER[name](spark, sf_dir, after):
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
