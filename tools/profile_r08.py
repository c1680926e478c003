#!/usr/bin/env python
"""Round-8 optimization measurement harness.

Usage:
  python tools/profile_r08.py time <query> [<query> ...]   # warm+best-of-N draws
  python tools/profile_r08.py phases <family>              # per-phase decomposition

Timed protocol mirrors bench.py (untimed warm draw, then timed draws with
full state release between draws) so numbers are comparable to the
committed record. SPARK_GRAFT_SF_DIR picks the dataset (default sf0.1).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark import StorageLevel  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def _release(spark):
    spark.catalog.clearCache()
    jsc = spark.sparkContext._jsc
    for rdd in list(jsc.getPersistentRDDs().values()):
        rdd.unpersist()
    spark.sparkContext._jvm.System.gc()


def _spark():
    from vul_dbgen_spark.session import get_spark

    return get_spark("profile_r08")


def timed(spark, fn, sf_dir, n_draws=3):
    draws = []
    n = 0
    for i in range(n_draws + 1):
        _release(spark)
        t0 = time.perf_counter()
        n = fn(spark, sf_dir).count()
        if i > 0:
            draws.append(round(time.perf_counter() - t0, 3))
    return draws, n


def cmd_time(names):
    from vul_dbgen_spark.queries.catalog import REGISTRY

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = _spark()
    # generic warmup (same shape as bench.py)
    warm = spark.read.parquet(os.path.join(sf_dir, "region.parquet"))
    warm.join(warm.selectExpr("r_regionkey as k"), warm.r_regionkey == F.col("k")).groupBy(
        "r_name"
    ).count().collect()
    out = {}
    for name in names:
        spec = REGISTRY[name]
        spark.sparkContext.setJobDescription(name)
        draws, n = timed(spark, spec.fn, sf_dir)
        out[name] = {"draws": draws, "best": min(draws), "rows": n}
        print(f"# {name}: best {min(draws):.3f}s draws={draws} rows={n}",
              file=sys.stderr)
    print(json.dumps({"sf_dir": sf_dir, "loadavg": os.getloadavg()[0], "timings": out}))


def _phase(spark, label, thunk):
    _t0 = time.perf_counter()
    r = thunk()
    dt = time.perf_counter() - _t0
    print(f"#   phase {label}: {dt:.3f}s", file=sys.stderr)
    return r, dt


def phases_pagerank(spark, sf_dir):
    """Decompose graph_pagerank_parts: edge derivation, setup, per-round."""
    from vul_dbgen_spark.queries.catalog import _seq_edges, load

    res = {}
    _release(spark)
    e = _seq_edges(spark, sf_dir)
    _, res["seq_edges_count"] = _phase(spark, "seq_edges.count", lambda: e.count())
    _release(spark)

    # inline the pagerank loop with per-round timing
    t_all0 = time.perf_counter()
    edges = _seq_edges(spark, sf_dir)
    e2 = edges.select(F.col("s"), F.col("d")).filter(F.col("s") != F.col("d")).distinct()
    outdeg = e2.groupBy("s").agg(F.count(F.lit(1)).alias("outdeg"))
    ew = e2.join(outdeg, "s").persist(StorageLevel.MEMORY_AND_DISK)
    _, res["ew_materialize"] = _phase(spark, "ew.count", lambda: ew.count())
    has_out = ew.select(F.col("s").alias("node")).distinct()
    parts = load(spark, sf_dir, "part").select("p_partkey")
    base = parts.select(F.col("p_partkey").alias("node")).distinct()
    nodes = (
        base.join(has_out.withColumn("__h", F.lit(True)), "node", "left")
        .select("node", F.coalesce("__h", F.lit(False)).alias("has_out"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n, res["nodes_materialize"] = _phase(spark, "nodes.count", lambda: nodes.count())
    ranks, res["init_ckpt"] = _phase(
        spark,
        "init ckpt",
        lambda: nodes.select(
            "node", "has_out", F.lit(1.0 / n).alias("rank")
        ).localCheckpoint(),
    )
    for i in range(5):
        def _round(ranks=ranks):
            dang = ranks.filter(~F.col("has_out")).agg(
                F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dang")
            )
            contrib = (
                ew.join(ranks, ew["s"] == ranks["node"])
                .select(F.col("d"), (F.col("rank") / F.col("outdeg")).alias("c"))
                .groupBy("d")
                .agg(F.sum("c").alias("contrib"))
            )
            return (
                nodes.join(contrib, nodes["node"] == contrib["d"], "left")
                .join(F.broadcast(dang))
                .select(
                    "node",
                    "has_out",
                    (
                        F.lit((1.0 - 0.85) / n)
                        + F.lit(0.85)
                        * (
                            F.coalesce(F.col("contrib"), F.lit(0.0))
                            + F.col("__dang") / n
                        )
                    ).alias("rank"),
                )
                .localCheckpoint()
            )

        ranks, res[f"round_{i}"] = _phase(spark, f"round {i}", _round)
    _, res["final_count"] = _phase(
        spark, "final count", lambda: ranks.select("node", "rank").count()
    )
    res["total_inline"] = round(time.perf_counter() - t_all0, 3)
    return res


def phases_triangle(spark, sf_dir):
    from vul_dbgen_spark.queries.catalog import _cooc_edges

    res = {}
    _release(spark)
    e = _cooc_edges(spark, sf_dir)
    _, res["cooc_edges_count"] = _phase(spark, "cooc_edges.count", lambda: e.count())
    _release(spark)

    t0 = time.perf_counter()
    edges = _cooc_edges(spark, sf_dir)
    canon = (
        edges.select(
            F.least(F.col("u"), F.col("v")).alias("u"),
            F.greatest(F.col("u"), F.col("v")).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    _, res["canon_materialize"] = _phase(spark, "canon.count+minmax", lambda: canon.agg(
        F.count(F.lit(1)).alias("n"), F.min("u"), F.max("v")
    ).first())
    sym = canon.union(canon.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    du = deg.select(F.col("u").alias("_n1"), F.col("deg").alias("deg_u"))
    dv = deg.select(F.col("u").alias("_n2"), F.col("deg").alias("deg_v"))
    lower_first = (F.col("deg_u") < F.col("deg_v")) | (
        (F.col("deg_u") == F.col("deg_v")) & (F.col("u") < F.col("v"))
    )
    oriented, res["oriented_ckpt"] = _phase(
        spark,
        "oriented ckpt",
        lambda: canon.join(du, canon["u"] == du["_n1"])
        .join(dv, canon["v"] == dv["_n2"])
        .select(
            F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("a"),
            F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("b"),
        )
        .localCheckpoint(),
    )
    o1 = oriented.select(F.col("a"), F.col("b").alias("x"))
    o2 = oriented.select(F.col("a"), F.col("b").alias("y"))
    wedge = (
        o1.join(o2, "a")
        .filter(F.col("x") < F.col("y"))
        .select(F.col("x").alias("u"), F.col("y").alias("v"))
    )
    _pk = lambda cu, cv: F.shiftleft(F.col(cu).cast("bigint"), 32).bitwiseOR(  # noqa: E731
        F.col(cv).cast("bigint")
    )
    build = F.broadcast(canon.select(_pk("u", "v").alias("__uv")))
    _, res["wedge_probe_agg"] = _phase(
        spark,
        "wedge gen + semi-join + agg",
        lambda: wedge.select(_pk("u", "v").alias("__uv"))
        .join(build, "__uv", "left_semi")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
        .first(),
    )
    _, res["deg_wedge_agg"] = _phase(
        spark,
        "degree wedge agg",
        lambda: deg.agg(
            F.sum(
                (F.col("deg").cast("bigint") * (F.col("deg") - 1)).cast(
                    "decimal(38,0)"
                )
                / 2
            )
        ).first(),
    )
    res["total_inline"] = round(time.perf_counter() - t0, 3)
    canon.unpersist()
    return res


def phases_lpa(spark, sf_dir):
    from vul_dbgen_spark.queries.catalog import _cooc_edges, load

    res = {}
    _release(spark)
    t0 = time.perf_counter()
    edges = _cooc_edges(spark, sf_dir)
    sym = (
        edges.select(F.col("u"), F.col("v"))
        .union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .repartition("v")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    _, res["sym_materialize"] = _phase(spark, "sym.count", lambda: sym.count())
    endpoints = sym.select(F.col("u").alias("node")).distinct()
    parts = load(spark, sf_dir, "part").select("p_partkey")
    nodes = (
        parts.select(F.col("p_partkey").alias("node"))
        .union(endpoints)
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    _, res["nodes_count"] = _phase(spark, "nodes.count", lambda: nodes.count())
    labels, res["init_ckpt"] = _phase(
        spark,
        "labels init",
        lambda: nodes.select("node", F.col("node").alias("label")).localCheckpoint(),
    )
    for i in range(3):
        def _round(labels=labels):
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
                        F.struct(F.col("c"), (-F.col("label")).alias("nl"))
                    ).alias("m")
                )
                .select(F.col("n2").alias("node"), (-F.col("m.nl")).alias("new_label"))
            )
            return (
                labels.join(F.broadcast(arg), "node", "left")
                .select("node", F.coalesce("new_label", "label").alias("label"))
                .localCheckpoint()
            )

        labels, res[f"round_{i}"] = _phase(spark, f"round {i}", _round)
    res["total_inline"] = round(time.perf_counter() - t0, 3)
    nodes.unpersist()
    sym.unpersist()
    return res


def phases_logreg_hashed(spark, sf_dir):
    from vul_dbgen_spark.operators.training import (
        LOGREG_LABEL_SQL,
        _prehash_tokens,
        _train_on_prehashed,
    )
    from vul_dbgen_spark.queries.catalog import load
    from vul_dbgen_spark.functions.text import tokens

    res = {}
    _release(spark)
    t0 = time.perf_counter()
    docs = load(spark, sf_dir, "documents")
    base = docs.select(
        tokens("text").alias("toks"), F.expr(LOGREG_LABEL_SQL).alias("y")
    )
    hb, res["prehash_ckpt"] = _phase(
        spark, "prehash ckpt", lambda: _prehash_tokens(base, 1024)
    )
    _, res["train_3_iters"] = _phase(
        spark, "3 GD iters", lambda: _train_on_prehashed(hb, 1024, 0.5, 3)
    )
    res["total_inline"] = round(time.perf_counter() - t0, 3)
    return res


FAMILIES = {
    "pagerank": phases_pagerank,
    "triangle": phases_triangle,
    "lpa": phases_lpa,
    "logreg_hashed": phases_logreg_hashed,
}


def cmd_phases(fam):
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = _spark()
    warm = spark.read.parquet(os.path.join(sf_dir, "region.parquet"))
    warm.join(warm.selectExpr("r_regionkey as k"), warm.r_regionkey == F.col("k")).groupBy(
        "r_name"
    ).count().collect()
    fn = FAMILIES[fam]
    # run twice: first is plan/codegen warmup, second is the measurement
    for tag in ("warm", "measured"):
        print(f"# --- {fam} ({tag}) ---", file=sys.stderr)
        res = fn(spark, sf_dir)
        print(json.dumps({"family": fam, "pass": tag, "sf_dir": sf_dir,
                          "loadavg": os.getloadavg()[0], "phases": res}))


if __name__ == "__main__":
    if sys.argv[1] == "time":
        cmd_time(sys.argv[2:])
    elif sys.argv[1] == "phases":
        cmd_phases(sys.argv[2])
    else:
        raise SystemExit(f"unknown subcommand {sys.argv[1]}")
