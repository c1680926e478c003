#!/usr/bin/env python
"""Interleaved A/B for the _cooc_edges/_seq_edges derivation shape.

Variants (identical output multiset in every case):
  join   — current shape: lineitem self-join on l_orderkey (SMJ)
  shj    — same join with a shuffle_hash hint (skips both sorts)
  arrays — groupBy(l_orderkey) + collect_list + higher-order-function
           pair expansion (one exchange, no join)

Each variant is timed two ways per rep: raw pair-stream count() and the
consumer-shaped distinct().count() (what triangle/LPA actually pay).
Reps are interleaved so tenancy drift hits all variants equally.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def _release(spark):
    spark.catalog.clearCache()
    jsc = spark.sparkContext._jsc
    for rdd in list(jsc.getPersistentRDDs().values()):
        rdd.unpersist()
    spark.sparkContext._jvm.System.gc()


def cooc_join(spark, sf_dir, hint=None):
    from vul_dbgen_spark.queries.catalog import load

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    l2 = li.select(F.col("l_orderkey").alias("_ok"), F.col("l_partkey").alias("v"))
    if hint:
        l2 = l2.hint(hint)
    return li.join(
        l2, (li["l_orderkey"] == l2["_ok"]) & (li["l_partkey"] < l2["v"])
    ).select(F.col("l_partkey").alias("u"), "v")


def cooc_arrays(spark, sf_dir):
    from vul_dbgen_spark.queries.catalog import load

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    parts = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_list("l_partkey")).alias("ps")
    )
    return (
        parts.select(
            F.explode(
                F.expr(
                    "flatten(transform(ps, (x, i) -> "
                    "transform(slice(ps, i + 2, size(ps)), y -> "
                    "struct(x AS u, y AS v))))"
                )
            ).alias("p")
        )
        .select("p.u", "p.v")
        .where(F.col("u") < F.col("v"))
    )


def seq_join(spark, sf_dir, hint=None):
    from vul_dbgen_spark.queries.catalog import load

    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey"
    )
    l2 = li.select(
        F.col("l_orderkey").alias("_ok"),
        F.col("l_linenumber").alias("_ln"),
        F.col("l_partkey").alias("d"),
    )
    if hint:
        l2 = l2.hint(hint)
    return li.join(
        l2,
        (li["l_orderkey"] == l2["_ok"])
        & (l2["_ln"] == li["l_linenumber"] + 1)
        & (li["l_partkey"] != l2["d"]),
    ).select(F.col("l_partkey").alias("s"), "d")


def seq_arrays(spark, sf_dir):
    from vul_dbgen_spark.queries.catalog import load

    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey"
    )
    rows = li.groupBy("l_orderkey").agg(
        F.collect_list(F.struct(F.col("l_linenumber").alias("ln"),
                                F.col("l_partkey").alias("pk"))).alias("sl")
    )
    return (
        rows.select(
            F.explode(
                F.expr(
                    "flatten(transform(sl, x -> "
                    "transform(filter(sl, y -> y.ln = x.ln + 1 AND y.pk <> x.pk), "
                    "y -> struct(x.pk AS s, y.pk AS d))))"
                )
            ).alias("p")
        ).select("p.s", "p.d")
    )


VARIANTS = {
    "cooc": {
        "join": lambda sp, d: cooc_join(sp, d),
        "shj": lambda sp, d: cooc_join(sp, d, hint="shuffle_hash"),
        "arrays": cooc_arrays,
    },
    "seq": {
        "join": lambda sp, d: seq_join(sp, d),
        "shj": lambda sp, d: seq_join(sp, d, hint="shuffle_hash"),
        "arrays": seq_arrays,
    },
}


def main():
    from vul_dbgen_spark.session import get_spark

    family = sys.argv[1] if len(sys.argv) > 1 else "cooc"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab_cooc_r08")
    variants = VARIANTS[family]

    # Parity gate first: raw count and canonical-distinct count identical.
    counts, dcounts = {}, {}
    for name, fn in variants.items():
        df = fn(spark, sf_dir)
        counts[name] = df.count()
        dcounts[name] = df.distinct().count()
    assert len(set(counts.values())) == 1, f"raw multiset count mismatch {counts}"
    assert len(set(dcounts.values())) == 1, f"distinct count mismatch {dcounts}"
    print(f"# parity: raw={counts} distinct={dcounts}", file=sys.stderr)

    out = {n: {"raw": [], "distinct": []} for n in variants}
    for rep in range(reps):
        for name, fn in variants.items():
            for mode in ("raw", "distinct"):
                _release(spark)
                df = fn(spark, sf_dir)
                if mode == "distinct":
                    df = df.distinct()
                t0 = time.perf_counter()
                df.count()
                out[name][mode].append(round(time.perf_counter() - t0, 3))
        print(f"# rep {rep}: " + json.dumps(out), file=sys.stderr)
    print(json.dumps({"sf_dir": sf_dir, "family": family,
                      "counts": counts, "loadavg": os.getloadavg()[0],
                      "timings": out}))
    spark.stop()


if __name__ == "__main__":
    main()
