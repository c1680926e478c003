"""Kubernetes official CVE feed source (SURVEY.md S20).

Behavioral spec: ``/root/reference/updater/fetchers/apps/k8s.go``.
One JSON doc ``{items: [{id, url, summary}]}``; only id/url/summary are
used — NVD enrichment fills everything else (k8s.go:60-69).
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import register_app
from .app_base import finish_app_vulns

_SCHEMA = T.StructType(
    [
        T.StructField(
            "items",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("id", T.StringType()),
                        T.StructField("url", T.StringType()),
                        T.StructField("summary", T.StringType()),
                    ]
                )
            ),
        )
    ]
)


@register_app("k8s")
def load(spark: SparkSession, source_root: str) -> DataFrame:
    pattern = os.path.join(source_root, "apps", "k8s.json*")
    if not glob.glob(pattern):
        raise FileNotFoundError(f"no k8s feed under {pattern}")
    doc = spark.read.schema(_SCHEMA).option("multiLine", True).json(pattern)
    rows = doc.select(F.explode("items").alias("i")).select(
        F.col("i.id").alias("vul_name"),
        F.lit("kubernetes").alias("app_name"),
        F.lit("kubernetes").alias("module_name"),
        F.col("i.summary").alias("description"),
        F.col("i.url").alias("link"),
        F.array(F.col("i.id")).alias("cves"),
    )
    return finish_app_vulns(rows)
