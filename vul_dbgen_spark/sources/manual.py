"""Manual NDJSON app records (SURVEY.md S22).

Behavioral spec: ``/root/reference/updater/fetchers/apps/manual.go``.
``app-manual/{busybox.db,toomcat.db}``: one AppModuleVul JSON object per
line using the short wire keys (``common/types.go:95-114`` struct tags:
VN, AN, MN, IP, SYM, D, L, SC, VV2, SC3, VV3, SE, AV[{O,V}], FV, UV,
Issue, LastMod). ``CVEs`` has tag ``"-"`` — never unmarshaled, so the
manual records carry no CVE list.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import register_app
from .app_base import finish_app_vulns

_TERM = T.StructType([T.StructField("O", T.StringType()), T.StructField("V", T.StringType())])

_SCHEMA = T.StructType(
    [
        T.StructField("VN", T.StringType()),
        T.StructField("AN", T.StringType()),
        T.StructField("MN", T.StringType()),
        T.StructField("IP", T.ArrayType(T.StringType())),
        T.StructField("SYM", T.ArrayType(T.StringType())),
        T.StructField("D", T.StringType()),
        T.StructField("L", T.StringType()),
        T.StructField("SC", T.DoubleType()),
        T.StructField("VV2", T.StringType()),
        T.StructField("SC3", T.DoubleType()),
        T.StructField("VV3", T.StringType()),
        T.StructField("SE", T.StringType()),
        T.StructField("AV", T.ArrayType(_TERM)),
        T.StructField("FV", T.ArrayType(_TERM)),
        T.StructField("UV", T.ArrayType(_TERM)),
        T.StructField("Issue", T.TimestampType()),
        T.StructField("LastMod", T.TimestampType()),
    ]
)

MANUAL_FILES = ["app-manual/busybox.db", "app-manual/toomcat.db"]


def _terms(col: str):
    return F.transform(
        F.coalesce(col, F.array()),
        lambda t: F.struct(t["O"].alias("op_code"), t["V"].alias("version")),
    )


@register_app("manual")
def load(spark: SparkSession, source_root: str) -> DataFrame:
    files = [os.path.join(source_root, rel) for rel in MANUAL_FILES]
    files = [f for f in files if os.path.exists(f)]
    if not files:
        raise FileNotFoundError(f"no manual .db files under {source_root}/app-manual/")
    raw = spark.read.schema(_SCHEMA).json(files)
    rows = raw.filter(F.col("VN").isNotNull()).select(
        F.col("VN").alias("vul_name"),
        F.col("AN").alias("app_name"),
        F.col("MN").alias("module_name"),
        F.col("IP").alias("import_paths"),
        F.col("SYM").alias("symbols"),
        F.col("D").alias("description"),
        F.col("L").alias("link"),
        F.col("SC").alias("score"),
        F.col("VV2").alias("vectors"),
        F.col("SC3").alias("score_v3"),
        F.col("VV3").alias("vectors_v3"),
        F.col("SE").alias("severity"),
        _terms("AV").alias("affected_ver"),
        _terms("FV").alias("fixed_ver"),
        _terms("UV").alias("unaffected_ver"),
        F.col("Issue").alias("issued_date"),
        F.col("LastMod").alias("last_mod_date"),
    )
    return finish_app_vulns(rows)
