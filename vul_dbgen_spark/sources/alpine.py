"""Alpine secdb source (SURVEY.md S4).

Behavioral spec: ``/root/reference/updater/fetchers/alpine/alpine.go:54-129``.
Per-release ``main.json``/``community.json`` files:
``{distroversion: "v3.18", packages: [{pkg: {name, secfixes:
map[version] → [CVE, ...]}}]}``. Malformed secfix values (``{}`` instead
of a CVE list, alpine.go:70-89) are skipped.

Spark-first: wholetext read → ``from_json`` (static schema, map-valued
secfixes) → explodes. The only non-declarative step is a regexp pre-clean
turning the malformed ``{}`` values into ``null`` so PERMISSIVE parsing
doesn't null the whole map.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import register_distro
from .base import finish_os_vulns, read_wholetext, version_is_parseable
from ..functions.priority import cve_year

CVE_LINK_PREFIX = "https://cve.mitre.org/cgi-bin/cvename.cgi?name="

_SECDB_SCHEMA = T.StructType(
    [
        T.StructField("distroversion", T.StringType()),
        T.StructField(
            "packages",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField(
                            "pkg",
                            T.StructType(
                                [
                                    T.StructField("name", T.StringType()),
                                    T.StructField(
                                        "secfixes",
                                        T.MapType(T.StringType(), T.ArrayType(T.StringType())),
                                    ),
                                ]
                            ),
                        )
                    ]
                )
            ),
        ),
    ]
)


@register_distro("alpine")
def load(spark: SparkSession, source_root: str) -> DataFrame:
    """All ``alpine/v*/{main,community}.json`` files → ``os_vulns`` rows.

    One row per (cve, pkg, fixed-version) — the reference emits one
    Vulnerability per secfix CVE with a single FixedIn entry
    (alpine.go:108-121); the namespacing regroup merges them later.
    """
    pattern = os.path.join(source_root, "alpine", "v*", "*.json")
    if not glob.glob(pattern):
        raise FileNotFoundError(f"no Alpine secdb files under {pattern}")
    raw = read_wholetext(spark, pattern)
    # malformed secfixes value `{}` → null (alpine.go:70-89 skips them);
    # from_json PERMISSIVE would otherwise null the entire secfixes map
    cleaned = raw.withColumn("value", F.regexp_replace("value", r":\s*\{\}", ": null"))
    doc = cleaned.select(F.from_json("value", _SECDB_SCHEMA).alias("d"))
    rows = (
        doc.select(
            F.col("d.distroversion").alias("distro"),
            F.explode("d.packages").alias("p"),
        )
        .select(
            "distro",
            F.col("p.pkg.name").alias("pkg"),
            F.explode("p.pkg.secfixes").alias("version", "cves"),
        )
        .filter(F.col("cves").isNotNull())
        # skip versions NewVersion rejects (alpine.go:64-68)
        .filter(version_is_parseable(F.col("version")))
        .select("distro", "pkg", "version", F.explode("cves").alias("cve_raw"))
        # hard-coded redundant-version skip (alpine.go:92-95)
        .filter(~((F.col("cve_raw") == "CVE-2017-3738") & (F.col("version") == "1.0.2o-r0")))
        # year gate on the raw name (alpine.go:97-102), then strip a
        # trailing " ..." annotation (alpine.go:104-106)
        .filter(cve_year("cve_raw").isNotNull() & (cve_year("cve_raw") >= 2014))
        .withColumn("cve", F.split("cve_raw", " ").getItem(0))
    )
    out = rows.select(
        F.col("cve").alias("name"),
        F.concat(F.lit(CVE_LINK_PREFIX), F.col("cve")).alias("link"),
        F.array(
            F.struct(
                F.col("pkg").alias("name"),
                # "alpine:" + distroversion[1:] (alpine.go:114)
                F.concat(F.lit("alpine:"), F.substring("distro", 2, 1000)).alias("namespace"),
                F.col("version"),
                F.lit(None).cast("string").alias("min_ver"),
            )
        ).alias("fixed_in"),
    )
    return finish_os_vulns(out)
