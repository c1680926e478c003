"""OpenSSL advisories page source (SURVEY.md S18).

Behavioral spec: ``/root/reference/updater/fetchers/apps/openssl.go``.
The pre-fetched ``vulnerabilities.html`` page is split on ``h3 id``; per
chunk, regexes extract CVE number, CVE-record link, severity, first
``<p>`` description and ``from X before Y`` version pairs. A chunk
missing any of name/link/severity/description/versions is skipped
(openssl.go:43-116). Affected terms: first pair → ``[lt fixed, gteq
from]``, later pairs → ``[orlt fixed, gteq from]``; fixed terms: bare
version (golden: apps_test.go:33-55).

Spark-first: wholetext read → posexplode(split) → native regexp
extraction; no UDFs.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import register_app
from .app_base import finish_app_vulns
from .base import map_literal, read_wholetext

SEVERITY_MAP = {"Critical": "Critical", "High": "High", "Moderate": "Medium", "Low": "Low"}

_CVE_NAME = '="(.*)">CVE-([0-9-]+)'
_CVE_LINK = '="(.*) target(.*)>CVE Record'
_SEVERITY = r"<span[^>]*>\s*Severity\s*</span>\s*</div>\s*<div[^>]*>\s*([A-Za-z]+)\s*</div>"
# the Go pattern's char class unions to "any char"; greedy first-<p> to
# last-</p> (openssl.go:26)
_DESCRIPTION = r"<p>([\s\S]+)</p>"
_VER_PAIR = r"<li>from\s*\n*([0-9a-z.\-\s]+) before\s*\n*([0-9a-z.\-\s]+)</li>"


@register_app("openssl")
def load(spark: SparkSession, source_root: str) -> DataFrame:
    pattern = os.path.join(source_root, "openssl", "vulnerabilities.html")
    if not glob.glob(pattern):
        raise FileNotFoundError(f"no openssl page at {pattern}")
    raw = read_wholetext(spark, pattern)
    chunks = raw.select(F.posexplode(F.split("value", "h3 id")).alias("pos", "chunk")).filter(
        F.col("pos") > 0
    )
    sev_map = map_literal(SEVERITY_MAP)
    parsed = chunks.select(
        F.regexp_extract("chunk", _CVE_NAME, 2).alias("cve_number"),
        F.regexp_extract("chunk", _CVE_LINK, 1).alias("link_raw"),
        F.regexp_extract("chunk", _SEVERITY, 1).alias("severity_word"),
        F.regexp_extract("chunk", _DESCRIPTION, 1).alias("description"),
        F.regexp_extract_all("chunk", F.lit(_VER_PAIR), F.lit(1)).alias("from_vers"),
        F.regexp_extract_all("chunk", F.lit(_VER_PAIR), F.lit(2)).alias("before_vers"),
    )
    parsed = (
        parsed.filter(F.col("cve_number") != "")
        .filter(F.col("link_raw") != "")
        .filter(F.size("before_vers") > 0)
        .withColumn("severity", sev_map[F.col("severity_word")])
        .filter(F.col("severity").isNotNull())
        .filter(F.col("description") != "")
    )
    # affected: per pair i → [i==0 ? lt : orlt, <before>], [gteq, <from
    # stripped of optional "since ">]   (openssl.go:133-156)
    fr = F.transform(
        "from_vers",
        lambda v: F.trim(F.regexp_replace(F.trim(v), r"^since\s+", "")),
    )
    before = F.transform("before_vers", lambda v: F.trim(v))
    affected = F.flatten(
        F.zip_with(
            before,
            fr,
            lambda b, a: F.array(
                F.struct(F.lit("lt").alias("op_code"), b.alias("version")),
                F.struct(F.lit("gteq").alias("op_code"), a.alias("version")),
            ),
        )
    )
    # re-tag: first term lt, every later lt → orlt (position-dependent)
    affected = F.transform(
        affected,
        lambda t, i: F.struct(
            F.when((t["op_code"] == "lt") & (i > 0), F.lit("orlt"))
            .otherwise(t["op_code"])
            .alias("op_code"),
            t["version"].alias("version"),
        ),
    )
    fixed = F.transform(
        before, lambda b: F.struct(F.lit("").alias("op_code"), b.alias("version"))
    )
    rows = parsed.select(
        F.concat(F.lit("CVE-"), F.col("cve_number")).alias("vul_name"),
        F.lit("openssl").alias("app_name"),
        F.lit("openssl").alias("module_name"),
        "description",
        F.replace(F.col("link_raw"), F.lit('"'), F.lit("")).alias("link"),
        F.lit(0.0).alias("score"),
        "severity",
        affected.alias("affected_ver"),
        fixed.alias("fixed_ver"),
        F.array(F.concat(F.lit("CVE-"), F.col("cve_number"))).alias("cves"),
    )
    return finish_app_vulns(rows)
