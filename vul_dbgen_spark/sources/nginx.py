"""Nginx security-advisories page source (SURVEY.md S19).

Behavioral spec: ``/root/reference/updater/fetchers/apps/nginx.go``.
The pre-fetched page is split on ``</p></li>``; per chunk regexes
extract name, description, severity (high/major/medium/low), link,
``Vulnerable:`` ranges and ``Not vulnerable:`` versions:

- affected ``a-b`` pairs → ``[gteq a, lteq b]`` chains with ``orgteq``
  from the second pair; the literal ``all`` → a single ``{"", "All"}``
  term (nginx.go:119-151);
- fixed versions → ``gteq`` terms with ``+`` stripped; literal ``none``
  → ``{"", "None"}`` (nginx.go:153-172).

Divergence (deterministic superset): the reference reuses one
``modVul``/``fixedVer`` variable across loop iterations, so a chunk
without a ``Not vulnerable:`` line silently inherits the previous
chunk's fixed list (nginx.go:42-43,70-74). We treat each advisory
independently — a missing fixed list is empty.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import register_app
from .app_base import finish_app_vulns
from .base import map_literal, read_wholetext

_NAME = '">([A-Z0-9-]*)</a><br>'
_AFFECTED = "<br>Vulnerable: ([0-9a-zA-Z\\s/.\\-,]*)"
_FIXED = "<br>Not vulnerable: ([0-9a-zA-Z.+\\-,\\s]*)<br>"
_DESCRIPTION = "<li><p>(.*)<br>Severity:"
_SEVERITY = "<br>Severity: <?b?>?(high|major|medium|low)<?/?b?>?<br>"
_LINK = '<a href="(.*)">Advisory'

_RANGE_PAIR = r"([0-9.]+)\-([0-9.]+)"
_BARE_VER = r"([0-9.]+)"

SEVERITY_MAP = {"high": "high", "major": "High", "medium": "Medium", "low": "Low"}


@register_app("nginx")
def load(spark: SparkSession, source_root: str) -> DataFrame:
    pattern = os.path.join(source_root, "nginx", "security_advisories.html")
    if not glob.glob(pattern):
        raise FileNotFoundError(f"no nginx page at {pattern}")
    raw = read_wholetext(spark, pattern)
    chunks = raw.select(F.explode(F.split("value", "</p></li>")).alias("chunk"))
    sev_map = map_literal(SEVERITY_MAP)
    parsed = chunks.select(
        F.regexp_extract("chunk", _NAME, 1).alias("name"),
        F.regexp_extract("chunk", _DESCRIPTION, 1).alias("description"),
        F.regexp_extract("chunk", _SEVERITY, 1).alias("severity_word"),
        F.regexp_extract("chunk", _LINK, 1).alias("link"),
        F.regexp_extract("chunk", _AFFECTED, 1).alias("affected_str"),
        F.regexp_extract("chunk", _FIXED, 1).alias("fixed_str"),
        F.col("chunk").contains("<br>Vulnerable: ").alias("has_affected"),
    )
    parsed = (
        parsed.filter(F.col("description") != "")
        .filter(F.col("name") != "")
        .filter(F.col("has_affected"))
        .withColumn("severity", sev_map[F.col("severity_word")])
        .filter(F.col("severity").isNotNull())
        .filter(F.col("affected_str") != "")
    )
    pair_a = F.regexp_extract_all("affected_str", F.lit(_RANGE_PAIR), F.lit(1))
    pair_b = F.regexp_extract_all("affected_str", F.lit(_RANGE_PAIR), F.lit(2))
    range_terms = F.flatten(
        F.zip_with(
            pair_a,
            pair_b,
            lambda a, b: F.array(
                F.struct(F.lit("gteq").alias("op_code"), a.alias("version")),
                F.struct(F.lit("lteq").alias("op_code"), b.alias("version")),
            ),
        )
    )
    range_terms = F.transform(
        range_terms,
        lambda t, i: F.struct(
            F.when((t["op_code"] == "gteq") & (i > 0), F.lit("orgteq"))
            .otherwise(t["op_code"])
            .alias("op_code"),
            t["version"].alias("version"),
        ),
    )
    bare_terms = F.transform(
        F.regexp_extract_all("affected_str", F.lit(_BARE_VER), F.lit(1)),
        lambda v: F.struct(F.lit("").alias("op_code"), v.alias("version")),
    )
    affected = (
        F.when(F.col("affected_str").contains("all"), F.array(F.struct(F.lit("").alias("op_code"), F.lit("All").alias("version"))))
        .when(F.size(range_terms) > 0, range_terms)
        .otherwise(bare_terms)
    )
    fixed = F.when(
        F.col("fixed_str").contains("none"),
        F.array(F.struct(F.lit("").alias("op_code"), F.lit("None").alias("version"))),
    ).otherwise(
        F.transform(
            F.regexp_extract_all("fixed_str", F.lit(r"([0-9.+]+)"), F.lit(1)),
            lambda v: F.struct(
                F.lit("gteq").alias("op_code"),
                F.replace(v, F.lit("+"), F.lit("")).alias("version"),
            ),
        )
    )
    rows = parsed.select(
        F.col("name").alias("vul_name"),
        F.lit("nginx").alias("app_name"),
        F.lit("nginx").alias("module_name"),
        "description",
        "link",
        "severity",
        affected.alias("affected_ver"),
        fixed.alias("fixed_ver"),
        F.array(F.col("name")).alias("cves"),
    )
    return finish_app_vulns(rows)
