"""Chainguard / Wolfi OSV v2 source (SURVEY.md S13).

Behavioral spec: ``/root/reference/updater/fetchers/chainguardv2/
chainguardv2.go`` (+ thin wrappers wolfi.go/chainguard.go).
One OSV document per advisory under ``chainguard/osv-v2/`` (the
unpacked equivalent of ``osv-v2.zip``):

- CVEs come from ``upstream`` (deduped, order kept); advisories with no
  CVE are dropped (chainguardv2.go:94-108,139-143);
- per CVE one vulnerability; FixedIn is the cross product of the CVEs ×
  the ECOSYSTEM-range fixed versions of affected entries matching the
  target ecosystem, deduped by (pkg, version) per CVE
  (chainguardv2.go:110-131,171-206);
- link ``cve.mitre.org/...<CVE>``; dates from published/modified;
  vulns left with no features are dropped (chainguardv2.go:208-214).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import register_distro
from .base import finish_os_vulns, version_is_parseable
from .govuln import load_osv_dir

CVE_LINK_PREFIX = "https://cve.mitre.org/cgi-bin/cvename.cgi?name="

# Round 9: the nested HOF expression tree below cost ~1.2k py4j round
# trips per build and the SAME function serves two sources (wolfi +
# chainguard) — the frozen SQL texts parse to the identical
# ArrayDistinct/ArrayFilter/ArrayTransform trees in a handful of RPCs
# and are cached per (ecosystem, namespace). The lambda identifiers and
# null semantics are 1:1 with the old builder chain (x -> x.y = 'v'
# null-propagates exactly like Column ==; CASE WHEN without ELSE is
# F.when without otherwise). The final version_is_parseable filter
# stays the shared Python helper — one source of truth for the dpkg
# version predicate.
_EXPR_CACHE: dict[tuple, F.Column] = {}


def _osv_exprs(ecosystem: str, namespace: str) -> tuple[F.Column, F.Column]:
    key = (ecosystem, namespace)
    got = _EXPR_CACHE.get(key)
    if got is None:
        cves = F.expr(
            "array_distinct(filter(coalesce(upstream, array()),"
            " u -> startswith(u, 'CVE-'))) AS cves"
        )
        fixed = F.expr(
            "array_distinct(flatten(transform("
            f" filter(affected, a -> a.package.ecosystem = '{ecosystem}'),"
            " a -> flatten(transform("
            "   filter(coalesce(a.ranges, array()), r -> r.type = 'ECOSYSTEM'),"
            "   r -> filter(transform("
            "     coalesce(r.events, array()),"
            "     e -> CASE WHEN coalesce(e.fixed, '') != '' THEN struct("
            "       a.package.name AS name,"
            f"      '{namespace}' AS namespace,"
            "       e.fixed AS version,"
            "       CAST(NULL AS string) AS min_ver) END),"
            "     x -> x IS NOT NULL)))"
            ")))"
        )
        got = (cves, fixed)
        _EXPR_CACHE[key] = got
    return got


def load_chainguard_osv(
    spark: SparkSession, source_root: str, ecosystem: str, namespace: str
) -> DataFrame:
    osv = load_osv_dir(spark, os.path.join(source_root, "chainguard", "osv-v2", "*.json"))
    cves, fixed = _osv_exprs(ecosystem, namespace)
    rows = osv.select(
        "id",
        "published",
        "modified",
        cves,
        F.coalesce("affected", F.array()).alias("affected"),
    ).filter("size(cves) > 0")
    # fixed versions: ECOSYSTEM ranges of matching-ecosystem packages,
    # in document order, deduped by (pkg, version)
    rows = rows.withColumn(
        "fixed_in",
        F.filter(fixed, lambda f: version_is_parseable(f["version"])),
    ).filter("size(fixed_in) > 0")
    out = rows.selectExpr(
        "explode(cves) AS name",
        "published AS issued_date",
        "modified AS last_mod_date",
        "fixed_in",
    ).withColumn("link", F.concat(F.lit(CVE_LINK_PREFIX), F.col("name")))
    return finish_os_vulns(out)


@register_distro("wolfi")
def load_wolfi(spark: SparkSession, source_root: str) -> DataFrame:
    return load_chainguard_osv(spark, source_root, "Wolfi", "wolfi:rolling")


@register_distro("chainguard")
def load_chainguard(spark: SparkSession, source_root: str) -> DataFrame:
    return load_chainguard_osv(spark, source_root, "Chainguard", "chainguard:rolling")
