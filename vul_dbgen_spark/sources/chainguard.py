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


def load_chainguard_osv(
    spark: SparkSession, source_root: str, ecosystem: str, namespace: str
) -> DataFrame:
    osv = load_osv_dir(spark, os.path.join(source_root, "chainguard", "osv-v2", "*.json"))
    cves = F.array_distinct(
        F.filter(F.coalesce("upstream", F.array()), lambda u: u.startswith("CVE-"))
    )
    rows = (
        osv.select(
            "id",
            "published",
            "modified",
            cves.alias("cves"),
            F.coalesce("affected", F.array()).alias("affected"),
        )
        .filter(F.size("cves") > 0)
    )
    # fixed versions: ECOSYSTEM ranges of matching-ecosystem packages,
    # in document order, deduped by (pkg, version)
    fixed = F.array_distinct(
        F.flatten(
            F.transform(
                F.filter("affected", lambda a: a["package"]["ecosystem"] == ecosystem),
                lambda a: F.flatten(
                    F.transform(
                        F.filter(
                            F.coalesce(a["ranges"], F.array()),
                            lambda r: r["type"] == "ECOSYSTEM",
                        ),
                        lambda r: F.filter(
                            F.transform(
                                F.coalesce(r["events"], F.array()),
                                lambda e: F.when(
                                    F.coalesce(e["fixed"], F.lit("")) != "",
                                    F.struct(
                                        a["package"]["name"].alias("name"),
                                        F.lit(namespace).alias("namespace"),
                                        e["fixed"].alias("version"),
                                        F.lit(None).cast("string").alias("min_ver"),
                                    ),
                                ),
                            ),
                            lambda x: x.isNotNull(),
                        ),
                    )
                ),
            )
        )
    )
    rows = rows.withColumn(
        "fixed_in",
        F.filter(fixed, lambda f: version_is_parseable(f["version"])),
    ).filter(F.size("fixed_in") > 0)
    out = rows.select(
        F.explode("cves").alias("name"),
        F.col("published").alias("issued_date"),
        F.col("modified").alias("last_mod_date"),
        "fixed_in",
    ).withColumn("link", F.concat(F.lit(CVE_LINK_PREFIX), F.col("name")))
    return finish_os_vulns(out)


@register_distro("wolfi")
def load_wolfi(spark: SparkSession, source_root: str) -> DataFrame:
    return load_chainguard_osv(spark, source_root, "Wolfi", "wolfi:rolling")


@register_distro("chainguard")
def load_chainguard(spark: SparkSession, source_root: str) -> DataFrame:
    return load_chainguard_osv(spark, source_root, "Chainguard", "chainguard:rolling")
