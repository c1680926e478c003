"""Debian Security Tracker source (SURVEY.md S1/S2, A2/A3).

Behavioral spec: ``/root/reference/updater/fetchers/debian/debian.go``.
One JSON document ``map[pkg]map[cve]{description, releases:
map[rel]{fixed_version, status, urgency}}`` per file; three files are
merged by CVE name with FixedIn lists appended in file order
(debian.go:39-42,106-135).

Spark-first plan: wholetext read → ``from_json`` with a MapType schema →
three ``explode``s → filters → group back per CVE. Everything except the
final regroup is Catalyst whole-stage codegen; no UDFs.

Determinism notes (SURVEY.md §4.3): the reference's per-CVE severity is
the *max* urgency over package rows (debian.go:202-209) which is order
independent, but ``feed_rating`` is the urgency of whichever row Go's map
iteration visited last. We instead take the urgency belonging to the max
severity (ties broken by urgency string) — deterministic and consistent
with the severity it accompanies.
"""

from __future__ import annotations

import os
from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import register_distro
from .base import (
    MAXV,
    MINV,
    finish_os_vulns,
    map_literal,
    read_wholetext,
    version_is_parseable,
)
from ..functions.priority import cve_year, priority_ordinal

DEBIAN_FILES = [  # merge order matters (debian.go:39-42,111-135)
    "debian/debian.json",
    "debian/debian-stretch.json",
    "debian/debian-buster.json",
]

LINK_PREFIX = "https://security-tracker.debian.org/tracker/"

# common/types.go:197-216
DEBIAN_RELEASES = {
    "squeeze": "6",
    "wheezy": "7",
    "jessie": "8",
    "stretch": "9",
    "buster": "10",
    "bullseye": "11",
    "bookworm": "12",
    "trixie": "13",
    "forky": "14",
    "sid": "unstable",
    "oldoldstable": "7",
    "oldstable": "8",
    "stable": "9",
    "testing": "10",
    "unstable": "unstable",
}

# debian.go:256-291
URGENCY_SEVERITY = {
    "not yet assigned": "Unknown",
    "end-of-life": "Negligible",
    "unimportant": "Negligible",
    "low": "Low",
    "low*": "Low",
    "low**": "Low",
    "medium": "Medium",
    "medium*": "Medium",
    "medium**": "Medium",
    "high": "High",
    "high*": "High",
    "high**": "High",
}

_DOC_SCHEMA = T.MapType(
    T.StringType(),
    T.MapType(
        T.StringType(),
        T.StructType(
            [
                T.StructField("description", T.StringType()),
                T.StructField(
                    "releases",
                    T.MapType(
                        T.StringType(),
                        T.StructType(
                            [
                                T.StructField("fixed_version", T.StringType()),
                                T.StructField("status", T.StringType()),
                                T.StructField("urgency", T.StringType()),
                            ]
                        ),
                    ),
                ),
            ]
        ),
    ),
)


def parse_file(spark: SparkSession, path: str, file_priority: int) -> DataFrame:
    """One tracker JSON file → exploded per-(pkg,cve,release) rows.
    (Kept for tests/composition; ``load`` scans all files in one plan —
    see ``_parse_raw``.)"""
    raw = read_wholetext(spark, path).withColumn(
        "file_priority", F.lit(file_priority)
    )
    return _parse_raw(raw)


def _parse_raw(raw: DataFrame) -> DataFrame:
    """(value, file_priority) wholetext rows → exploded per-(pkg, cve,
    release) rows. One expression tree regardless of file count — the
    round-9 build-phase cut: the per-file plan construction was ~2.2k
    py4j round trips × 3 files, and the map literals now ride the
    cached one-RPC SQL form (sources/base.py:map_literal)."""
    rows = (
        raw.select(
            "file_priority",
            F.explode(F.from_json("value", _DOC_SCHEMA)).alias("pkg", "cves"),
        )
        .select("file_priority", "pkg", F.explode("cves").alias("cve", "node"))
        .select(
            "file_priority",
            "pkg",
            "cve",
            F.col("node.description").alias("description"),
            F.explode("node.releases").alias("release", "rel"),
        )
    )
    releases = map_literal(DEBIAN_RELEASES)
    sev_map = map_literal(URGENCY_SEVERITY)
    return (
        rows.withColumn("rel_ver", releases[F.col("release")])
        # unknown release / undetermined / non-CVE / pre-2014 skips
        # (debian.go:174-189)
        .filter(F.col("rel_ver").isNotNull())
        .filter(F.col("rel.status") != "undetermined")
        .filter(F.col("cve").startswith("CVE-"))
        .filter(cve_year("cve").isNotNull() & (cve_year("cve") >= 2014))
        # fixed_version "0" → not affected (MinVersion); open → MaxVersion;
        # resolved → parsed fixed_version, skip row when unparseable
        # (debian.go:211-229)
        .withColumn(
            "version",
            F.when(F.col("rel.fixed_version") == "0", F.lit(MINV))
            .when(F.col("rel.status") == "open", F.lit(MAXV))
            .when(F.col("rel.status") == "resolved", F.col("rel.fixed_version")),
        )
        .filter(
            (F.col("version").isin(MINV, MAXV))
            | (F.col("rel.status") != "resolved")
            | version_is_parseable(F.col("version"))
        )
        .withColumn("severity", F.coalesce(sev_map[F.col("rel.urgency")], F.lit("Unknown")))
        .withColumn("urgency", F.col("rel.urgency"))
    )


@register_distro("debian")
def load(spark: SparkSession, source_root: str) -> DataFrame:
    """All Debian files → canonical ``os_vulns`` rows (one per CVE).

    Round 9: the files ride ONE wholetext scan with ``file_priority``
    derived from the file name, instead of three separately-built
    per-file plans unioned together — the parse expression tree is
    constructed once (the build phase is py4j-round-trip-bound) and the
    executed plan reads the same rows with the same per-file priority
    tags, so the deterministic merge below is unchanged."""
    present = [
        (i, os.path.join(source_root, rel))
        for i, rel in enumerate(DEBIAN_FILES)
        if os.path.exists(os.path.join(source_root, rel))
    ]
    if not present:
        raise FileNotFoundError(f"no Debian feed files under {source_root}")
    prio = F.lit(None).cast("int")
    for i, p in present:
        # input_file_name yields a URI; the trailing /<basename> match
        # is unambiguous across the three tracker files
        prio = F.when(
            F.col("path").endswith("/" + os.path.basename(p)), F.lit(i)
        ).otherwise(prio)
    raw = read_wholetext(spark, [p for _, p in present]).withColumn(
        "file_priority", prio
    )
    rows = _parse_raw(raw)
    c = _merge_cols()
    grouped = (
        rows.withColumn("fv", c["fv"])
        # deterministic FixedIn order: file order then (ns, pkg, version)
        # — the reference appends in nondeterministic map order
        .withColumn("fv_sort", c["fv_sort"])
        .groupBy("cve")
        .agg(*c["aggs"])
        .withColumn("min_fp", c["min_fp"])
        .withColumn("sev", c["sev"])
        .select(*c["out"])
    )
    return finish_os_vulns(grouped)


@lru_cache(maxsize=None)
def _merge_cols():
    """Frozen Column trees for the per-CVE merge (round 9 — built once
    per process; the expression set is a pure function of the canonical
    column names and rebuilding it cost ~1k py4j round trips/query)."""
    fv = F.struct(
        F.col("pkg").alias("name"),
        F.concat(F.lit("debian:"), F.col("rel_ver")).alias("namespace"),
        F.col("version"),
        F.lit(None).cast("string").alias("min_ver"),
    )
    fv_sort = F.struct("file_priority", "rel_ver", "pkg", "version")
    aggs = [
        F.array_sort(
            F.collect_list(F.struct(F.col("fv_sort").alias("k"), F.col("fv").alias("v")))
        ).alias("fvs"),
        # scalars come from the lowest-priority file that saw the CVE
        # (debian.go:127-133 keeps the existing record, only appends)
        F.min_by("description", F.struct("file_priority", "pkg")).alias("description"),
        # severity = max urgency over the package rows of the FIRST file
        # that saw the CVE (debian.go:202-209 within a file; later files
        # only append FixedIn) — filter to min file_priority, then max
        F.collect_list(
            F.struct(
                "file_priority", priority_ordinal("severity").alias("o"), "severity", "urgency"
            )
        ).alias("sev_rows"),
    ]
    min_fp = F.array_min("sev_rows.file_priority")
    sev = F.array_max(
        F.filter("sev_rows", lambda s: s["file_priority"] == F.col("min_fp"))
    )
    out = [
        F.col("cve").alias("name"),
        F.concat(F.lit(LINK_PREFIX), F.col("cve")).alias("link"),
        F.col("description"),
        F.col("sev.severity").alias("severity"),
        F.col("sev.urgency").alias("feed_rating"),
        F.col("fvs.v").alias("fixed_in"),
    ]
    return {"fv": fv, "fv_sort": fv_sort, "aggs": aggs, "min_fp": min_fp,
            "sev": sev, "out": out}
