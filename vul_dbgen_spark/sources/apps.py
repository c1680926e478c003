"""App-source orchestrator (SURVEY.md §3.3, A9).

Behavioral spec: ``/root/reference/updater/fetchers/apps/apps.go:37-96``.
Sources run in a fixed serial order and upsert into one map keyed
``module_name:vul_name`` — later sources overwrite earlier ones
(apps.go:32-35,44-67). The final sweep drops:

- hard-coded withdrawn CVEs (apps.go:23,69-72);
- rejected/withdrawn descriptions (apps.go:74-77);
- pre-2014 records, where the year parses from after the first ``-``;
  unparseable years are ALSO dropped; CWE-/GHSA- prefixed ids are exempt
  (apps.go:79-87).

Spark: union with a ``source_priority`` column + row_number window —
the deterministic form of the reference's overwrite semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import APP_SOURCES
from ..functions.priority import cve_year, should_skip_description

# apps.go:44-67 call order = upsert priority (higher wins)
APP_SOURCE_ORDER = ["govuln", "ghsa", "nginx", "openssl", "ruby", "k8s", "openshift", "manual"]

WITHDRAWN_CVES = ["CVE-2021-23334", "CVE-2024-4109", "CVE-2026-33817"]  # apps.go:23


def app_year_gate(name) -> F.Column:
    """Keep-filter of the final sweep (apps.go:79-87)."""
    name = F.col(name) if isinstance(name, str) else name
    exempt = name.startswith("CWE-") | name.startswith("GHSA-")
    has_dash = name.contains("-")
    y = cve_year(name)
    return exempt | ~has_dash | (y.isNotNull() & (y >= 2014))


def load_all(spark: SparkSession, source_root: str, sources: list[str] | None = None) -> DataFrame:
    """Run the app pipeline: ordered sources → keyed upsert → final sweep.

    ``sources`` limits which feeds run (missing fixture dirs raise in the
    individual loaders), preserving the canonical order.
    """
    names = [s for s in APP_SOURCE_ORDER if sources is None or s in sources]
    if not names:
        raise ValueError("no app sources selected")
    parts = []
    for prio, name in enumerate(names):
        df = APP_SOURCES[name](spark, source_root).withColumn("source_priority", F.lit(prio))
        parts.append(df)
    rows = parts[0]
    for p in parts[1:]:
        rows = rows.unionByName(p)

    # keyed upsert, later source wins (apps.go:32-35); ties within one
    # source broken deterministically by (app_name, description)
    w = Window.partitionBy("module_name", "vul_name").orderBy(
        F.desc("source_priority"), F.desc("app_name"), F.desc("description")
    )
    rows = rows.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).drop("rn")

    rows = (
        rows.filter(~F.col("vul_name").isin(WITHDRAWN_CVES))
        .filter(~should_skip_description("description"))
        .filter(app_year_gate("vul_name"))
        .drop("source_priority")
    )
    return rows
