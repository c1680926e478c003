"""Severity (Priority) ordered enum + CVSS-driven severity calibration.

Behavioral spec: ``/root/reference/common/priority.go:4-34`` (ordinal enum)
and ``/root/reference/updater/updater.go:293-333`` (``fixSeverityScore``,
NVSHAS-4709). Everything here is pure Column expressions — no UDFs — so it
stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

PRIORITIES = ["Unknown", "Negligible", "Low", "Medium", "High", "Critical", "Defcon1"]

# severities the pipeline keeps (updater.go:35-37, IgnoreSeverity inverted)
KEPT_SEVERITIES = ["Critical", "High", "Medium", "Low"]


def priority_ordinal(col: Column | str) -> Column:
    """0-based ordinal; unknown strings get len(PRIORITIES) like the Go
    loop running off the end (priority.go:19-34)."""
    col = F.col(col) if isinstance(col, str) else col
    arr = F.array(*[F.lit(p) for p in PRIORITIES])
    pos = F.array_position(arr, col)  # 1-based, 0 if absent
    return F.when(pos == 0, F.lit(len(PRIORITIES))).otherwise(pos - 1)


def max_priority(col: Column | str) -> Column:
    """Aggregate: the highest-ordinal severity in a group (debian.go:202-209)."""
    col = F.col(col) if isinstance(col, str) else col
    return F.max_by(col, priority_ordinal(col))


def severity_gate(col: Column | str) -> Column:
    """Boolean keep-filter: Critical/High/Medium/Low only (updater.go:35-37)."""
    col = F.col(col) if isinstance(col, str) else col
    return col.isin(KEPT_SEVERITIES)


def fix_severity_score(
    feed_severity: Column, score_v2: Column, score_v3: Column
) -> tuple[Column, Column, Column]:
    """(severity, score_v2, score_v3) after NVSHAS-4709 calibration.

    Severity always re-derived from max CVSS score bands (>=9 Critical,
    >=7 High, >=4 Medium, >=1 Low, else feed severity); missing scores
    back-filled 9/7/4/1 from the derived severity (updater.go:293-333).
    """
    s2 = F.coalesce(score_v2, F.lit(0.0))
    s3 = F.coalesce(score_v3, F.lit(0.0))
    severity = (
        F.when((s3 >= 9) | (s2 >= 9), F.lit("Critical"))
        .when((s3 >= 7) | (s2 >= 7), F.lit("High"))
        .when((s3 >= 4) | (s2 >= 4), F.lit("Medium"))
        .when((s3 >= 1) | (s2 >= 1), F.lit("Low"))
        .otherwise(feed_severity)
    )
    backfill = (
        F.when(severity == "Critical", F.lit(9.0))
        .when(severity == "High", F.lit(7.0))
        .when(severity == "Medium", F.lit(4.0))
        .when(severity == "Low", F.lit(1.0))
        .otherwise(F.lit(0.0))
    )
    out_v3 = F.when(s3 == 0, backfill).otherwise(s3)
    out_v2 = F.when(s2 == 0, backfill).otherwise(s2)
    return severity, out_v2, out_v3


def should_skip_description(col: Column | str) -> Column:
    """True when the description marks a rejected/withdrawn advisory
    (updater/filter.go:5-19, case-insensitive substring match)."""
    col = F.col(col) if isinstance(col, str) else col
    low = F.lower(F.coalesce(col, F.lit("")))
    return low.contains("rejected reason") | low.contains("withdrawn advisory")


def cve_year(name: Column | str) -> Column:
    """Leading year of a CVE-style id ('CVE-2021-1234' → 2021); null when the
    id has no parseable year (common/db.go:63-70 ParseYear)."""
    name = F.col(name) if isinstance(name, str) else name
    y = F.regexp_extract(name, r"^[A-Za-z]+-(\d{4})", 1)
    return F.when(y == "", F.lit(None).cast("int")).otherwise(y.cast("int"))


def year_gate(name: Column | str, first_year: int = 2014, exempt_prefixes=("CWE-", "GHSA-")) -> Column:
    """Keep-filter: year >= first_year; ids without a year and exempted
    prefixes (CWE-/GHSA-, apps.go:79-87) are kept."""
    name = F.col(name) if isinstance(name, str) else name
    y = cve_year(name)
    exempt = F.lit(False)
    for p in exempt_prefixes:
        exempt = exempt | name.startswith(p)
    return exempt | y.isNull() | (y >= first_year)
