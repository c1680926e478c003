"""Oracle ELSA OVAL source (SURVEY.md S7, A6 merge).

Behavioral spec: ``/root/reference/updater/fetchers/oracle/oracle.go``.

- Feed files ``oracle/*.xml[.bz2]``; HTML error bodies skipped
  (oracle.go:185-203).
- Name = title before ": " (ELSA ids); namespace ``oracle:N`` parsed
  from the 'Oracle Linux N is installed' criterion; releases < 7
  dropped (oracle.go:418-473).
- CVEs carry names only; ksplice and signing criterions ignored
  (oracle.go:30-33).
- Same-name records across feed files merge: FixedIn deduped by
  (ns,name,version), CVEs by name, first non-empty desc/link/severity,
  min issued / max lastmod (mergeVulnerability oracle.go:269-341).
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import register_distro
from ..functions.oval import _find, _findall, _text, get_possibilities, oracle_features, parse_criteria
from ..functions.priority import priority_ordinal
from .oval_base import SEVERITY_MAP, read_oval_files

IGNORED_CRITERIONS = (" is signed with the Oracle Linux", ".ksplice1.")  # oracle.go:30-33


def parse_oracle_doc(path: str, xml_bytes: bytes) -> list[dict]:
    import xml.etree.ElementTree as ET

    from .rhel import _clean_desc, _parse_date

    trimmed = xml_bytes.strip()
    if trimmed.startswith(b"<!DOCTYPE html") or trimmed.startswith(b"<html"):
        return []  # HTML error body (oracle.go:185-192)
    try:
        root = ET.fromstring(xml_bytes)
    except ET.ParseError:
        low = trimmed.lower()
        if b"<html" in low or b"<body" in low:
            return []
        raise
    out = []
    for d in _findall(root, "definitions>definition"):
        title = _text(d, "metadata>title")
        name = title[: title.index(": ")].strip() if ": " in title else ""
        crit = parse_criteria(_find(d, "criteria"))
        pkgs = oracle_features(get_possibilities(crit, IGNORED_CRITERIONS))
        if not pkgs:
            continue
        refs = [
            (r.get("source", ""), r.get("ref_id", ""), r.get("ref_url", ""))
            for r in _findall(d, "metadata>reference")
        ]
        link = next((r[2] for r in refs if r[0] == "elsa"), "")
        if not link:
            link = next((r[2] for r in refs if r[0] == "CVE"), "")
        issued_el = _find(d, "metadata>advisory>issued")
        updated_el = _find(d, "metadata>advisory>updated")
        issued = _parse_date(issued_el.get("date", "") if issued_el is not None else "")
        updated = _parse_date(updated_el.get("date", "") if updated_el is not None else "")
        issued = issued or updated
        updated = updated or issued
        out.append(
            {
                "name": name,
                "description": _clean_desc(_text(d, "metadata>description")),
                "link": link,
                "severity": SEVERITY_MAP.get(
                    _text(d, "metadata>advisory>severity").lower(), "Unknown"
                ),
                "issued_date": issued,
                "last_mod_date": updated,
                "cves": [
                    {"name": (c.text or "").strip(), "cvss_v2": None, "cvss_v3": None}
                    for c in _findall(d, "metadata>advisory>cve")
                ],
                "fixed_in": pkgs,
                "feed_rating": _text(d, "metadata>advisory>severity"),
            }
        )
    return out


def merge_elsa(df: DataFrame) -> DataFrame:
    """A6: same-name merge across feed files (oracle.go:269-341)."""
    rows = df.withColumn("row_order", F.monotonically_increasing_id())
    fv_key = lambda f: F.concat_ws(":", f["namespace"], f["name"], f["version"])  # noqa: E731

    def ordered_flatten(col):
        return F.flatten(
            F.array_sort(
                F.collect_list(F.struct(F.col("row_order").alias("o"), F.col(col).alias("t")))
            )["t"]
        )

    def first_nonempty(col):
        return F.min(
            F.when(
                F.col(col).isNotNull() & (F.col(col) != ""),
                F.struct(F.col("row_order").alias("o"), F.col(col).alias("v")),
            )
        )["v"]

    merged = rows.groupBy("name").agg(
        ordered_flatten("fixed_in").alias("all_fixed_in"),
        ordered_flatten("cves").alias("all_cves"),
        first_nonempty("description").alias("description"),
        first_nonempty("link").alias("link"),
        # Unknown severity counts as empty (oracle.go:281-283)
        F.min(
            F.when(
                priority_ordinal("severity") > 0,
                F.struct(F.col("row_order").alias("o"), F.col("severity").alias("v")),
            )
        )["v"].alias("severity_ne"),
        F.min("issued_date").alias("issued_date"),
        F.max("last_mod_date").alias("last_mod_date"),
        F.min_by("cvss_v2", "row_order").alias("cvss_v2"),
        F.min_by("cvss_v3", "row_order").alias("cvss_v3"),
        F.min_by("namespace", "row_order").alias("namespace"),
        F.min_by("cpes", "row_order").alias("cpes"),
        F.min_by("feed_rating", "row_order").alias("feed_rating"),
    )
    # dedup FixedIn by (ns, name, version) keeping first occurrence; CVEs by name
    dedup_fv = F.filter(
        F.transform(
            "all_fixed_in",
            lambda f, i: F.when(
                F.array_position(
                    F.transform(F.slice("all_fixed_in", 1, i), fv_key), fv_key(f)
                )
                == 0,
                f,
            ),
        ),
        lambda x: x.isNotNull(),
    )
    dedup_cves = F.filter(
        F.transform(
            "all_cves",
            lambda c, i: F.when(
                F.array_position(
                    F.transform(F.slice("all_cves", 1, i), lambda x: x["name"]), c["name"]
                )
                == 0,
                c,
            ),
        ),
        lambda x: x.isNotNull(),
    )
    return merged.select(
        "name",
        "namespace",
        "description",
        "link",
        F.coalesce("severity_ne", F.lit("Unknown")).alias("severity"),
        "cvss_v2",
        "cvss_v3",
        "issued_date",
        "last_mod_date",
        dedup_cves.alias("cves"),
        dedup_fv.alias("fixed_in"),
        "cpes",
        "feed_rating",
    )


@register_distro("oracle")
def load(spark: SparkSession, source_root: str) -> DataFrame:
    pattern = os.path.join(source_root, "oracle", "*.xml*")
    if not glob.glob(pattern):
        raise FileNotFoundError(f"no Oracle ELSA files under {pattern}")
    parsed = read_oval_files(spark, pattern, parse_oracle_doc)
    from ..schemas import OS_VULNS
    from .base import conform

    return conform(merge_elsa(parsed), OS_VULNS)
