"""SUSE OVAL source (SURVEY.md S8, J6 test resolution).

Behavioral spec: ``/root/reference/updater/fetchers/suse/suse.go``.

- 25 per-product feed files (SLES 11-16, Leap, Tumbleweed, Liberty,
  Micro) each with a product name prefix and a namespace prefix
  (suse.go:27-53); Tumbleweed gets no version suffix.
- ``tests>rpminfo_test`` comments parse to (pkg, op, version) and
  criterions resolve through ``test_ref`` (J6, suse.go:334-365).
- Name = title before ": " (else whole title), must be CVE- with the
  ≥2014 year gate — Liberty files use ≥2004 (suse.go:206-222).
- The product criterion pins the namespace (prefix + release test
  version); the package criterion supplies (pkg, version); version "0"
  means not-affected-for-all and is skipped (suse.go:367-416).
- CVE list entries are deduped by the CVE-regex match (suse.go:244-253).
"""

from __future__ import annotations

import glob
import os
import re

from pyspark.sql import DataFrame, SparkSession

from . import register_distro
from ..functions.oval import (
    _find,
    _findall,
    _text,
    get_possibilities,
    parse_criteria,
    suse_features,
    suse_parse_test,
)
from .oval_base import SEVERITY_MAP, read_oval_files

# (file basename, product name prefix, namespace prefix, no_version)
# suse.go:27-57
OVALS = [
    ("suse.linux.enterprise.server.16.xml", "SUSE Linux Enterprise Server 16 ", "sles:", False),
    ("suse.linux.enterprise.server.15.xml", "SUSE Linux Enterprise Server 15 ", "sles:", False),
    ("suse.linux.enterprise.server.12.xml", "SUSE Linux Enterprise Server 12 ", "sles:", False),
    ("suse.linux.enterprise.server.11.xml", "SUSE Linux Enterprise Server 11 ", "sles:", False),
    ("opensuse.leap.16.0.xml", "openSUSE Leap 16.0 ", "sles:l", False),
    ("opensuse.leap.15.6.xml", "openSUSE Leap 15.6 ", "sles:l", False),
    ("opensuse.leap.15.5.xml", "openSUSE Leap 15.5 ", "sles:l", False),
    ("opensuse.leap.15.4.xml", "openSUSE Leap 15.4 ", "sles:l", False),
    ("opensuse.leap.15.3.xml", "openSUSE Leap 15.3 ", "sles:l", False),
    ("opensuse.leap.15.2.xml", "openSUSE Leap 15.2 ", "sles:l", False),
    ("opensuse.leap.15.1.xml", "openSUSE Leap 15.1 ", "sles:l", False),
    ("opensuse.leap.15.0.xml", "openSUSE Leap 15.0 ", "sles:l", False),
    ("opensuse.tumbleweed.xml", "openSUSE Tumbleweed ", "sles:tw", True),
    ("suse.liberty.linux.7.xml", "SUSE Liberty Linux 7", "sles:lib", False),
    ("suse.liberty.linux.8.xml", "SUSE Liberty Linux 8", "sles:lib", False),
    ("suse.liberty.linux.9.xml", "SUSE Liberty Linux 9", "sles:lib", False),
    ("suse.linux.enterprise.micro.5.xml", "SUSE Linux Enterprise Micro 5", "sles:micro", False),
    ("suse.linux.enterprise.micro.5.0.xml", "SUSE Linux Enterprise Micro 5.0", "sles:micro", False),
    ("suse.linux.enterprise.micro.5.1.xml", "SUSE Linux Enterprise Micro 5.1", "sles:micro", False),
    ("suse.linux.enterprise.micro.5.2.xml", "SUSE Linux Enterprise Micro 5.2", "sles:micro", False),
    ("suse.linux.enterprise.micro.5.3.xml", "SUSE Linux Enterprise Micro 5.3", "sles:micro", False),
    ("suse.linux.enterprise.micro.5.4.xml", "SUSE Linux Enterprise Micro 5.4", "sles:micro", False),
    ("suse.linux.enterprise.micro.5.5.xml", "SUSE Linux Enterprise Micro 5.5", "sles:micro", False),
    ("suse.linux.micro.6.0.xml", "SUSE Linux Micro 6.0", "sles:micro", False),
    ("suse.linux.micro.6.1.xml", "SUSE Linux Micro 6.1", "sles:micro", False),
]

LIBERTY_FIRST_YEAR = 2004  # suse.go:59
_CVE_RE = re.compile(r"CVE-[0-9]+-[0-9]+")


def _oval_info(path: str):
    base = os.path.basename(path)
    for suffix in (".gz",):
        if base.endswith(suffix):
            base = base[: -len(suffix)]
    for fname, product, prefix, no_ver in OVALS:
        if base == fname:
            return product, prefix, no_ver
    return None


def parse_suse_doc(path: str, xml_bytes: bytes) -> list[dict]:
    import xml.etree.ElementTree as ET

    from .rhel import _clean_desc, _parse_date

    info = _oval_info(path)
    if info is None:
        return []
    product, prefix, no_ver = info
    first_year = LIBERTY_FIRST_YEAR if "liberty" in os.path.basename(path) else 2014

    root = ET.fromstring(xml_bytes)
    test_map = {}
    for t in _findall(root, "tests>rpminfo_test"):
        ti = suse_parse_test(t.get("comment", ""))
        if ti is not None:
            test_map[t.get("id", "")] = ti

    out = []
    for d in _findall(root, "definitions>definition"):
        title = _text(d, "metadata>title")
        name = title[: title.index(": ")].strip() if ": " in title else title
        if not name.startswith("CVE-"):
            continue
        digits = ""
        for ch in name[4:]:
            if ch.isdigit():
                digits += ch
            else:
                break
        if not digits or int(digits) < first_year:
            continue

        crit = parse_criteria(_find(d, "criteria"))
        pkgs = suse_features(get_possibilities(crit), product, prefix, no_ver, test_map)
        if not pkgs:
            continue

        refs = [
            (r.get("source", ""), r.get("ref_url", ""))
            for r in _findall(d, "metadata>reference")
        ]
        link = next((u for s, u in refs if s == "SUSE CVE"), "") or next(
            (u for s, u in refs if s == "CVE"), ""
        )
        issued_el = _find(d, "metadata>advisory>issued")
        updated_el = _find(d, "metadata>advisory>updated")
        issued = _parse_date(issued_el.get("date", "") if issued_el is not None else "")
        updated = _parse_date(updated_el.get("date", "") if updated_el is not None else "")
        issued = issued or updated
        updated = updated or issued

        seen, cves = set(), []
        for c in _findall(d, "metadata>advisory>cve"):
            m = _CVE_RE.search((c.text or ""))
            if m and m.group(0) not in seen:
                seen.add(m.group(0))
                cves.append({"name": m.group(0), "cvss_v2": None, "cvss_v3": None})

        out.append(
            {
                "name": name,
                # vuln namespace unset pre-namespacing (features carry it)
                "description": _clean_desc(_text(d, "metadata>description")),
                "link": link,
                "severity": SEVERITY_MAP.get(
                    _text(d, "metadata>advisory>severity").lower(), "Unknown"
                ),
                "issued_date": issued,
                "last_mod_date": updated,
                "cves": cves,
                "fixed_in": pkgs,
                "feed_rating": _text(d, "metadata>advisory>severity"),
            }
        )
    return out


@register_distro("suse")
def load(spark: SparkSession, source_root: str) -> DataFrame:
    pattern = os.path.join(source_root, "suse", "*.xml*")
    if not glob.glob(pattern):
        raise FileNotFoundError(f"no SUSE OVAL files under {pattern}")
    return read_oval_files(spark, pattern, parse_suse_doc)
