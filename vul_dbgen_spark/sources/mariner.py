"""CBL-Mariner OVAL source (SURVEY.md S10, J7 resolution).

Behavioral spec: ``/root/reference/updater/fetchers/mariner/mariner.go``.

- Two feed files under ``mariner-vulnerability/``; namespace is
  hard-coded ``mariner:1.0`` even for the 2.0 file (mariner.go:300).
- Name/link from the CVE reference; ≥2014 year gate.
- ``patchable`` gates: "Not Applicable" (case-insensitive) drops the
  record, "true" resolves features, anything else keeps the record
  with no features (mariner.go:176-181).
- Features resolve criterion → test → object (pkg name) + state (EVR
  version) through id-keyed maps, ids being the 4th colon field
  (mariner.go:143-158,188-198,273-319).
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession

from . import register_distro
from ..functions.oval import (
    _find,
    _findall,
    _text,
    get_possibilities,
    mariner_features,
    mariner_ref_num,
    parse_criteria,
)
from .oval_base import read_oval_files

SEVERITY_MAP = {"low": "Low", "medium": "Medium", "high": "High", "critical": "Critical"}


def parse_mariner_doc(path: str, xml_bytes: bytes) -> list[dict]:
    import xml.etree.ElementTree as ET
    from datetime import datetime

    root = ET.fromstring(xml_bytes)

    obj_map = {
        mariner_ref_num(o.get("id", "")): [(n.text or "") for n in o if n.tag.endswith("name")]
        for o in _findall(root, "objects>rpminfo_object")
    }
    state_map = {
        mariner_ref_num(s.get("id", "")): _text(s, "evr")
        for s in _findall(root, "states>rpminfo_state")
    }
    test_map = {}
    for t in _findall(root, "tests>rpminfo_test"):
        obj = _find(t, "object")
        st = _find(t, "state")
        test_map[mariner_ref_num(t.get("id", ""))] = {
            "object_ref": obj.get("object_ref", "") if obj is not None else "",
            "state_ref": st.get("state_ref", "") if st is not None else "",
        }

    out = []
    for d in _findall(root, "definitions>definition"):
        refs = [
            (r.get("source", ""), r.get("ref_id", ""), r.get("ref_url", ""))
            for r in _findall(d, "metadata>reference")
        ]
        cve_ref = next((r for r in refs if r[0] == "CVE"), None)
        name = cve_ref[1] if cve_ref else ""
        digits = ""
        for ch in name[4:]:
            if ch.isdigit():
                digits += ch
            else:
                break
        if not digits or int(digits) < 2014:
            continue

        patchable = _text(d, "metadata>patchable")
        if patchable.lower() == "not applicable":
            continue
        fixed_in = []
        if patchable == "true":
            crit = parse_criteria(_find(d, "criteria"))
            fixed_in = mariner_features(
                get_possibilities(crit), test_map, obj_map, state_map
            )

        adv_date = _text(d, "metadata>advisory_date").split("T")[0]
        try:
            issued = datetime.strptime(adv_date, "%Y-%m-%d")
        except ValueError:
            issued = None

        out.append(
            {
                "name": name,
                "namespace": "mariner:1.0",
                "description": _text(d, "metadata>description"),
                "link": cve_ref[2] if cve_ref else "",
                "severity": SEVERITY_MAP.get(
                    _text(d, "metadata>severity").lower(), "Unknown"
                ),
                "issued_date": issued,
                "fixed_in": fixed_in,
                "feed_rating": _text(d, "metadata>severity"),
            }
        )
    return out


@register_distro("mariner")
def load(spark: SparkSession, source_root: str) -> DataFrame:
    pattern = os.path.join(source_root, "mariner-vulnerability", "*.xml*")
    if not glob.glob(pattern):
        raise FileNotFoundError(f"no Mariner OVAL files under {pattern}")
    return read_oval_files(spark, pattern, parse_mariner_doc)
