"""Ubuntu CVE-tracker source (SURVEY.md S3, J9 feed side).

Behavioral spec: ``/root/reference/updater/fetchers/ubuntu/ubuntu.go``.
One bespoke key:value text file per CVE under
``ubuntu-cve-tracker/{active,retired}/CVE-*``:

- file-name gates: ``CVE-`` prefix + year ≥ 2014 (ubuntu.go:233-240);
- ``Candidate:``/``Priority:``/``Description:`` (with continuation
  lines) headers (ubuntu.go:284-331);
- ``<release>_<pkg>: <status> (<note>)`` lines via the reference regex;
  keep statuses needed/active/deferred/released/not-affected; ignored-
  release and unknown-release skips (ubuntu.go:334-399);
- released → version from the note (skip complex comma notes),
  not-affected → ``#MINV#``, else ``#MAXV#``;
- upstream calibration: drop openssl and ``ubuntu``-suffixed versions in
  ubuntu:upstream, pin hard-coded kernel versions (ubuntu.go:443-475);
- rejected/withdrawn descriptions skipped; records need ≥1 FixedIn
  (ubuntu.go:145-150).

Spark-first: wholetext per file (distributed), parsed with a
``mapInPandas`` generator — the bespoke format has no JVM-side codec.
"""

from __future__ import annotations

import glob
import os
import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from . import register_distro
from ..functions.version import MAXV, MINV, parse_unsafe
from ..schemas import OS_VULNS
from .base import conform

TRACKER_URI = "https://launchpad.net/ubuntu-cve-tracker"
CVE_URL = "http://people.ubuntu.com/~ubuntu-security/cve/%s"

UBUNTU_RELEASES = {  # common/types.go:160-195
    "upstream": "upstream",
    "precise": "12.04",
    "precise/esm": "12.04",
    "quantal": "12.10",
    "raring": "13.04",
    "trusty": "14.04",
    "trusty/esm": "14.04",
    "utopic": "14.10",
    "vivid": "15.04",
    "wily": "15.10",
    "xenial": "16.04",
    "esm-infra/xenial": "16.04",
    "yakkety": "16.10",
    "zesty": "17.04",
    "artful": "17.10",
    "bionic": "18.04",
    "cosmic": "18.10",
    "disco": "19.04",
    "eoan": "19.10",
    "focal": "20.04",
    "groovy": "20.10",
    "hirsute": "21.04",
    "impish": "21.10",
    "jammy": "22.04",
    "kinetic": "22.10",
    "lunar": "23.04",
    "mantic": "23.10",
    "noble": "24.04",
    "esm-apps/bionic": "18.04",
    "esm-apps/focal": "20.04",
    "esm-apps/jammy": "22.04",
    "esm-apps/noble": "24.04",
}

IGNORED_RELEASES = {  # ubuntu.go:45-69
    "devel",
    "dapper",
    "edgy",
    "feisty",
    "gutsy",
    "hardy",
    "intrepid",
    "jaunty",
    "karmic",
    "lucid",
    "maverick",
    "natty",
    "oneiric",
    "saucy",
    "vivid/ubuntu-core",
    "vivid/stable-phone-overlay",
    "Patches",
    "product",
}

SEVERITIES = {  # ubuntu.go:418-436
    "untriaged": "Unknown",
    "negligible": "Negligible",
    "low": "Low",
    "medium": "Medium",
    "high": "High",
    "critical": "Critical",
}

CALIBRATE_MAP = {  # ubuntu.go:443-449 (kernel false-CVE fixes)
    "CVE-2018-1087": ("", "4.17"),
    "CVE-2017-1000405": ("", "4.14"),
    "CVE-2017-17712": ("", "4.14.6"),
    "CVE-2017-16996": ("", "4.14.8"),
    "CVE-2017-16995": ("", "4.14.8"),
}

AFFECTS_RE = re.compile(r"(?P<release>.*)_(?P<package>.*): (?P<status>[^\s]*)( \(+(?P<note>[^()]*)\)+)?")
KEPT_STATUSES = {"needed", "active", "deferred", "released", "not-affected"}

_DESC_BREAKERS = (
    "Ubuntu-Description:",
    "Notes:",
    "Bugs:",
    "Priority:",
    "Discovered-by:",
    "Assigned-to:",
)


def parse_ubuntu_cve(content: str) -> dict:
    """One tracker file → canonical os_vulns dict (ubuntu.go:284-416)."""
    v = {"name": "", "link": "", "severity": "", "feed_rating": None, "description": "", "fixed_in": []}
    reading_desc = False
    for raw in content.splitlines():
        line = raw.strip()
        if line.startswith("#"):
            continue
        if line.startswith("Candidate:"):
            v["name"] = line[len("Candidate:") :].strip()
            v["link"] = CVE_URL % v["name"]
            continue
        if line.startswith("Priority:"):
            prio = line[len("Priority:") :].strip()
            if " " in prio:
                prio = prio[: prio.index(" ")]
            v["severity"] = SEVERITIES.get(prio, "Unknown")
            v["feed_rating"] = prio
            continue
        if line.startswith("Description:"):
            reading_desc = True
            v["description"] = line[len("Description:") :].strip()
            continue
        if reading_desc:
            if line.startswith(_DESC_BREAKERS):
                reading_desc = False
            else:
                v["description"] = v["description"] + " " + line
                continue
        m = AFFECTS_RE.search(line)
        if m:
            release = (m.group("release") or "").strip()
            package = (m.group("package") or "").strip()
            status = (m.group("status") or "").strip()
            note = (m.group("note") or "").strip()
            if status not in KEPT_STATUSES:
                continue
            if release in IGNORED_RELEASES or release not in UBUNTU_RELEASES:
                continue
            version = None
            if status == "released":
                if note and "," not in note:
                    parsed = parse_unsafe(note)
                    version = str(parsed) if str(parsed) else None
            elif status == "not-affected":
                version = MINV
            else:
                version = MAXV
            if not version:
                continue
            v["fixed_in"].append(
                {
                    "name": package,
                    "namespace": "ubuntu:" + UBUNTU_RELEASES[release],
                    "version": version,
                    "min_ver": None,
                }
            )
    v["description"] = v["description"].strip()
    if not v["link"]:
        v["link"] = TRACKER_URI
    if not v["severity"]:
        v["severity"] = "Unknown"
    return v


def upstream_calibration(v: dict) -> None:
    """ubuntu.go:451-475: upstream features lose openssl and
    'ubuntu'-suffixed versions; whitelisted kernel CVEs pin versions."""
    new_fix = []
    for fx in v["fixed_in"]:
        if "upstream" not in fx["namespace"]:
            new_fix.append(fx)
            continue
        if fx["name"] == "openssl":
            continue
        if "ubuntu" in fx["version"]:
            continue
        calib = CALIBRATE_MAP.get(v["name"])
        if calib and (calib[0] == "" or calib[0] == fx["name"]):
            fx = dict(fx, version=str(parse_unsafe(calib[1])))
        new_fix.append(fx)
    v["fixed_in"] = new_fix


def _should_skip_description(desc: str) -> bool:
    low = (desc or "").lower()
    return "rejected reason" in low or "withdrawn advisory" in low


@register_distro("ubuntu")
def load(
    spark: SparkSession, source_root: str, keep_cves: frozenset[str] = frozenset()
) -> DataFrame:
    """``ubuntu-cve-tracker/{active,retired}/CVE-*`` → os_vulns rows.

    ``keep_cves`` mirrors ``CvesIncludeGoVuln`` (ubuntu.go:148-150):
    those CVEs are kept even with no FixedIn, for the Go calibration.
    """
    patterns = [
        os.path.join(source_root, "ubuntu-cve-tracker", d, "CVE-*") for d in ("active", "retired")
    ]
    files = [p for pat in patterns for p in glob.glob(pat)]
    if not files:
        raise FileNotFoundError(f"no Ubuntu tracker files under {patterns}")

    field_names = [f.name for f in OS_VULNS.fields]
    paths = spark.read.format("binaryFile").load(
        os.path.join(source_root, "ubuntu-cve-tracker", "*", "CVE-*")
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for path, content in zip(batch["path"], batch["content"]):
                base = os.path.basename(path)
                # file-name year gate (ubuntu.go:233-240)
                digits = ""
                for ch in base[4:]:
                    if ch.isdigit():
                        digits += ch
                    else:
                        break
                if not base.startswith("CVE-") or not digits or int(digits) < 2014:
                    continue
                v = parse_ubuntu_cve(bytes(content).decode("utf-8", "replace"))
                upstream_calibration(v)
                if _should_skip_description(v["description"]):
                    continue
                if not v["fixed_in"] and v["name"] not in keep_cves:
                    continue
                rows.append({k: v.get(k) for k in field_names})
            yield pd.DataFrame(rows, columns=field_names)

    out = paths.select("path", "content").mapInPandas(gen, OS_VULNS)
    return conform(out, OS_VULNS)
