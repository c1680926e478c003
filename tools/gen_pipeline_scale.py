#!/usr/bin/env python
"""Generate a scaled synthetic advisory corpus for the composed
reference pipeline (fetch → namespace → enrich → upsert → sink), so
`pipeline_e2e` gets the scale row every other operator family already
has (round-5 VERDICT directive #5).

Mechanism: structure-aware replication of fixtures/vul-source. For
copy c (1..k-1) every advisory identity is rewritten by a GLOBAL,
format-agnostic id map — CVE-YYYY-N → CVE-YYYY-(N + c·10⁷), RHSA/RLSA/
ELSA-YYYY:N → +c·10⁵, ALAS…-N → +c·10⁵, GO-YYYY-N / OSVDB-N / CGA ids /
OVAL definition ids bumped, GHSA last-8-chars re-encoded base-36 — and
the rewritten copies are merged back in each source's NATIVE shape
(dict-merge for debian, list-extend for alpine/photon/rocky/k8s/nvd,
NDJSON-append for GHSA/app-manual, per-file copies for ubuntu/golang/
ruby/chainguard/amazon pages, <definition>/<item> block replication
for the four OVAL XMLs and the ALAS RSS). Because the rewrite is pure
text-level and applied with the same c everywhere, every CROSS-source
relationship is preserved by construction: the NVD dimension carries
the rewritten CVEs so enrichment hit-rates stay constant, the Ubuntu
tracker carries them so the Go-vulndb calibration (J5) still joins,
and year/severity gate behavior is identical per copy (years are never
rewritten).

Deliberately NOT scaled (fixed-size dims, documented): the openssl /
nginx HTML scrapes (fixed upstream pages), the openshift manual
literals, and the RHEL repo-to-cpe raw passthrough — these are
constant-size in production too.

Deterministic (no RNG: the transformation is a pure function of the
committed fixtures and k). Output: fixtures/vul-source-x{k}.

Usage: python tools/gen_pipeline_scale.py [k] [outdir]
"""

from __future__ import annotations

import json
import os
import re
import shutil
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(ROOT, "fixtures", "vul-source")

_B36 = "0123456789abcdefghijklmnopqrstuvwxyz"


def _ghsa_bump(m: re.Match, c: int) -> str:
    """Re-encode the last two GHSA blocks as base-36 + c·997 (odd step
    so distinct originals stay distinct for all c ≤ 10⁴)."""
    tail = (m.group(2) + m.group(3)).replace("-", "")
    n = int(tail, 36) + c * 997
    enc = ""
    for _ in range(8):
        n, r = divmod(n, 36)
        enc = _B36[r] + enc
    return f"GHSA-{m.group(1)}-{enc[:4]}-{enc[4:]}"


def rewrite(text: str, c: int) -> str:
    """The global id map for copy c — collision-free against the
    original corpus (fixture ids are < 10⁷/10⁵ respectively) and
    across copies (disjoint offset ranges per c)."""
    text = re.sub(
        r"CVE-(\d{4})-(\d+)",
        lambda m: f"CVE-{m.group(1)}-{int(m.group(2)) + c * 10**7}",
        text,
    )
    text = re.sub(
        r"(RHSA|RLSA|ELSA)-(\d{4}):(\d+)",
        lambda m: f"{m.group(1)}-{m.group(2)}:{int(m.group(3)) + c * 10**5}",
        text,
    )
    text = re.sub(
        r"ALAS(\d*)-(\d{4})-(\d+)",
        lambda m: f"ALAS{m.group(1)}-{m.group(2)}-{int(m.group(3)) + c * 10**5}",
        text,
    )
    text = re.sub(
        r"GHSA-([0-9a-z]{4})-([0-9a-z]{4})-([0-9a-z]{4})",
        lambda m: _ghsa_bump(m, c),
        text,
    )
    text = re.sub(
        r"GO-(\d{4})-(\d+)",
        lambda m: f"GO-{m.group(1)}-{int(m.group(2)) + c * 10**5}",
        text,
    )
    text = re.sub(
        r"OSVDB-(\d+)", lambda m: f"OSVDB-{int(m.group(1)) + c * 10**5}", text
    )
    text = re.sub(
        r"CGA-([0-9a-z]{4})-([0-9a-z]{4})-([0-9a-z]{4})",
        lambda m: f"CGA-{m.group(1)}-{m.group(2)}-"
        + "".join(_B36[(_B36.index(ch) + c) % 36] for ch in m.group(3)),
        text,
    )
    # OVAL definition ids: oval:…:def:NNNN (tests/objects/states are
    # intentionally untouched — replicated definitions re-reference the
    # same package tests, which is exactly how big OVAL feeds look)
    text = re.sub(
        r":def:(\d+)", lambda m: f":def:{int(m.group(1)) + c * 10**7}", text
    )
    return text


def _read(p: str) -> str:
    with open(p, encoding="utf-8") as f:
        return f.read()


def _write(p: str, s: str) -> None:
    os.makedirs(os.path.dirname(p), exist_ok=True)
    with open(p, "w", encoding="utf-8") as f:
        f.write(s)


def per_file_copies(rel_dir: str, out: str, k: int) -> None:
    """One advisory per file (ubuntu tracker, golang OSV, ruby YAML,
    chainguard OSV, amazon pages): copy 0 verbatim, then k-1 rewritten
    copies under rewritten filenames."""
    src_dir = os.path.join(SRC, rel_dir)
    for dirpath, _, files in os.walk(src_dir):
        rel = os.path.relpath(dirpath, SRC)
        for fn in files:
            body = _read(os.path.join(dirpath, fn))
            _write(os.path.join(out, rel, fn), body)
            for c in range(1, k):
                _write(os.path.join(out, rel, rewrite(fn, c)), rewrite(body, c))


def json_merge_dict(rel: str, out: str, k: int) -> None:
    """debian: {package: {cve: entry}} — rewritten CVE keys merge into
    each package's dict."""
    body = _read(os.path.join(SRC, rel))
    merged = json.loads(body)
    for c in range(1, k):
        for pkg, cves in json.loads(rewrite(body, c)).items():
            merged.setdefault(pkg, {}).update(cves)
    _write(os.path.join(out, rel), json.dumps(merged, indent=1))


def json_extend_list(rel: str, out: str, k: int, path: list[str]) -> None:
    """Containers with a list of advisories at `path` (alpine packages,
    photon root list, rocky advisories, k8s items, nvd vulnerabilities)."""
    body = _read(os.path.join(SRC, rel))
    doc = json.loads(body)
    target = doc
    for key in path[:-1]:
        target = target[key]
    base = target[path[-1]] if path else doc
    for c in range(1, k):
        copy_doc = json.loads(rewrite(body, c))
        for key in path[:-1]:
            copy_doc = copy_doc[key]
        items = copy_doc[path[-1]] if path else copy_doc
        if rel.startswith("rocky"):
            for adv in items:
                adv["id"] = adv["id"] + c * 10**6
        base.extend(items)
    if "totalResults" in (doc if isinstance(doc, dict) else {}):
        doc["totalResults"] = len(base)
        doc["resultsPerPage"] = len(base)
    _write(os.path.join(out, rel), json.dumps(doc, indent=1))


def ndjson_append(rel: str, out: str, k: int) -> None:
    body = _read(os.path.join(SRC, rel))
    lines = [ln for ln in body.splitlines() if ln.strip()]
    all_lines = list(lines)
    for c in range(1, k):
        all_lines.extend(rewrite(ln, c) for ln in lines)
    _write(os.path.join(out, rel), "\n".join(all_lines) + "\n")


def xml_block_replicate(rel: str, out: str, k: int, tag: str, anchor: str) -> None:
    """OVAL <definition> / RSS <item> replication: rewritten copies of
    every block are inserted before the section's closing anchor."""
    body = _read(os.path.join(SRC, rel))
    blocks = re.findall(rf"<{tag}[\s>].*?</{tag}>", body, re.S)
    extra = []
    for c in range(1, k):
        extra.extend(rewrite(b, c) for b in blocks)
    _write(os.path.join(out, rel), body.replace(anchor, "\n".join(extra) + anchor, 1))


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(ROOT, "fixtures", f"vul-source-x{k}")
    )
    if os.path.isdir(out):
        shutil.rmtree(out)
    # start from a verbatim copy so unscaled sources (openssl, nginx,
    # openshift, redhat repo-to-cpe raw files) are present unchanged
    shutil.copytree(SRC, out)

    per_file_copies("ubuntu-cve-tracker", out, k)
    per_file_copies("apps/golang-osv", out, k)
    per_file_copies("ruby-advisory-db", out, k)
    per_file_copies("chainguard", out, k)
    per_file_copies("amazon/pages", out, k)

    for rel in ("debian/debian.json", "debian/debian-buster.json",
                "debian/debian-stretch.json"):
        if os.path.exists(os.path.join(SRC, rel)):
            json_merge_dict(rel, out, k)

    json_extend_list("alpine/v3.18/main.json", out, k, ["packages"])
    json_extend_list("alpine/v3.18/community.json", out, k, ["packages"])
    json_extend_list("photon/cve_data_photon3.0.json", out, k, [])
    json_extend_list("rocky/apollo.json", out, k, ["advisories"])
    json_extend_list("apps/k8s.json", out, k, ["items"])
    json_extend_list("nvd/nvdcve-2.0-sample.json", out, k, ["vulnerabilities"])

    ndjson_append("github/maven.data", out, k)
    ndjson_append("github/npm.data", out, k)
    ndjson_append("app-manual/busybox.db", out, k)
    ndjson_append("app-manual/toomcat.db", out, k)

    for rel in ("redhat/7/com.redhat.rhsa-RHEL7.oval.xml",
                "redhat/8/com.redhat.rhsa-RHEL8.oval.xml",
                "oracle/com.oracle.elsa-ol7.xml",
                "oracle/com.oracle.elsa-ol8.xml",
                "suse/suse.linux.enterprise.server.15.xml",
                "mariner-vulnerability/cbl-mariner-1.0-oval.xml"):
        xml_block_replicate(rel, out, k, "definition", "</definitions>")
    for rel in ("amazon/alas2.rss", "amazon/alas2023.rss"):
        xml_block_replicate(rel, out, k, "item", "</channel>")

    print(f"x{k} advisory corpus written to {out}")


if __name__ == "__main__":
    main()
