"""OVAL criteria-tree machinery shared by the RHEL/Oracle/SUSE/Mariner
sources (SURVEY.md S5/S7/S8/S10).

``get_possibilities`` is the AND/OR DNF expansion that appears verbatim
in all four reference fetchers (rhel2/rhel.go:511-584,
oracle/oracle.go:343-416, suse/suse.go:270-332, mariner/mariner.go:
200-271): an AND node cross-products its children's possibility lists,
an OR node concatenates them, and a leaf list of criterions is one AND
group (AND) or one group per criterion (OR).

The reference does the full cross-product; ``max_possibilities`` bounds
the blow-up (a pathological tree is an input error, not a semantics
change — the reference would OOM instead).

Everything here is pure Python over parsed XML dicts — executed inside
``mapInPandas`` per feed file, so the driver never touches XML.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import NamedTuple

from .version import MAXV, MINV, parse_unsafe


class Criterion(NamedTuple):
    comment: str
    test_ref: str


def strip_ns(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _find(el, path: str):
    """Namespace-agnostic find of a nested local-name path."""
    cur = [el]
    for part in path.split(">"):
        nxt = []
        for e in cur:
            nxt.extend(c for c in e if strip_ns(c.tag) == part)
        cur = nxt
        if not cur:
            return None
    return cur[0]


def _findall(el, path: str) -> list:
    cur = [el]
    for part in path.split(">"):
        nxt = []
        for e in cur:
            nxt.extend(c for c in e if strip_ns(c.tag) == part)
        cur = nxt
    return cur


def _text(el, path: str) -> str:
    found = _find(el, path)
    return (found.text or "") if found is not None else ""


def parse_criteria(el) -> dict:
    """<criteria> element → {operator, criterions, criterias} tree."""
    if el is None:
        return {"operator": "", "criterions": [], "criterias": []}
    return {
        "operator": el.get("operator", ""),
        "criterions": [
            Criterion(c.get("comment", ""), c.get("test_ref", ""))
            for c in el
            if strip_ns(c.tag) == "criterion"
        ],
        "criterias": [parse_criteria(c) for c in el if strip_ns(c.tag) == "criteria"],
    }


def _get_criterions(node: dict, ignored: tuple[str, ...]) -> list[list[Criterion]]:
    crits = [
        c
        for c in node["criterions"]
        if not any(ign in c.comment for ign in ignored)
    ]
    if node["operator"] == "AND":
        return [crits]
    if node["operator"] == "OR":
        return [[c] for c in crits]
    return []


def get_possibilities(
    node: dict, ignored: tuple[str, ...] = (), max_possibilities: int = 100_000
) -> list[list[Criterion]]:
    """DNF expansion of a criteria tree (rhel.go:542-584)."""
    if not node["criterias"]:
        return _get_criterions(node, ignored)

    to_compose = [get_possibilities(c, ignored, max_possibilities) for c in node["criterias"]]
    if node["criterions"]:
        to_compose.append(_get_criterions(node, ignored))

    possibilities: list[list[Criterion]] = []
    if node["operator"] == "AND":
        possibilities = [list(p) for p in to_compose[0]]
        for group in to_compose[1:]:
            new = []
            for p in possibilities:
                for g in group:
                    new.append(p + g)
                    if len(new) > max_possibilities:
                        raise ValueError("OVAL criteria cross-product exceeds bound")
            possibilities = new
    elif node["operator"] == "OR":
        for group in to_compose:
            possibilities.extend(group)
    return possibilities


# ---------------------------------------------------------------------------
# Per-distro criterion-comment parsers
# ---------------------------------------------------------------------------


def _valid(ns: str, name: str, version) -> bool:
    return bool(ns) and bool(name) and str(version) != ""


def rhel_features(possibilities: list[list[Criterion]], ros: int) -> list[dict]:
    """rhel2/rhel.go:586-665 (toFeatureVersions)."""
    out: dict[str, dict] = {}
    for criterions in possibilities:
        name, version = "", None
        for c in criterions:
            cm = c.comment
            if " is installed" in cm and "Red Hat Enterprise Linux " in cm:
                pass  # release criterion; version pinned by folder (ros)
            elif " is earlier than " in cm:
                i = cm.index(" is earlier than ")
                name = cm[:i].strip()
                ver = cm[i + len(" is earlier than ") :]
                epoch = ""
                a = ver.find(":")
                if a > 0:
                    epoch, ver = ver[: a + 1], ver[a + 1 :]
                if ver[:3] == "svn":
                    ver = ver[3:]
                if ver[:1] == "v":
                    ver = ver[1:]
                version = parse_unsafe(epoch + ver)  # NewVersion err → zero (skipped below)
                if str(version) == "":
                    version = None
            elif ".unaffected:" in c.test_ref:
                if (a := cm.find(" is not installed")) > 0:
                    name = cm[:a].strip()
                elif (a := cm.find(" is installed")) > 0:
                    name = cm[:a].strip()
                version = MINV
            elif " is installed" in cm:
                name = cm[: cm.index(" is installed")].strip()
                version = MAXV
        ns = f"centos:{ros}"
        vstr = version if isinstance(version, str) else (str(version) if version else "")
        if _valid(ns, name, vstr):
            out[f"{ns}:{name}"] = {
                "name": name,
                "namespace": ns,
                "version": vstr,
                "min_ver": None,
            }
    return list(out.values())


def oracle_features(possibilities: list[list[Criterion]], first_elsa: int = 7) -> list[dict]:
    """oracle/oracle.go:418-473 (toFeatureVersions); os version parsed from
    the 'Oracle Linux N is installed' criterion, releases < 7 dropped."""
    out: dict[str, dict] = {}
    for criterions in possibilities:
        name, version, os_version = "", None, 0
        for c in criterions:
            cm = c.comment
            if " is installed" in cm:
                prefix = len("Oracle Linux ")
                rest = cm[prefix:]
                a = rest.find(" ")
                if a > 0:
                    try:
                        os_version = int(rest[:a].strip())
                    except ValueError:
                        pass
            elif " is earlier than " in cm:
                i = cm.index(" is earlier than ")
                name = cm[:i].strip()
                version = parse_unsafe(cm[i + len(" is earlier than ") :])
                if str(version) == "":
                    version = None
        if os_version < first_elsa:
            continue
        ns = f"oracle:{os_version}"
        vstr = str(version) if version else ""
        if _valid(ns, name, vstr):
            out[f"{ns}:{name}"] = {
                "name": name,
                "namespace": ns,
                "version": vstr,
                "min_ver": None,
            }
    return list(out.values())


def suse_parse_test(comment: str):
    """suse/suse.go:334-365: 'pkg op version ...' test comment →
    (name, op, version_str) or None."""
    s = comment.find(" ")
    if s == -1:
        return None
    name = comment[:s]
    rest = comment[s + 1 :]
    for op in ("==", "<=", ">=", "<", ">"):  # longer patterns first
        o = rest.find(op)
        if o != -1:
            v = rest[o + len(op) :]
            sp = v.find(" ")
            if sp != -1:
                v = v[:sp]
            if str(parse_unsafe(v)) == "":
                return None  # NewVersion failure drops the test (suse.go:349-355)
            return (name, op, v)
    return None


def suse_features(
    possibilities: list[list[Criterion]],
    oval_name: str,
    ns_prefix: str,
    no_version: bool,
    test_map: dict[str, tuple],
) -> list[dict]:
    """suse/suse.go:367-416 (parsePackageVersions)."""
    out: dict[str, dict] = {}
    for criterions in possibilities:
        ns, name, version = "", "", ""
        for c in criterions:
            cm = c.comment
            if cm.startswith(oval_name) and " is installed" in cm:
                ti = test_map.get(c.test_ref)
                if ti is not None:
                    ns = ns_prefix if no_version else f"{ns_prefix}{parse_unsafe(ti[2])}"
            elif not cm.startswith("SUSE") and (
                " is installed" in cm or " is not affected" in cm
            ):
                ti = test_map.get(c.test_ref)
                if ti is not None:
                    if ti[2] == "0":
                        continue  # not affected for all versions
                    version = str(parse_unsafe(ti[2]))
                    name = ti[0]
        if _valid(ns, name, version):
            out[f"{ns}:{name}"] = {
                "name": name,
                "namespace": ns,
                "version": version,
                "min_ver": None,
            }
    return list(out.values())


def mariner_ref_num(idstring: str) -> str:
    """mariner/mariner.go:188-198: last of 4 colon-separated parts."""
    parts = idstring.split(":")
    return parts[3] if len(parts) == 4 else ""


def mariner_features(
    possibilities: list[list[Criterion]],
    test_map: dict[str, dict],
    obj_map: dict[str, list[str]],
    state_map: dict[str, str],
) -> list[dict]:
    """mariner/mariner.go:273-319 (toFeatureVersions)."""
    out: dict[str, dict] = {}
    for criterions in possibilities:
        name, version = "", None
        for c in criterions:
            t = test_map.get(mariner_ref_num(c.test_ref))
            if t is None:
                continue
            names = obj_map.get(mariner_ref_num(t["object_ref"]), [])
            evr = state_map.get(mariner_ref_num(t["state_ref"]), "")
            if names:
                name = names[0]
            version = parse_unsafe(evr)
        ns = "mariner:1.0"  # hard-coded even for 2.0 input (mariner.go:300)
        vstr = str(version) if version else ""
        if _valid(ns, name, vstr):
            out[f"{ns}:{name}"] = {
                "name": name,
                "namespace": ns,
                "version": vstr,
                "min_ver": None,
            }
    return list(out.values())
