"""Golden tests for the OVAL family (RHEL, Oracle, SUSE, Mariner) plus
the DNF expansion and RHSA-culling unit cases from the reference tests."""

from __future__ import annotations

import os

import pytest

from vul_dbgen_spark.functions import oval as O
from vul_dbgen_spark.schemas import OS_VULNS
from vul_dbgen_spark.sources import DISTRO_SOURCES
from vul_dbgen_spark.sources.rhel import cull_rhsa

ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures", "vul-source"
)


def one(rows, **kv):
    sel = [r for r in rows if all(r[k] == v for k, v in kv.items())]
    assert len(sel) == 1, f"expected one row for {kv}, got {len(sel)}"
    return sel[0]


def fixset(row):
    return {(f["namespace"], f["name"], f["version"]) for f in row["fixed_in"]}


# ---------------------------------------------------------------------------
# DNF expansion (pure function)
# ---------------------------------------------------------------------------


def c(comment, ref=""):
    return O.Criterion(comment, ref)


def test_get_possibilities_and_or_cross_product():
    tree = {
        "operator": "AND",
        "criterions": [c("base")],
        "criterias": [
            {"operator": "OR", "criterions": [c("a"), c("b")], "criterias": []},
            {"operator": "OR", "criterions": [c("x"), c("y")], "criterias": []},
        ],
    }
    poss = O.get_possibilities(tree)
    combos = sorted(tuple(cr.comment for cr in p) for p in poss)
    # AND composes [a|b] × [x|y] × [base]
    assert combos == [("a", "x", "base"), ("a", "y", "base"), ("b", "x", "base"), ("b", "y", "base")]


def test_get_possibilities_ignored_criterions():
    tree = {
        "operator": "AND",
        "criterions": [c("pkg is earlier than 1"), c("pkg is signed with Red Hat key")],
        "criterias": [],
    }
    poss = O.get_possibilities(tree, (" is signed with Red Hat ",))
    assert [[cr.comment for cr in p] for p in poss] == [["pkg is earlier than 1"]]


# ---------------------------------------------------------------------------
# RHSA culling (rhel_test.go:9-134 scenario)
# ---------------------------------------------------------------------------


def test_rhsa_culling_reference_scenario(spark):
    def fv(name, ns):
        return {"name": name, "namespace": ns, "version": "", "min_ver": None}

    def cve(name):
        return {"name": name, "cvss_v2": None, "cvss_v3": None}

    f1, f2, f3 = fv("ldap", "centos7"), fv("ldap", "centos8"), fv("openldap", "centos7")
    rows = [
        {"name": "CVE-2021-2222", "namespace": "centos7", "fixed_in": [f1, f3], "cves": []},
        {"name": "RHSA-33", "namespace": "centos7", "fixed_in": [f1], "cves": [cve("CVE-2021-2222")]},
        {"name": "RHSA-34", "namespace": "centos8", "fixed_in": [f2, f3], "cves": [cve("CVE-2021-2223"), cve("CVE-2021-2225")]},
        {"name": "CVE-2021-2223", "namespace": "centos8", "fixed_in": [f2], "cves": []},
        {"name": "CVE-2021-2224", "namespace": "centos8", "fixed_in": [f1, f2, f3], "cves": []},
        {"name": "CVE-2021-2225", "namespace": "centos8", "fixed_in": [f2, f3], "cves": []},
    ]
    df = spark.createDataFrame(rows, OS_VULNS)
    out = {r["name"]: r for r in cull_rhsa(df).collect()}
    assert sorted(out) == ["CVE-2021-2222", "CVE-2021-2224", "RHSA-33", "RHSA-34"]
    assert [f["name"] for f in out["CVE-2021-2222"]["fixed_in"]] == ["openldap"]
    assert len(out["CVE-2021-2224"]["fixed_in"]) == 3
    assert len(out["RHSA-34"]["fixed_in"]) == 2


# ---------------------------------------------------------------------------
# RHEL source end-to-end
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def rhel_rows(spark):
    return DISTRO_SOURCES["redhat"](spark, ROOT).collect()


def test_rhel_inventory_and_culling(rhel_rows):
    names = sorted((r["namespace"], r["name"]) for r in rhel_rows)
    # RHSA-2013 dropped (year); centos:7 CVE-2021-2222 survives with only
    # the nss-pam-ldapd feature (openldap culled by RHSA-2021:1234)
    assert names == [
        ("centos:7", "CVE-2021-2222"),
        ("centos:7", "CVE-2021-4444"),
        ("centos:7", "CVE-2021-5555"),
        ("centos:7", "RHSA-2021:1234"),
        ("centos:8", "CVE-2021-2222"),
    ]
    culled = one(rhel_rows, namespace="centos:7", name="CVE-2021-2222")
    assert fixset(culled) == {("centos:7", "nss-pam-ldapd", "0.8.13-25.el7")}


def test_rhel_rhsa_record(rhel_rows):
    v = one(rhel_rows, name="RHSA-2021:1234")
    assert v["severity"] == "Medium" and v["feed_rating"] == "Moderate"
    assert fixset(v) == {
        ("centos:7", "openldap", "2.4.44-23.el7_9"),
        ("centos:7", "openldap-clients", "2.4.44-23.el7_9"),
    }
    assert v["cvss_v3"]["score"] == 7.5 and v["cvss_v2"]["score"] == 5.0
    assert v["link"] == "https://access.redhat.com/errata/RHSA-2021:1234"
    assert v["cpes"] == ["cpe:/o:redhat:enterprise_linux:7"]
    assert [x["name"] for x in v["cves"]] == ["CVE-2021-2222"]
    # description newlines flattened (rhel.go:667-673)
    assert "\n" not in v["description"]


def test_rhel_svn_prefix_and_unaffected(rhel_rows):
    svn = one(rhel_rows, name="CVE-2021-4444")
    assert fixset(svn) == {("centos:7", "kernel", "3.10.0-1160.31.1.el7")}
    unaff = one(rhel_rows, name="CVE-2021-5555")
    assert fixset(unaff) == {("centos:7", "podman", "#MINV#")}


def test_rhel_same_ns_merge_set_semantics(rhel_rows):
    # centos:8 CVE-2021-2222 appears in two definitions; FixedIn unions
    # with set dedup (A4)
    v = one(rhel_rows, namespace="centos:8", name="CVE-2021-2222")
    assert fixset(v) == {
        ("centos:8", "openldap", "2.4.46-18.el8"),
        ("centos:8", "openldap-servers", "2.4.46-18.el8"),
    }


# ---------------------------------------------------------------------------
# Oracle
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def oracle_rows(spark):
    return DISTRO_SOURCES["oracle"](spark, ROOT).collect()


def test_oracle_merge_across_releases(oracle_rows):
    # OL6 def dropped (release < 7); the two ELSA-2021-9151 defs merge
    assert [r["name"] for r in oracle_rows] == ["ELSA-2021-9151"]
    v = oracle_rows[0]
    assert fixset(v) == {
        ("oracle:7", "glibc", "2.17-323.0.1.el7"),
        ("oracle:7", "glibc-devel", "2.17-323.0.1.el7"),
        ("oracle:8", "glibc", "2.28-151.0.1.el8"),
    }
    # CVEs deduped by name, order preserved
    assert [c["name"] for c in v["cves"]] == ["CVE-2021-3326", "CVE-2021-27645"]
    assert v["severity"] == "High"  # IMPORTANT → High
    # min issued over the merged records
    assert v["issued_date"].strftime("%Y-%m-%d") == "2021-03-19"
    assert v["link"] == "https://linux.oracle.com/errata/ELSA-2021-9151.html"


# ---------------------------------------------------------------------------
# SUSE
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def suse_rows(spark):
    return DISTRO_SOURCES["suse"](spark, ROOT).collect()


def test_suse_rows(suse_rows):
    # pre-2014 dropped; version-0 package dropped (empties the def)
    assert sorted(r["name"] for r in suse_rows) == ["CVE-2021-3712"]
    v = suse_rows[0]
    assert fixset(v) == {
        ("sles:15.3", "libopenssl1_1", "1.1.1d-11.43.1"),
        ("sles:15.3", "openssl-1_1", "1.1.1d-11.43.1"),
    }
    assert v["severity"] == "Medium"
    assert v["link"] == "https://www.suse.com/security/cve/CVE-2021-3712/"
    # CVE regex strips the " at SUSE" suffix
    assert [c["name"] for c in v["cves"]] == ["CVE-2021-3712"]


# ---------------------------------------------------------------------------
# Mariner
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def mariner_rows(spark):
    return DISTRO_SOURCES["mariner"](spark, ROOT).collect()


def test_mariner_rows(mariner_rows):
    names = sorted(r["name"] for r in mariner_rows)
    # Not Applicable and pre-2014 dropped; unpatchable kept featureless
    assert names == ["CVE-2015-0803", "CVE-2018-3914", "CVE-2021-8888"]
    groff = one(mariner_rows, name="CVE-2015-0803")
    assert fixset(groff) == {("mariner:1.0", "groff", "1.22.3-5.cm1")}
    assert groff["severity"] == "Critical"
    assert groff["issued_date"].strftime("%Y-%m-%d") == "2020-10-08"
    unpatched = one(mariner_rows, name="CVE-2021-8888")
    assert unpatched["fixed_in"] == []
