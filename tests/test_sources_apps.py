"""Golden tests for the app-vulnerability sources (GHSA, Go OSV, ruby,
k8s, manual, openshift, openssl, nginx) and the serial-priority
orchestrator, against fixtures/vul-source/."""

from __future__ import annotations

import os

import pytest

from vul_dbgen_spark.sources import APP_SOURCES
from vul_dbgen_spark.sources.apps import load_all

ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures", "vul-source"
)


def terms(row_terms):
    return [(t["op_code"], t["version"]) for t in row_terms]


def one(rows, **kv):
    sel = [r for r in rows if all(r[k] == v for k, v in kv.items())]
    assert len(sel) == 1, f"expected exactly one row for {kv}, got {len(sel)}"
    return sel[0]


# ---------------------------------------------------------------------------
# GHSA (S15, A7)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ghsa_rows(spark):
    return APP_SOURCES["ghsa"](spark, ROOT).collect()


def test_ghsa_basic_record(ghsa_rows):
    v = one(ghsa_rows, vul_name="CVE-2019-10744")
    assert v["app_name"] == "npm"
    assert v["module_name"] == "lodash"
    assert v["severity"] == "High"
    # CVSS:3.0 vector → v3 slots (ghsa.go:165-173)
    assert v["score_v3"] == 7.4 and v["vectors_v3"].startswith("CVSS:3.0/")
    assert v["score"] is None and v["vectors"] is None
    assert terms(v["affected_ver"]) == [("lt", "4.17.12")]
    assert terms(v["fixed_ver"]) == [("", "4.17.12")]
    assert v["description"] == (
        "Prototype Pollution in lodash\nVersions of lodash before 4.17.12 are vulnerable to Prototype Pollution.\n"
    )
    assert v["cves"] == ["CVE-2019-10744"]


def test_ghsa_multiline_merge(ghsa_rows):
    v = one(ghsa_rows, vul_name="CVE-2020-7598")
    # non-CVSS3 vector → v2 slots
    assert v["score"] == 5.6 and v["vectors"].startswith("AV:N")
    # second line's affected gets an or-prefix on its first term
    assert terms(v["affected_ver"]) == [
        ("gteq", "1.0.0"),
        ("lt", "1.2.3"),
        ("orlt", "0.2.4"),
    ]
    assert terms(v["fixed_ver"]) == [("", "1.2.3"), ("", "0.2.4")]


def test_ghsa_invalid_severity_line_skipped_then_created(ghsa_rows):
    # first left-pad line has unmappable severity; second line creates
    v = one(ghsa_rows, vul_name="GHSA-xxxx-yyyy-zzzz")
    assert v["severity"] == "Low"
    assert v["description"].startswith("Second line creates the record")
    assert terms(v["affected_ver"]) == [("lt", "1.1.0")]
    # lone 0.0.0 fixed → cleared (ghsa.go:192-194)
    assert terms(v["fixed_ver"]) == []


def test_ghsa_cwe_fallback_name(ghsa_rows):
    v = one(ghsa_rows, vul_name="CWE-506")
    assert v["cves"] == []
    assert terms(v["affected_ver"]) == [("eq", "3.3.6")]


def test_ghsa_jre_cleanup_and_prefix(ghsa_rows):
    v = one(ghsa_rows, vul_name="CVE-2021-3333")
    assert v["module_name"] == "com.microsoft.sqlserver:mssql-jdbc"
    assert v["app_name"] == "maven"
    # .jre11 stripped before range parse (ghsa_test.go:10-44)
    assert terms(v["affected_ver"]) == [("gteq", "8.2.0"), ("lt", "8.2.2")]
    assert terms(v["fixed_ver"]) == [("", "8.2.2")]


# ---------------------------------------------------------------------------
# Go OSV (S16)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def go_rows(spark):
    return APP_SOURCES["govuln"](spark, ROOT).collect()


def test_govuln_semver_ranges_and_imports(go_rows):
    v = one(go_rows, vul_name="GO-2022-0969")
    assert v["app_name"] == "go"
    assert v["module_name"] == "go:stdlib"
    assert terms(v["affected_ver"]) == [
        ("gteq", "0"),
        ("andlt", "1.18.6"),
        ("gteq", "1.19.0"),
        ("andlt", "1.19.1"),
    ]
    assert terms(v["fixed_ver"]) == [("gteq", "1.18.6"), ("gteq", "1.19.1")]
    assert v["import_paths"] == ["net/http", "golang.org/x/net/http2"]
    assert v["symbols"] == ["ListenAndServe", "Serve", "ConfigureServer"]
    assert v["cves"] == ["CVE-2022-27664"]
    assert v["severity"] == "High" and v["score_v3"] == 7.5
    assert v["link"] == "https://pkg.go.dev/vuln/GO-2022-0969"


def test_govuln_no_severity_reference_link(go_rows):
    v = one(go_rows, vul_name="GO-2021-0113")
    assert v["severity"] is None
    assert v["link"] == "https://go.dev/cl/340830"  # first reference fallback
    assert terms(v["affected_ver"]) == [("gteq", "0"), ("andlt", "0.3.7")]


def test_govuln_custom_ranges_before_semver(go_rows):
    v = one(go_rows, vul_name="GO-2020-0001")
    # ECOSYSTEM custom ranges first, then SEMVER with orgteq
    # (govuln_test.go golden shape)
    assert terms(v["affected_ver"]) == [
        ("gteq", "5.2.0"),
        ("andlt", "5.3.0"),
        ("orgteq", "5.3.0"),
        ("andlt", "5.3.4"),
        ("orgteq", "5.4.0"),
        ("andlt", "5.4.7"),
    ]
    assert v["score"] == 6.4 and v["score_v3"] == 5.0
    assert v["severity"] == "Medium"


def test_govuln_whitelist_dropped(go_rows):
    assert not [r for r in go_rows if r["vul_name"] == "GO-2022-0635"]


# ---------------------------------------------------------------------------
# Ruby (S17)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ruby_rows(spark):
    return APP_SOURCES["ruby"](spark, ROOT).collect()


def test_ruby_inventory(ruby_rows):
    # OSVDB-only and empty-version advisories dropped
    assert sorted(r["vul_name"] for r in ruby_rows) == ["CVE-2019-5477", "CVE-2020-8164"]


def test_ruby_pessimistic_inversion(ruby_rows):
    v = one(ruby_rows, vul_name="CVE-2019-5477")
    assert v["module_name"] == "ruby:nokogiri"
    # term shapes from apps_test.go:13-31; order follows the lexicographic
    # sort on trimmed strings (ruby.go:180-188): 1.0.4 < 1.1.1 < 1.10.4 < 1.2.2
    assert terms(v["affected_ver"]) == [
        ("lt", "1.0.4,1.0"),
        ("orlt", "1.1.1,1.1"),
        ("orlt", "1.10.4"),
        ("orlt", "1.2.2,1.2"),
    ]
    assert terms(v["fixed_ver"]) == [
        ("gteq", "1.0.4,1.0"),
        ("orgteq", "1.1.1,1.1"),
        ("orgteq", "1.10.4"),
        ("orgteq", "1.2.2,1.2"),
    ]
    assert v["score_v3"] == 9.8
    assert "/n" in v["description"]  # the preserved reference typo


def test_ruby_two_part_requirements(ruby_rows):
    v = one(ruby_rows, vul_name="CVE-2020-8164")
    assert terms(v["fixed_ver"]) == [
        ("gteq", "5.2.4.3"),
        ("lt", "6.0.0"),
        ("orgteq", "6.0.3.1"),
    ]
    assert terms(v["unaffected_ver"]) == [("lt", "4.0.0")]
    assert terms(v["affected_ver"]) == [
        ("lt", "5.2.4.3"),
        ("gteq", "6.0.0"),
        ("orlt", "6.0.3.1"),
    ]


# ---------------------------------------------------------------------------
# k8s / manual / openshift (S20-S22)
# ---------------------------------------------------------------------------


def test_k8s_rows(spark):
    rows = APP_SOURCES["k8s"](spark, ROOT).collect()
    v = one(rows, vul_name="CVE-2023-2728")
    assert v["app_name"] == "kubernetes" and v["module_name"] == "kubernetes"
    assert v["cves"] == ["CVE-2023-2728"]
    assert v["severity"] is None  # NVD fills everything else


def test_manual_rows(spark):
    rows = APP_SOURCES["manual"](spark, ROOT).collect()
    v = one(rows, vul_name="CVE-2020-1938")
    assert v["module_name"] == "Tomcat"
    assert v["score"] == 7.5 and v["score_v3"] == 9.8
    assert terms(v["affected_ver"])[2] == ("orlt", "7.0.100,7.0")
    assert v["cves"] is None  # CVEs tag is "-" — never unmarshaled (nil slice)
    b = one(rows, vul_name="CVE-2021-42381")
    assert b["severity"] == "High"


def test_openshift_rows(spark):
    rows = APP_SOURCES["openshift"](spark, ROOT).collect()
    assert len(rows) == 5
    v = one(rows, vul_name="CVE-2018-1002105")
    assert v["severity"] == "Critical" and v["score"] == 9.8
    assert len(v["affected_ver"]) == 10 and len(v["fixed_ver"]) == 10
    v2 = one(rows, vul_name="CVE-2020-8554")
    assert v2["module_name"] == "kubernetes"  # differs from the other four


# ---------------------------------------------------------------------------
# openssl / nginx (S18/S19)
# ---------------------------------------------------------------------------


def test_openssl_rows(spark):
    rows = APP_SOURCES["openssl"](spark, ROOT).collect()
    # severity-less chunk skipped
    assert sorted(r["vul_name"] for r in rows) == ["CVE-2016-2107", "CVE-2022-3602"]
    v = one(rows, vul_name="CVE-2016-2107")
    assert v["severity"] == "Medium"  # Moderate → Medium
    # golden shape from apps_test.go:33-55
    assert terms(v["affected_ver"]) == [
        ("lt", "1.0.2h"),
        ("gteq", "1.0.2"),
        ("orlt", "1.0.1t"),
        ("gteq", "1.0.1"),
    ]
    assert terms(v["fixed_ver"]) == [("", "1.0.2h"), ("", "1.0.1t")]
    assert v["link"] == "https://www.cve.org/CVERecord?id=CVE-2016-2107"


def test_nginx_rows(spark):
    rows = APP_SOURCES["nginx"](spark, ROOT).collect()
    assert sorted(r["vul_name"] for r in rows) == [
        "CVE-2014-0133",
        "CVE-2018-16843",
        "CVE-2021-23017",
    ]
    v = one(rows, vul_name="CVE-2021-23017")
    assert v["severity"] == "Medium"
    assert terms(v["affected_ver"]) == [("gteq", "0.6.18"), ("lteq", "1.20.0")]
    assert terms(v["fixed_ver"]) == [("gteq", "1.21.0"), ("gteq", "1.20.1")]
    multi = one(rows, vul_name="CVE-2018-16843")
    assert multi["severity"] == "High"  # major → High
    assert terms(multi["affected_ver"]) == [
        ("gteq", "1.1.3"),
        ("lteq", "1.15.5"),
        ("orgteq", "1.0.7"),
        ("lteq", "1.0.15"),
    ]
    assert terms(multi["fixed_ver"]) == [("", "None")]
    allv = one(rows, vul_name="CVE-2014-0133")
    assert allv["severity"] == "high"  # the reference's lowercase quirk
    assert terms(allv["affected_ver"]) == [("", "All")]


# ---------------------------------------------------------------------------
# Orchestrator (A9 + final sweep)
# ---------------------------------------------------------------------------


def test_app_orchestrator_upsert_and_sweep(spark):
    rows = load_all(spark, ROOT).collect()
    names = {(r["module_name"], r["vul_name"]) for r in rows}
    # openshift (prio 6) beats k8s (prio 5) for kubernetes:CVE-2020-8554
    v = one(rows, module_name="kubernetes", vul_name="CVE-2020-8554")
    assert v["app_name"] == "openshift.kubernetes"
    assert v["severity"] == "Medium"
    # k8s-only record survives alongside
    assert ("kubernetes", "CVE-2023-2728") in names
    # year gate: ruby CVE-2019-5477 (2019) kept, GO/CWE/GHSA ids kept
    assert ("ruby:nokogiri", "CVE-2019-5477") in names
    assert ("go:golang.org/x/text", "GO-2021-0113") in names
    assert ("event-stream", "CWE-506") in names
    assert ("left-pad", "GHSA-xxxx-yyyy-zzzz") in names
