"""Golden tests for the first batch of sources (Debian, Alpine, Photon,
NVD) against the committed fixtures under fixtures/vul-source/.

Each expectation mirrors a documented reference behavior (file:line in
the source modules' docstrings).
"""

from __future__ import annotations

import os

import pytest

from vul_dbgen_spark.sources import DISTRO_SOURCES, META_SOURCES

ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures", "vul-source")


def by_name(rows, name):
    matches = [r for r in rows if r["name"] == name]
    assert matches, f"{name} missing from result"
    assert len(matches) == 1, f"{name} duplicated"
    return matches[0]


# ---------------------------------------------------------------------------
# Debian (S1/S2, A2/A3)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def debian_rows(spark):
    return DISTRO_SOURCES["debian"](spark, ROOT).collect()


def test_debian_row_inventory(debian_rows):
    # dropped: CVE-2013-0166 (year), TEMP-… (non-CVE)
    assert sorted(r["name"] for r in debian_rows) == [
        "CVE-2017-3735",
        "CVE-2018-25032",
        "CVE-2019-20372",
        "CVE-2021-23017",
        "CVE-2021-3449",
    ]


def test_debian_explode_filters_and_versions(debian_rows):
    v = by_name(debian_rows, "CVE-2021-3449")
    # warty is not a Debian release → dropped; sid open → #MAXV#
    fixed = {(f["namespace"], f["name"]): f["version"] for f in v["fixed_in"]}
    assert fixed == {
        ("debian:10", "openssl"): "1.1.1d-0+deb10u6",
        ("debian:11", "openssl"): "1.1.1k-1",
        ("debian:unstable", "openssl"): "#MAXV#",
        ("debian:9", "openssl"): "1.1.0l-1~deb9u3",  # merged from stretch file
    }
    # severity = max urgency over rows incl. stretch merge (high > medium > low)
    assert v["severity"] == "High"
    assert v["feed_rating"] == "high"
    assert v["link"] == "https://security-tracker.debian.org/tracker/CVE-2021-3449"
    # scalar fields come from the main file, not the stretch snapshot
    assert v["description"].startswith("An OpenSSL TLS server")


def test_debian_status_and_release_filters(debian_rows):
    v = by_name(debian_rows, "CVE-2019-20372")
    fixed = {(f["namespace"], f["name"]): f["version"] for f in v["fixed_in"]}
    # "0" → #MINV#; undetermined stretch row dropped
    assert fixed == {
        ("debian:10", "nginx"): "#MINV#",
        ("debian:11", "nginx"): "1.17.7-1",
    }
    # urgencies: unimportant→Negligible, not yet assigned→Unknown → max=Negligible
    assert v["severity"] == "Negligible"
    assert v["feed_rating"] == "unimportant"


def test_debian_unparseable_resolved_version_skipped(debian_rows):
    v = by_name(debian_rows, "CVE-2018-25032")
    fixed = {(f["namespace"], f["name"]): f["version"] for f in v["fixed_in"]}
    assert fixed == {("debian:12", "zlib"): "1:1.2.11.dfsg-4"}


def test_debian_additional_files_merge(debian_rows):
    # created by the stretch snapshot, extended by the buster snapshot
    v = by_name(debian_rows, "CVE-2017-3735")
    fixed = {(f["namespace"], f["name"]): f["version"] for f in v["fixed_in"]}
    assert fixed == {
        ("debian:9", "openssl"): "1.1.0f-5",
        ("debian:10", "glibc"): "2.28-10",
    }
    # scalars from the first file that saw the CVE (stretch), buster merges
    # only FixedIn (debian.go:127-133)
    assert v["description"].startswith("OpenSSL X.509")
    assert v["severity"] == "Low"


# ---------------------------------------------------------------------------
# Alpine (S4)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def alpine_rows(spark):
    return DISTRO_SOURCES["alpine"](spark, ROOT).collect()


def test_alpine_inventory_and_filters(alpine_rows):
    names = sorted(r["name"] for r in alpine_rows)
    # dropped: CVE-2017-3738@1.0.2o-r0 (hard-coded), CVE-2020-1971 (bad
    # version), CVE-2013-0166 (year), 7.4.0-r0:{} (malformed)
    assert names == [
        "CVE-2017-17439",
        "CVE-2018-0739",
        "CVE-2021-44758",
        "CVE-2022-3437",
        "CVE-2023-44487",
        "CVE-2023-5678",
    ]


def test_alpine_row_shape(alpine_rows):
    v = by_name(alpine_rows, "CVE-2022-3437")  # " (advisory note)" stripped
    assert v["link"].endswith("CVE-2022-3437")
    [fv] = v["fixed_in"]
    assert (fv["namespace"], fv["name"], fv["version"]) == ("alpine:3.18", "heimdal", "7.7.0-r0")
    community = by_name(alpine_rows, "CVE-2023-44487")
    [fv] = community["fixed_in"]
    assert (fv["namespace"], fv["name"], fv["version"]) == (
        "alpine:3.18",
        "nodejs-current",
        "20.8.1-r0",
    )


# ---------------------------------------------------------------------------
# Photon (S12)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def photon_rows(spark):
    return DISTRO_SOURCES["photon"](spark, ROOT).collect()


def test_photon_rows(photon_rows):
    assert len(photon_rows) == 5
    v = by_name(photon_rows, "CVE-2021-22901")
    assert v["namespace"] == "photon:3"
    assert v["cvss_v3"]["score"] == 8.1
    [fv] = v["fixed_in"]
    assert (fv["name"], fv["namespace"], fv["version"]) == ("curl", "photon:3", "7.75.0-3.ph3")
    v1 = by_name(photon_rows, "CVE-2017-1000366")
    assert v1["namespace"] == "photon:1"


def test_photon_na_version_and_alternate_names(photon_rows):
    na = by_name(photon_rows, "CVE-2020-8286")
    assert na["fixed_in"][0]["version"] == "#MAXV#"
    # expat gets the expat-libs alternate entry (photon.go:143-156)
    expat = by_name(photon_rows, "CVE-2021-3541")
    assert [(f["name"], f["version"]) for f in expat["fixed_in"]] == [
        ("expat", "2.2.9-3.ph3"),
        ("expat-libs", "2.2.9-3.ph3"),
    ]
    # unparseable version kept with zero version (photon.go:116-120 bug)
    bad = by_name(photon_rows, "CVE-2019-12900")
    assert bad["fixed_in"][0]["version"] == ""


# ---------------------------------------------------------------------------
# NVD (S14)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def nvd_rows(spark):
    return {r["cve"]: r for r in META_SOURCES["nvd"](spark, ROOT).collect()}


def test_nvd_cvss_preference(nvd_rows):
    m = nvd_rows["CVE-2021-3449"]
    assert m["cvss_v3"]["score"] == 5.9  # v3.1 preferred
    assert m["cvss_v2"]["score"] == 4.3
    assert m["severity"] == "Medium"
    assert m["description"].startswith("An OpenSSL TLS server")  # descriptions[0]
    m30 = nvd_rows["CVE-2021-23017"]
    assert m30["cvss_v3"]["score"] == 7.7  # falls back to v3.0
    assert m30["severity"] == "High"
    v31_over_30 = nvd_rows["CVE-2022-3437"]
    assert v31_over_30["cvss_v3"]["score"] == 6.5


def test_nvd_v2_only_severity(nvd_rows):
    m = nvd_rows["CVE-2016-1000027"]
    assert m["cvss_v3"]["score"] is None
    assert m["cvss_v2"]["score"] == 7.5
    assert m["severity"] == "High"  # from the v2 metric's baseSeverity


def test_nvd_dates_strict_two_layout_parse(nvd_rows):
    m = nvd_rows["CVE-2021-3449"]
    assert m["published_date"] is not None and m["published_date"].year == 2021
    m2 = nvd_rows["CVE-2021-23017"]
    assert m2["published_date"] is not None  # "13:15Z" → second layout
    assert m2["last_modified_date"] is None  # fractional seconds fail both


def test_nvd_vuln_versions(nvd_rows):
    m = nvd_rows["CVE-2021-3449"]
    # only configurations[0], only vulnerable, visual_studio_ ignored,
    # non-vulnerable ignored, second configuration ignored
    assert [
        (v["start_including"], v["end_excluding"]) for v in m["vuln_versions"]
    ] == [("1.1.1", "1.1.1k")]
    # AND node skipped, OR node kept (nvd.go:288-289)
    m2 = nvd_rows["CVE-2021-23017"]
    assert [(v["start_including"], v["end_excluding"]) for v in m2["vuln_versions"]] == [
        ("0.6.18", "1.20.1")
    ]
    # cpeMatch without any version bound dropped (samba 4.17.0 exact cpe)
    m3 = nvd_rows["CVE-2022-3437"]
    assert [(v["end_excluding"]) for v in m3["vuln_versions"]] == ["7.7.1"]
    assert nvd_rows["CVE-2023-44487"]["vuln_versions"] == []


def test_nvd_link(nvd_rows):
    assert (
        nvd_rows["CVE-2018-25032"]["link"]
        == "https://cve.mitre.org/cgi-bin/cvename.cgi?name=CVE-2018-25032"
    )
