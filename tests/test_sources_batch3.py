"""Golden tests for Ubuntu, Amazon, Rocky and Chainguard/Wolfi sources."""

from __future__ import annotations

import os

import pytest

from vul_dbgen_spark.sources import DISTRO_SOURCES
from vul_dbgen_spark.sources.amazon import parse_alas_page

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
# Ubuntu (S3)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ubuntu_rows(spark):
    return DISTRO_SOURCES["ubuntu"](spark, ROOT).collect()


def test_ubuntu_inventory(ubuntu_rows):
    # CVE-2013-0166 dropped by the file-name year gate
    assert sorted(r["name"] for r in ubuntu_rows) == [
        "CVE-2017-16995",
        "CVE-2020-1971",
        "CVE-2021-3449",
    ]


def test_ubuntu_parse_statuses_and_releases(ubuntu_rows):
    v = one(ubuntu_rows, name="CVE-2021-3449")
    fixed = fixset(v)
    # upstream openssl dropped (calibration skip); upstream openssl1.0
    # dropped too — its version contains 'ubuntu' (ubuntu.go:463-465)
    assert fixed == {
        ("ubuntu:16.04", "openssl", "1.0.2g-1ubuntu4.19"),
        ("ubuntu:16.04", "openssl", "#MAXV#"),  # esm-infra/xenial needed
        ("ubuntu:18.04", "openssl", "1.1.1-1ubuntu2.1~18.04.9"),
        ("ubuntu:20.04", "openssl", "1.1.1f-1ubuntu2.3"),
        ("ubuntu:21.04", "openssl", "#MINV#"),  # not-affected
    }
    # Priority with trailing annotation parsed ("medium (heap-protector)")
    assert v["severity"] == "Medium" and v["feed_rating"] == "medium"
    # description stops at Ubuntu-Description:
    assert v["description"].endswith("from a client.")
    assert v["link"] == "http://people.ubuntu.com/~ubuntu-security/cve/CVE-2021-3449"


def test_ubuntu_upstream_kernel_calibration(ubuntu_rows):
    v = one(ubuntu_rows, name="CVE-2017-16995")
    fixed = fixset(v)
    # calibrateMap pins upstream kernel versions to 4.14.8; the
    # 'ubuntu'-suffixed upstream version is dropped
    assert ("ubuntu:upstream", "linux-flo", "4.14.8") in fixed
    assert not any(f[2] == "4.9.77ubuntu1" for f in fixed)
    assert ("ubuntu:14.04", "linux", "4.4.0-112.135") in fixed


def test_ubuntu_retired_folder_loaded(ubuntu_rows):
    v = one(ubuntu_rows, name="CVE-2020-1971")
    assert ("ubuntu:upstream", "openssl", "1.1.1i") not in fixset(v)  # openssl upstream skip
    assert ("ubuntu:16.04", "openssl", "1.0.2g-1ubuntu4.18") in fixset(v)


# ---------------------------------------------------------------------------
# Amazon (S9)
# ---------------------------------------------------------------------------


def test_parse_alas_page_goldens():
    # amazon_test.go:78-92 token behaviors
    body = (
        "<b>Issue Overview:</b><p>Example overview.</p>"
        "<b>Affected Packages:</b><p>curl</p>"
        "<b>New Packages:</b><pre>aarch64:<br />&nbsp;"
        "libcurl-debuginfo-8.3.0-1.amzn2023.0.1.aarch64<br />&nbsp;"
        "java-1.8.0-amazon-corretto-1.8.0_402.b08-1.amzn2023.aarch64<br />&nbsp;"
        "kernel-debuginfo-common-i686-4.14.336-180.562.amzn1.i686<br /></pre>"
    )
    desc, pkgs = parse_alas_page(body)
    assert desc == "Example overview."
    assert dict(pkgs) == {
        "libcurl-debuginfo": "8.3.0-1.amzn2023.0.1",
        "java-1.8.0-amazon-corretto": "1.8.0_402.b08-1.amzn2023",
        "kernel-debuginfo-common-i686": "4.14.336-180.562.amzn1",
    }


@pytest.fixture(scope="module")
def amazon_rows(spark):
    return DISTRO_SOURCES["amazon"](spark, ROOT).collect()


def test_amazon_rows(amazon_rows):
    # low severity dropped; missing page dropped
    assert sorted(r["name"] for r in amazon_rows) == ["ALAS2-2021-1700", "ALAS2023-2023-368"]
    v = one(amazon_rows, name="ALAS2023-2023-368")
    assert v["namespace"] == "amzn:2023"
    assert v["severity"] == "High" and v["feed_rating"] == "Important"
    assert [c["name"] for c in v["cves"]] == ["CVE-2023-38039", "CVE-2023-38545"]
    assert v["description"].startswith("HTTP headers eat all memory")
    assert ("amzn:2023", "curl", "8.3.0-1.amzn2023.0.1") in fixset(v)
    assert ("amzn:2023", "java-1.8.0-amazon-corretto", "1.8.0_402.b08-1.amzn2023") in fixset(v)
    a2 = one(amazon_rows, name="ALAS2-2021-1700")
    assert a2["namespace"] == "amzn:2"
    assert a2["severity"] == "Critical"
    assert [c["name"] for c in a2["cves"]] == ["CVE-2021-44228", "CVE-2021-45046"]
    assert fixset(a2) == {("amzn:2", "log4j", "2.15.0-1.amzn2")}


# ---------------------------------------------------------------------------
# Rocky (S11)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def rocky_rows(spark):
    return DISTRO_SOURCES["rocky"](spark, ROOT).collect()


def test_rocky_nevra_and_namespaces(rocky_rows):
    v9 = one(rocky_rows, name="RLSA-2023:5616", namespace="rocky:9")
    # curl x86_64 and aarch64 share the version → deduped to one entry;
    # 9.2 product floors to rocky:9; '^' → '.' (rocky_test.go:19)
    assert fixset(v9) == {
        ("rocky:9", "curl", "7.76.1-26.el9_2.4"),
        ("rocky:9", "libcurl", "7.76.1-26.el9_2.5"),
        ("rocky:9", "passt", "0.20240806.gee36266-6.el9_5"),
    }
    assert v9["severity"] == "High"
    assert [c["name"] for c in v9["cves"]] == ["CVE-2023-38545"]
    assert v9["issued_date"].strftime("%Y-%m-%d") == "2023-10-10"


def test_rocky_split_product_rows(rocky_rows):
    # one row per (advisory, namespace)
    v8 = one(rocky_rows, name="RLSA-2023:7000", namespace="rocky:8")
    v9 = one(rocky_rows, name="RLSA-2023:7000", namespace="rocky:9")
    assert fixset(v8) == {("rocky:8", "zlib", "1.2.11-21.el8_8")}
    assert fixset(v9) == {("rocky:9", "zlib", "1.2.11-40.el9_2")}
    assert v8["severity"] == "Medium"


# ---------------------------------------------------------------------------
# Chainguard / Wolfi (S13)
# ---------------------------------------------------------------------------


def test_wolfi_rows(spark):
    rows = DISTRO_SOURCES["wolfi"](spark, ROOT).collect()
    # CVE list deduped; GHSA upstream ignored; no-CVE advisory dropped
    assert sorted(r["name"] for r in rows) == ["CVE-2023-38545", "CVE-2023-38546"]
    v = one(rows, name="CVE-2023-38545")
    # fixed versions deduped; only the Wolfi ecosystem entry used
    assert fixset(v) == {("wolfi:rolling", "curl", "8.4.0-r0")}
    assert v["link"].endswith("CVE-2023-38545")
    assert v["issued_date"] is not None


def test_chainguard_rows(spark):
    rows = DISTRO_SOURCES["chainguard"](spark, ROOT).collect()
    v = one(rows, name="CVE-2023-38546")
    assert fixset(v) == {("chainguard:rolling", "curl", "8.4.0-r1")}
