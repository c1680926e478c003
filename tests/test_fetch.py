"""Fetch-layer tests with a fake transport: retry budget, NVD
pagination + rate selection, scrape politeness cadence. No network."""

from __future__ import annotations

import json
import os

import pytest

from vul_dbgen_spark import fetch


class FakeTransport:
    def __init__(self, responses=None, fail_times=0):
        self.responses = responses or {}
        self.fail_times = fail_times
        self.calls: list[tuple[str, dict]] = []

    def __call__(self, url, headers):
        self.calls.append((url, dict(headers)))
        if self.fail_times > 0:
            self.fail_times -= 1
            raise ConnectionError("boom")
        if callable(self.responses):
            return self.responses(url)
        return self.responses[url]


class SleepLog:
    def __init__(self):
        self.slept: list[float] = []

    def __call__(self, secs):
        self.slept.append(secs)


def test_retry_budget_matches_reference():
    # retry <= retryTimes (nvd.go:183) ⇒ 6 attempts for 5 retries
    t = FakeTransport(fail_times=5, responses=lambda url: b"ok")
    out = fetch.fetch_with_retry("http://x", transport=t, sleep=SleepLog())
    assert out == b"ok"
    assert len(t.calls) == 6

    t2 = FakeTransport(fail_times=6, responses=lambda url: b"ok")
    with pytest.raises(ConnectionError):
        fetch.fetch_with_retry("http://x", transport=t2, sleep=SleepLog())
    assert len(t2.calls) == 6


def _nvd_pages(total, page_size):
    def respond(url):
        start = int(url.split("startIndex=")[1])
        items = list(range(start, min(start + page_size, total)))
        return json.dumps(
            {"totalResults": total, "vulnerabilities": [{"cve": {"id": f"CVE-0-{i}"}} for i in items]}
        ).encode()

    return respond


def test_nvd_pagination_no_key(tmp_path):
    t = FakeTransport(responses=_nvd_pages(total=4500, page_size=2000))
    s = SleepLog()
    paths = fetch.fetch_nvd_pages(str(tmp_path), transport=t, sleep=s, api_key="")
    # 4500 results / 2000 per page → 3 pages, correct startIndex sequence
    assert [int(u.split("startIndex=")[1]) for u, _ in t.calls] == [0, 2000, 4000]
    assert [os.path.basename(p) for p in paths] == [
        "nvdcve-2.0-start0.json",
        "nvdcve-2.0-start2000.json",
        "nvdcve-2.0-start4000.json",
    ]
    # 6 s politeness delay per page without a key (nvd.go:175)
    assert s.slept == [6.0, 6.0, 6.0]
    # no apiKey header sent
    assert all("apiKey" not in h for _, h in t.calls)
    # pages land in the layout sources/nvd.py globs (nvd/*.json*)
    assert all(os.path.dirname(p).endswith("/nvd") for p in paths)


def test_nvd_pagination_with_key_uses_fast_rate(tmp_path):
    t = FakeTransport(responses=_nvd_pages(total=2000, page_size=2000))
    s = SleepLog()
    fetch.fetch_nvd_pages(str(tmp_path), transport=t, sleep=s, api_key="k123")
    assert s.slept == [1.0]  # nvd.go:190-192
    assert all(h.get("apiKey") == "k123" for _, h in t.calls)


def test_nvd_pages_parse_with_spark_source(tmp_path, spark):
    """The fetched layout must be directly consumable by sources/nvd.py."""
    sample = open(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "fixtures", "vul-source", "nvd", "nvdcve-2.0-sample.json"), "rb"
    ).read()
    t = FakeTransport(responses=lambda url: sample)
    fetch.fetch_nvd_pages(str(tmp_path), transport=t, sleep=SleepLog())
    from vul_dbgen_spark.sources import META_SOURCES

    meta = META_SOURCES["nvd"](spark, str(tmp_path))
    assert meta.count() > 0


def test_scrape_politeness_every_20_files(tmp_path):
    urls = [(f"http://h/{i}", f"oracle/elsa-{i}.html") for i in range(45)]
    t = FakeTransport(responses=lambda url: b"<html/>")
    s = SleepLog()
    paths = fetch.fetch_files(urls, str(tmp_path), transport=t, sleep=s)
    assert len(paths) == 45 and all(os.path.exists(p) for p in paths)
    # 2 s pause after files 20 and 40 (oracle.go:159-162)
    assert s.slept == [2.0, 2.0]
