"""Driver-side fetch layer: retries, NVD pagination, scrape politeness.

The engine itself is local-file-first (like the reference: every fetcher
parses files under ``source_root``); this module is the thin utility that
*populates* that layout from the network, so a user of the reference can
run the same refresh flow. It runs on the driver only — executors stay
network-free, and Spark never sees a URL.

Behavioral constants are the reference's own:

- 5 retries on any remote fetch (``updater/nvd/nvd.go:40``,
  ``updater/fetchers/debian/debian.go:36``, ``rhel2/rhel.go:27``,
  ``oracle/oracle.go:26``, ``rocky/rocky.go:278``);
- NVD API 2.0 pagination at 2000 results/page with a 6 s inter-request
  delay, dropped to 1 s when an API key is present
  (``updater/nvd/nvd.go:43,175,178,190-192``);
- scrape politeness: 2 s pause every 20 files
  (``oracle/oracle.go:159-162``, ``rhel2/rhel.go:235-238``).

The transport is injectable (any ``url, headers -> bytes`` callable) so
unit tests run against a fake; the default uses urllib.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable
from typing import Any

RETRY_TIMES = 5  # nvd.go:40 retryTimes / debian.go:36 maxRetryTimes
NVD_PAGE_SIZE = 2000  # nvd.go:43 resultsPerPage
NVD_DELAY_NO_KEY = 6.0  # nvd.go:175 (default rate)
NVD_DELAY_WITH_KEY = 1.0  # nvd.go:190-192 (faster rate with apiKey header)
SCRAPE_PAUSE_EVERY = 20  # oracle.go:159-162 / rhel2/rhel.go:235-238
SCRAPE_PAUSE_SECS = 2.0

NVD_API_URL = "https://services.nvd.nist.gov/rest/json/cves/2.0/"
NVD_KEY_ENV = "NVD_KEY"

Transport = Callable[[str, dict[str, str]], bytes]


def _urllib_transport(url: str, headers: dict[str, str]) -> bytes:
    from urllib.request import Request, urlopen

    req = Request(url, headers=headers)
    with urlopen(req, timeout=60) as resp:  # noqa: S310 (https feeds only)
        return resp.read()


def fetch_with_retry(
    url: str,
    transport: Transport | None = None,
    retries: int = RETRY_TIMES,
    headers: dict[str, str] | None = None,
    sleep: Callable[[float], None] = time.sleep,
    backoff: float = 1.0,
) -> bytes:
    """GET with the reference's retry budget (retry <= retryTimes —
    i.e. up to ``retries`` + 1 attempts, nvd.go:183); raises the last
    error once the budget is exhausted."""
    transport = transport or _urllib_transport
    last: Exception | None = None
    for attempt in range(retries + 1):
        try:
            return transport(url, headers or {})
        except Exception as e:  # noqa: BLE001 — retry any transport failure
            last = e
            if attempt < retries:
                sleep(backoff)
    raise last  # type: ignore[misc]


def fetch_nvd_pages(
    out_dir: str,
    transport: Transport | None = None,
    sleep: Callable[[float], None] = time.sleep,
    page_size: int = NVD_PAGE_SIZE,
    api_key: str | None = None,
) -> list[str]:
    """Page through the NVD 2.0 API into ``{out_dir}/nvd/`` (the layout
    ``sources/nvd.py`` reads: ``nvd/*.json*``).

    Mirrors ``loadRemote`` (nvd.go:166-224): startIndex pagination until
    totalResults, per-page retry budget, apiKey header + 1 s delay when a
    key is present (else 6 s), one politeness sleep after every page.
    Returns the written file paths.
    """
    api_key = api_key if api_key is not None else os.environ.get(NVD_KEY_ENV, "")
    delay = NVD_DELAY_WITH_KEY if api_key else NVD_DELAY_NO_KEY
    headers = {"apiKey": api_key} if api_key else {}

    nvd_dir = os.path.join(out_dir, "nvd")
    os.makedirs(nvd_dir, exist_ok=True)

    paths: list[str] = []
    index = 0
    total = 1
    while index < total:
        url = f"{NVD_API_URL}?resultsPerPage={page_size}&startIndex={index}"
        body = fetch_with_retry(url, transport=transport, headers=headers, sleep=sleep)
        page: dict[str, Any] = json.loads(body)
        total = int(page.get("totalResults", 0))
        path = os.path.join(nvd_dir, f"nvdcve-2.0-start{index}.json")
        with open(path, "wb") as f:
            f.write(body)
        paths.append(path)
        index += page_size
        sleep(delay)
    return paths


def fetch_files(
    url_to_relpath: list[tuple[str, str]],
    out_dir: str,
    transport: Transport | None = None,
    sleep: Callable[[float], None] = time.sleep,
) -> list[str]:
    """Fetch a list of (url, relative path) into ``out_dir`` with the
    reference's scrape politeness: a 2 s pause after every 20 files
    (oracle.go:159-162). Used for per-advisory page scrapes (Oracle ELSA,
    RHEL OVAL streams, Amazon ALAS pages)."""
    paths: list[str] = []
    for i, (url, rel) in enumerate(url_to_relpath, start=1):
        body = fetch_with_retry(url, transport=transport, sleep=sleep)
        path = os.path.join(out_dir, rel)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "wb") as f:
            f.write(body)
        paths.append(path)
        if i % SCRAPE_PAUSE_EVERY == 0:
            sleep(SCRAPE_PAUSE_SECS)
    return paths
