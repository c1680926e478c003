"""Amazon Linux ALAS source (SURVEY.md S9).

Behavioral spec: ``/root/reference/updater/fetchers/amazon/amazon.go``.
Three RSS feeds (ALAS / ALAS2 / ALAS2023 → namespaces amzn:1/2/2023)
plus one pre-fetched HTML page per advisory (the reference fetches them
live; here they live under ``amazon/pages/<ALAS-id>.html``):

- title ``ALAS-… (severity): pkgs`` → name + severity; only critical/
  important/medium survive (amazon.go:133-156);
- description CVE list splits on spaces, trailing ``,\\n`` trimmed;
- RFC1123 pubData/lastBuildDate with zero-date mirroring;
- the advisory page supplies the description (plain-text between
  "Issue Overview:" and "Affected Packages:") and the ``New Packages:
  </b><pre>…</pre>`` package/version list parsed by the version-start
  regexes (amazon.go:215-271; golden amazon_test.go:9-114);
- advisories whose page yields no packages are dropped.

Spark shape: the RSS parse runs in ``mapInPandas``; pages are read as a
separate wholetext DataFrame and joined on the link basename, so page
parsing is distributed too.
"""

from __future__ import annotations

import glob
import html
import os
import re
from collections.abc import Iterator
from datetime import datetime

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import register_distro
from ..functions.version import parse_unsafe
from .base import finish_os_vulns, read_wholetext

FEEDS = [("alas.rss", 1), ("alas2.rss", 2), ("alas2023.rss", 2023)]  # amazon.go:34-38

SEVERITIES = {"(critical):": "Critical", "(important):": "High", "(medium):": "Medium"}
FEED_RATINGS = {"(critical):": "Critical", "(important):": "Important", "(medium):": "Medium"}

_RSS_ROW = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("link", T.StringType()),
        T.StructField("severity", T.StringType()),
        T.StructField("feed_rating", T.StringType()),
        T.StructField("cves", T.ArrayType(T.StringType())),
        T.StructField("issued_date", T.TimestampType()),
        T.StructField("last_mod_date", T.TimestampType()),
        T.StructField("namespace", T.StringType()),
        T.StructField("page_key", T.StringType()),
    ]
)

_VERSION_START = re.compile(r"[a-z+]-[0-9]")
_ALT_VERSION_START = re.compile(r"[0-9]-[0-9]")
_TAG = re.compile(r"<[^>]+>")


def _rfc1123(s: str):
    for fmt in ("%a, %d %b %Y %H:%M:%S %Z", "%a, %d %b %Y %H:%M:%S %z"):
        try:
            t = datetime.strptime(s.strip(), fmt)
            return t.replace(tzinfo=None)
        except (ValueError, AttributeError):
            continue
    return None


def html2text(body: str) -> str:
    """Crude stand-in for the reference's html2text (amazon.go:73): strip
    tags, unescape entities, collapse runs of blank space."""
    text = _TAG.sub("\n", body)
    return html.unescape(text)


def parse_alas_page(body: str) -> tuple[str, list[tuple[str, str]]]:
    """amazon.go:215-271 (parseAlasPage) → (description, [(pkg, version)])."""
    plain = html2text(body)
    description = ""
    a = plain.find("Issue Overview:")
    if a > 0:
        b = plain.find("Affected Packages:")
        if b > 0:
            description = " ".join(plain[a + 15 : b].split())

    pkg_vers: dict[str, str] = {}
    a = body.find("New Packages:</b><pre>")
    if a > 0:
        seg = body[a + 22 :]
        if (b := seg.find("</pre>")) > 0:
            seg = seg[:b]
        seg = seg.replace("<br />", " ").replace("&nbsp;", " ")
        for token in seg.split(" "):
            token = token.strip()
            if not token or token.endswith(":"):
                continue  # arch lines
            last_dot = token.rfind(".")
            starts = list(_VERSION_START.finditer(token))
            if not starts:
                starts = list(_ALT_VERSION_START.finditer(token))
                if not starts:
                    continue
                i = starts[0].start()  # first match for the alternate form
                pkg_vers[token[: i + 1]] = token[i + 2 : last_dot]
                continue
            i = starts[-1].start()  # last match for the standard form
            pkg_vers[token[: i + 1]] = token[i + 2 : last_dot]
    return description, list(pkg_vers.items())


def _parse_rss(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import xml.etree.ElementTree as ET

    from ..functions.oval import _findall, _text

    for batch in batches:
        rows = []
        for path, content in zip(batch["path"], batch["value"]):
            base = os.path.basename(path)
            version = next((v for f, v in FEEDS if base.startswith(f.split(".")[0] + ".")), None)
            if version is None:
                continue
            root = ET.fromstring(content)
            for item in _findall(root, "channel>item"):
                meta = _text(item, "title")
                tokens = meta.split(" ")
                if len(tokens) < 3:
                    continue
                sev_token = tokens[1].lower()
                if sev_token not in SEVERITIES:
                    continue
                cves = [c.rstrip(",\n ") for c in _text(item, "description").split(" ")]
                issued = _rfc1123(_text(item, "pubData"))
                lastmod = _rfc1123(_text(item, "lastBuildDate"))
                issued = issued or lastmod
                lastmod = lastmod or issued
                link = _text(item, "link")
                rows.append(
                    {
                        "name": tokens[0],
                        "link": link,
                        "severity": SEVERITIES[sev_token],
                        "feed_rating": FEED_RATINGS[sev_token],
                        "cves": [c for c in cves if c],
                        "issued_date": issued,
                        "last_mod_date": lastmod,
                        "namespace": f"amzn:{version}",
                        "page_key": os.path.basename(link),
                    }
                )
        yield pd.DataFrame(rows, columns=[f.name for f in _RSS_ROW.fields])


_PAGE_OUT = T.StructType(
    [
        T.StructField("description", T.StringType()),
        T.StructField(
            "pkgs",
            T.ArrayType(
                T.StructType(
                    [T.StructField("pkg", T.StringType()), T.StructField("ver", T.StringType())]
                )
            ),
        ),
    ]
)


@F.pandas_udf(_PAGE_OUT)
def _parse_page(bodies: pd.Series) -> pd.DataFrame:
    descs, pkgs = [], []
    for body in bodies:
        d, pv = parse_alas_page(body or "")
        descs.append(d)
        kept = []
        for pkg, ver in pv:
            if str(parse_unsafe(ver)) != "":  # NewVersion failure skips (amazon.go:190-194)
                kept.append({"pkg": pkg, "ver": ver})
        pkgs.append(kept)
    return pd.DataFrame({"description": descs, "pkgs": pkgs})


@register_distro("amazon")
def load(spark: SparkSession, source_root: str) -> DataFrame:
    rss_pattern = os.path.join(source_root, "amazon", "alas*.rss*")
    if not glob.glob(rss_pattern):
        raise FileNotFoundError(f"no Amazon RSS feeds under {rss_pattern}")
    rss = (
        read_wholetext(spark, rss_pattern)
        .mapInPandas(lambda it: _parse_rss(it), _RSS_ROW)
    )
    pages_pattern = os.path.join(source_root, "amazon", "pages", "*.html")
    pages = read_wholetext(spark, pages_pattern).select(
        F.element_at(F.split("path", "/"), -1).alias("page_key"),
        _parse_page("value").alias("page"),
    )
    j = rss.join(F.broadcast(pages), "page_key", "inner")
    out = (
        j.filter(F.size("page.pkgs") > 0)
        .select(
            "name",
            "namespace",
            F.trim(F.col("page.description")).alias("description"),
            "link",
            "severity",
            "issued_date",
            "last_mod_date",
            F.transform(
                "cves",
                lambda c: F.struct(
                    c.alias("name"),
                    F.lit(None).cast("struct<vectors:string,score:double>").alias("cvss_v2"),
                    F.lit(None).cast("struct<vectors:string,score:double>").alias("cvss_v3"),
                ),
            ).alias("cves"),
            F.transform(
                "page.pkgs",
                lambda p: F.struct(
                    p["pkg"].alias("name"),
                    F.col("namespace").alias("namespace"),
                    p["ver"].alias("version"),
                    F.lit(None).cast("string").alias("min_ver"),
                ),
            ).alias("fixed_in"),
            "feed_rating",
        )
    )
    return finish_os_vulns(out)
