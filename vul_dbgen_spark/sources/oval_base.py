"""Shared OVAL feed reading: distributed per-file XML parse.

Each feed file becomes one input row (``binaryFile`` read, so ``.bz2``/
``.gz`` members decompress in the worker), and a ``mapInPandas``
generator yields canonical ``os_vulns`` rows. XML never crosses the
driver; per-file parallelism matches the reference's one-goroutine-per-
file shape and scales with the file count.
"""

from __future__ import annotations

import bz2
import gzip
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..schemas import OS_VULNS
from .base import conform

SEVERITY_MAP = {  # rhel.go:737-751, oracle.go:540-554, suse.go:472-486
    "low": "Low",
    "moderate": "Medium",
    "important": "High",
    "critical": "Critical",
}


def decompress(path: str, content: bytes) -> bytes:
    if path.endswith(".bz2"):
        return bz2.decompress(content)
    if path.endswith(".gz"):
        return gzip.decompress(content)
    return content


def read_oval_files(
    spark: SparkSession,
    pattern: str,
    parse_doc: Callable[[str, bytes], list[dict]],
) -> DataFrame:
    """Glob of OVAL files → canonical os_vulns rows.

    ``parse_doc(path, xml_bytes)`` returns a list of os_vulns dicts (the
    canonical field names; missing fields null-padded).
    """
    files = spark.read.format("binaryFile").load(pattern)
    field_names = [f.name for f in OS_VULNS.fields]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for path, content in zip(batch["path"], batch["content"]):
                xml_bytes = decompress(path, bytes(content))
                for v in parse_doc(path, xml_bytes):
                    rows.append({k: v.get(k) for k in field_names})
            yield pd.DataFrame(rows, columns=field_names)

    out = files.select("path", "content").mapInPandas(gen, OS_VULNS)
    return conform(out, OS_VULNS)
