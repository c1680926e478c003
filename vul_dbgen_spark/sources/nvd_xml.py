"""Legacy NVD XML feed → CVSSv2 metadata (SURVEY.md S24).

Behavioral spec: ``/root/reference/updater/nvd/xml.go`` (the pre-2.0
NVD feed builder — dead code in the reference: nothing registers it —
kept here for drop-in parity with the same non-wired status; it is NOT
in ``META_SOURCES``).

Fidelity notes (xml.go quirks mirrored exactly):

- The availability impact is read from the tag ``avaibility-impact``
  (xml.go:33 — a typo for ``availability-impact``). Real legacy feeds
  spell the tag correctly, so the reference silently drops the ``A:``
  component from every vector; a feed that *contains* the typo'd tag
  gets its ``A:`` back. Both behaviors are locked by test.
- Metric values map to letters through ``vectorValuesToLetters``
  (xml.go:38-51); an unknown value logs and is skipped — the component
  is simply absent from the vector (xml.go:82-89), not an error.
- An entry whose assembled vector is empty yields no metadata row
  (xml.go:61-63 returns nil).
- Empty components are skipped, the trailing ``/`` is trimmed
  (xml.go:69-79).

Spark shape: one row per feed file via a ``binaryFile`` scan, XML
parsed worker-side in ``mapInPandas`` (same distributed per-file plan
as the OVAL sources — the XML never crosses the driver), yielding
``(cve, vectors, score)`` rows.
"""

from __future__ import annotations

import glob
import gzip
import os
import xml.etree.ElementTree as ET
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_VULN_NS = "http://scap.nist.gov/schema/vulnerability/0.4"  # xml.go:17-19
_CVSS_NS = "http://scap.nist.gov/schema/cvss-v2/0.2"  # xml.go:23

# xml.go:38-51
VECTOR_VALUES_TO_LETTERS = {
    "NETWORK": "N",
    "ADJACENT_NETWORK": "A",
    "LOCAL": "L",
    "HIGH": "H",
    "MEDIUM": "M",
    "LOW": "L",
    "NONE": "N",
    "SINGLE_INSTANCE": "S",
    "MULTIPLE_INSTANCES": "M",
    "PARTIAL": "P",
    "COMPLETE": "C",
}

# (vector key, base_metrics child tag) in emission order — xml.go:69-76.
# NB the deliberate ``avaibility-impact`` typo carried from xml.go:33.
_COMPONENTS = [
    ("AV", "access-vector"),
    ("AC", "access-complexity"),
    ("Au", "authentication"),
    ("C", "confidentiality-impact"),
    ("I", "integrity-impact"),
    ("A", "avaibility-impact"),
]

XML_META_SCHEMA = T.StructType(
    [
        T.StructField("cve", T.StringType()),
        T.StructField("vectors", T.StringType()),
        T.StructField("score", T.DoubleType()),
    ]
)


def _vector_string(base_metrics: ET.Element | None) -> str:
    """Assemble ``AV:N/AC:M/...`` — xml.go String()/addVec()."""
    if base_metrics is None:
        return ""
    parts: list[str] = []
    for key, tag in _COMPONENTS:
        el = base_metrics.find(f"{{{_CVSS_NS}}}{tag}")
        val = (el.text or "").strip() if el is not None else ""
        if not val:
            continue  # xml.go:83 empty → skipped
        letter = VECTOR_VALUES_TO_LETTERS.get(val)
        if letter is None:
            continue  # xml.go:86-88 unknown value → logged + skipped
        parts.append(f"{key}:{letter}")
    return "/".join(parts)


def parse_feed(xml_bytes: bytes) -> list[dict]:
    """One legacy feed document → metadata dicts (nil-vector entries
    dropped, xml.go:61-63)."""
    root = ET.fromstring(xml_bytes)
    out: list[dict] = []
    # the Go decoder matches ``entry`` in ANY namespace (the field tag
    # carries no namespace, xml.go:14) — iterate by local name
    for entry in root.iter():
        if entry.tag.split("}")[-1] != "entry":
            continue
        name_el = entry.find(f"{{{_VULN_NS}}}cve-id")
        cve = (name_el.text or "").strip() if name_el is not None else ""
        cvss = entry.find(f"{{{_VULN_NS}}}cvss")
        bm = cvss.find(f"{{{_CVSS_NS}}}base_metrics") if cvss is not None else None
        vectors = _vector_string(bm)
        if not vectors:
            continue
        score = 0.0
        if bm is not None:
            score_el = bm.find(f"{{{_CVSS_NS}}}score")
            if score_el is not None and score_el.text:
                try:
                    score = float(score_el.text)
                except ValueError:
                    score = 0.0
        out.append({"cve": cve, "vectors": vectors, "score": score})
    return out


def load(spark: SparkSession, source_root: str) -> DataFrame:
    """``nvd-xml/*.xml[.gz]`` → ``(cve, vectors, score)`` rows."""
    pattern = os.path.join(source_root, "nvd-xml", "*.xml*")
    if not glob.glob(pattern):
        raise FileNotFoundError(f"no legacy NVD XML feeds under {pattern}")
    files = spark.read.format("binaryFile").load(pattern)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in XML_META_SCHEMA.fields]
        for batch in batches:
            rows = []
            for path, content in zip(batch["path"], batch["content"]):
                data = bytes(content)
                if path.endswith(".gz"):
                    data = gzip.decompress(data)
                rows.extend(parse_feed(data))
            yield pd.DataFrame(rows, columns=cols)

    return files.select("path", "content").mapInPandas(gen, XML_META_SCHEMA)
