"""Legacy NVD XML builder (SURVEY.md S24) — reference xml.go fidelity.

The reference's xml.go is dead code (never registered); this locks the
same parse semantics anyway, including its ``avaibility-impact`` typo:
a correctly-spelled feed loses its A: component, a typo'd feed keeps it.
"""

import os

from vul_dbgen_spark.sources import nvd_xml

ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures", "vul-source"
)


def test_legacy_xml_feed(spark):
    rows = {r["cve"]: r for r in nvd_xml.load(spark, ROOT).collect()}

    # correctly-spelled availability-impact tag → A: DROPPED (xml.go:33 typo)
    assert rows["CVE-2013-0001"]["vectors"] == "AV:N/AC:M/Au:N/C:P/I:P"
    assert rows["CVE-2013-0001"]["score"] == 6.8

    # feed that itself contains the typo'd tag → A: present
    assert rows["CVE-2013-0002"]["vectors"] == "AV:N/AC:L/Au:N/C:C/I:C/A:C"
    assert rows["CVE-2013-0002"]["score"] == 10.0

    # unknown metric value skipped (not an error), rest of vector kept
    assert rows["CVE-2013-0003"]["vectors"] == "AC:H/Au:S"

    # no cvss block → empty vector → entry dropped (xml.go:61-63)
    assert "CVE-2013-0004" not in rows
    assert len(rows) == 3


def test_unregistered_like_reference():
    # nothing in the reference wires xml.go into a fetcher registry —
    # mirrored: the module is importable but absent from META_SOURCES
    from vul_dbgen_spark.sources import META_SOURCES, _import_all

    _import_all()
    assert "nvd_xml" not in META_SOURCES
