"""CLI smoke: the ``python -m vul_dbgen_spark`` analog of ``dbgen``
produces a decodable container from the fixtures, honors the version
parse gate, and the -debug filter dumps matching records."""

from __future__ import annotations

import os

from vul_dbgen_spark.__main__ import main, parse_debug_filters
from vul_dbgen_spark.sinks import memdb

ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures", "vul-source"
)


def test_parse_debug_filters():
    assert parse_debug_filters("v=CVE-2023-1000") == {"CVE-2023-1000"}
    assert parse_debug_filters("v=CVE-1,CVE-2") == {"CVE-1", "CVE-2"}
    assert parse_debug_filters("x=1") == set()


def test_version_parse_gate():
    assert main(["-v", "not-a-float"]) == 2


def test_cli_end_to_end(tmp_path, spark, capsys):
    rc = main(["-v", "3.99", "-d", str(tmp_path), "-s", ROOT,
               "-debug", "v=CVE-2021-3449"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Update CVE database successfully" in out
    # debug filter dumped only the matching enriched records (the CVE
    # spans several distro namespaces — every dumped line must be it)
    dbg = [l for l in out.splitlines() if l.startswith("DEBUG os")]
    assert len(dbg) >= 4 and all("CVE-2021-3449" in l for l in dbg)

    header, files = memdb.read_db_file(
        os.path.join(str(tmp_path), memdb.REGULAR_DB_NAME)
    )
    assert header["Version"] == "3.99"
    assert len(files["debian_full.tb"].decode().splitlines()) > 0
    assert os.path.exists(os.path.join(str(tmp_path), memdb.COMPACT_DB_NAME))
