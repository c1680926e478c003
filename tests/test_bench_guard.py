"""The committed bench record must stay canary-clean (round-6 VERDICT
directive #1): round 6's end-of-round snapshot overwrote a clean
BENCH_result.json with a run that self-flagged contaminated in both
sections. bench.resolve_artifact_path is the guard — a contaminated
payload is diverted to the gitignored BENCH_result.rejected.json unless
explicitly overridden."""

import importlib.util
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _bench():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(_REPO, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_clean_run_writes_the_committed_record():
    assert _bench().resolve_artifact_path("/r", False) == "/r/BENCH_result.json"


def test_contaminated_run_is_diverted(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_ALLOW_CONTAMINATED", raising=False)
    assert (
        _bench().resolve_artifact_path("/r", True)
        == "/r/BENCH_result.rejected.json"
    )


def test_contaminated_override_is_explicit(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_ALLOW_CONTAMINATED", "1")
    assert _bench().resolve_artifact_path("/r", True) == "/r/BENCH_result.json"


def test_rejected_artifact_is_gitignored():
    gi = open(os.path.join(_REPO, ".gitignore")).read()
    assert "BENCH_result.rejected.json" in gi


def test_non_graded_sf_is_diverted_even_when_clean(monkeypatch):
    # a clean sf0.001 smoke run replaced the committed sf0.1 record
    # during round-7 code-path testing — the record means "the graded
    # configuration", so any other SF diverts to the local file
    monkeypatch.delenv("SPARK_GRAFT_ALLOW_CONTAMINATED", raising=False)
    b = _bench()
    assert (
        b.resolve_artifact_path("/r", False, "/root/testdata/sf0.001")
        == "/r/BENCH_result.local.json"
    )
    assert (
        b.resolve_artifact_path("/r", False, "/root/testdata/sf0.1")
        == "/r/BENCH_result.json"
    )
    # contamination outranks the SF routing
    assert (
        b.resolve_artifact_path("/r", True, "/root/testdata/sf0.001")
        == "/r/BENCH_result.rejected.json"
    )


def test_local_artifact_is_gitignored():
    gi = open(os.path.join(_REPO, ".gitignore")).read()
    assert "BENCH_result.local.json" in gi
