"""Source registry — mirrors the reference's fetcher registries.

The reference registers distro fetchers / app fetchers / raw fetchers via
``init()`` side effects (``/root/reference/updater/fetchers.go:11-92``).
Here each source module exposes ``load(spark, source_root) -> DataFrame``
returning one of the canonical schemas (vul_dbgen_spark/schemas.py):

- distro sources  → ``os_vulns``  rows
- app sources     → ``app_vulns`` rows
- nvd             → ``nvd_meta``  rows

``source_root`` is the fixture/feed root (the reference's
``common.CVESourceRoot = "vul-source/"``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

LoadFn = Callable[[SparkSession, str], DataFrame]

DISTRO_SOURCES: dict[str, LoadFn] = {}
APP_SOURCES: dict[str, LoadFn] = {}  # insertion order = upsert priority (apps.go:44-67)
META_SOURCES: dict[str, LoadFn] = {}


def register_distro(name: str):
    def deco(fn: LoadFn) -> LoadFn:
        DISTRO_SOURCES[name] = fn
        return fn

    return deco


def register_app(name: str):
    def deco(fn: LoadFn) -> LoadFn:
        APP_SOURCES[name] = fn
        return fn

    return deco


def register_meta(name: str):
    def deco(fn: LoadFn) -> LoadFn:
        META_SOURCES[name] = fn
        return fn

    return deco


def _import_all() -> None:
    from . import (  # noqa: F401
        alpine,
        amazon,
        chainguard,
        debian,
        ghsa,
        govuln,
        k8s,
        manual,
        mariner,
        nginx,
        nvd,
        openshift,
        openssl,
        oracle,
        photon,
        rhel,
        rocky,
        ruby,
        suse,
        ubuntu,
    )


_import_all()
