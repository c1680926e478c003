"""NVD enrichment and calibration (SURVEY.md J1-J3, J5, J8, J9, F2).

Behavioral spec: ``/root/reference/updater/updater.go:147-640``.

``assignMetadata`` (updater.go:335-552) is two passes over a shared
``cveMap``:

- pass 1 builds a per-key metadata record: distro keys are
  ``<namespace>:<cve>``, app keys are the bare ``<cve>`` (disjoint key
  spaces → two separate builds here). A key's meta starts from the NVD
  lookup when it hits, and every field that is still "empty" (score 0,
  empty/Unknown severity, zero date, empty text) is back-filled by the
  *first* feed record that touches the key and has the field
  (enrichDistroMeta/enrichAppMeta, updater.go:248-291). The reference's
  "first" is map-iteration order; we order contributors by an explicit
  deterministic rank (SURVEY.md §4.3).
- pass 2 walks each record's CVE list in order and coalesce-fills its
  empty fields from the first meta that has them, then recalibrates
  severity/scores (``fixSeverityScore``) and applies the severity gate.

Spark shape: explode on CVE lists, broadcast-join ``nvd_meta``, groupBy
with ``min_by`` aggregation — per-field "first non-empty contributor"
without any window over a global ordering.
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.priority import KEPT_SEVERITIES, fix_severity_score
from ..schemas import APP_VULNS, OS_VULNS

CVE_LINK_PREFIX = "https://cve.mitre.org/cgi-bin/cvename.cgi?name="

# updater.go:25-33
NVD_APP_WHITELIST = [
    {"cve": "CVE-2025-14847", "app_name": "mongodb", "module_name": "mongodb"},
]


def _nonempty_s(c: Column) -> Column:
    return c.isNotNull() & (c != "")


def _sev_set(c: Column) -> Column:
    # "empty" severity = null/""/Unknown (updater.go:257,278,461)
    return c.isNotNull() & ~c.isin("", "Unknown")


def _score_set(c: Column) -> Column:
    return c.isNotNull() & (c != 0.0)


def _first(cond: Column, value: Column, rank: Column) -> Column:
    """Aggregate: value of the lowest-rank row where cond holds."""
    return F.min(F.when(cond, F.struct(rank.alias("r"), value.alias("v"))))["v"]


# ---------------------------------------------------------------------------
# pass 1 — build the cveMap sides
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _distro_meta_cols():
    """Frozen Column trees for build_distro_meta, built once per
    process (round 9): the enrich expression sets are pure functions of
    the canonical schemas, and rebuilding them cost ~1k py4j round
    trips per composed pipeline. An unresolved Column is
    plan-independent — the same reuse contract as F.col."""
    cves = F.when(
        F.size(F.coalesce("cves", F.array())) > 0, F.col("cves")
    ).otherwise(
        F.array(
            F.struct(
                F.col("name").alias("name"),
                F.lit(None).cast("struct<vectors:string,score:double>").alias("cvss_v2"),
                F.lit(None).cast("struct<vectors:string,score:double>").alias("cvss_v3"),
            )
        )
    )
    pair_cols = [
        F.col("namespace"),
        F.col("name").alias("vuln_name"),
        F.col("severity"),
        F.col("issued_date"),
        F.col("last_mod_date"),
        F.col("description"),
        F.posexplode(cves).alias("cve_pos", "cve"),
    ]
    rank = F.struct("vuln_name", "cve_pos")
    group_cve = F.col("cve.name").alias("cve")
    aggs = [
        _first(_score_set(F.col("cve.cvss_v3.score")), F.col("cve.cvss_v3"), rank).alias("feed_cvss_v3"),
        _first(_score_set(F.col("cve.cvss_v2.score")), F.col("cve.cvss_v2"), rank).alias("feed_cvss_v2"),
        _first(_sev_set(F.col("severity")), F.col("severity"), rank).alias("feed_severity"),
        _first(F.col("issued_date").isNotNull(), F.col("issued_date"), rank).alias("feed_published"),
        _first(F.col("last_mod_date").isNotNull(), F.col("last_mod_date"), rank).alias("feed_lastmod"),
        _first(_nonempty_s(F.col("description")), F.col("description"), rank).alias("feed_desc"),
    ]
    out_cols = [
        F.col("namespace"),
        F.col("cve"),
        F.when(_score_set(F.col("n_cvss_v3.score")), F.col("n_cvss_v3"))
        .otherwise(F.col("feed_cvss_v3"))
        .alias("m_cvss_v3"),
        F.when(_score_set(F.col("n_cvss_v2.score")), F.col("n_cvss_v2"))
        .otherwise(F.col("feed_cvss_v2"))
        .alias("m_cvss_v2"),
        F.when(_sev_set(F.col("n_severity")), F.col("n_severity"))
        .otherwise(F.col("feed_severity"))
        .alias("m_severity"),
        F.coalesce("n_published", "feed_published").alias("m_published"),
        F.coalesce("n_lastmod", "feed_lastmod").alias("m_lastmod"),
        F.when(_nonempty_s(F.col("n_desc")), F.col("n_desc"))
        .otherwise(F.col("feed_desc"))
        .alias("m_desc"),
        # link comes only from NVD (enrichDistroMeta never sets it)
        F.col("n_link").alias("m_link"),
    ]
    return pair_cols, group_cve, aggs, out_cols


_NVD_META_COLS_SRC = (
    ("cve", "n_cve"),
    ("cvss_v2", "n_cvss_v2"),
    ("cvss_v3", "n_cvss_v3"),
    ("severity", "n_severity"),
    ("published_date", "n_published"),
    ("last_modified_date", "n_lastmod"),
    ("description", "n_desc"),
    ("link", "n_link"),
)


@lru_cache(maxsize=None)
def _nvd_meta_cols():
    return [F.col(a).alias(b) for a, b in _NVD_META_COLS_SRC]


def build_distro_meta(os_vulns: DataFrame, nvd_meta: DataFrame) -> DataFrame:
    """One row per (namespace, cve) key with the merged metadata
    (updater.go:345-386)."""
    pair_cols, group_cve, aggs, out_cols = _distro_meta_cols()
    pairs = os_vulns.select(*pair_cols)
    merged = pairs.groupBy("namespace", group_cve).agg(*aggs)
    nvd = F.broadcast(nvd_meta.select(*_nvd_meta_cols()))
    j = merged.join(nvd, F.col("cve") == F.col("n_cve"), "left")
    return j.select(*out_cols)


@lru_cache(maxsize=None)
def _app_meta_cols():
    keys = F.array_union(F.array(F.col("vul_name")), F.coalesce("cves", F.array()))
    pair_cols = [
        F.col("module_name"),
        F.col("vul_name"),
        F.col("severity"),
        F.col("score").alias("score_v2"),
        F.col("vectors").alias("vectors_v2"),
        F.col("score_v3"),
        F.col("vectors_v3"),
        F.col("issued_date"),
        F.col("last_mod_date"),
        F.col("description"),
        F.posexplode(keys).alias("cve_pos", "cve"),
    ]
    rank = F.struct("module_name", "vul_name", "cve_pos")
    v3 = F.struct(F.col("vectors_v3").alias("vectors"), F.col("score_v3").alias("score"))
    v2 = F.struct(F.col("vectors_v2").alias("vectors"), F.col("score_v2").alias("score"))
    aggs = [
        _first(_score_set(F.col("score_v3")), v3, rank).alias("feed_cvss_v3"),
        _first(_score_set(F.col("score_v2")), v2, rank).alias("feed_cvss_v2"),
        _first(_sev_set(F.col("severity")), F.col("severity"), rank).alias("feed_severity"),
        _first(F.col("issued_date").isNotNull(), F.col("issued_date"), rank).alias("feed_published"),
        _first(F.col("last_mod_date").isNotNull(), F.col("last_mod_date"), rank).alias("feed_lastmod"),
        _first(_nonempty_s(F.col("description")), F.col("description"), rank).alias("feed_desc"),
    ]
    out_cols = [
        F.col("cve"),
        F.when(_score_set(F.col("n_cvss_v3.score")), F.col("n_cvss_v3"))
        .otherwise(F.col("feed_cvss_v3"))
        .alias("m_cvss_v3"),
        F.when(_score_set(F.col("n_cvss_v2.score")), F.col("n_cvss_v2"))
        .otherwise(F.col("feed_cvss_v2"))
        .alias("m_cvss_v2"),
        F.when(_sev_set(F.col("n_severity")), F.col("n_severity"))
        .otherwise(F.col("feed_severity"))
        .alias("m_severity"),
        F.coalesce("n_published", "feed_published").alias("m_published"),
        F.coalesce("n_lastmod", "feed_lastmod").alias("m_lastmod"),
        F.when(_nonempty_s(F.col("n_desc")), F.col("n_desc"))
        .otherwise(F.col("feed_desc"))
        .alias("m_desc"),
        F.col("n_link").alias("m_link"),
    ]
    return pair_cols, aggs, out_cols


def build_app_meta(app_vulns: DataFrame, nvd_meta: DataFrame) -> DataFrame:
    """One row per bare-cve key (updater.go:388-425). Keys come from
    ``[vul_name] + cves``."""
    pair_cols, aggs, out_cols = _app_meta_cols()
    pairs = app_vulns.select(*pair_cols)
    merged = pairs.groupBy("cve").agg(*aggs)
    nvd = F.broadcast(nvd_meta.select(*_nvd_meta_cols()))
    j = merged.join(nvd, F.col("cve") == F.col("n_cve"), "left")
    return j.select(*out_cols)


# ---------------------------------------------------------------------------
# pass 2 — assign back, fix severity/scores, gate
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _assign_distro_cols():
    cves = F.when(
        F.size(F.coalesce("cves", F.array())) > 0, F.transform("cves", lambda c: c["name"])
    ).otherwise(F.array(F.col("name")))
    explode_col = F.posexplode(cves).alias("cve_pos", "cve_key")
    join_cond = (F.col("namespace") == F.col("m_namespace")) & (
        F.col("cve_key") == F.col("m_cve")
    )
    rank = F.col("cve_pos")
    aggs = [
        *[F.min_by(c, "cve_pos").alias(c) for c in OS_VULNS.fieldNames()],
        _first(F.col("m_published").isNotNull(), F.col("m_published"), rank).alias("f_published"),
        _first(F.col("m_lastmod").isNotNull(), F.col("m_lastmod"), rank).alias("f_lastmod"),
        _first(_nonempty_s(F.col("m_desc")), F.col("m_desc"), rank).alias("f_desc"),
        _first(_nonempty_s(F.col("m_link")), F.col("m_link"), rank).alias("f_link"),
        _first(_score_set(F.col("m_cvss_v3.score")), F.col("m_cvss_v3"), rank).alias("f_cvss_v3"),
        _first(_score_set(F.col("m_cvss_v2.score")), F.col("m_cvss_v2"), rank).alias("f_cvss_v2"),
        _first(_sev_set(F.col("m_severity")), F.col("m_severity"), rank).alias("f_severity"),
    ]
    v3 = F.when(_score_set(F.col("cvss_v3.score")), F.col("cvss_v3")).otherwise(F.col("f_cvss_v3"))
    v2 = F.when(_score_set(F.col("cvss_v2.score")), F.col("cvss_v2")).otherwise(F.col("f_cvss_v2"))
    base_sev = F.when(_sev_set(F.col("severity")), F.col("severity")).otherwise(F.col("f_severity"))
    sev, s2, s3 = fix_severity_score(
        base_sev, F.coalesce(v2["score"], F.lit(0.0)), F.coalesce(v3["score"], F.lit(0.0))
    )
    out_cols = [
        F.col("name"),
        F.col("namespace"),
        F.when(_nonempty_s(F.col("description")), F.col("description"))
        .otherwise(F.col("f_desc"))
        .alias("description"),
        F.when(_nonempty_s(F.col("link")), F.col("link")).otherwise(F.col("f_link")).alias("link"),
        sev.alias("severity"),
        F.struct(v2["vectors"].alias("vectors"), s2.alias("score")).alias("cvss_v2"),
        F.struct(v3["vectors"].alias("vectors"), s3.alias("score")).alias("cvss_v3"),
        F.coalesce("issued_date", "f_published").alias("issued_date"),
        F.coalesce("last_mod_date", "f_lastmod").alias("last_mod_date"),
        F.col("cves"),
        F.col("fixed_in"),
        F.col("cpes"),
        F.col("feed_rating"),
    ]
    gate = F.col("severity").isin(KEPT_SEVERITIES)
    return explode_col, join_cond, aggs, out_cols, gate


def assign_distro_metadata(os_vulns: DataFrame, distro_meta: DataFrame) -> DataFrame:
    """updater.go:431-486: coalesce-fill each vuln from its CVEs' meta in
    list order, recalibrate severity, severity-gate."""
    explode_col, join_cond, aggs, out_cols, gate = _assign_distro_cols()
    exploded = os_vulns.withColumn("vid", F.monotonically_increasing_id()).select(
        "*", explode_col
    )
    m = distro_meta.withColumnRenamed("namespace", "m_namespace").withColumnRenamed("cve", "m_cve")
    j = exploded.join(m, join_cond, "left")
    filled = j.groupBy("vid").agg(*aggs)
    return filled.select(*out_cols).filter(gate)


@lru_cache(maxsize=None)
def _assign_app_cols():
    keys = F.array_union(F.array(F.col("vul_name")), F.coalesce("cves", F.array()))
    explode_col = F.posexplode(keys).alias("cve_pos", "cve_key")
    join_cond = F.col("cve_key") == F.col("m_cve")
    rank = F.col("cve_pos")
    aggs = [
        *[F.min_by(c, "cve_pos").alias(c) for c in APP_VULNS.fieldNames()],
        _first(F.col("m_published").isNotNull(), F.col("m_published"), rank).alias("f_published"),
        _first(F.col("m_lastmod").isNotNull(), F.col("m_lastmod"), rank).alias("f_lastmod"),
        _first(_nonempty_s(F.col("m_desc")), F.col("m_desc"), rank).alias("f_desc"),
        _first(_nonempty_s(F.col("m_link")), F.col("m_link"), rank).alias("f_link"),
        _first(_score_set(F.col("m_cvss_v3.score")), F.col("m_cvss_v3"), rank).alias("f_cvss_v3"),
        _first(_score_set(F.col("m_cvss_v2.score")), F.col("m_cvss_v2"), rank).alias("f_cvss_v2"),
    ]
    v3_struct = F.struct(F.col("vectors_v3").alias("vectors"), F.col("score_v3").alias("score"))
    v2_struct = F.struct(F.col("vectors").alias("vectors"), F.col("score").alias("score"))
    v3 = F.when(_score_set(F.col("score_v3")), v3_struct).otherwise(F.col("f_cvss_v3"))
    v2 = F.when(_score_set(F.col("score")), v2_struct).otherwise(F.col("f_cvss_v2"))
    # note: pass 2 never back-fills app severity from meta (updater.go:
    # 497-518 touches dates/desc/link/scores only); fixSeverityScore's
    # else-branch uses the record's own severity
    sev, s2, s3 = fix_severity_score(
        F.col("severity"),
        F.coalesce(v2["score"], F.lit(0.0)),
        F.coalesce(v3["score"], F.lit(0.0)),
    )
    out_cols = [
        F.col("vul_name"),
        F.col("app_name"),
        F.col("module_name"),
        F.col("import_paths"),
        F.col("symbols"),
        F.when(_nonempty_s(F.col("description")), F.col("description"))
        .otherwise(F.col("f_desc"))
        .alias("description"),
        F.when(_nonempty_s(F.col("link")), F.col("link")).otherwise(F.col("f_link")).alias("link"),
        s2.alias("score"),
        v2["vectors"].alias("vectors"),
        s3.alias("score_v3"),
        v3["vectors"].alias("vectors_v3"),
        sev.alias("severity"),
        F.col("affected_ver"),
        F.col("fixed_ver"),
        F.col("unaffected_ver"),
        F.coalesce("issued_date", "f_published").alias("issued_date"),
        F.coalesce("last_mod_date", "f_lastmod").alias("last_mod_date"),
        F.col("cves"),
    ]
    gate = F.col("severity").isin(KEPT_SEVERITIES)
    return explode_col, join_cond, aggs, out_cols, gate


def assign_app_metadata(app_vulns: DataFrame, app_meta: DataFrame) -> DataFrame:
    """updater.go:488-542 for app records (bare-cve keys)."""
    explode_col, join_cond, aggs, out_cols, gate = _assign_app_cols()
    exploded = app_vulns.withColumn("vid", F.monotonically_increasing_id()).select(
        "*", explode_col
    )
    m = app_meta.withColumnRenamed("cve", "m_cve")
    j = exploded.join(m, join_cond, "left")
    filled = j.groupBy("vid").agg(*aggs)
    return filled.select(*out_cols).filter(gate)


# ---------------------------------------------------------------------------
# J3 — NVD vulnerable-version backfill
# ---------------------------------------------------------------------------


def correct_app_affected_version(app_vulns: DataFrame, nvd_meta: DataFrame) -> DataFrame:
    """Fill empty affected/fixed ranges from NVD CPE ranges
    (updater.go:147-189; GetAffectedVersion nvd.go:363-394).

    Entirely Catalyst-native: the or-prefix bookkeeping of the string
    round-trip (``||>=x`` → ``orgteq``) is reproduced positionally with
    ``transform``.
    """
    nvd = F.broadcast(
        nvd_meta.select(F.col("cve").alias("n_cve"), F.col("vuln_versions").alias("n_vv"))
    )
    j = app_vulns.join(nvd, F.col("vul_name") == F.col("n_cve"), "left")
    aff_col, fix_col = _affected_version_cols()
    out = j.withColumn("affected_ver", aff_col).withColumn("fixed_ver", fix_col)
    return out.drop("n_cve", "n_vv")


@lru_cache(maxsize=None)
def _affected_version_cols():
    """Frozen backfill Columns for correct_app_affected_version (round
    9): the nested positional-lambda HOF tree costs ~35 ms of py4j
    round trips per lambda to build and the whole set is a pure
    function of the canonical column names — built once per process."""
    vv = F.coalesce("n_vv", F.array())

    def or_(i):
        return F.when(i > 0, F.lit("or")).otherwise(F.lit(""))

    def s(op, ver):
        return F.struct(op.alias("op_code"), ver.alias("version"))

    has = lambda c: c.isNotNull() & (c != "")  # noqa: E731
    affects = F.flatten(
        F.transform(
            vv,
            lambda v, i: F.filter(
                F.array(
                    # start bound: >=start_including | >start_excluding
                    F.when(has(v["start_including"]), s(F.concat(or_(i), F.lit("gteq")), v["start_including"]))
                    .when(has(v["start_excluding"]), s(F.concat(or_(i), F.lit("gt")), v["start_excluding"])),
                    # end bound: or-prefix only when no start bound consumed it
                    F.when(
                        has(v["end_including"]),
                        s(
                            F.when(
                                has(v["start_including"]) | has(v["start_excluding"]), F.lit("lteq")
                            ).otherwise(F.concat(or_(i), F.lit("lteq"))),
                            v["end_including"],
                        ),
                    ).when(
                        has(v["end_excluding"]),
                        s(
                            F.when(
                                has(v["start_including"]) | has(v["start_excluding"]), F.lit("lt")
                            ).otherwise(F.concat(or_(i), F.lit("lt"))),
                            v["end_excluding"],
                        ),
                    ),
                ),
                lambda t: t.isNotNull(),
            ),
        )
    )
    fixes = F.filter(
        F.transform(
            vv,
            lambda v, i: F.when(has(v["end_including"]), s(F.concat(or_(i), F.lit("gt")), v["end_including"]))
            .when(has(v["end_excluding"]), s(F.concat(or_(i), F.lit("gteq")), v["end_excluding"])),
        ),
        lambda t: t.isNotNull(),
    )
    needs = (F.size(F.coalesce("affected_ver", F.array())) == 0) | (
        F.size(F.coalesce("fixed_ver", F.array())) == 0
    )
    found = F.size(vv) > 0
    aff_col = F.when(
        needs & found & (F.size(F.coalesce("affected_ver", F.array())) == 0), affects
    ).otherwise(F.col("affected_ver"))
    fix_col = F.when(
        needs & found & (F.size(F.coalesce("fixed_ver", F.array())) == 0), fixes
    ).otherwise(F.col("fixed_ver"))
    return aff_col, fix_col


# ---------------------------------------------------------------------------
# J8 — NVD whitelist injection; J9 — ubuntu:upstream translation
# ---------------------------------------------------------------------------


def inject_nvd_whitelist_apps(app_vulns: DataFrame, nvd_meta: DataFrame) -> DataFrame:
    """Append hand-listed CVEs from NVD metadata (updater.go:596-640).

    The reference's existence check compares against a key that can never
    match (it formats the whole whitelist struct into the key string,
    updater.go:605), so records are appended whenever NVD has the CVE —
    mirrored.
    """
    spark = app_vulns.sparkSession
    wl = spark.createDataFrame(
        [(w["cve"], w["app_name"], w["module_name"]) for w in NVD_APP_WHITELIST],
        "w_cve string, w_app string, w_module string",
    )
    rows = wl.join(nvd_meta, wl["w_cve"] == nvd_meta["cve"], "inner").select(
        F.col("w_cve").alias("vul_name"),
        F.col("w_app").alias("app_name"),
        F.col("w_module").alias("module_name"),
        F.col("description"),
        F.col("link"),
        F.col("cvss_v2.score").alias("score"),
        F.col("cvss_v2.vectors").alias("vectors"),
        F.col("cvss_v3.score").alias("score_v3"),
        F.col("cvss_v3.vectors").alias("vectors_v3"),
        F.col("severity"),
        F.array().cast(APP_VULNS["affected_ver"].dataType).alias("affected_ver"),
        F.array().cast(APP_VULNS["fixed_ver"].dataType).alias("fixed_ver"),
        F.array().cast(APP_VULNS["unaffected_ver"].dataType).alias("unaffected_ver"),
        F.col("published_date").alias("issued_date"),
        F.col("last_modified_date").alias("last_mod_date"),
        F.array(F.col("cve")).alias("cves"),
    )
    from ..sources.base import conform

    return app_vulns.unionByName(conform(rows, APP_VULNS))


def xslate_ubuntu_upstream(os_vulns: DataFrame) -> DataFrame:
    """ubuntu:upstream FixedIn entries → app records (updater.go:67-86).

    NOTE: dead code in the reference — defined but never called from the
    pipeline; exposed here as a standalone operator for parity.
    """
    rows = (
        os_vulns.filter(F.col("namespace") == "ubuntu:upstream")
        .select("name", "description", "severity", F.explode("fixed_in").alias("fv"))
        .select(
            F.col("name").alias("vul_name"),
            F.col("fv.name").alias("module_name"),
            "description",
            F.concat(F.lit(CVE_LINK_PREFIX), F.col("name")).alias("link"),
            "severity",
            F.array(
                F.struct(F.lit("lt").alias("op_code"), F.col("fv.version").alias("version"))
            ).alias("affected_ver"),
            F.array(
                F.struct(F.lit("gteq").alias("op_code"), F.col("fv.version").alias("version"))
            ).alias("fixed_ver"),
        )
    )
    from ..sources.base import conform

    return conform(rows, APP_VULNS)


def calibrate_go_with_ubuntu(app_vulns: DataFrame, ubuntu_vulns: DataFrame) -> DataFrame:
    """J5: Go records take severity/scores/link/dates from the Ubuntu feed
    record of the same CVE (govuln.go:394-435,468-492). ``ubuntu_vulns``
    is the (pre-namespacing) Ubuntu os_vulns feed; the reference keys by
    vuln name."""
    key = F.coalesce(F.try_element_at("cves", F.lit(1)), F.col("vul_name"))
    ub = F.broadcast(
        ubuntu_vulns.select(
            F.col("name").alias("u_name"),
            F.col("severity").alias("u_severity"),
            F.col("cvss_v2").alias("u_cvss_v2"),
            F.col("cvss_v3").alias("u_cvss_v3"),
            F.col("link").alias("u_link"),
            F.col("issued_date").alias("u_issued"),
            F.col("last_mod_date").alias("u_lastmod"),
        ).dropDuplicates(["u_name"])
    )
    is_go = F.col("app_name") == "go"
    j = app_vulns.withColumn("u_key", key).join(
        ub, (F.col("u_key") == F.col("u_name")) & is_go, "left"
    )
    hit = F.col("u_name").isNotNull()
    out = j.select(
        F.when(hit, F.col("u_name")).otherwise(F.col("vul_name")).alias("vul_name"),
        "app_name",
        "module_name",
        "import_paths",
        "symbols",
        "description",
        F.when(hit, F.col("u_link")).otherwise(F.col("link")).alias("link"),
        F.when(hit, F.col("u_cvss_v2.score")).otherwise(F.col("score")).alias("score"),
        F.when(hit, F.col("u_cvss_v2.vectors")).otherwise(F.col("vectors")).alias("vectors"),
        F.when(hit, F.col("u_cvss_v3.score")).otherwise(F.col("score_v3")).alias("score_v3"),
        F.when(hit, F.col("u_cvss_v3.vectors")).otherwise(F.col("vectors_v3")).alias("vectors_v3"),
        F.when(hit, F.col("u_severity")).otherwise(F.col("severity")).alias("severity"),
        "affected_ver",
        "fixed_ver",
        "unaffected_ver",
        F.coalesce("issued_date", F.when(hit, F.col("u_issued"))).alias("issued_date"),
        F.coalesce("last_mod_date", F.when(hit, F.col("u_lastmod"))).alias("last_mod_date"),
        "cves",
    )
    from ..sources.base import conform

    return conform(out, APP_VULNS)
