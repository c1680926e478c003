"""Go vulnerability database (OSV) source (SURVEY.md S16).

Behavioral spec: ``/root/reference/updater/fetchers/apps/govuln.go``.
One OSV JSON document per advisory; per ``affected`` entry one app-vuln
row with module ``go:<pkg>``:

- severity: CVSS_V2 score → ``score``; CVSS_V3 score → ``score_v3`` +
  severity band (>=7 High, >=4 Medium, else Low) (govuln.go:196-203,
  352-372);
- description falls back to summary (govuln.go:374-376);
- link: database_specific.url else first reference (govuln.go:174-193);
- CVEs from ``CVE-`` aliases; records keyed by first CVE else id, last
  writer wins (govuln.go:413-418,459);
- ranges: ECOSYSTEM custom_ranges then SEMVER ranges → opcode terms
  (functions.ranges.osv_affected_ranges);
- import paths/symbols deduped in order (govuln.go:119-149);
- whitelist of GO- ids dropped (govuln.go:473-480).

The Ubuntu severity calibration (govuln.go:468-492) is a separate join —
``plans.enrich.calibrate_go_with_ubuntu`` — because it needs the Ubuntu
feed DataFrame.

Input: a directory ``apps/golang-osv/`` of per-advisory ``*.json`` files
(the unpacked equivalent of the reference's ``golang-osv.zip``; local-
file-first like every other source).
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import register_app
from .app_base import finish_app_vulns, osv_range_terms

GO_WHITELIST = [  # govuln.go:473-480 (skipped ids)
    "GO-2022-0635",
    "GO-2022-0646",
    "GO-2025-3918",
    "GO-2025-3917",
    "GO-2025-3919",
    "GO-2025-4235",
]

_EVENTS = T.ArrayType(
    T.StructType(
        [
            T.StructField("introduced", T.StringType()),
            T.StructField("fixed", T.StringType()),
        ]
    )
)
_RANGES = T.ArrayType(
    T.StructType([T.StructField("type", T.StringType()), T.StructField("events", _EVENTS)])
)

OSV_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("published", T.TimestampType()),
        T.StructField("modified", T.TimestampType()),
        T.StructField("aliases", T.ArrayType(T.StringType())),
        T.StructField("upstream", T.ArrayType(T.StringType())),
        T.StructField("summary", T.StringType()),
        T.StructField("details", T.StringType()),
        T.StructField(
            "severity",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("type", T.StringType()),
                        T.StructField("score", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField(
            "affected",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField(
                            "package",
                            T.StructType(
                                [
                                    T.StructField("ecosystem", T.StringType()),
                                    T.StructField("name", T.StringType()),
                                ]
                            ),
                        ),
                        T.StructField("ranges", _RANGES),
                        T.StructField(
                            "ecosystem_specific",
                            T.StructType(
                                [
                                    T.StructField(
                                        "imports",
                                        T.ArrayType(
                                            T.StructType(
                                                [
                                                    T.StructField("path", T.StringType()),
                                                    T.StructField(
                                                        "symbols", T.ArrayType(T.StringType())
                                                    ),
                                                ]
                                            )
                                        ),
                                    ),
                                    T.StructField("custom_ranges", _RANGES),
                                ]
                            ),
                        ),
                    ]
                )
            ),
        ),
        T.StructField(
            "database_specific",
            T.StructType([T.StructField("url", T.StringType())]),
        ),
        T.StructField(
            "references",
            T.ArrayType(T.StructType([T.StructField("url", T.StringType())])),
        ),
    ]
)


def load_osv_dir(spark: SparkSession, pattern: str) -> DataFrame:
    """Directory of OSV JSON docs → one row per document."""
    if not glob.glob(pattern):
        raise FileNotFoundError(f"no OSV files under {pattern}")
    return spark.read.schema(OSV_SCHEMA).option("multiLine", True).json(pattern)


@register_app("govuln")
def load(spark: SparkSession, source_root: str) -> DataFrame:
    osv = load_osv_dir(spark, os.path.join(source_root, "apps", "golang-osv", "*.json"))
    rows = osv.select(
        "id",
        "published",
        "modified",
        "summary",
        "details",
        "severity",
        "aliases",
        "database_specific",
        "references",
        F.explode("affected").alias("aff"),
    )
    cves = F.transform(
        F.filter(F.coalesce("aliases", F.array()), lambda a: a.startswith("CVE-")),
        lambda a: a,
    )
    sev_v2 = F.try_element_at(
        F.filter(F.coalesce("severity", F.array()), lambda s: s["type"] == "CVSS_V2"), F.lit(1)
    )
    sev_v3 = F.try_element_at(
        F.filter(F.coalesce("severity", F.array()), lambda s: s["type"] == "CVSS_V3"), F.lit(1)
    )
    score_v2 = sev_v2["score"].cast("double")
    score_v3 = sev_v3["score"].cast("double")
    severity = F.when(
        score_v3.isNotNull(),
        F.when(score_v3 >= 7.0, "High").when(score_v3 >= 4.0, "Medium").otherwise("Low"),
    )
    imports = F.filter(
        F.coalesce("aff.ecosystem_specific.imports", F.array()),
        lambda i: (F.coalesce(i["path"], F.lit("")) != "")
        | (F.size(F.coalesce(i["symbols"], F.array())) > 0),
    )
    import_paths = F.array_distinct(
        F.filter(F.transform(imports, lambda i: i["path"]), lambda p: F.coalesce(p, F.lit("")) != "")
    )
    symbols = F.array_distinct(
        F.filter(
            F.flatten(F.transform(imports, lambda i: F.coalesce(i["symbols"], F.array()))),
            lambda s: F.coalesce(s, F.lit("")) != "",
        )
    )
    terms = osv_range_terms(
        F.col("aff.ecosystem_specific.custom_ranges"), F.col("aff.ranges")
    )
    rows = rows.select(
        F.col("id").alias("vul_name"),
        F.lit("go").alias("app_name"),
        F.concat(F.lit("go:"), F.col("aff.package.name")).alias("module_name"),
        import_paths.alias("import_paths"),
        symbols.alias("symbols"),
        F.when(F.coalesce("details", F.lit("")) != "", F.col("details"))
        .otherwise(F.col("summary"))
        .alias("description"),
        F.coalesce(
            F.when(F.coalesce("database_specific.url", F.lit("")) != "", F.col("database_specific.url")),
            F.try_element_at("references", F.lit(1))["url"],
        ).alias("link"),
        F.coalesce(score_v2, F.lit(0.0)).alias("score"),
        severity.alias("severity"),
        F.coalesce(score_v3, F.lit(0.0)).alias("score_v3"),
        F.col("published").alias("issued_date"),
        F.col("modified").alias("last_mod_date"),
        cves.alias("cves"),
        terms["affected_ver"].alias("affected_ver"),
        terms["fixed_ver"].alias("fixed_ver"),
    )
    # keyed by first CVE alias else id; deterministic last-writer-wins
    # stand-in: keep the max id per key (zip iteration order is file order;
    # ids are unique per advisory so collisions only occur when two
    # advisories alias the same CVE)
    key = F.coalesce(F.try_element_at("cves", F.lit(1)), F.col("vul_name"))
    w = Window.partitionBy(key).orderBy(F.desc("vul_name"))
    rows = rows.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).drop("rn")
    rows = rows.filter(~F.col("vul_name").isin(GO_WHITELIST))
    return finish_app_vulns(rows)
