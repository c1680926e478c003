"""GitHub Security Advisories source (SURVEY.md S15, A7).

Behavioral spec: ``/root/reference/updater/fetchers/apps/ghsa.go``.
Six per-ecosystem NDJSON files; multiple lines of the same
(vuln, module) carry additional vulnerable ranges and are merged *in
file order* (ghsa.go:98-184):

- the first line whose severity maps (critical/high/moderate/low)
  creates the record with its scalars and base ranges; earlier invalid-
  severity lines contribute nothing;
- later lines append: affected terms only when their first opcode is
  non-empty (then ``or``-prefixed), fixed terms always;
- a final single-``0.0.0`` fixed list is cleared (ghsa.go:192-194).

Spark-first: line-mode ``spark.read.text`` + ``from_json`` (static
schema); line order is captured with ``monotonically_increasing_id``
(monotone in file offset); the order-sensitive merge is expressed with a
window + ``array_sort``ed ``collect_list`` — all JVM-side. The only
Python is the vectorized range-string parser (``ghsa_version_terms``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import register_app
from .app_base import finish_app_vulns, ghsa_version_terms, or_prefix_first

# (file, app, module prefix, lowercase) — ghsa.go:18-25,66-75
GHSA_FILES = [
    ("github/npm.data", "npm", "", False),
    ("github/maven.data", "maven", "", False),
    ("github/pip.data", "pip", "python:", False),
    ("github/nuget.data", ".NET", ".NET:", False),
    ("github/go.data", "golang", "go:", False),
    ("github/php.data", "php", "php:", True),
]

SEVERITY_MAP = {"critical": "Critical", "high": "High", "moderate": "Medium", "low": "Low"}

_LINE_SCHEMA = T.StructType(
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
        T.StructField(
            "advisory",
            T.StructType(
                [
                    T.StructField("ghsaId", T.StringType()),
                    T.StructField("severity", T.StringType()),
                    T.StructField("summary", T.StringType()),
                    T.StructField("description", T.StringType()),
                    T.StructField("publishedAt", T.TimestampType()),
                    T.StructField("updatedAt", T.TimestampType()),
                    T.StructField("permalink", T.StringType()),
                    T.StructField(
                        "cvss",
                        T.StructType(
                            [
                                T.StructField("vectorString", T.StringType()),
                                T.StructField("score", T.DoubleType()),
                            ]
                        ),
                    ),
                    T.StructField(
                        "identifiers",
                        T.ArrayType(
                            T.StructType(
                                [
                                    T.StructField("type", T.StringType()),
                                    T.StructField("value", T.StringType()),
                                ]
                            )
                        ),
                    ),
                    T.StructField(
                        "cwes",
                        T.StructType(
                            [
                                T.StructField(
                                    "nodes",
                                    T.ArrayType(
                                        T.StructType([T.StructField("cweid", T.StringType())])
                                    ),
                                )
                            ]
                        ),
                    ),
                ]
            ),
        ),
        T.StructField("vulnerableVersionRange", T.StringType()),
        T.StructField("firstPatchedVersion", T.StructType([T.StructField("identifier", T.StringType())])),
    ]
)


def _load_file(spark: SparkSession, path: str, app: str, prefix: str, lowercase: bool) -> DataFrame:
    lines = (
        spark.read.text(path)
        .withColumn("line_order", F.monotonically_increasing_id())
        .filter(F.trim("value") != "")
        .select("line_order", F.from_json("value", _LINE_SCHEMA).alias("r"))
        .filter(F.col("r").isNotNull())
    )
    sev_map = F.create_map(*[F.lit(x) for kv in SEVERITY_MAP.items() for x in kv])
    cves = F.transform(
        F.filter(F.coalesce("r.advisory.identifiers", F.array()), lambda i: i["type"] == "CVE"),
        lambda i: i["value"],
    )
    vul_name = F.coalesce(
        F.try_element_at(cves, F.lit(1)),
        F.when(F.coalesce(F.col("r.advisory.ghsaId"), F.lit("")) != "", F.col("r.advisory.ghsaId")),
        F.try_element_at("r.advisory.cwes.nodes", F.lit(1))["cweid"],
    )
    module = F.concat(F.lit(prefix), F.col("r.package.name"))
    if lowercase:
        module = F.lower(module)
    vectors = F.coalesce("r.advisory.cvss.vectorString", F.lit(""))
    is_v3 = vectors.startswith("CVSS:3")
    return lines.select(
        "line_order",
        vul_name.alias("vul_name"),
        F.lit(app).alias("app_name"),
        module.alias("module_name"),
        cves.alias("cves"),
        F.concat_ws(
            "", F.col("r.advisory.summary"), F.lit("\n"), F.col("r.advisory.description"), F.lit("\n")
        ).alias("description"),
        F.col("r.advisory.permalink").alias("link"),
        sev_map[F.lower("r.advisory.severity")].alias("severity"),
        F.when(~is_v3 & (vectors != ""), F.col("r.advisory.cvss.score")).alias("score"),
        F.when(~is_v3 & (vectors != ""), vectors).alias("vectors"),
        F.when(is_v3, F.col("r.advisory.cvss.score")).alias("score_v3"),
        F.when(is_v3, vectors).alias("vectors_v3"),
        F.col("r.advisory.publishedAt").alias("issued_date"),
        F.col("r.advisory.updatedAt").alias("last_mod_date"),
        ghsa_version_terms("r.vulnerableVersionRange").alias("aff_terms"),
        ghsa_version_terms("r.firstPatchedVersion.identifier").alias("fix_terms"),
    )


@register_app("ghsa")
def load(spark: SparkSession, source_root: str) -> DataFrame:
    parts = []
    for rel, app, prefix, lowercase in GHSA_FILES:
        for ext in ("", ".gz"):
            p = os.path.join(source_root, rel + ext)
            if os.path.exists(p):
                parts.append(_load_file(spark, p, app, prefix, lowercase))
                break
    if not parts:
        raise FileNotFoundError(f"no GHSA data files under {source_root}/github/")
    rows = parts[0]
    for p in parts[1:]:
        rows = rows.unionByName(p)

    key = ["app_name", "vul_name", "module_name"]
    w = Window.partitionBy(*key)
    # first valid-severity line creates the record (ghsa.go:137-176);
    # lines before it are dropped entirely
    rows = (
        rows.withColumn(
            "first_valid", F.min(F.when(F.col("severity").isNotNull(), F.col("line_order"))).over(w)
        )
        .filter(F.col("first_valid").isNotNull() & (F.col("line_order") >= F.col("first_valid")))
        .withColumn("is_base", F.col("line_order") == F.col("first_valid"))
    )
    first_op = F.try_element_at("aff_terms", F.lit(1))["op_code"]
    aff_contrib = (
        F.when(F.col("is_base"), F.col("aff_terms"))
        .when(
            (F.size("aff_terms") > 0) & (first_op != ""), or_prefix_first(F.col("aff_terms"))
        )
        .otherwise(F.array().cast("array<struct<op_code:string,version:string>>"))
    )
    merged = (
        rows.withColumn("aff_contrib", aff_contrib)
        .groupBy(*key)
        .agg(
            F.flatten(
                F.array_sort(
                    F.collect_list(F.struct(F.col("line_order").alias("o"), F.col("aff_contrib").alias("t")))
                )["t"]
            ).alias("affected_ver"),
            F.flatten(
                F.array_sort(
                    F.collect_list(F.struct(F.col("line_order").alias("o"), F.col("fix_terms").alias("t")))
                )["t"]
            ).alias("fixed_ver"),
            *[
                F.min_by(c, "line_order").alias(c)
                for c in (
                    "cves",
                    "description",
                    "link",
                    "severity",
                    "score",
                    "vectors",
                    "score_v3",
                    "vectors_v3",
                    "issued_date",
                    "last_mod_date",
                )
            ],
        )
        # lone 0.0.0 fixed version → no fixed version (ghsa.go:192-194)
        .withColumn(
            "fixed_ver",
            F.when(
                (F.size("fixed_ver") == 1)
                & (F.try_element_at("fixed_ver", F.lit(1))["version"] == "0.0.0"),
                F.array().cast("array<struct<op_code:string,version:string>>"),
            ).otherwise(F.col("fixed_ver")),
        )
    )
    return finish_app_vulns(merged)
