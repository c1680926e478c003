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


# Round 9: the per-file projection is built SIX times per composed
# pipeline (one per ecosystem file) and its F.*-chain construction cost
# ~200 py4j round trips each — the SQL texts below are assembled
# Python-side (pure string work) and parse to the identical
# expression trees in one selectExpr batch per file. The two
# range-parser columns stay Python (ghsa_version_terms is the shared
# vectorized Arrow UDF — one source of truth), attached from the raw
# strings the selectExpr passes through.
_CVES_SQL = (
    "transform(filter(coalesce(r.advisory.identifiers, array()),"
    " i -> i.type = 'CVE'), i -> i.value)"
)
_VECTORS_SQL = "coalesce(r.advisory.cvss.vectorString, '')"
_IS_V3_SQL = f"startswith({_VECTORS_SQL}, 'CVSS:3')"


def _sev_map_sql() -> str:
    body = ", ".join(f"'{k}', '{v}'" for k, v in SEVERITY_MAP.items())
    return f"map({body})"


def _load_file(spark: SparkSession, path: str, app: str, prefix: str, lowercase: bool) -> DataFrame:
    lines = (
        spark.read.text(path)
        .withColumn("line_order", F.monotonically_increasing_id())
        .filter(F.trim("value") != "")
        .select("line_order", F.from_json("value", _LINE_SCHEMA).alias("r"))
        .filter(F.col("r").isNotNull())
    )
    app_sql = app.replace("'", "\\'")
    prefix_sql = prefix.replace("'", "\\'")
    module_sql = f"concat('{prefix_sql}', r.package.name)"
    if lowercase:
        module_sql = f"lower({module_sql})"
    base = lines.selectExpr(
        "line_order",
        f"coalesce(try_element_at({_CVES_SQL}, 1),"
        " CASE WHEN coalesce(r.advisory.ghsaId, '') != ''"
        " THEN r.advisory.ghsaId END,"
        " try_element_at(r.advisory.cwes.nodes, 1).cweid) AS vul_name",
        f"'{app_sql}' AS app_name",
        f"{module_sql} AS module_name",
        f"{_CVES_SQL} AS cves",
        "concat_ws('', r.advisory.summary, '\\n',"
        " r.advisory.description, '\\n') AS description",
        "r.advisory.permalink AS link",
        f"{_sev_map_sql()}[lower(r.advisory.severity)] AS severity",
        f"CASE WHEN NOT {_IS_V3_SQL} AND {_VECTORS_SQL} != ''"
        " THEN r.advisory.cvss.score END AS score",
        f"CASE WHEN NOT {_IS_V3_SQL} AND {_VECTORS_SQL} != ''"
        f" THEN {_VECTORS_SQL} END AS vectors",
        f"CASE WHEN {_IS_V3_SQL} THEN r.advisory.cvss.score END AS score_v3",
        f"CASE WHEN {_IS_V3_SQL} THEN {_VECTORS_SQL} END AS vectors_v3",
        "r.advisory.publishedAt AS issued_date",
        "r.advisory.updatedAt AS last_mod_date",
        "r.vulnerableVersionRange AS __aff_raw",
        "r.firstPatchedVersion.identifier AS __fix_raw",
    )
    return (
        base.withColumn("aff_terms", ghsa_version_terms("__aff_raw"))
        .withColumn("fix_terms", ghsa_version_terms("__fix_raw"))
        .drop("__aff_raw", "__fix_raw")
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
