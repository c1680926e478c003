"""Rocky Linux Apollo source (SURVEY.md S11).

Behavioral spec: ``/root/reference/updater/fetchers/rocky/rocky.go``.
The API response (paginated remotely; here the local dump
``rocky/apollo.json``) holds advisories with affected products,
NEVRA-formatted packages and CVEs:

- namespace ``rocky:<major>`` from the product name's first numeric
  field (floored float, rocky.go:93-105);
- NEVRA ``name-[epoch:]version-release.arch.rpm`` → (name, version)
  with ``^`` → ``.`` (rocky.go:107-136; goldens rocky_test.go:9-26);
- packages dedupe per namespace by VERSION string (first wins —
  rocky.go:160-176 keys the group map by version only);
- severity map Critical/Important/Moderate → Critical/High/Medium,
  everything else → Low (rocky.go:258-272);
- one vulnerability row per (advisory, namespace).
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import register_distro
from .base import finish_os_vulns, map_literal, version_is_parseable

SEVERITY_MAP = {"Critical": "Critical", "Important": "High", "Moderate": "Medium"}

_SCHEMA = T.StructType(
    [
        T.StructField(
            "advisories",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("name", T.StringType()),
                        T.StructField("description", T.StringType()),
                        T.StructField("severity", T.StringType()),
                        T.StructField("published_at", T.StringType()),
                        T.StructField(
                            "cves",
                            T.ArrayType(T.StructType([T.StructField("cve", T.StringType())])),
                        ),
                        T.StructField(
                            "affected_products",
                            T.ArrayType(
                                T.StructType([T.StructField("major_version", T.IntegerType())])
                            ),
                        ),
                        T.StructField(
                            "packages",
                            T.ArrayType(
                                T.StructType(
                                    [
                                        T.StructField("nevra", T.StringType()),
                                        T.StructField("product_name", T.StringType()),
                                        T.StructField("package_name", T.StringType()),
                                    ]
                                )
                            ),
                        ),
                    ]
                )
            ),
        ),
        T.StructField("total", T.LongType()),
    ]
)


def _nevra_name(nevra: F.Column) -> F.Column:
    """name-[epoch:]version-release.arch.rpm → package name."""
    base = F.regexp_replace(nevra, r"\.rpm$", "")
    base = F.regexp_replace(base, r"\.[^.]*$", "")  # strip arch
    left = F.when(base.contains(":"), F.substring_index(base, ":", 1))
    return F.regexp_replace(left, r"-[^-]*$", "")  # strip -epoch


def _nevra_version(nevra: F.Column) -> F.Column:
    base = F.regexp_replace(nevra, r"\.rpm$", "")
    base = F.regexp_replace(base, r"\.[^.]*$", "")
    right = F.when(
        (F.size(F.split(base, ":")) == 2), F.substring_index(base, ":", -1)
    )
    return F.replace(right, F.lit("^"), F.lit("."))


def _product_major(product_name: F.Column) -> F.Column:
    """First numeric field of the product name, floored (rocky.go:93-105)."""
    num = F.filter(
        F.transform(F.split(product_name, r"\s+"), lambda t: t.try_cast("double")),
        lambda x: x.isNotNull(),
    )
    return F.try_element_at(num, F.lit(1)).cast("int")


@register_distro("rocky")
def load(spark: SparkSession, source_root: str) -> DataFrame:
    pattern = os.path.join(source_root, "rocky", "apollo.json*")
    if not glob.glob(pattern):
        raise FileNotFoundError(f"no Rocky apollo dump under {pattern}")
    doc = spark.read.schema(_SCHEMA).option("multiLine", True).json(pattern)
    adv = doc.select(F.explode("advisories").alias("a"))
    sev_map = map_literal(SEVERITY_MAP)
    pkgs = adv.select(
        F.col("a.name").alias("name"),
        F.col("a.description").alias("description"),
        F.coalesce(sev_map[F.col("a.severity")], F.lit("Low")).alias("severity"),
        F.to_timestamp(F.substring_index("a.published_at", "T", 1), "yyyy-MM-dd").alias(
            "issued_date"
        ),
        F.transform(
            F.coalesce("a.cves", F.array()),
            lambda c: F.struct(
                c["cve"].alias("name"),
                F.lit(None).cast("struct<vectors:string,score:double>").alias("cvss_v2"),
                F.lit(None).cast("struct<vectors:string,score:double>").alias("cvss_v3"),
            ),
        ).alias("cves"),
        F.posexplode(F.coalesce("a.packages", F.array())).alias("pkg_pos", "p"),
    )
    pkgs = (
        pkgs.withColumn("major", _product_major(F.col("p.product_name")))
        .withColumn("pkg_name", _nevra_name(F.col("p.nevra")))
        .withColumn("pkg_version", _nevra_version(F.col("p.nevra")))
        .filter(
            F.col("major").isNotNull()
            & F.col("pkg_version").isNotNull()
            & (F.col("pkg_name") != "")
        )
        .withColumn("namespace", F.concat(F.lit("rocky:"), F.col("major")))
        # unparseable versions logged-but-kept as zero in the reference;
        # keep the raw string (comparator degrades identically)
        .withColumn(
            "pkg_version",
            F.when(version_is_parseable(F.col("pkg_version")), F.col("pkg_version")).otherwise(
                F.lit("")
            ),
        )
    )
    # dedupe per (advisory, namespace) by VERSION string, first wins
    grouped = (
        pkgs.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("name", "namespace", "pkg_version").orderBy("pkg_pos")
            ),
        )
        .filter(F.col("rn") == 1)
        .groupBy("name", "namespace")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("pkg_pos").alias("o"),
                        F.struct(
                            F.col("pkg_name").alias("name"),
                            F.col("namespace").alias("namespace"),
                            F.col("pkg_version").alias("version"),
                            F.lit(None).cast("string").alias("min_ver"),
                        ).alias("t"),
                    )
                )
            )["t"].alias("fixed_in"),
            *[
                F.min_by(c, "pkg_pos").alias(c)
                for c in ("description", "severity", "issued_date", "cves")
            ],
        )
    )
    return finish_os_vulns(grouped)
