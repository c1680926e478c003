"""NVD 2.0 metadata source (SURVEY.md S14) → canonical ``nvd_meta``.

Behavioral spec: ``/root/reference/updater/nvd/nvd.go:132-338``.

- CVSS preference: v3.1 over v3.0 (first metric element, score != 0);
  v2 kept alongside; severity from the winning v3 baseSeverity, else from
  the v2 metric-level baseSeverity (nvd.go:252-267).
- Severity words LOW/MEDIUM/HIGH/CRITICAL map to priorities, anything
  else → empty (nvd.go:324-338).
- Dates parse with two exact layouts (``2006-01-02T15:04:05`` then
  ``2006-01-02T15:04Z``); anything else — including fractional seconds —
  fails both and stays null (nvd.go:268-283, Go ``time.Parse`` is strict).
- Vulnerable-version ranges: only ``configurations[0]``, only OR nodes,
  only vulnerable cpeMatch entries with ≥1 range bound, and
  ``microsoft:visual_studio_`` criteria ignored (nvd.go:286-308).

Everything is Catalyst-native (from_json-free: spark.read.json with an
explicit schema; higher-order functions for the range extraction).
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import register_meta
from .base import map_literal

CVE_LINK_PREFIX = "https://cve.mitre.org/cgi-bin/cvename.cgi?name="

_CVSS_DATA = T.StructType(
    [
        T.StructField("vectorString", T.StringType()),
        T.StructField("baseScore", T.DoubleType()),
        T.StructField("baseSeverity", T.StringType()),
    ]
)

_METRIC_V3 = T.ArrayType(T.StructType([T.StructField("cvssData", _CVSS_DATA)]))
_METRIC_V2 = T.ArrayType(
    T.StructType(
        [
            T.StructField("cvssData", _CVSS_DATA),
            T.StructField("baseSeverity", T.StringType()),
        ]
    )
)

_SCHEMA = T.StructType(
    [
        T.StructField(
            "vulnerabilities",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField(
                            "cve",
                            T.StructType(
                                [
                                    T.StructField("id", T.StringType()),
                                    T.StructField("published", T.StringType()),
                                    T.StructField("lastModified", T.StringType()),
                                    T.StructField(
                                        "descriptions",
                                        T.ArrayType(
                                            T.StructType(
                                                [
                                                    T.StructField("lang", T.StringType()),
                                                    T.StructField("value", T.StringType()),
                                                ]
                                            )
                                        ),
                                    ),
                                    T.StructField(
                                        "metrics",
                                        T.StructType(
                                            [
                                                T.StructField("cvssMetricV31", _METRIC_V3),
                                                T.StructField("cvssMetricV30", _METRIC_V3),
                                                T.StructField("cvssMetricV2", _METRIC_V2),
                                            ]
                                        ),
                                    ),
                                    T.StructField(
                                        "configurations",
                                        T.ArrayType(
                                            T.StructType(
                                                [
                                                    T.StructField(
                                                        "nodes",
                                                        T.ArrayType(
                                                            T.StructType(
                                                                [
                                                                    T.StructField(
                                                                        "operator", T.StringType()
                                                                    ),
                                                                    T.StructField(
                                                                        "cpeMatch",
                                                                        T.ArrayType(
                                                                            T.StructType(
                                                                                [
                                                                                    T.StructField("criteria", T.StringType()),
                                                                                    T.StructField("vulnerable", T.BooleanType()),
                                                                                    T.StructField("versionStartIncluding", T.StringType()),
                                                                                    T.StructField("versionStartExcluding", T.StringType()),
                                                                                    T.StructField("versionEndIncluding", T.StringType()),
                                                                                    T.StructField("versionEndExcluding", T.StringType()),
                                                                                ]
                                                                            )
                                                                        ),
                                                                    ),
                                                                ]
                                                            )
                                                        ),
                                                    )
                                                ]
                                            )
                                        ),
                                    ),
                                ]
                            ),
                        )
                    ]
                )
            ),
        )
    ]
)

_SEVERITY_WORDS = {"LOW": "Low", "MEDIUM": "Medium", "HIGH": "High", "CRITICAL": "Critical"}


def _to_severity(col):
    m = map_literal(_SEVERITY_WORDS)
    return F.coalesce(m[col], F.lit(""))


def _parse_date(col):
    # strict two-layout parse; fractional-second strings fail both (see
    # module docstring)
    return F.coalesce(
        F.try_to_timestamp(col, F.lit("yyyy-MM-dd'T'HH:mm:ss")),
        F.try_to_timestamp(col, F.lit("yyyy-MM-dd'T'HH:mm'Z'")),
    )


@register_meta("nvd")
def load(spark: SparkSession, source_root: str) -> DataFrame:
    """``nvd/*.json[.gz]`` → canonical ``nvd_meta`` (one row per CVE id)."""
    pattern = os.path.join(source_root, "nvd", "*.json*")
    if not glob.glob(pattern):
        raise FileNotFoundError(f"no NVD feed files under {pattern}")
    raw = spark.read.schema(_SCHEMA).option("multiLine", True).json(pattern)
    cve = raw.select(F.explode("vulnerabilities").alias("v")).select(F.col("v.cve").alias("c"))
    cve = cve.filter(F.col("c.id").isNotNull() & (F.col("c.id") != ""))

    v31 = F.try_element_at("c.metrics.cvssMetricV31", F.lit(1))["cvssData"]
    v30 = F.try_element_at("c.metrics.cvssMetricV30", F.lit(1))["cvssData"]
    v2m = F.try_element_at("c.metrics.cvssMetricV2", F.lit(1))
    use31 = v31.isNotNull() & (v31["baseScore"] != 0)
    use30 = v30.isNotNull() & (v30["baseScore"] != 0)
    v3 = F.when(use31, v31).when(use30, v30)
    use2 = v2m.isNotNull() & (v2m["cvssData"]["baseScore"] != 0)

    severity = F.when(use31 | use30, _to_severity(v3["baseSeverity"]))
    severity = F.coalesce(
        F.when(severity == "", F.lit(None)).otherwise(severity),
        F.when(use2, _to_severity(v2m["baseSeverity"])),
        F.lit(""),
    )

    matches = F.flatten(
        F.transform(
            F.filter(
                F.coalesce(F.try_element_at("c.configurations", F.lit(1))["nodes"], F.array()),
                lambda n: (n["operator"] == "OR") & (F.size(n["cpeMatch"]) > 0),
            ),
            lambda n: F.filter(
                n["cpeMatch"],
                lambda m: m["vulnerable"]
                & ~F.coalesce(m["criteria"], F.lit("")).contains("microsoft:visual_studio_")
                & (
                    (F.coalesce(m["versionStartIncluding"], F.lit("")) != "")
                    | (F.coalesce(m["versionStartExcluding"], F.lit("")) != "")
                    | (F.coalesce(m["versionEndIncluding"], F.lit("")) != "")
                    | (F.coalesce(m["versionEndExcluding"], F.lit("")) != "")
                ),
            ),
        )
    )
    vuln_versions = F.transform(
        matches,
        lambda m: F.struct(
            m["versionStartIncluding"].alias("start_including"),
            m["versionStartExcluding"].alias("start_excluding"),
            m["versionEndIncluding"].alias("end_including"),
            m["versionEndExcluding"].alias("end_excluding"),
        ),
    )

    from ..schemas import NVD_META
    from .base import conform

    return conform(cve.select(
        F.col("c.id").alias("cve"),
        F.try_element_at("c.descriptions", F.lit(1))["value"].alias("description"),
        severity.alias("severity"),
        F.struct(
            F.when(use2, v2m["cvssData"]["vectorString"]).alias("vectors"),
            F.when(use2, v2m["cvssData"]["baseScore"]).alias("score"),
        ).alias("cvss_v2"),
        F.struct(
            v3["vectorString"].alias("vectors"),
            v3["baseScore"].alias("score"),
        ).alias("cvss_v3"),
        _parse_date(F.col("c.published")).alias("published_date"),
        _parse_date(F.col("c.lastModified")).alias("last_modified_date"),
        F.concat(F.lit(CVE_LINK_PREFIX), F.col("c.id")).alias("link"),
        vuln_versions.alias("vuln_versions"),
    ), NVD_META)
