"""Canonical StructType schemas for the engine's fact/dimension tables.

Derived from the reference record types (see FIXTURES.md §1):
- ``OS_VULNS``  ← common.Vulnerability   (/root/reference/common/types.go:136-152)
- ``APP_VULNS`` ← common.AppModuleVul    (/root/reference/common/types.go:95-114)
- ``NVD_META``  ← common.NVDMetadata     (/root/reference/common/types.go:15-31)

Schemas are explicit and static — the reference hard-codes every wire
schema via struct tags; we never infer.
"""

from __future__ import annotations

from pyspark.sql import types as T

CVSS = T.StructType(
    [
        T.StructField("vectors", T.StringType()),
        T.StructField("score", T.DoubleType()),
    ]
)

CVE = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("cvss_v2", CVSS),
        T.StructField("cvss_v3", CVSS),
    ]
)

FEATURE_VERSION = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("namespace", T.StringType()),
        T.StructField("version", T.StringType()),  # dpkg string; "#MINV#"/"#MAXV#"
        T.StructField("min_ver", T.StringType()),
    ]
)

OS_VULNS = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("namespace", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("link", T.StringType()),
        T.StructField("severity", T.StringType()),
        T.StructField("cvss_v2", CVSS),
        T.StructField("cvss_v3", CVSS),
        T.StructField("issued_date", T.TimestampType()),
        T.StructField("last_mod_date", T.TimestampType()),
        T.StructField("cves", T.ArrayType(CVE)),
        T.StructField("fixed_in", T.ArrayType(FEATURE_VERSION)),
        T.StructField("cpes", T.ArrayType(T.StringType())),
        T.StructField("feed_rating", T.StringType()),
    ]
)

VERSION_TERM = T.StructType(
    [
        T.StructField("op_code", T.StringType()),
        T.StructField("version", T.StringType()),
    ]
)

APP_VULNS = T.StructType(
    [
        T.StructField("vul_name", T.StringType()),
        T.StructField("app_name", T.StringType()),
        T.StructField("module_name", T.StringType()),
        T.StructField("import_paths", T.ArrayType(T.StringType())),
        T.StructField("symbols", T.ArrayType(T.StringType())),
        T.StructField("description", T.StringType()),
        T.StructField("link", T.StringType()),
        T.StructField("score", T.DoubleType()),
        T.StructField("vectors", T.StringType()),
        T.StructField("score_v3", T.DoubleType()),
        T.StructField("vectors_v3", T.StringType()),
        T.StructField("severity", T.StringType()),
        T.StructField("affected_ver", T.ArrayType(VERSION_TERM)),
        T.StructField("fixed_ver", T.ArrayType(VERSION_TERM)),
        T.StructField("unaffected_ver", T.ArrayType(VERSION_TERM)),
        T.StructField("issued_date", T.TimestampType()),
        T.StructField("last_mod_date", T.TimestampType()),
        T.StructField("cves", T.ArrayType(T.StringType())),
    ]
)

NVD_VULN_VERSION = T.StructType(
    [
        T.StructField("start_including", T.StringType()),
        T.StructField("start_excluding", T.StringType()),
        T.StructField("end_including", T.StringType()),
        T.StructField("end_excluding", T.StringType()),
    ]
)

NVD_META = T.StructType(
    [
        T.StructField("cve", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("severity", T.StringType()),
        T.StructField("cvss_v2", CVSS),
        T.StructField("cvss_v3", CVSS),
        T.StructField("published_date", T.TimestampType()),
        T.StructField("last_modified_date", T.TimestampType()),
        T.StructField("link", T.StringType()),
        T.StructField("vuln_versions", T.ArrayType(NVD_VULN_VERSION)),
    ]
)
