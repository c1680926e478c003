"""VMware Photon OS source (SURVEY.md S12).

Behavioral spec: ``/root/reference/updater/fetchers/photon/photon.go``.
Five per-release JSON arrays ``[{cve_id, pkg, cve_score, res_ver}]``.

- ``res_ver`` "N/A"/"NA" → ``#MAXV#`` (photon.go:113-115).
- The version-parse error is never actually checked (photon.go:116-120
  tests the stale outer ``err``), so unparseable versions fall through as
  the zero version (empty string) rather than being skipped — mirrored.
- ``cve_score`` lands in CVSSv3.Score (photon.go:126-128).
- Alternate package names add a second FixedIn entry (expat →
  expat-libs, photon.go:29-32,143-156).
"""

from __future__ import annotations

import glob
import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import register_distro
from .base import MAXV, finish_os_vulns, map_literal, version_is_parseable

ALTERNATE_PACKAGE_NAMES = {"expat": "expat-libs"}  # photon.go:29-32

_ROW_SCHEMA = T.StructType(
    [
        T.StructField("cve_id", T.StringType()),
        T.StructField("pkg", T.StringType()),
        T.StructField("cve_score", T.DoubleType()),
        T.StructField("res_ver", T.StringType()),
    ]
)

_FILE_RE = re.compile(r"cve_data_photon(\d+)\.0\.json")


@register_distro("photon")
def load(spark: SparkSession, source_root: str) -> DataFrame:
    """``photon/cve_data_photon<N>.0.json[.gz]`` → ``os_vulns`` rows."""
    pattern = os.path.join(source_root, "photon", "cve_data_photon*.json*")
    files = sorted(glob.glob(pattern))
    if not files:
        raise FileNotFoundError(f"no Photon feed files under {pattern}")
    # the release number comes from the file name (photon.go:21-27);
    # derive it from input_file_name so one distributed read covers all
    # files. JSON arrays parse fine with multiLine=true.
    df = (
        spark.read.schema(_ROW_SCHEMA)
        .option("multiLine", True)
        .json(files)
        .withColumn("file", F.input_file_name())
        .withColumn("rel", F.regexp_extract("file", r"cve_data_photon(\d+)\.0\.json", 1))
        .withColumn("namespace", F.concat(F.lit("photon:"), F.col("rel")))
    )
    df = df.withColumn(
        "version",
        F.when(F.col("res_ver").isin("N/A", "NA"), F.lit(MAXV)).otherwise(F.col("res_ver")),
    ).withColumn(
        # unparseable → zero version, NOT skipped (photon.go:116-120 checks
        # the wrong err variable)
        "version",
        F.when(version_is_parseable(F.col("version")), F.col("version")).otherwise(F.lit("")),
    )

    alt = map_literal(ALTERNATE_PACKAGE_NAMES)
    fv = F.struct(
        F.col("pkg").alias("name"),
        F.col("namespace"),
        F.col("version"),
        F.lit(None).cast("string").alias("min_ver"),
    )
    alt_fv = F.struct(
        alt[F.col("pkg")].alias("name"),
        F.col("namespace"),
        F.col("version"),
        F.lit(None).cast("string").alias("min_ver"),
    )
    out = df.select(
        F.col("cve_id").alias("name"),
        F.col("namespace"),
        F.lit("").alias("severity"),  # photon.go:124
        F.struct(F.lit(None).cast("string").alias("vectors"), F.lit(None).cast("double").alias("score")).alias(
            "cvss_v2"
        ),
        F.struct(
            F.lit(None).cast("string").alias("vectors"), F.col("cve_score").alias("score")
        ).alias("cvss_v3"),
        F.when(alt[F.col("pkg")].isNotNull(), F.array(fv, alt_fv))
        .otherwise(F.array(fv))
        .alias("fixed_in"),
        F.array().cast("array<string>").alias("cpes"),
        F.lit("").alias("feed_rating"),
    )
    return finish_os_vulns(out)
