"""A1: per-source namespacing regroup.

Behavioral spec: ``doVulnerabilitiesNamespacing``
(``/root/reference/updater/updater.go:642-671``): explode ``fixed_in``,
re-key each feature version by ``(feature.namespace, vuln.name)``, and
regroup the features per key. Scalars come from the first row that
created the key (the reference copies the whole vuln then only appends
features); FixedIn order is append order.

Determinism (SURVEY.md §4.3): the reference's row order is Go map
iteration — we carry an explicit ``row_order`` (monotonic id, stable for
a given input layout) so scalars and FixedIn order are reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import OS_VULNS

_SCALARS = [f.name for f in OS_VULNS.fields if f.name not in ("name", "namespace", "fixed_in")]


def do_vulnerabilities_namespacing(df: DataFrame) -> DataFrame:
    """os_vulns rows (any namespace layout) → one row per
    (feature-namespace, name) with that namespace's features."""
    rows = df.withColumn("row_order", F.monotonically_increasing_id()).select(
        "name", *_SCALARS, "row_order", F.posexplode("fixed_in").alias("fv_pos", "fv")
    )
    grouped = (
        rows.groupBy(F.col("fv.namespace").alias("namespace"), "name")
        .agg(
            F.flatten(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("row_order").alias("o"),
                            F.col("fv_pos").alias("p"),
                            F.array("fv").alias("t"),
                        )
                    )
                )["t"]
            ).alias("fixed_in"),
            *[F.min_by(c, "row_order").alias(c) for c in _SCALARS],
        )
    )
    return grouped.select(*[f.name for f in OS_VULNS.fields])
