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

# Round 9: this regroup runs once per distro source (12× per composed
# build) and its F.*-chain construction cost ~300 py4j round trips per
# call. The expression set is FROZEN (pure function of the canonical
# schema), so the Columns are built once per process from SQL strings
# (one parse RPC each) and reused — an unresolved Column is
# plan-independent, the same reuse contract as F.col (the
# similarity-module _cached_expr pattern). Parsed trees are identical
# to the old builder chain; results byte-identical (golden sink tests).
_COLS: dict[str, object] = {}


def _cols():
    if not _COLS:
        _COLS["group_ns"] = F.expr("fv.namespace AS namespace")
        _COLS["fixed_in"] = F.expr(
            "flatten(array_sort(collect_list(struct("
            "row_order AS o, fv_pos AS p, array(fv) AS t))).t) AS fixed_in"
        )
        _COLS["scalars"] = [
            F.expr(f"min_by({c}, row_order) AS {c}") for c in _SCALARS
        ]
    return _COLS


def do_vulnerabilities_namespacing(df: DataFrame) -> DataFrame:
    """os_vulns rows (any namespace layout) → one row per
    (feature-namespace, name) with that namespace's features."""
    rows = df.selectExpr(
        "name",
        *_SCALARS,
        "monotonically_increasing_id() AS row_order",
        "posexplode(fixed_in) AS (fv_pos, fv)",
    )
    c = _cols()
    grouped = rows.groupBy(c["group_ns"], F.col("name")).agg(
        c["fixed_in"], *c["scalars"]
    )
    return grouped.select(*[f.name for f in OS_VULNS.fields])
