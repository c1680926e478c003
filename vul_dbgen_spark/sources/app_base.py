"""Shared helpers for app-vulnerability sources (``app_vulns`` schema)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import ranges
from ..schemas import APP_VULNS, VERSION_TERM
from .base import conform

TERMS_TYPE = T.ArrayType(VERSION_TERM)


def finish_app_vulns(df: DataFrame) -> DataFrame:
    return conform(df, APP_VULNS)


def _terms_to_rows(terms) -> list[dict]:
    return [t.as_dict() for t in terms] if terms else []


@F.pandas_udf(TERMS_TYPE)
def ghsa_version_terms(s: pd.Series) -> pd.Series:
    """GHSA range string column → term-struct array (ghsa.go:203-235),
    after the ``.jreNN`` cleanup (ghsa.go:27,77-79)."""
    import re

    jre = re.compile(r"\.jre\d+")

    def conv(v):
        if v is None:
            return []
        return _terms_to_rows(ranges.get_version(jre.sub("", v)))

    return s.map(conv)


_OSV_RANGES_IN = T.ArrayType(
    T.StructType(
        [
            T.StructField("type", T.StringType()),
            T.StructField(
                "events",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("introduced", T.StringType()),
                            T.StructField("fixed", T.StringType()),
                        ]
                    )
                ),
            ),
        ]
    )
)

OSV_RANGES_OUT = T.StructType(
    [
        T.StructField("affected_ver", TERMS_TYPE),
        T.StructField("fixed_ver", TERMS_TYPE),
    ]
)


@F.pandas_udf(OSV_RANGES_OUT)
def osv_range_terms(custom: pd.Series, semver: pd.Series) -> pd.DataFrame:
    """OSV (custom_ranges, ranges) columns → (affected_ver, fixed_ver)
    term arrays (govuln.go:226-328 via functions.ranges)."""

    def norm(rs):
        out = []
        for r in rs if rs is not None else []:
            events = [
                {"introduced": e["introduced"] or "", "fixed": e["fixed"] or ""}
                for e in (r["events"] if r["events"] is not None else [])
            ]
            out.append({"type": r["type"], "events": events})
        return out

    aff_col, fix_col = [], []
    for c, s in zip(custom, semver):
        aff, fix = ranges.osv_affected_ranges(norm(c), norm(s))
        aff_col.append(_terms_to_rows(aff))
        fix_col.append(_terms_to_rows(fix))
    return pd.DataFrame({"affected_ver": aff_col, "fixed_ver": fix_col})


def or_prefix_first(terms: Column) -> Column:
    """Prefix the first term's opcode with ``or`` (merge-append semantics,
    ghsa.go:178-180) — only call when the first opcode is non-empty."""
    first = F.try_element_at(terms, F.lit(1))
    rest = F.slice(terms, 2, F.greatest(F.size(terms) - 1, F.lit(0)))
    return F.concat(
        F.array(
            F.struct(
                F.concat(F.lit("or"), first["op_code"]).alias("op_code"),
                first["version"].alias("version"),
            )
        ),
        rest,
    )
