"""Ruby advisory DB source (SURVEY.md S17).

Behavioral spec: ``/root/reference/updater/fetchers/apps/ruby.go``.
One YAML file per advisory under ``gems/<gem>/*.yml``:

- only advisories with a ``cve`` key are kept (name = ``CVE-<cve>``,
  ruby.go:86,122-126);
- description = ``title + "/n" + description`` (the reference's literal
  ``"/n"`` typo is preserved, ruby.go:175);
- ``patched_versions`` → fixed terms; inverted (pessimistic-operator
  aware) → affected terms; ``unaffected_versions`` → unaffected terms
  (functions.ranges.ruby_ranges);
- advisories with neither patched nor unaffected versions are dropped
  (ruby.go:211-213).

Spark-first: wholetext read of the yml tree (distributed), YAML parse +
range conversion in one Arrow-batched pandas UDF (YAML has no JVM-side
codec in Spark).
"""

from __future__ import annotations

import glob
import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import register_app
from ..functions import ranges
from .app_base import TERMS_TYPE, finish_app_vulns
from .base import read_wholetext

_PARSED = T.StructType(
    [
        T.StructField("gem", T.StringType()),
        T.StructField("cve", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("cvss_v2", T.DoubleType()),
        T.StructField("cvss_v3", T.DoubleType()),
        T.StructField("affected_ver", TERMS_TYPE),
        T.StructField("fixed_ver", TERMS_TYPE),
        T.StructField("unaffected_ver", TERMS_TYPE),
        T.StructField("keep", T.BooleanType()),
    ]
)


@F.pandas_udf(_PARSED)
def _parse_yaml(texts: pd.Series) -> pd.DataFrame:
    import yaml

    out = []
    empty = {
        "gem": None,
        "cve": None,
        "title": None,
        "description": None,
        "url": None,
        "cvss_v2": None,
        "cvss_v3": None,
        "affected_ver": [],
        "fixed_ver": [],
        "unaffected_ver": [],
        "keep": False,
    }
    for text in texts:
        try:
            m = yaml.safe_load(text)
        except yaml.YAMLError:
            out.append(dict(empty))
            continue
        if not isinstance(m, dict):
            out.append(dict(empty))
            continue

        def s(k):
            v = m.get(k)
            return v if isinstance(v, str) else None

        def fl(k):
            v = m.get(k)
            return float(v) if isinstance(v, (int, float)) else None

        def sl(k):
            v = m.get(k)
            return [x for x in v if isinstance(x, str)] if isinstance(v, list) else []

        cve = s("cve")
        r = ranges.ruby_ranges(sl("patched_versions"), sl("unaffected_versions"))
        out.append(
            {
                "gem": s("gem"),
                "cve": ("CVE-" + cve) if cve else None,
                "title": s("title"),
                "description": s("description"),
                "url": s("url"),
                "cvss_v2": fl("cvss_v2"),
                "cvss_v3": fl("cvss_v3"),
                "affected_ver": [t.as_dict() for t in r[0]] if r else [],
                "fixed_ver": [t.as_dict() for t in r[1]] if r else [],
                "unaffected_ver": [t.as_dict() for t in r[2]] if r else [],
                "keep": bool(cve) and r is not None,
            }
        )
    return pd.DataFrame(out)


@register_app("ruby")
def load(spark: SparkSession, source_root: str) -> DataFrame:
    pattern = os.path.join(source_root, "ruby-advisory-db", "gems", "*", "*.yml")
    if not glob.glob(pattern):
        raise FileNotFoundError(f"no ruby advisories under {pattern}")
    raw = read_wholetext(spark, pattern)
    parsed = raw.select(_parse_yaml("value").alias("p")).select("p.*").filter(F.col("keep"))
    rows = parsed.select(
        F.col("cve").alias("vul_name"),
        F.lit("ruby").alias("app_name"),
        F.concat(F.lit("ruby:"), F.col("gem")).alias("module_name"),
        # literal "/n" preserved from ruby.go:175
        F.concat_ws("", F.col("title"), F.lit("/n"), F.col("description")).alias("description"),
        F.col("url").alias("link"),
        F.coalesce("cvss_v2", F.lit(0.0)).alias("score"),
        F.coalesce("cvss_v3", F.lit(0.0)).alias("score_v3"),
        "affected_ver",
        "fixed_ver",
        "unaffected_ver",
        F.array(F.col("cve")).alias("cves"),
    )
    return finish_app_vulns(rows)
