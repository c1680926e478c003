#!/usr/bin/env python
"""Emit PLANS.md: the physical plan of every benched catalog query.

One section per benched entry: the stable plan signature (same counters
as tests/plan_snapshots.json) plus the full `explain formatted` node
tree — so a reviewer can read join strategies, exchange placement,
pushed filters, and WholeStageCodegen spans without running Spark.
Captured at sf0.001 (plan SHAPE is SF-independent for these queries;
AQE number-of-partitions annotations are stripped).

Usage: python tools/gen_plans_doc.py   (writes PLANS.md at the repo root)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    from test_plan_snapshots import plan_signature  # reuse the exact counters

    from vul_dbgen_spark.queries.catalog import REGISTRY
    from vul_dbgen_spark.session import get_spark

    spark = get_spark("gen_plans_doc", cpus=8, shuffle_partitions=8)
    out = [
        "# PLANS — physical plans of the benched catalog queries",
        "",
        f"Captured from `explain formatted` at `{SF_DIR}` "
        "(plan shape, join strategies and exchange placement are what "
        "matter; row-count annotations vary with SF). The `signature` "
        "line is the drift-pinned counter set from "
        "`tests/plan_snapshots.json`.",
        "",
    ]
    from test_plan_snapshots import EXTRA_SNAPSHOT_NAMES

    for name, spec in REGISTRY.items():
        if not spec.bench and name not in EXTRA_SNAPSHOT_NAMES:
            continue
        spark.catalog.clearCache()
        df = spec.fn(spark, SF_DIR)
        sig = plan_signature(df)
        formatted = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        # strip AQE/statistics noise that varies run to run
        formatted = re.sub(r"#\d+L?", "#x", formatted)
        formatted = "\n".join(
            ln for ln in formatted.splitlines() if not ln.strip().startswith("Arguments:")
        )
        out.append(f"## {name}")
        out.append("")
        out.append(f"signature: `{sig}`")
        out.append("")
        out.append("```")
        out.append(formatted.rstrip())
        out.append("```")
        out.append("")
        print(f"# {name}: ok", file=sys.stderr)

    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")
    with open(path, "w") as f:
        f.write("\n".join(out))
    print(f"wrote {path} ({len(out)} lines)")


if __name__ == "__main__":
    main()
