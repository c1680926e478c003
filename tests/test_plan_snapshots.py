"""Physical-plan drift detection for every benched query.

tests/test_plans.py pins *targeted* properties (no cartesian outside the
allowlist, specific broadcasts). This harness complements it with a
*full* signature — counts of join strategies, shuffle exchanges,
aggregates, windows, top-k, and Python/Arrow surfaces in the initial
physical plan — so a Spark upgrade or an innocuous-looking edit that
flips a join strategy, adds a shuffle, or drops into a Python path gets
caught even where no targeted assertion exists.

Snapshots live in tests/plan_snapshots.json, captured at the test SF
(sf0.001 — join-strategy choices depend on file-size statistics, so the
snapshot SF and the comparison SF must match). Regenerate after an
INTENDED plan change with:

    python tests/test_plan_snapshots.py --regen

and review the JSON diff like any other code change: each +/- is a
physical-plan delta you are signing off on.
"""

from __future__ import annotations

import json
import os
import re
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SNAPSHOT_PATH = os.path.join(os.path.dirname(__file__), "plan_snapshots.json")
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

# operator → regex over the executedPlan string. Order-independent
# counts: enough to catch strategy flips and added shuffles, insensitive
# to expression ids and AQE annotation noise.
PATTERNS = {
    "broadcast_hash_join": r"\bBroadcastHashJoin\b",
    "sort_merge_join": r"\bSortMergeJoin\b",
    "shuffled_hash_join": r"\bShuffledHashJoin\b",
    "broadcast_nested_loop_join": r"\bBroadcastNestedLoopJoin\b",
    "cartesian_product": r"\bCartesianProduct\b",
    "shuffle_hash": r"Exchange hashpartitioning",
    "shuffle_range": r"Exchange rangepartitioning",
    "shuffle_single": r"Exchange SinglePartition",
    "broadcast_exchange": r"\bBroadcastExchange\b",
    "take_ordered_topk": r"\bTakeOrderedAndProject\b",
    "window": r"\bWindow\b",
    "hash_aggregate": r"\bHashAggregate\b",
    "object_hash_aggregate": r"\bObjectHashAggregate\b",
    "sort_aggregate": r"\bSortAggregate\b",
    "generate_explode": r"\bGenerate\b",
    "python_arrow": r"ArrowEvalPython|FlatMapGroupsInPandas|MapInPandas|AggregateInPandas",
}


def plan_signature(df) -> dict[str, int]:
    # NOTE: callers must capture from a cache-free session (clearCache
    # first). A persisted subtree materialized by an EARLIER test makes
    # the analyzer substitute an InMemoryRelation whose stored adaptive
    # plan prints both its Final and Initial sections — every node in
    # the cached subtree counts twice and the signature "drifts" on
    # test order alone (observed: tfidf's shared-TF persist).
    plan = df._jdf.queryExecution().executedPlan().toString()
    sig = {}
    for name, pat in PATTERNS.items():
        n = len(re.findall(pat, plan))
        if n:
            sig[name] = n
    return sig


# snapshot-pinned beyond the benched set: the composed reference
# pipeline (its bench row is a dedicated once-timed block, not
# spec.bench, but its physical composition — broadcasts between stages,
# no stray shuffles — must not drift silently either)
EXTRA_SNAPSHOT_NAMES = ["pipeline_e2e"]


def _bench_names():
    from vul_dbgen_spark.queries.catalog import REGISTRY

    return [n for n, s in REGISTRY.items() if s.bench] + EXTRA_SNAPSHOT_NAMES


def _load_snapshots() -> dict:
    with open(SNAPSHOT_PATH) as f:
        return json.load(f)


@pytest.mark.parametrize("name", _bench_names())
def test_benched_plan_signature_unchanged(spark, name):
    from vul_dbgen_spark.queries.catalog import REGISTRY

    snaps = _load_snapshots()
    assert name in snaps, f"{name}: benched but unsnapshotted — run --regen"
    # signature must be cache-state-independent: earlier tests in the
    # session may have materialized a persisted subtree this query
    # shares (see plan_signature note)
    spark.catalog.clearCache()
    got = plan_signature(REGISTRY[name].fn(spark, SF_DIR))
    assert got == snaps[name], (
        f"{name}: physical-plan signature drifted.\n"
        f"  snapshot: {snaps[name]}\n"
        f"  current:  {got}\n"
        f"If intended, regenerate: python tests/test_plan_snapshots.py --regen"
    )


def _regen() -> None:
    from vul_dbgen_spark.queries.catalog import REGISTRY
    from vul_dbgen_spark.session import get_spark

    spark = get_spark("plan_snapshots", cpus=8, shuffle_partitions=8)
    out = {}
    for name in _bench_names():
        spark.catalog.clearCache()
        out[name] = plan_signature(REGISTRY[name].fn(spark, SF_DIR))
        print(f"{name}: {out[name]}")
    with open(SNAPSHOT_PATH, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {len(out)} snapshots to {SNAPSHOT_PATH}")


if __name__ == "__main__":
    if "--regen" in sys.argv:
        _regen()
    else:
        print(__doc__)
