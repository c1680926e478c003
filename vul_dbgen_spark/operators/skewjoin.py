"""Skew-mitigation operators: salted join and two-phase aggregation.

AQE's skew-join rule (spark.sql.adaptive.skewJoin, on in session.py)
splits oversized sort-merge partitions automatically — that is the first
line of defense and needs no code. These operators are the explicit
fallback for the cases AQE cannot fix:

- a single pathological key whose *build* of downstream state (not just
  its shuffle block) overwhelms one task — salting spreads one key
  across ``n_salts`` tasks at the cost of replicating the small side
  ``n_salts``×;
- aggregation skew (one group receiving most rows), where no join is
  involved so AQE's skew rule never fires — the two-phase form computes
  partial aggregates on (key, salt) and combines per key.

Salts derive from a hash of caller-named spread columns, so plans stay
deterministic (no rand()), retries are idempotent, and both phases
stay in whole-stage codegen. Results are provably salt-invariant:
sum/count/min/max are associative-commutative, so the oracle is the
plain unsalted SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(spread_cols: list[str], n_salts: int) -> Column:
    return F.pmod(F.hash(*[F.col(c) for c in spread_cols]), F.lit(n_salts))


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    spread_cols: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed``'s hot keys are spread over ``n_salts``
    shuffle partitions; ``other`` is replicated once per salt.

    ``spread_cols`` name columns of the skewed side (ideally near-unique,
    e.g. the fact's primary key) whose hash distributes the hot key's
    rows across salts. The join result equals the unsalted join exactly —
    every skewed row still meets every matching ``other`` row, in
    exactly one salt bucket.
    """
    if how.replace("_", "").lower() in {"right", "rightouter", "full", "fullouter", "outer"}:
        # the replicated side's unmatched rows would surface once per
        # salt; flip the join around instead
        raise ValueError(f"salted_join cannot preserve {how!r} semantics on the replicated side")
    s = skewed.withColumn("__salt", _salt(spread_cols, n_salts))
    o = other.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return s.join(o, [on, "__salt"], how).drop("__salt")


def salted_groupby_agg(
    df: DataFrame,
    keys: list[str],
    spread_cols: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys.

    ``aggs`` maps output column -> (input column, fn) with fn in
    {sum, count, min, max}. Phase 1 aggregates per (keys, salt) — the hot
    key's rows split across ``n_salts`` partial groups that combine
    map-side; phase 2 merges the ≤ n_salts partials per key (count
    re-combines with sum). Equivalent to a plain groupBy because the
    supported fns are associative and commutative.
    """
    fns = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    partial = [fns[fn](col).alias(out) for out, (col, fn) in aggs.items()]
    merge = [
        (F.sum(out) if fn == "count" else fns[fn](out)).alias(out)
        for out, (_, fn) in aggs.items()
    ]
    return (
        df.withColumn("__salt", _salt(spread_cols, n_salts))
        .groupBy(*keys, "__salt")
        .agg(*partial)
        .groupBy(*keys)
        .agg(*merge)
    )
