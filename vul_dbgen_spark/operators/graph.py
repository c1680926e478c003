"""Distributed connected components — the clustering step that turns
near-duplicate candidate PAIRS (MinHash-LSH, SimHash bands, embedding
buckets) into duplicate GROUPS so a pipeline can keep one canonical
document per group. The reference's dedup surfaces stop at keyed merges
(e.g. RHEL set-dedup, `updater/fetchers/rhel2/rhel.go`), which is
exact-key grouping; transitive near-dup clustering is the beyond-reference
LLM-pipeline completion of that family.

Algorithm: min-label propagation to a fixpoint. Every node starts
labeled with its own id; each round, every node takes the minimum label
among itself and its neighbors; converged when no label changes. The
result — every node labeled with the minimum node id of its component —
is algorithm-independent, so a SQL reachability oracle (recursive CTE)
can verify it exactly.

Scale shape (the 100 TB story):

- The symmetrized edge list is deduplicated and persisted ONCE; every
  round joins the (small, 2-column) label table against it on the same
  key, so the shuffle partitioning of `edges` is computed once and
  reused — AQE coalesces the tiny label side.
- Rounds needed = graph diameter. Near-dup graphs are unions of
  LSH-bucket cliques, so diameters are tiny (2-4); the generic
  worst case (long paths) is O(n) rounds, for which the literature's
  large-star/small-star alternation (Kiveris et al., "Connected
  Components in MapReduce and Beyond", SoCC'14) gets O(log n) — the
  round structure below is deliberately shaped so that swapping the
  message step for star-contraction is a local change.
- Each round ends in `localCheckpoint` (eager): without it the plan
  doubles per iteration and Catalyst analysis time, not the data,
  becomes the bottleneck by round ~15.
- Convergence is detected with a one-number aggregate (count of
  changed labels), not a collect of the labels.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    vertices: DataFrame | None = None,
    id_col: str = "id",
    max_iter: int = 30,
) -> DataFrame:
    """Label every vertex with the minimum vertex id reachable from it.

    ``edges`` is an undirected pair list (one row per pair, either
    orientation). ``vertices`` optionally supplies the full vertex set so
    isolated nodes appear as their own singleton components (a dedup
    pipeline wants every document labeled, not just the ones with a
    near-dup candidate).

    Returns (node, component) — component = min id in the node's
    connected component. Deterministic regardless of partitioning or
    iteration count, hence exactly oracle-checkable.
    """
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    if vertices is not None:
        lbl = vertices.select(F.col(id_col).alias("node")).distinct()
    else:
        lbl = e.select(F.col("u").alias("node")).distinct()
    lbl = lbl.select("node", F.col("node").alias("component")).localCheckpoint()

    for i in range(max_iter):
        # neighbor messages: component[u] offered to v across each edge
        msgs = e.join(lbl, e["u"] == lbl["node"]).select(
            F.col("v").alias("node"), F.col("component")
        )
        new_lbl = (
            lbl.unionByName(msgs)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .localCheckpoint()  # truncate lineage: plan size stays O(1) per round
        )
        # convergence probe = one small join + count. Round 0 always
        # changes labels on any graph with an edge, so skip the probe
        # there — one fewer scheduled action per call.
        if i > 0:
            changed = (
                new_lbl.alias("n")
                .join(lbl.alias("o"), "node")
                .filter(F.col("n.component") != F.col("o.component"))
                .count()
            )
            if changed == 0:
                lbl = new_lbl
                break
        lbl = new_lbl
    e.unpersist()
    return lbl


def component_summary(assignment: DataFrame, min_size: int = 2) -> DataFrame:
    """Collapse a (node, component) assignment to per-cluster stats,
    keeping only real duplicate groups (size >= min_size). One hash
    aggregation, map-side combinable."""
    return (
        assignment.groupBy("component")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.max("node").alias("max_doc"),
        )
        .filter(F.col("n_docs") >= min_size)
    )
