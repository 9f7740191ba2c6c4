"""Distributed connected components over a near-duplicate pair graph.

Dedup operators (dedup.py, similarity.py) emit PAIRS; dropping duplicates
needs CLUSTERS — the transitive closure of the pair relation — so one
keeper survives per component, not per pair. (The reference stops at
pairwise similarity: raise_/PRD.md's dedup surface; clustering is one of
this engine's training-data additions, SURVEY.md §2.14.)

Algorithm: the alternating **large-star / small-star** contraction
(Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC '14) — the standard shared-nothing CC algorithm (also what
GraphFrames uses). Each half-round is one groupBy + one equi-join on the
node id (two hash shuffles); the edge set contracts toward a forest of
stars centered on each component's minimum id in O(log n) rounds. No
driver-side graph state: the only per-round driver work is the
convergence check (a count + an except), and lineage is truncated with
``localCheckpoint`` so plans stay flat across iterations.

Scale notes:
- Edge counts SHRINK monotonically toward one edge per non-root node, so
  later rounds are cheaper than earlier ones; AQE re-coalesces the
  shrinking shuffles.
- Both half-rounds shuffle on the same key (node id), so consecutive
  stages reuse the hash partitioning.
- Worst-case input for the df-capped pair generators is a clique of
  near-identical docs — that's |clique|² pairs BEFORE clustering; cluster
  on the banded/capped pair output, never on raw all-pairs.

The DuckDB oracle (``components_sql``) computes the same labels with a
recursive label-propagation CTE — fine at test scale, which is exactly
why the Spark side doesn't use that formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _half_round(edges: DataFrame, large: bool) -> DataFrame:
    """One large-star or small-star contraction.

    Input/output edges are oriented (u, v) with v < u except for the raw
    first input, which may be arbitrary. Output is deduplicated.
    """
    if large:
        sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = sym.groupBy("u").agg(F.min("v").alias("mn"))
        mins = mins.select("u", F.least("mn", F.col("u")).alias("m"))
        out = (
            sym.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
    else:
        oriented = edges.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        mins = oriented.groupBy("u").agg(F.min("v").alias("m"))
        out = (
            oriented.join(mins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(mins.select(F.col("u").alias("u"), F.col("m").alias("v")))
        )
    return out.where(F.col("u") != F.col("v")).distinct()


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 30,
) -> DataFrame:
    """Label every node of the undirected pair graph with the minimum node
    id of its connected component.

    Returns (node, cluster) for every node that appears in ``edges``
    (isolated docs never enter the pair graph and keep themselves — no row
    needed). ``cluster`` doubles as the keeper id: it IS the min doc id of
    the component.
    """
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    nodes = e.select("u").union(e.select("v")).distinct()
    e = e.localCheckpoint(eager=True)
    for _ in range(max_iter):
        e_next = _half_round(_half_round(e, large=True), large=False)
        e_next = e_next.localCheckpoint(eager=True)
        # converged when the oriented edge set is a fixed point
        if e_next.count() == e.count() and e_next.exceptAll(e).isEmpty():
            e = e_next
            break
        e = e_next
    else:
        raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")
    labels = e.groupBy("u").agg(F.min("v").alias("cluster"))
    return (
        nodes.join(labels, "u", "left")
        .select(
            F.col("u").alias("node"),
            F.coalesce("cluster", F.col("u")).alias("cluster"),
        )
    )


def components_sql(pairs_sql: str, src: str = "id_a", dst: str = "id_b") -> str:
    """DuckDB oracle: recursive min-label propagation over the same pairs.

    O(component² ) label rows before the final MIN — a test-scale oracle,
    not a production plan."""
    return (
        f"WITH RECURSIVE __pairs AS ({pairs_sql}), "
        f"__edges AS (SELECT {src} AS u, {dst} AS v FROM __pairs WHERE {src} <> {dst} "
        f"UNION SELECT {dst} AS u, {src} AS v FROM __pairs WHERE {src} <> {dst}), "
        f"__reach(node, lbl) AS ("
        f"SELECT u, u FROM (SELECT DISTINCT u FROM __edges) __n "
        f"UNION "
        f"SELECT e.v, r.lbl FROM __reach r JOIN __edges e ON e.u = r.node) "
        f"SELECT node, MIN(lbl) AS cluster FROM __reach GROUP BY node"
    )


def cluster_summary(labels: DataFrame) -> DataFrame:
    """(cluster, n_docs) for every multi-doc cluster — the anti-join side
    for "drop all but the keeper" is ``labels.where(node != cluster)``."""
    return (
        labels.groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .where(F.col("n_docs") > 1)
    )
