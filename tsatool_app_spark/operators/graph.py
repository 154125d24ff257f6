"""Iterative graph algorithms as DataFrame loops.

`functions/dedup.connected_components` covers label propagation; this
module adds weighted iteration — PageRank — in FIXED-POINT integer
arithmetic, which is what makes a cross-engine oracle possible at all:
float PageRank sums contributions in nondeterministic order, so two
engines disagree in the low bits after one iteration, while int64
micro-units (rank ⋅ 10⁶) make every step — integer division by degree,
damping as (85·x) div 100, the contribution SUM — order-independent and
exactly reproducible (the DuckDB oracle unrolls the same iterations as a
CTE chain).

Scale shape per iteration: one hash-join of edges⋈ranks on src (edges
pre-partitioned by src would make this shuffle-free on a cluster), one
groupBy(dst) aggregate with map-side partial sums.  Ranks are
localCheckpoint-ed per iteration to truncate the iterative lineage (same
reason as connected_components / runner.py).  Driver holds only the node
COUNT, never the node set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000


def pagerank_fixed_point(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
) -> DataFrame:
    """PageRank with damping 0.85 in int64 micro-units over a directed
    edge list (pass both directions for an undirected graph).

    Exact recurrence (all ops int64, engine-portable):
        r0       = SCALE div n
        jump     = (15 · r0) div 100
        contrib  = Σ_{u→v} (r_u div deg_u)
        r'_v     = jump + (85 · contrib) div 100

    Nodes without in-edges keep jump as their whole rank (contrib = 0,
    via left join).  ``n`` is the distinct node count — a bounded scalar,
    the only driver-side value.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = e.select(F.col("src").alias("node")).unionByName(
        e.select(F.col("dst").alias("node"))
    ).distinct()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    n = nodes.count()
    r0 = SCALE // n
    jump = (15 * r0) // 100

    ranks = nodes.withColumn("rank", F.lit(r0).cast("long"))
    for _ in range(iters):
        contrib = (
            e.join(ranks, e.src == ranks.node)
            .join(deg, "src")
            .select("dst", F.expr("rank div deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        ranks = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .select(
                "node",
                (
                    F.lit(jump)
                    + F.expr("85 * coalesce(contrib, 0L) div 100")
                ).cast("long").alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks


def ancestor_closure(
    nodes: DataFrame,
    *,
    id_col: str = "node",
    parent_col: str = "parent",
    max_depth: int = 64,
) -> DataFrame:
    """Transitive (node, ancestor) closure of a parent-pointer forest by
    POINTER DOUBLING: round k joins the closure to itself, so reachable
    depth doubles every round — ⌈log₂ depth⌉ self-joins instead of the
    depth-many sequential joins a naive climb (or a recursive CTE) costs.
    For a 64-deep hierarchy that is 6 shuffles, not 64.

    Roots are rows whose parent is NULL or equals the node itself.
    Output: one row per (node, ancestor) proper pair — the node itself is
    NOT its own ancestor.  Closure size is nodes × avg-depth; for org/BOM
    trees (depth ≤ 20) that is a small multiple of the input, and every
    join is an int-pair hash join checkpointed per round
    (connected_components rationale above).
    """
    base = (
        nodes.select(
            F.col(id_col).alias("node"), F.col(parent_col).alias("anc")
        )
        .where(F.col("anc").isNotNull() & (F.col("anc") != F.col("node")))
        .localCheckpoint(eager=False)
    )
    closure = base
    rounds = max(1, (max_depth - 1).bit_length())
    for _ in range(rounds):
        # extend every known pair by every known ancestry of its endpoint
        step = (
            closure.alias("a")
            .join(
                closure.alias("b"),
                F.col("a.anc") == F.col("b.node"),
            )
            .select(F.col("a.node").alias("node"), F.col("b.anc").alias("anc"))
        )
        new_closure = closure.unionByName(step).distinct().localCheckpoint(
            eager=False
        )
        closure = new_closure
    return closure


def subtree_rollup(
    nodes: DataFrame,
    values: DataFrame,
    *,
    id_col: str = "node",
    parent_col: str = "parent",
    value_col: str = "val",
) -> DataFrame:
    """Hierarchy aggregate: for every node, the DECIMAL-exact sum and
    count over its proper descendants' values plus its own — the org-chart
    / bill-of-materials rollup.  One closure build + one join + one
    aggregate; no per-level loop over the data."""
    closure = ancestor_closure(nodes, id_col=id_col, parent_col=parent_col)
    v = values.select(F.col(id_col).alias("node"), F.col(value_col).alias("_v"))
    contributions = closure.select(
        F.col("anc").alias("node"), F.col("node").alias("src")
    ).unionByName(
        nodes.select(F.col(id_col).alias("node"), F.col(id_col).alias("src"))
    )
    return (
        contributions.join(v, contributions.src == v.node)
        .select(contributions.node.alias("roll_node"), "_v")
        .groupBy("roll_node")
        .agg(
            F.sum(F.col("_v").cast("decimal(18,2)")).cast("double").alias(
                "subtree_total"
            ),
            F.count(F.lit(1)).alias("subtree_n"),
        )
        .select(F.col("roll_node").alias("node"), "subtree_total", "subtree_n")
    )
