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
