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
        r0       = scale div n          (scale auto-widens, see below)
        jump     = (15 · r0) div 100
        contrib  = Σ_{u→v} (r_u div deg_u)
        r'_v     = jump + (85 · contrib) div 100

    Nodes without in-edges keep jump as their whole rank (contrib = 0,
    via left join).  ``n`` is the distinct node count — a bounded scalar,
    the only driver-side value.

    Fixed-point width: at SCALE=10⁶ a graph with more than 10⁶ nodes
    would start at r0 = 0 and silently stay all-zero, so the unit scale
    widens to keep r0 ≥ 10⁶ per node (total mass n·r0 ≤ ~n·2·10⁶ — far
    inside int64 up to ~10¹² nodes).  Callers needing cross-engine
    hash-equality must use the same scale on the oracle side; the driver
    query pins n ≪ 10⁶ so the default SCALE is in force there.

    The edge list, node set, and degree table are eagerly checkpointed
    ONCE — each iteration re-reads them from block storage instead of
    re-deriving the distinct/aggregate from the raw edges every round.
    """
    if not iters or iters < 1:
        raise ValueError("iters must be >= 1")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).localCheckpoint(
        eager=True
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).localCheckpoint(
        eager=True
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0).cast("long"))
    # default SCALE until it would underflow (n > SCALE nodes), then widen
    # so r0 = scale // n stays >= SCALE instead of collapsing to 0
    scale = SCALE if n <= SCALE else n * SCALE
    r0 = scale // n
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
    POINTER DOUBLING with a jump table: round k holds ``far`` = the pairs
    at distance exactly 2^k; the closure (distances 1..2^k) extends by
    ``closure ⋈ far`` to reach 1..2^(k+1).  ⌈log₂ depth⌉ join rounds
    instead of depth-many sequential joins — 6 shuffles for a 64-deep
    tree — and, because each node has at most ONE ancestor at a given
    distance in a forest, every new pair is generated exactly once: no
    duplicate blowup and no distinct() needed (the closure⋈closure
    variant regenerates each pair once per split point — O(depth²)
    pre-distinct volume).  Rounds stop early once ``far`` empties (the
    deepest chain is exhausted), so a shallow tree costs ⌈log₂ its own
    depth⌉ rounds regardless of ``max_depth``.

    Roots are rows whose parent is NULL or equals the node itself.
    Output: one row per (node, ancestor) proper pair — the node itself is
    NOT its own ancestor.  Closure size is nodes × avg-depth; every join
    is an int-pair hash join checkpointed per round
    (connected_components rationale above).
    """
    base = (
        nodes.select(
            F.col(id_col).alias("node"), F.col(parent_col).alias("anc")
        )
        .where(F.col("anc").isNotNull() & (F.col("anc") != F.col("node")))
        .localCheckpoint(eager=True)
    )
    closure = base  # distances 1..2^k
    far = base      # distance exactly 2^k
    rounds = max(1, (max_depth - 1).bit_length())

    def _renamed(df):
        # fresh attribute ids for the build side of a self-join (alias-
        # qualified self-joins on a checkpointed plan trip attribute
        # resolution under AQE)
        return df.select(F.col("node").alias("_bn"), F.col("anc").alias("_ba"))

    for _ in range(rounds):
        ext = (
            closure.join(_renamed(far), F.col("anc") == F.col("_bn"))
            .select("node", F.col("_ba").alias("anc"))
            .localCheckpoint(eager=True)
        )
        if ext.isEmpty():
            break
        closure = closure.unionByName(ext).localCheckpoint(eager=True)
        far = (
            far.join(_renamed(far), F.col("anc") == F.col("_bn"))
            .select("node", F.col("_ba").alias("anc"))
            .localCheckpoint(eager=True)
        )
    return closure


def subtree_rollup(
    nodes: DataFrame,
    values: DataFrame,
    *,
    id_col: str = "node",
    parent_col: str = "parent",
    value_col: str = "val",
) -> DataFrame:
    """Hierarchy aggregate: for EVERY node, the DECIMAL-exact sum and
    count over its proper descendants' values plus its own — the org-chart
    / bill-of-materials rollup.  One closure build + one join + one
    aggregate; no per-level loop over the data.

    Nodes whose subtree holds no value rows still appear, with
    subtree_total 0.0 / subtree_n 0 (left join + coalesce) — dropping
    them would silently desync any caller re-joining on the node table."""
    closure = ancestor_closure(nodes, id_col=id_col, parent_col=parent_col)
    v = values.select(F.col(id_col).alias("vnode"), F.col(value_col).alias("_v"))
    contributions = closure.select(
        F.col("anc").alias("node"), F.col("node").alias("src")
    ).unionByName(
        nodes.select(F.col(id_col).alias("node"), F.col(id_col).alias("src"))
    )
    return (
        contributions.join(v, contributions.src == v.vnode, "left")
        .select(contributions.node.alias("roll_node"), "_v")
        .groupBy("roll_node")
        .agg(
            F.coalesce(
                F.sum(F.col("_v").cast("decimal(18,2)")).cast("double"), F.lit(0.0)
            ).alias("subtree_total"),
            F.count(F.col("_v")).alias("subtree_n"),
        )
        .select(F.col("roll_node").alias("node"), "subtree_total", "subtree_n")
    )


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle counts via degree-ordered edge orientation.

    ``edges`` is an undirected edge list (u, v), u != v, each edge listed
    once in either direction.  The naive triangle join (edges³) explodes on
    skew: a hub of degree d sits on O(d²) wedges.  The classic fix
    (node-iterator++ / Schank-Wagner) orients every edge from the
    lower-(degree, id) endpoint to the higher one — so every node's
    OUT-degree is bounded by ~sqrt(2m) on any graph — then counts, for each
    oriented wedge (u→v, u→w), whether the closing oriented edge (v→w)
    exists.  Each triangle is counted exactly once.

    Plan: two shuffles to attach degrees, one self-join of the oriented
    edge list on its source (wedge generation — bounded by the oriented
    out-degree, NOT the raw degree), one join against oriented edges to
    close the wedge, then explode each found triangle to its three corners
    for the per-node rollup.  All joins are equi-joins on node ids.

    Returns (node, n_triangles) for nodes in >=1 triangle, ordered.
    """
    # Canonicalize: undirected edge set, dedup both directions.  Materialize
    # it once — the plan below references it five times (degree count,
    # orientation, both wedge sides, closing edges), and without the
    # checkpoint each reference would re-execute the caller's whole
    # edge-derivation subtree (same fix as connected_components).
    e = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    both = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    deg = both.groupBy("a").agg(F.count(F.lit(1)).alias("deg")).withColumnRenamed("a", "n")

    # Orient each edge toward the higher (degree, id) endpoint.
    da = deg.select(F.col("n").alias("a"), F.col("deg").alias("dega"))
    db = deg.select(F.col("n").alias("b"), F.col("deg").alias("degb"))
    oriented = (
        e.join(da, "a")
        .join(db, "b")
        .select(
            F.when(
                (F.col("dega") < F.col("degb"))
                | ((F.col("dega") == F.col("degb")) & (F.col("a") < F.col("b"))),
                F.struct(F.col("a").alias("u"), F.col("b").alias("v")),
            )
            .otherwise(F.struct(F.col("b").alias("u"), F.col("a").alias("v")))
            .alias("edge")
        )
        .select("edge.u", "edge.v")
    )

    # Wedges from each node's oriented out-neighborhood, one per unordered
    # {x, y} via the id filter.  The closing oriented edge between x and y
    # may point either way relative to id order, so canonicalize closing
    # edges back to (min_id, max_id) before the equi-join.
    w1 = oriented.select(F.col("u"), F.col("v").alias("x"))
    w2 = oriented.select(F.col("u"), F.col("v").alias("y"))
    wedges = w1.join(w2, "u").where(F.col("x") < F.col("y"))
    closing = oriented.select(
        F.least("u", "v").alias("x"), F.greatest("u", "v").alias("y")
    )
    triangles = wedges.join(closing, ["x", "y"])

    corners = triangles.select(
        F.explode(F.array("u", "x", "y")).alias("node")
    )
    return (
        corners.groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
        .orderBy("node")
    )
