"""Distributed graph analytics in pure DataFrame algebra.

Two operator families the reference's analytic surface implies but no
prior module covered:

* ``pagerank_int`` — fixed-iteration PageRank in EXACT int64
  arithmetic, so a DuckDB oracle unrolled to the same K iterations is
  bit-identical (no float-summation-order drift across engines).
* ``triangle_stats`` — triangle count + global clustering coefficient
  over an undirected edge list, using the canonical a<b<c orientation
  so each triangle is generated exactly once and two-path expansion is
  bounded by forward-degree.

Scale shape (the part that matters at 100 TB):
  PageRank is the textbook join-agg loop — edges are partitioned ONCE
  by src and persisted; every iteration is one shuffle of the (tiny
  relative to edges) rank vector into the edge partitioning plus a
  map-side-combinable groupBy(dst). Ranks are localCheckpointed per
  iteration so the lineage (and the replay cost of a lost executor)
  stays O(1) in the iteration count, not O(K).
  Triangle counting never materializes two-paths for high-degree
  hubs in a skewed direction: orienting every edge low->high id makes
  each node's expansion quadratic in its FORWARD degree only, the
  standard bound that keeps celebrity nodes from exploding the join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

PR_SCALE = 1_000_000_000_000  # rank fixed-point: parts-per-1e12


def symmetrize(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Undirected edge list -> both directed arcs, distinct."""
    fwd = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    return fwd.unionByName(
        edges.select(F.col(dst).alias("src"), F.col(src).alias("dst"))
    ).distinct()


def pagerank_int(
    arcs: DataFrame,
    iterations: int = 3,
    damping_pct: int = 85,
) -> DataFrame:
    """Fixed-iteration PageRank over directed ``(src, dst)`` arcs in
    exact int64 fixed-point (PR_SCALE parts).

    r0(v)    = PR_SCALE div N
    r_{t+1}(v) = ((100-d)*PR_SCALE) div (100*N)
                 + (d * SUM_in(r_t(u) div outdeg(u))) div 100

    All divisions are integer (non-negative operands, so Spark ``div``
    == DuckDB ``//``): an oracle unrolled to the same K matches
    hash-exactly. Truncation dust (< N ulps of 1e-12 per iteration) is
    the price of cross-engine determinism.

    Nodes are whatever appears in ``arcs``; callers must ensure every
    node has outdeg >= 1 (symmetrize() guarantees it), otherwise
    dangling mass silently drains — same contract both engines.

    Scale: arcs are hash-partitioned by src once and persisted; each
    iteration shuffles only the rank vector (|V| rows) to the arc
    partitioning, then a map-side-combinable groupBy(dst). Ranks are
    localCheckpointed each iteration to truncate lineage.
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    deg = arcs.groupBy("src").agg(F.count("*").alias("outdeg"))
    arcs_deg = (
        arcs.join(deg, "src")
        .repartition("src")
        .persist()
    )
    n_nodes = deg.count()  # tiny driver scalar; also materializes arcs_deg's parent
    base = ((100 - damping_pct) * PR_SCALE) // (100 * n_nodes)
    ranks = deg.select(
        F.col("src").alias("node"),
        F.lit(PR_SCALE // n_nodes).cast("long").alias("rank"),
    )
    for _ in range(iterations):
        contribs = arcs_deg.join(
            ranks, arcs_deg["src"] == ranks["node"]
        ).select(
            F.col("dst").alias("node"),
            F.expr("rank div outdeg").alias("contrib"),
        )
        ranks = contribs.groupBy("node").agg(
            (
                F.lit(base)
                + F.expr(f"div({damping_pct} * sum(contrib), 100)")
            ).cast("long").alias("rank")
        )
        # eager: materialize the (tiny, |V|-row) rank vector now so the
        # lineage is O(1) per iteration and arcs_deg can be released
        # after the loop — the canonical iterative-algorithm shape
        ranks = ranks.localCheckpoint(eager=True)
    arcs_deg.unpersist()
    return ranks


def oriented_edges(edges: DataFrame, a: str = "a", b: str = "b") -> DataFrame:
    """Canonical low<high orientation, distinct — each undirected edge
    exactly once, self-loops dropped."""
    lo = F.least(F.col(a), F.col(b))
    hi = F.greatest(F.col(a), F.col(b))
    return (
        edges.where(F.col(a) != F.col(b))
        .select(lo.alias("a"), hi.alias("b"))
        .distinct()
    )


def triangle_stats(edges: DataFrame) -> DataFrame:
    """Triangle count + wedge count + global clustering coefficient
    (integer per-million) over oriented ``(a, b)`` edges (a < b,
    distinct — use ``oriented_edges``).

    Triangles via the two-path join: (a,b),(b,c) with a<b<c closed by
    (a,c). Orientation bounds each node's expansion by its forward
    degree — the standard skew guard (a hub's |in|x|out| cross product
    never materializes; only pairs of its HIGHER-id neighbors do).

    Wedges (paths of length 2) count from undirected degree:
    sum(d*(d-1))/2; global clustering = 3*triangles/wedges.

    Returns one row: (n_edges, n_wedges, n_triangles, clustering_1e6).
    """
    e = edges.persist()
    paths = (
        e.alias("e1")
        .join(e.alias("e2"), F.col("e1.b") == F.col("e2.a"))
        .select(
            F.col("e1.a").alias("a"),
            F.col("e1.b").alias("b"),
            F.col("e2.b").alias("c"),
        )
    )
    closing = e.select(F.col("a").alias("a"), F.col("b").alias("c"))
    tri = paths.join(closing, ["a", "c"]).agg(
        F.count("*").alias("n_triangles")
    )
    degrees = (
        e.select(F.col("a").alias("v"))
        .unionAll(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("d"))
    )
    base = degrees.agg(
        F.expr("div(sum(d * (d - 1)), 2)").alias("n_wedges"),
        F.expr("div(sum(d), 2)").alias("n_edges"),
    )
    out = base.crossJoin(tri).select(
        "n_edges",
        "n_wedges",
        "n_triangles",
        F.expr(
            "div(3 * n_triangles * 1000000, greatest(n_wedges, 1))"
        ).alias("clustering_1e6"),
    )
    return out
