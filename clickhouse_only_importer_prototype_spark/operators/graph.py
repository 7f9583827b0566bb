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
    seeds: DataFrame | None = None,
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

    Scale: the (possibly expensive) upstream edge build materializes
    ONCE — arcs are persisted before the degree pass and are the ONLY
    |E|-scale frame that ever materializes. ``rank div outdeg`` is a
    per-NODE quantity, so each iteration computes it on the |V|-row
    vector (ranks ⋈ persisted deg — a node-scale join) and broadcasts
    the resulting (node, contrib) map into the cached 2-column arc
    list: zero arc shuffles, no |E|-row arcs+outdeg join or second
    |E|-scale cache (the previous shape paid both — at a 116M-arc
    100x stress graph that join alone dominated the 290s wall), then
    one map-side-combinable groupBy(dst). Billion-node graphs flip
    ``bcast_ranks`` off and get a src-co-partitioned shuffle join
    instead. Ranks are eagerly localCheckpointed each iteration so
    lineage (and lost-executor replay) stays O(1) in K.
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    arcs_c = arcs.persist()
    # |V|-row frame, consumed every iteration (contrib join) plus the
    # init select — persist so the |E|-scan groupBy runs once
    deg = (
        arcs_c.groupBy("src").agg(F.count("*").alias("outdeg")).persist()
    )
    n_nodes = deg.count()  # tiny driver scalar; materializes arcs_c
    # Personalized variant: teleport mass restricted to ``seeds``
    # (single column ``node``) — ranks measure proximity to the seed
    # set instead of global centrality. Seed sets are query-scale
    # (broadcast); the iteration adds one broadcast flag join, nothing
    # else changes shape.
    seed_flag = None
    if seeds is not None:
        # intersect with the graph's node set FIRST: seeds absent
        # from the graph can never receive their teleport share, so
        # counting them would silently drain rank mass (and a fully
        # disjoint seed set would yield all-zero ranks instead of an
        # error)
        seed_flag = (
            seeds.select("node").distinct()
            .join(
                deg.select(F.col("src").alias("node")), "node", "left_semi"
            )
            .withColumn("__seed", F.lit(1))
            .persist()
        )
        n_teleport = seed_flag.count()
        if n_teleport == 0:
            raise ValueError(
                "personalized PageRank needs >= 1 seed node present in "
                "the graph"
            )
    else:
        n_teleport = n_nodes
    base = ((100 - damping_pct) * PR_SCALE) // (100 * n_teleport)
    # the rank vector is |V| rows vs |E| arcs: broadcast it while it
    # fits (catalog-scale graphs; billions of nodes would flip this to
    # a src-co-partitioned shuffle join)
    bcast_ranks = n_nodes <= 5_000_000
    arcs_p = arcs_c if bcast_ranks else arcs_c.repartition("src").persist()
    r0 = PR_SCALE // n_teleport
    if seed_flag is None:
        ranks = deg.select(
            F.col("src").alias("node"),
            F.lit(r0).cast("long").alias("rank"),
        )
    else:
        ranks = (
            deg.select(F.col("src").alias("node"))
            .join(F.broadcast(seed_flag), "node", "left")
            .select(
                "node",
                F.when(F.col("__seed").isNotNull(), F.lit(r0))
                .otherwise(F.lit(0))
                .cast("long")
                .alias("rank"),
            )
        )
    for _ in range(iterations):
        # per-node contribution: rank div outdeg computed ONCE per
        # node on the |V|-row vector, never per arc
        per_node = ranks.join(
            F.broadcast(deg) if bcast_ranks else deg,
            ranks["node"] == deg["src"],
        ).select("node", F.expr("rank div outdeg").alias("contrib"))
        c = F.broadcast(per_node) if bcast_ranks else per_node
        contribs = arcs_p.join(c, arcs_p["src"] == c["node"]).select(
            F.col("dst").alias("node"), F.col("contrib")
        )
        damp = contribs.groupBy("node").agg(
            F.expr(f"div({damping_pct} * sum(contrib), 100)").alias("__damp")
        )
        if seed_flag is None:
            ranks = damp.select(
                "node",
                (F.lit(base) + F.col("__damp")).cast("long").alias("rank"),
            )
        else:
            ranks = damp.join(F.broadcast(seed_flag), "node", "left").select(
                "node",
                (
                    F.when(F.col("__seed").isNotNull(), F.lit(base))
                    .otherwise(F.lit(0))
                    + F.col("__damp")
                )
                .cast("long")
                .alias("rank"),
            )
        # eager: materialize the (tiny, |V|-row) rank vector now so the
        # lineage is O(1) per iteration and arcs_deg can be released
        # after the loop — the canonical iterative-algorithm shape
        ranks = ranks.localCheckpoint(eager=True)
    if arcs_p is not arcs_c:
        arcs_p.unpersist()
    deg.unpersist()
    arcs_c.unpersist()
    if seed_flag is not None:
        seed_flag.unpersist()
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


#: Broadcast the adjacency table while total entries (= edge count,
#: ~8B each) stay under ~160MB; beyond that fall back to shuffle joins.
_ADJ_BROADCAST_MAX_EDGES = 20_000_000


def triangle_stats(
    edges: DataFrame, broadcast_adjacency: bool | None = None
) -> DataFrame:
    """Triangle count + wedge count + global clustering coefficient
    (integer per-million) over oriented ``(a, b)`` edges (a < b,
    distinct — use ``oriented_edges``).

    Compact-adjacency intersection, not the two-path join: a naive
    (a,b)x(b,c) join materializes sum(fwd_deg²) rows THROUGH A SHUFFLE
    (~100M for a 1.2M-edge near-regular graph — measured 21s at sf0.1),
    while per-edge |adj_fwd[a] ∩ adj_fwd[b]| does the same work
    JVM-side inside one codegen stage. Forward adjacency (neighbors
    with higher id) makes every common element c satisfy a<b<c, so
    each triangle counts exactly once, and orientation still bounds
    list length by forward degree (the hub/skew guard).

    Scale: the adjacency table totals |E| entries — broadcast it and
    the count is ONE pass over edges, zero shuffles beyond the
    adjacency build. ``broadcast_adjacency=None`` (default) decides
    from the measured edge count (same measured-statistics philosophy
    as the dedup collapse gate; the count rides the persist the plan
    needs anyway); past ``_ADJ_BROADCAST_MAX_EDGES`` the two
    equi-joins shuffle E rows each — still E-row shuffles, never the
    sum(fwd_deg²) path blowup.

    Wedges (paths of length 2) count from undirected degree:
    sum(d*(d-1))/2; global clustering = 3*triangles/wedges.

    Returns one row: (n_edges, n_wedges, n_triangles, clustering_1e6).
    """
    e = edges.persist()
    n_edges = None
    if broadcast_adjacency is None:
        n_edges = e.count()
        broadcast_adjacency = n_edges <= _ADJ_BROADCAST_MAX_EDGES
    adj = e.groupBy("a").agg(F.collect_list("b").alias("nbrs"))
    if not broadcast_adjacency:
        # shuffle path: two consumers (adj_a, adj_b) on DIFFERENT join
        # keys — without a persist each branch re-runs the |E|-row
        # groupBy+collect_list (measured 27s/build on a 119.6M-edge
        # 100x graph). |V| rows of forward lists ≈ |E| longs total:
        # the natural checkpoint. On the broadcast path the rebuild is
        # a small cached-input job and the cache write of array rows
        # only adds GC pressure — measured net-negative there, so the
        # persist rides the same measured gate as the broadcast choice.
        # Lifetime: caller-owns-unpersist (returned frame is lazy) —
        # long-lived sessions clearCache() after their action
        adj = adj.persist()
    adj_a = adj.select(F.col("a"), F.col("nbrs").alias("__nbrs_a"))
    adj_b = adj.select(F.col("a").alias("b"), F.col("nbrs").alias("__nbrs_b"))
    tri_src = e
    if broadcast_adjacency:
        adj_a, adj_b = F.broadcast(adj_a), F.broadcast(adj_b)
        # The per-edge intersect is CPU-bound (~µs per adjacency
        # element) while its input rows are two longs: byte-based
        # partition sizing (AQE coalescing / the cached layout) gives
        # the stage a handful of tasks and leaves the cluster idle
        # (r11 profile: 11 tasks on 32 cores, ~45s of task CPU behind
        # a 5.7s-max straggler). Widen to the session's parallelism —
        # the broadcast gate already bounds |E| here (<= 20M edges,
        # ~320 MB), so the extra round-robin exchange is noise next to
        # the intersect work; the shuffle path keeps its own |E|-scale
        # partitioning untouched. Width-gated: only when the cached
        # layout is actually narrower than half the cores (the 10x
        # fixture caches ~25-33 partitions already — measured there
        # the unconditional exchange cost ~1s for nothing), and the
        # partition probe is metadata-only because n_edges' count()
        # just materialized the cache.
        cores = e.sparkSession.sparkContext.defaultParallelism
        if (
            n_edges is not None
            and n_edges >= 50_000
            and e.rdd.getNumPartitions() < max(2, cores // 2)
        ):
            tri_src = e.repartition(cores)
    tri = (
        tri_src.join(adj_a, "a")
        # inner join: an edge whose endpoint has no forward neighbors
        # can't close a triangle — dropping it equals intersecting
        # with an empty list
        .join(adj_b, "b")
        .select(
            F.size(F.array_intersect("__nbrs_a", "__nbrs_b")).alias("__t")
        )
        .agg(F.sum("__t").cast("long").alias("n_triangles"))
        .select(F.coalesce("n_triangles", F.lit(0)).alias("n_triangles"))
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
