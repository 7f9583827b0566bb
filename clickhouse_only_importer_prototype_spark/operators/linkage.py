"""Record linkage: blocked fuzzy (edit-distance) matching.

The reference has no string-similarity matching (its joins are exact
metadata pairing, SURVEY §2.5); entity resolution over dirty catalog
data is a standard analytics ask, and the naive formulation — an
all-pairs levenshtein cross join — is the canonical scale killer
(n²/2 distance evaluations). The industry-standard fix is BLOCKING:
only rows sharing a cheap deterministic key (brand, size band,
phonetic code, first-k chars...) are candidate pairs, turning the
cross join into an equi-join whose fan-out is the block-size
histogram, not n².

Duplicate-heavy catalogs (the replicated-listing norm) get the same
representative-collapse treatment as operators/dedup: distance is a
pure function of the two texts, so levenshtein runs once per distinct
(block, text) pair and results expand back through the group mapping
— identical members pair at distance 0, cross-group members inherit
their reps' distance. Gated on a measured dup-ratio probe, exactly
the operators/dedup._has_exact_dups philosophy.

All JVM-side: levenshtein() is a built-in codegen expression; no
Python boundary anywhere.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

# shared break-even: the collapse groupBy + expansion joins only pay
# off once a meaningful fraction of (block, text) rows are duplicates
# — one constant so retuning the dedup family retunes linkage with it
from clickhouse_only_importer_prototype_spark.operators.dedup import (
    _COLLAPSE_MIN_DUP_FRAC,
)


def _keyed(
    df: DataFrame, id_col: str, text_col: str, block_cols: list[str]
) -> DataFrame:
    """Normalized (__id, __t, blocks...) projection both entry points
    share."""
    return df.select(
        F.col(id_col).alias("__id"),
        F.col(text_col).alias("__t"),
        *[F.col(c) for c in block_cols],
    )


def _rep_groups(
    keyed: DataFrame, block_cols: list[str]
) -> tuple[DataFrame, DataFrame]:
    """(groups, reps): the member->rep mapping and the one-row-per-
    distinct-(block, text) representative frame, rep = group min id —
    the collapse structure pairs and clusters both build on."""
    mins = keyed.groupBy(*block_cols, "__t").agg(F.min("__id").alias("__rep"))
    groups = keyed.join(mins, block_cols + ["__t"]).select("__id", "__rep")
    reps = mins.select(
        F.col("__rep").alias("__id"), F.col("__t"), *block_cols
    )
    return groups, reps


def _plain_pairs(
    keyed: DataFrame, block_cols: list[str], max_dist: int
) -> DataFrame:
    """(id_a, id_b, dist) within blocks, id_a < id_b — direct path."""
    left = keyed.select(
        F.col("__id").alias("id_a"),
        F.col("__t").alias("__ta"),
        *block_cols,
    )
    right = keyed.select(
        F.col("__id").alias("id_b"),
        F.col("__t").alias("__tb"),
        *block_cols,
    )
    dist = F.levenshtein(F.col("__ta"), F.col("__tb"), max_dist)
    return (
        left.join(right, block_cols)
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", dist.alias("dist"))
        .where((F.col("dist") >= 0) & (F.col("dist") <= max_dist))
    )


def blocked_fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_cols: Sequence[str],
    max_dist: int,
    collapse: bool | None = None,
) -> DataFrame:
    """Self-linkage: (id_a, id_b, dist) for every pair of rows sharing
    ALL ``block_cols`` values with levenshtein(text) <= max_dist,
    oriented id_a < id_b.

    Scale shape: equi-join on the block key — each block shuffles to
    one reducer and pairs only within itself, so cost is
    sum(block_size²)/2, controlled by block-key selectivity, with the
    id_a < id_b predicate halving it. AQE's skew-join splits an
    oversized block (a degenerate blocking key is data skew, not a
    plan change). Audit block sizes first with join_skew_audit and
    tighten the key if needed — blocking quality is a data-quality
    property, measured not assumed.

    Duplicate texts: with ``collapse=None`` (default) a one-aggregate
    probe measures the (block, text) dup ratio; past 5% the distance
    join runs on DISTINCT (block, text) representatives only and pairs
    expand back to members — within-group member pairs at distance 0,
    cross-group pairs inheriting their reps' distance. Output is
    IDENTICAL either way (distance is a pure text function; identical
    texts are distance 0 <= max_dist); only the levenshtein count
    changes: a catalog with 10 copies per listing does ~1% of the DP
    work collapsed. The expansion join's output is the result set
    itself — that part no trick can shrink.

    Levenshtein early-exit: Spark's levenshtein(l, r, threshold) form
    returns -1 past the threshold and abandons the DP early — the
    band-limited O(max_dist·len) variant, not O(len²).
    """
    if not block_cols:
        raise ValueError("blocked_fuzzy_pairs requires at least one block col")
    block_cols = list(block_cols)
    keyed = _keyed(df, id_col, text_col, block_cols)
    if collapse is None:
        r = keyed.agg(
            F.count(F.lit(1)).alias("n"),
            F.approx_count_distinct(
                F.xxhash64(*block_cols, "__t"), rsd=0.02
            ).alias("d"),
        ).first()
        n, d = (r["n"] or 0), (r["d"] or 0)
        collapse = n > 0 and (n - d) >= _COLLAPSE_MIN_DUP_FRAC * n
    if not collapse:
        return _plain_pairs(keyed, block_cols, max_dist)

    groups, reps = _rep_groups(keyed, block_cols)
    rep_pairs = _plain_pairs(reps, block_cols, max_dist)

    ga = groups.select(F.col("__rep").alias("id_a"), F.col("__id").alias("__ma"))
    gb = groups.select(F.col("__rep").alias("id_b"), F.col("__id").alias("__mb"))
    cross = (
        rep_pairs.join(ga, "id_a")
        .join(gb, "id_b")
        .select(
            F.least("__ma", "__mb").alias("id_a"),
            F.greatest("__ma", "__mb").alias("id_b"),
            "dist",
        )
    )
    # Within-group pairs by collect + double explode, NOT a self-join
    # on __rep: the join's OUTPUT fans out C(group,2)-fold while its
    # INPUT stays slim, so AQE (which sizes partitions by input bytes)
    # coalesces it onto a handful of tasks — measured at the 100x
    # stress gate as one straggler task emitting ~945M pairs (191k
    # names x C(100,2)). Exploding from a sorted member list does the
    # same fan-out inside the projection — no shuffle ever carries the
    # fanned rows — and the explicit repartition (user-specified, so
    # AQE leaves it alone) spreads the generators. Per-row memory is
    # O(group size), not O(group size²): the outer posexplode emits
    # one member per row, the inner explode slices only that member's
    # tail.
    n_fan = int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    ) * 4
    members = (
        groups.groupBy("__rep")
        .agg(F.sort_array(F.collect_list("__id")).alias("__ms"))
        .repartition(n_fan)
    )
    within = (
        members.select(
            F.col("__ms"), F.posexplode("__ms").alias("__i", "__ma")
        )
        .select(
            F.col("__ma").alias("id_a"),
            F.explode(
                F.slice(F.col("__ms"), F.col("__i") + F.lit(2), F.size("__ms"))
            ).alias("id_b"),
            # levenshtein() is IntegerType; matching it directly avoids
            # an analysis pass just to read cross's schema
            F.lit(0).cast("int").alias("dist"),
        )
    )
    return cross.unionByName(within)


def blocked_fuzzy_clusters(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_cols: Sequence[str],
    max_dist: int,
    driver_cc_max_edges: int | None = None,
) -> DataFrame:
    """Entity resolution end game: (id, cluster_id) connected
    components over the blocked fuzzy pair graph, computed on the
    REPRESENTATIVE graph — the same architecture as
    operators/dedup.minhash_dedup_clusters.

    Components run over one edge per distinct-(block, text) pair, and
    members inherit their rep's component afterwards — never over the
    expanded member graph, which is quadratic in copies (a replicated
    catalog with 10 copies per listing has 100x the member edges but
    the SAME rep graph). cluster_id = min member id holds because each
    rep is its group's min and the rep component label is the min rep.

    Output equals neardup_clusters(blocked_fuzzy_pairs(df)) exactly:
    ids in no pair (unique text, no fuzzy match in its block) are
    absent; a multi-member exact-dup group clusters even without a
    cross-text match (its members pair at distance 0).
    """
    from clickhouse_only_importer_prototype_spark.operators.dedup import (
        neardup_clusters,
    )

    if not block_cols:
        raise ValueError("blocked_fuzzy_clusters requires a block col")
    block_cols = list(block_cols)
    groups, reps = _rep_groups(
        _keyed(df, id_col, text_col, block_cols), block_cols
    )
    rep_pairs = _plain_pairs(reps, block_cols, max_dist).select(
        F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b")
    )
    cc_kwargs = (
        {} if driver_cc_max_edges is None
        else {"driver_cc_max_edges": driver_cc_max_edges}
    )
    rep_labels = neardup_clusters(rep_pairs, **cc_kwargs).withColumnRenamed(
        "doc_id", "__rep"
    )
    sizes = groups.groupBy("__rep").agg(F.count("*").alias("__gsize"))
    return (
        groups.join(sizes, "__rep")
        .join(rep_labels, "__rep", "left")
        .where((F.col("__gsize") >= 2) | F.col("cluster_id").isNotNull())
        .select(
            F.col("__id").alias("doc_id"),
            F.coalesce(F.col("cluster_id"), F.col("__rep")).alias("cluster_id"),
        )
    )
