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

All JVM-side: levenshtein() is a built-in codegen expression; no
Python boundary anywhere.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def blocked_fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_cols: Sequence[str],
    max_dist: int,
) -> DataFrame:
    """Self-linkage: (id_a, id_b, dist) for every pair of rows sharing
    ALL ``block_cols`` values with levenshtein(text) <= max_dist,
    oriented id_a < id_b.

    Scale shape: equi-join on the block key — each block shuffles to
    one reducer and pairs only within itself, so cost is
    sum(block_size²)/2, controlled by block-key selectivity, with the
    id_a < id_b predicate halving it. AQE's skew-join splits an
    oversized block (a degenerate blocking key is data skew, not a
    plan change). An optional pre-check for 100 TB runs: audit block
    sizes first with join_skew_audit and tighten the key — blocking
    quality is a data-quality property, measured not assumed.

    Levenshtein early-exit: Spark's levenshtein(l, r, threshold) form
    returns -1 past the threshold and abandons the DP early — the
    band-limited O(max_dist·len) variant, not O(len²).
    """
    if not block_cols:
        raise ValueError("blocked_fuzzy_pairs requires at least one block col")
    left = df.select(
        F.col(id_col).alias("id_a"),
        F.col(text_col).alias("__ta"),
        *[F.col(c) for c in block_cols],
    )
    right = df.select(
        F.col(id_col).alias("id_b"),
        F.col(text_col).alias("__tb"),
        *[F.col(c) for c in block_cols],
    )
    dist = F.levenshtein(F.col("__ta"), F.col("__tb"), max_dist)
    return (
        left.join(right, list(block_cols))
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            dist.alias("dist"),
        )
        .where((F.col("dist") >= 0) & (F.col("dist") <= max_dist))
    )
