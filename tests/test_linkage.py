"""Blocked fuzzy-pair linkage: blocking semantics + distance filter."""

from __future__ import annotations

import pytest

from clickhouse_only_importer_prototype_spark.operators.linkage import (
    blocked_fuzzy_pairs,
)


def test_blocked_fuzzy_pairs_respects_blocks_and_threshold(spark):
    rows = [
        (1, "red widget", "A"),
        (2, "red wagget", "A"),   # dist 1, same block
        (3, "red widget", "B"),   # identical text, DIFFERENT block
        (4, "blue cable", "A"),   # same block, far away
        (5, "red widgets", "A"),  # dist 1 to id 1
    ]
    df = spark.createDataFrame(rows, "id long, name string, blk string")
    out = {
        (r.id_a, r.id_b): r.dist
        for r in blocked_fuzzy_pairs(df, "id", "name", ["blk"], 2).collect()
    }
    # cross-block identical pair (1,3) must NOT appear: blocking is a
    # deliberate recall/cost trade, pinned here as a semantic contract
    assert (1, 3) not in out
    assert out[(1, 2)] == 2 and out[(1, 5)] == 1
    assert (1, 4) not in out  # beyond max_dist
    assert all(a < b for a, b in out)


def test_blocked_fuzzy_pairs_requires_block_cols(spark):
    df = spark.createDataFrame([(1, "x")], "id long, name string")
    with pytest.raises(ValueError):
        blocked_fuzzy_pairs(df, "id", "name", [], 2)


def test_collapse_paths_identical_on_dup_catalog(spark):
    rows = []
    # 6 copies each of two near-miss names + 3 copies of a far one,
    # all in one block -> dup ratio far past the probe threshold
    for i in range(6):
        rows.append((i, "red widget", "A"))
        rows.append((10 + i, "red widgex", "A"))
    for i in range(3):
        rows.append((20 + i, "blue cable", "A"))
    rows.append((30, "red widget", "B"))  # other block: isolated
    df = spark.createDataFrame(rows, "id long, name string, blk string")

    def pairset(d):
        return {(r.id_a, r.id_b, r.dist) for r in d.collect()}

    auto = pairset(blocked_fuzzy_pairs(df, "id", "name", ["blk"], 2))
    forced = pairset(
        blocked_fuzzy_pairs(df, "id", "name", ["blk"], 2, collapse=True)
    )
    plain = pairset(
        blocked_fuzzy_pairs(df, "id", "name", ["blk"], 2, collapse=False)
    )
    assert auto == forced == plain
    # the probe must have taken the collapsed path on this corpus
    # (sanity numbers: 15 within "red widget", 15 within "red widgex",
    # 36 cross at dist 1, 3 within "blue cable", none to B)
    assert len(auto) == 15 + 15 + 36 + 3
    assert all(a < b for a, b, _ in auto)
    assert (0, 30, 0) not in auto  # cross-block identical: blocked out


def test_blocked_fuzzy_clusters_equals_expanded_graph(spark):
    from clickhouse_only_importer_prototype_spark.operators.dedup import (
        neardup_clusters,
    )
    from clickhouse_only_importer_prototype_spark.operators.linkage import (
        blocked_fuzzy_clusters,
    )
    from pyspark.sql import functions as F

    rows = []
    for i in range(4):
        rows.append((i, "red widget", "A"))       # exact-dup group
        rows.append((10 + i, "red widgex", "A"))  # dist 1 to the above
    rows.append((20, "blue cable", "A"))   # unique, no match: absent
    rows.append((21, "blue cable", "A"))   # dist swap: clusters with 20
    rows.append((30, "red widget", "B"))   # other block: absent
    df = spark.createDataFrame(rows, "id long, name string, blk string")

    via_reps = {
        (r.doc_id, r.cluster_id)
        for r in blocked_fuzzy_clusters(df, "id", "name", ["blk"], 2).collect()
    }
    expanded = blocked_fuzzy_pairs(df, "id", "name", ["blk"], 2).select(
        F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b")
    )
    via_graph = {
        (r.doc_id, r.cluster_id) for r in neardup_clusters(expanded).collect()
    }
    assert via_reps == via_graph
    assert (30, 30) not in via_reps  # cross-block identical: no pair
    assert (20, 20) in via_reps and (21, 20) in via_reps
