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
