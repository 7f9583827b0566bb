"""Deterministic split/sample (operators/sampling) and sequence
packing (operators/packing)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clickhouse_only_importer_prototype_spark.operators import (
    packing,
    sampling,
    text as text_ops,
)


def test_hash_split_deterministic_and_proportional(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    out = sampling.hash_split(
        docs, weights={"train": 0.8, "val": 0.1, "test": 0.1}
    )
    a = {(r.doc_id, r.split) for r in out.collect()}
    b = {(r.doc_id, r.split) for r in out.collect()}  # re-run: identical
    assert a == b
    n = len(a)
    by_split = {}
    for _, s in a:
        by_split[s] = by_split.get(s, 0) + 1
    assert set(by_split) <= {"train", "val", "test"}
    assert by_split["train"] > 0.7 * n  # ~0.8 with hash noise
    assert by_split.get("val", 0) + by_split.get("test", 0) < 0.3 * n


def test_hash_split_partial_weights_leave_rest(spark):
    df = spark.range(1000).withColumnRenamed("id", "doc_id")
    out = sampling.hash_split(df, weights={"train": 0.5})
    splits = {r.split for r in out.collect()}
    assert splits == {"train", "rest"}


def test_hash_sample_nested_and_stable(spark):
    df = spark.range(5000).withColumnRenamed("id", "doc_id")
    ten = {r.doc_id for r in sampling.hash_sample(df, 0.10).collect()}
    one = {r.doc_id for r in sampling.hash_sample(df, 0.01).collect()}
    assert one <= ten  # nested: smaller rate is a subset at same salt
    assert 0.05 * 5000 < len(ten) < 0.15 * 5000
    other = {r.doc_id for r in sampling.hash_sample(df, 0.10, salt="s2").collect()}
    assert other != ten  # a different salt re-rolls membership


def test_pack_sequences_matches_serial_reference(spark):
    import random

    rng = random.Random(3)
    rows = [(i, rng.randrange(0, 700)) for i in range(500)]
    # sprinkle zero-token docs to pin the ride-along convention
    rows[10] = (10, 0)
    rows[11] = (11, 0)
    df = spark.createDataFrame(rows, "doc_id long, n long")
    out = packing.pack_sequences(df, "n", budget=512).collect()
    got = {r.doc_id: (r.n_tokens, r.start_tok, r.seq_first, r.seq_last) for r in out}
    acc = 0
    for doc_id, n in rows:
        first = acc // 512
        last = (acc + max(n, 1) - 1) // 512
        assert got[doc_id] == (n, acc, first, last), doc_id
        acc += n


def test_pack_sequences_parallel_plan_and_bounds(spark, sf_dir):
    """With explicit bounds the cumsum window runs per-bucket (no
    single-partition global sort) and totals still line up gaplessly."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tokens = text_ops.wordpiece_count(F.col("text"))
    ids = [r.doc_id for r in docs.select("doc_id").collect()]
    ids.sort()
    bounds = [ids[len(ids) // 4], ids[len(ids) // 2], ids[3 * len(ids) // 4]]
    out = packing.pack_sequences(docs, tokens, budget=2048, bounds=bounds)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the window partitions by bucket — a global order-by window would
    # show a single-partition Sort/Exchange
    assert "__bkt" in plan
    rows = sorted(
        ((r.doc_id, r.n_tokens, r.start_tok) for r in out.collect())
    )
    acc = 0
    for _, n, start in rows:
        assert start == acc
        acc += n


def test_hash_split_rejects_bad_weights(spark):
    df = spark.range(10).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError, match="negative"):
        sampling.hash_split(df, weights={"train": -0.1, "val": 0.5})
    with pytest.raises(ValueError, match="sum past 1"):
        sampling.hash_split(df, weights={"train": 0.9, "val": 0.2})


def test_pack_sequences_empty_input(spark):
    empty = spark.createDataFrame([], "doc_id long, n long")
    out = packing.pack_sequences(empty, "n", budget=128)
    assert out.columns == ["doc_id", "n_tokens", "start_tok", "seq_first", "seq_last"]
    assert out.count() == 0


def test_stratified_sample_rates_and_nesting(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang"
    )
    out = sampling.stratified_sample(
        docs, rates={"en": 0.2}, default_rate=1.0
    )
    en_total = docs.where("lang = 'en'").count()
    en_kept = out.where("lang = 'en'").count()
    assert 0.05 < en_kept / en_total < 0.4  # ~20% of the dominant group
    # non-listed groups ride through untouched
    assert (
        out.where("lang <> 'en'").count() == docs.where("lang <> 'en'").count()
    )
    # nesting: the 10% en sample is a subset of the 20% one
    tighter = sampling.stratified_sample(docs, rates={"en": 0.1}, default_rate=1.0)
    a = {r.doc_id for r in tighter.where("lang='en'").collect()}
    b = {r.doc_id for r in out.where("lang='en'").collect()}
    assert a <= b
    with pytest.raises(ValueError, match="rate out of"):
        sampling.stratified_sample(docs, rates={"en": 1.5})


def test_quota_per_group_caps_exactly_and_stably(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source"
    )
    out = sampling.quota_per_group(docs, quota=5)
    sizes = {r.source: r.n for r in out.groupBy("source").agg(
        F.count("*").alias("n")).collect()}
    orig = {r.source: r.n for r in docs.groupBy("source").agg(
        F.count("*").alias("n")).collect()}
    for src, n in sizes.items():
        assert n == min(5, orig[src])
    # deterministic: same draw on re-evaluation
    again = {r.doc_id for r in sampling.quota_per_group(docs, quota=5).collect()}
    assert again == {r.doc_id for r in out.collect()}
    with pytest.raises(ValueError, match="quota"):
        sampling.quota_per_group(docs, quota=0)


def test_token_budget_greedy_prefix_per_group(spark):
    from clickhouse_only_importer_prototype_spark.operators.sampling import (
        token_budget_per_group,
    )
    import pytest

    rows = [(i, "s1" if i < 6 else "s2", 40) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    out = token_budget_per_group(
        df, budget_tokens=100, token_col="n_tokens"
    ).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r)
    # 40-token docs, budget 100 -> exactly 2 kept per group (80 <= 100,
    # a third would hit 120), regardless of group size
    assert {s: len(v) for s, v in by_src.items()} == {"s1": 2, "s2": 2}
    assert all(r.cum_tokens <= 100 for r in out)
    # deterministic: same salt -> same kept set
    again = {
        r.doc_id
        for r in token_budget_per_group(
            df, budget_tokens=100, token_col="n_tokens"
        ).collect()
    }
    assert again == {r.doc_id for r in out}
    with pytest.raises(ValueError):
        token_budget_per_group(df, budget_tokens=0, token_col="n_tokens")


def test_priority_sample_matches_python_reference(spark):
    """Engine top-k == brute-force priority sampling over all rows."""
    import hashlib

    rows = [(i, (i % 7) + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, w long")

    def key(i, w):
        h = int(
            hashlib.md5(f"wsample-v1:{i}".encode()).hexdigest()[:15], 16
        )
        return (float(2 * h + 1) / float(w), i)

    expect = sorted(rows, key=lambda r: key(*r))[:25]
    got = sorted(
        (r.doc_id, r.w)
        for r in sampling.priority_sample(
            df, k=25, weight_col="w", id_col="doc_id"
        ).collect()
    )
    assert got == sorted(expect)


def test_priority_sample_weight_proportional_and_stable(spark):
    # one heavy doc among light ones is (almost) always included
    rows = [(i, 1) for i in range(100)] + [(100, 100_000)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    s1 = {r.doc_id for r in sampling.priority_sample(df, 10, "w").collect()}
    s2 = {r.doc_id for r in sampling.priority_sample(df, 10, "w").collect()}
    assert s1 == s2  # deterministic across runs
    assert 100 in s1
    assert len(s1) == 10


def test_priority_sample_excludes_nonpositive_weights(spark):
    df = spark.createDataFrame(
        [(1, 0), (2, -5), (3, 10), (4, 1)], "doc_id long, w long"
    )
    got = {r.doc_id for r in sampling.priority_sample(df, 4, "w").collect()}
    assert got == {3, 4}
    with pytest.raises(ValueError):
        sampling.priority_sample(df, 0, "w")


def test_contrastive_negatives_properties(spark):
    """Never the anchor, always in [0, N), deterministic across runs,
    and matching the pure-Python reference draw."""
    import hashlib

    from clickhouse_only_importer_prototype_spark.operators.sampling import (
        contrastive_negatives,
    )
    from pyspark.sql import functions as F

    n = 37
    df = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    out = contrastive_negatives(df, k=4).collect()
    assert len(out) == n * 4
    got = {(r.anchor_id, r.j): r.negative_id for r in out}
    for (a, j), neg in got.items():
        assert 0 <= neg < n and neg != a
        h = int(
            hashlib.md5(f"cneg-v1:{a}:{j}".encode()).hexdigest()[:15], 16
        )
        assert neg == (a + 1 + h % (n - 1)) % n
    again = {
        (r.anchor_id, r.j): r.negative_id
        for r in contrastive_negatives(df, k=4).collect()
    }
    assert again == got


def test_contrastive_negatives_validates(spark):
    import pytest

    from clickhouse_only_importer_prototype_spark.operators.sampling import (
        contrastive_negatives,
    )

    dense = spark.createDataFrame([(0,), (1,)], "doc_id long")
    with pytest.raises(ValueError):
        contrastive_negatives(dense, k=0)
    with pytest.raises(ValueError):
        contrastive_negatives(
            spark.createDataFrame([(5,), (6,)], "doc_id long"), k=1
        )
    with pytest.raises(ValueError):
        contrastive_negatives(
            spark.createDataFrame([(0,)], "doc_id long"), k=1
        )
