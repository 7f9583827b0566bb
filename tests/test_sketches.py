from __future__ import annotations

import random
from collections import Counter

import pytest
from pyspark.sql import functions as F

from clickhouse_only_importer_prototype_spark.operators import sketches
from clickhouse_only_importer_prototype_spark.operators.profile import (
    group_tv_distance,
)


def _exact_hh(tokens: list[str], den: int) -> dict[str, int]:
    total = len(tokens)
    return {
        t: n for t, n in Counter(tokens).items() if n * den >= total
    }


def test_heavy_hitters_exact_on_skewed_stream(spark):
    """MG nomination + rescore == the exact groupBy answer, on a
    Zipf-ish stream whose tail forces real MG decrements (tail
    cardinality >> sketch size)."""
    rng = random.Random(7)
    tokens = []
    for i in range(30):
        tokens += [f"hot{i}"] * (400 - 12 * i)
    tokens += [f"tail{rng.randrange(20000)}" for _ in range(6000)]
    rng.shuffle(tokens)
    den = 50
    df = spark.createDataFrame([(t,) for t in tokens], "tok string")
    # few tokens per partition => many partitions' n_p/k bounds exercised
    got = {
        r.token: (r.n_occurrences, r.share_1e6)
        for r in sketches.heavy_hitters(
            df.repartition(16), "tok", den=den
        ).collect()
    }
    expect = _exact_hh(tokens, den)
    assert set(got) == set(expect)
    total = len(tokens)
    for t, n in expect.items():
        assert got[t] == (n, n * 1_000_000 // total)


def test_heavy_hitters_small_sketch_still_exact(spark):
    """Even a deliberately undersized candidate sketch cannot create
    false positives (rescore is exact); with k = 2*den the output is
    also a guaranteed superset, asserted against brute force."""
    tokens = ["a"] * 100 + ["b"] * 60 + [f"t{i}" for i in range(300)]
    df = spark.createDataFrame([(t,) for t in tokens], "tok string")
    out = sketches.heavy_hitters(df, "tok", den=4).collect()
    assert {r.token: r.n_occurrences for r in out} == _exact_hh(tokens, 4)


def test_misra_gries_validates(spark):
    df = spark.createDataFrame([("a",)], "tok string")
    with pytest.raises(ValueError):
        sketches.misra_gries_candidates(df, "tok", 0)
    with pytest.raises(ValueError):
        sketches.heavy_hitters(df, "tok", den=0)


def test_bigram_tokens_edges(spark):
    df = spark.createDataFrame(
        [("w x y",), ("solo",), ("",), ("a  b",)], "text string"
    )
    # normalization upstream collapses doubled spaces; feed raw here to
    # prove the empty-token guard also holds without it
    rows = df.select(
        sketches.bigram_tokens(F.col("text")).alias("bg")
    ).collect()
    assert rows[0].bg == ["w x", "x y"]
    assert rows[1].bg == []
    assert rows[2].bg == []
    # both pairs touch the empty middle token => dropped (upstream
    # normalization is what makes "a  b" yield the "a b" bigram)
    assert rows[3].bg == []


def _tv_bruteforce(rows: list[tuple[str, str]]) -> dict[tuple, int]:
    by_g: dict[str, Counter] = {}
    for g, i in rows:
        by_g.setdefault(g, Counter())[i] += 1
    shares = {
        g: {i: c * 1_000_000 // sum(cnt.values()) for i, c in cnt.items()}
        for g, cnt in by_g.items()
    }
    out = {}
    gs = sorted(shares)
    for x in range(len(gs)):
        for y in range(x + 1, len(gs)):
            a, b = shares[gs[x]], shares[gs[y]]
            num = sum(
                abs(a.get(i, 0) - b.get(i, 0)) for i in set(a) | set(b)
            )
            out[(gs[x], gs[y])] = num // 2
    return out


def test_group_tv_distance_matches_bruteforce(spark):
    rng = random.Random(3)
    vocab = [f"w{i}" for i in range(40)]
    rows = []
    for g, bias in [("s0", 0), ("s1", 0), ("s2", 25)]:
        for _ in range(500):
            rows.append((g, vocab[(rng.randrange(15) + bias) % 40]))
    df = spark.createDataFrame(rows, "src string, tok string")
    got = {
        (r.group_a, r.group_b): r.tv_1e6
        for r in group_tv_distance(df, "src", "tok").collect()
    }
    expect = _tv_bruteforce(rows)
    assert got == expect
    # sanity of the metric itself: the same-biased pair is far closer
    # than either cross pair
    assert got[("s0", "s1")] < got[("s0", "s2")]
    assert got[("s0", "s1")] < got[("s1", "s2")]


def test_group_tv_distance_disjoint_and_identical(spark):
    rows = [("a", "x"), ("a", "y"), ("b", "x"), ("b", "y"), ("c", "z")]
    df = spark.createDataFrame(rows, "src string, tok string")
    got = {
        (r.group_a, r.group_b): r.tv_1e6
        for r in group_tv_distance(df, "src", "tok").collect()
    }
    assert got[("a", "b")] == 0
    # disjoint vocabularies: full share mass on both sides
    assert got[("a", "c")] == 1_000_000
    assert got[("b", "c")] == 1_000_000


def test_heavy_hitters_empty_input(spark):
    from clickhouse_only_importer_prototype_spark.operators import sketches

    df = spark.createDataFrame([], "tok string")
    assert sketches.heavy_hitters(df, "tok", den=10).count() == 0
