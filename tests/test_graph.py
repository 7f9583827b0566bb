"""Graph analytics: integer PageRank + triangle counting, plus the
iterative-contract properties the oracle can't express (mass bounds,
orientation invariance, known-answer fixtures)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from clickhouse_only_importer_prototype_spark.operators import graph as G


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src: long, dst: long")


def test_symmetrize_distinct_both_arcs(spark):
    e = _edges(spark, [(1, 2), (2, 1), (1, 2), (2, 3)])
    arcs = {(r["src"], r["dst"]) for r in G.symmetrize(e).collect()}
    assert arcs == {(1, 2), (2, 1), (2, 3), (3, 2)}


def test_pagerank_uniform_on_regular_graph(spark):
    # a 4-cycle is 2-regular: every node keeps exactly the uniform rank
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 1)])
    arcs = G.symmetrize(e)
    ranks = {r["node"]: r["rank"] for r in G.pagerank_int(arcs, 3).collect()}
    assert len(ranks) == 4
    assert len(set(ranks.values())) == 1  # symmetry preserved exactly
    # conserved mass up to truncation dust: <= N ulps lost per div site
    assert abs(sum(ranks.values()) - G.PR_SCALE) < 100


def test_pagerank_star_center_dominates(spark):
    star = _edges(spark, [(0, i) for i in range(1, 6)])
    ranks = {
        r["node"]: r["rank"]
        for r in G.pagerank_int(G.symmetrize(star), 3).collect()
    }
    center, leaves = ranks[0], [ranks[i] for i in range(1, 6)]
    assert all(center > lv for lv in leaves)
    assert len(set(leaves)) == 1


def test_pagerank_validates_iterations(spark):
    with pytest.raises(ValueError):
        G.pagerank_int(_edges(spark, [(1, 2)]), iterations=0)


def test_pagerank_matches_pure_python(spark):
    """Exact replay of the int64 recurrence on a small irregular graph."""
    raw = [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5), (2, 5), (5, 1)]
    arcs = sorted({(a, b) for a, b in raw} | {(b, a) for a, b in raw})
    out_deg: dict[int, int] = {}
    for a, _ in arcs:
        out_deg[a] = out_deg.get(a, 0) + 1
    n = len(out_deg)
    ranks = {v: G.PR_SCALE // n for v in out_deg}
    base = (15 * G.PR_SCALE) // (100 * n)
    for _ in range(3):
        incoming: dict[int, int] = {v: 0 for v in out_deg}
        for a, b in arcs:
            incoming[b] += ranks[a] // out_deg[a]
        ranks = {v: base + (85 * s) // 100 for v, s in incoming.items()}
    got = {
        r["node"]: r["rank"]
        for r in G.pagerank_int(
            G.symmetrize(_edges(spark, raw)), 3
        ).collect()
    }
    assert got == ranks


def test_oriented_edges_canonical(spark):
    e = spark.createDataFrame(
        [(2, 1), (1, 2), (3, 3), (4, 2)], "a: long, b: long"
    )
    got = {(r["a"], r["b"]) for r in G.oriented_edges(e).collect()}
    assert got == {(1, 2), (2, 4)}  # dup collapsed, self-loop dropped


def test_triangle_stats_known_answer(spark):
    # K4 minus one edge: edges {12,13,14,23,24} -> triangles 123, 124
    e = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4)], "a: long, b: long"
    )
    row = G.triangle_stats(G.oriented_edges(e)).collect()[0]
    assert row["n_edges"] == 5
    assert row["n_triangles"] == 2
    # degrees 3,3,2,2 -> wedges = (3+3+1+1) = 8
    assert row["n_wedges"] == 8
    assert row["clustering_1e6"] == (3 * 2 * 1_000_000) // 8


def test_triangle_free_graph(spark):
    e = spark.createDataFrame([(1, 2), (3, 4)], "a: long, b: long")
    row = G.triangle_stats(G.oriented_edges(e)).collect()[0]
    assert row["n_triangles"] == 0
    assert row["n_wedges"] == 0
    assert row["clustering_1e6"] == 0


def test_floordiv_negative_ts_matches_duckdb(spark):
    """Regression for the floor-vs-truncate trap: Spark buckets with
    exact floor (_floordiv_sql); DuckDB's integer ``//`` TRUNCATES, so
    oracles must add the remainder-sign correction (ORACLE_FLOORDIV).
    Pre-epoch instants are the case where bare ``//`` would differ."""
    from clickhouse_only_importer_prototype_spark.operators.temporal import (
        _floordiv_sql,
    )
    from clickhouse_only_importer_prototype_spark.queries import (
        ORACLE_FLOORDIV,
    )

    ts = [-7_200_000_000_001, -3_600_000_000_000, -1, 0, 1, 3_599_999_999_999]
    width = 3_600_000_000_000
    df = spark.createDataFrame([(t,) for t in ts], "ts: long")
    got = [
        r[0]
        for r in df.select(F.expr(_floordiv_sql("ts", width)))
        .orderBy(F.lit(1))
        .collect()
    ]
    want = [t // width for t in ts]  # Python //: exact floor
    assert sorted(got) == sorted(want)
    con = duckdb.connect()
    frag = ORACLE_FLOORDIV("x", width)
    oracle = [
        con.execute(f"SELECT {frag} FROM (SELECT CAST({t} AS BIGINT) AS x)")
        .fetchone()[0]
        for t in ts
    ]
    assert oracle == want
    # and the trap is real: bare // truncates on negatives
    assert con.execute("SELECT -7 // 2").fetchone()[0] == -3


def test_personalized_pagerank_all_seeds_equals_uniform(spark):
    arcs = G.symmetrize(
        spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4)], "src long, dst long"
        )
    ).persist()
    seeds = arcs.select(F.col("src").alias("node")).distinct()
    uni = {
        r.node: r.rank for r in G.pagerank_int(arcs, iterations=2).collect()
    }
    per = {
        r.node: r.rank
        for r in G.pagerank_int(arcs, iterations=2, seeds=seeds).collect()
    }
    assert per == uni


def test_personalized_pagerank_concentrates_on_seed_side(spark):
    # path 1-2-3-4-5: seed at node 1 -> rank(2) > rank(5)
    arcs = G.symmetrize(
        spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (4, 5)], "src long, dst long"
        )
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    r = {
        r.node: r.rank
        for r in G.pagerank_int(arcs, iterations=3, seeds=seeds).collect()
    }
    assert r[2] > r[5]
    assert r[1] > r[4]


def test_personalized_pagerank_empty_seeds_raises(spark):
    arcs = G.symmetrize(
        spark.createDataFrame([(1, 2)], "src long, dst long")
    )
    seeds = spark.createDataFrame([], "node long")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="seed"):
        G.pagerank_int(arcs, iterations=1, seeds=seeds)


def test_personalized_pagerank_disjoint_seeds_raise(spark):
    arcs = G.symmetrize(
        spark.createDataFrame([(1, 2)], "src long, dst long")
    )
    seeds = spark.createDataFrame([(42,)], "node long")
    with pytest.raises(ValueError, match="present in"):
        G.pagerank_int(arcs, iterations=1, seeds=seeds)


def test_personalized_pagerank_offgraph_seeds_dont_dilute(spark):
    # seeds {1, 99}: 99 is off-graph, so mass must be allotted as if
    # the seed set were exactly {1}
    arcs = G.symmetrize(
        spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    )
    only1 = spark.createDataFrame([(1,)], "node long")
    with99 = spark.createDataFrame([(1,), (99,)], "node long")
    a = {r.node: r.rank for r in G.pagerank_int(arcs, 2, seeds=only1).collect()}
    b = {r.node: r.rank for r in G.pagerank_int(arcs, 2, seeds=with99).collect()}
    assert a == b
