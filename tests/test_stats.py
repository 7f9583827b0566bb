"""Footer-statistics range bucketing (stats.py): skew calibration and
the gapless-id contract it feeds (queries.surrogate_ids)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from clickhouse_only_importer_prototype_spark import stats


def _write_skewed(tmp_path, keys: np.ndarray, row_group_size: int = 1000):
    path = str(tmp_path / "skewed.parquet")
    n = len(keys)
    tbl = pa.table(
        {
            "k": pa.array(np.sort(keys).astype("int64")),
            "line": pa.array(np.arange(n, dtype="int64")),
        }
    )
    pq.write_table(tbl, path, row_group_size=row_group_size)
    return path


def _bucket_counts(keys: np.ndarray, bounds: list[int]) -> np.ndarray:
    # mirror of stats.bucket_expr: count of bounds strictly below key
    b = np.asarray(sorted(bounds), dtype="int64")
    idx = np.searchsorted(b, keys, side="left")
    # searchsorted('left') counts bounds < key only when key > bound;
    # equal keys must NOT pass (expr uses strict >): side='right' counts
    # bounds <= key... we need #(key > bound) = #(bound < key) = 'left'
    # unless key == bound, where 'left' stops before the equal bound: OK
    return np.bincount(idx, minlength=len(b) + 1)


@pytest.mark.parametrize("dist", ["pareto", "uniform", "lognormal"])
def test_boundaries_balance_skewed_keys(tmp_path, dist):
    rng = np.random.default_rng(7)
    n = 40_000
    if dist == "pareto":
        keys = (rng.pareto(1.2, n) * 1000).astype("int64")
    elif dist == "lognormal":
        keys = (rng.lognormal(8, 2, n)).astype("int64")
    else:
        keys = rng.integers(0, 1_000_000, n)
    path = _write_skewed(tmp_path, keys)

    segs = stats.parquet_rowgroup_stats(path, "k")
    assert len(segs) == 40  # 40k rows / 1k row-group size
    assert sum(s[2] for s in segs) == n

    n_buckets = 8
    bounds = stats.boundaries_from_stats(segs, n_buckets)
    assert bounds == sorted(set(bounds))
    counts = _bucket_counts(keys, bounds)
    occupied = counts[counts > 0]
    # calibrated split: no bucket beyond ~2.5x the ideal share (one
    # row-group granularity of slack + integer-valued key collisions)
    assert occupied.max() <= 2.5 * n / len(occupied)

    if dist != "uniform":
        # uniform [min,max] split on a heavy-tailed key is catastrophic:
        # nearly everything lands in bucket 0 — the case calibration fixes
        lo, hi = int(keys.min()), int(keys.max())
        span = max(hi - lo + 1, 1)
        ub = np.minimum(
            n_buckets - 1, (keys - lo) * n_buckets // span
        ).astype("int64")
        uniform_max = np.bincount(ub, minlength=n_buckets).max()
        assert uniform_max > 0.9 * n
        assert occupied.max() < uniform_max / 2


def test_rowgroup_stats_missing_column(tmp_path):
    path = _write_skewed(tmp_path, np.arange(100, dtype="int64"))
    assert stats.parquet_rowgroup_stats(path, "nope") == []
    assert stats.boundaries_from_stats([], 8) == []


def test_bucket_expr_matches_numpy_and_ids_gapless(spark, tmp_path):
    """End-to-end on a pareto key: footer-calibrated buckets + two-pass
    rank produce exactly the ids of a global ORDER BY, in parallel."""
    from pyspark.sql import Window, functions as F

    rng = np.random.default_rng(11)
    n = 20_000
    keys = (rng.pareto(1.2, n) * 1000).astype("int64")
    path = _write_skewed(tmp_path, keys)

    segs = stats.parquet_rowgroup_stats(path, "k")
    bounds = stats.boundaries_from_stats(segs, 8)
    assert len(bounds) >= 3  # pareto has enough spread to split

    df = spark.read.parquet(path)
    bucketed = df.withColumn("__bkt", stats.bucket_expr("k", bounds))
    # bucket expr agrees with the numpy mirror
    got_counts = {
        r["__bkt"]: r["cnt"]
        for r in bucketed.groupBy("__bkt").agg(F.count("*").alias("cnt")).collect()
    }
    exp_counts = _bucket_counts(np.sort(keys), bounds)
    for b, c in got_counts.items():
        assert exp_counts[b] == c

    offsets, acc = [], 0
    for b in sorted(got_counts):
        offsets.append((b, acc))
        acc += got_counts[b]
    off_df = spark.createDataFrame(offsets, "__bkt int, __offset long")
    w = Window.partitionBy("__bkt").orderBy("k", "line")
    out = (
        bucketed.join(F.broadcast(off_df), "__bkt")
        .select(
            "k",
            "line",
            (F.row_number().over(w) - 1 + F.col("__offset"))
            .cast("long")
            .alias("seq_id"),
        )
    )
    pdf = out.toPandas().sort_values(["k", "line"]).reset_index(drop=True)
    # gapless, dense, and identical to the global sort order
    assert pdf["seq_id"].tolist() == list(range(n))


def test_rank_gapless_multicolumn_order(spark):
    """Public rank_gapless: ids equal the global ORDER BY rank with a
    multi-column tiebreak, all original columns preserved."""
    import random

    from clickhouse_only_importer_prototype_spark.operators.ids import rank_gapless

    rng = random.Random(9)
    rows = [(rng.randrange(50), i, f"v{i}") for i in range(3000)]
    df = spark.createDataFrame(rows, "k long, line long, payload string")
    out = rank_gapless(df, ["k", "line"]).collect()
    assert {r.payload for r in out} == {p for _, _, p in rows}
    by_order = sorted(((r.k, r.line), r.seq_id) for r in out)
    assert [s for _, s in by_order] == list(range(3000))


def test_rowgroup_stats_nested_schema_leaf_resolution(tmp_path):
    """A nested struct BEFORE the target column explodes into several
    parquet leaves; the arrow field index would point at the wrong
    leaf's stats. Resolution must go through leaf paths."""
    path = str(tmp_path / "nested.parquet")
    n = 100
    tbl = pa.table(
        {
            "meta": pa.array(
                [{"a": 0, "b": -1000}] * n,
                type=pa.struct([("a", pa.int64()), ("b", pa.int64())]),
            ),
            "k": pa.array(np.arange(500, 500 + n, dtype="int64")),
        }
    )
    pq.write_table(tbl, path, row_group_size=50)
    segs = stats.parquet_rowgroup_stats(path, "k")
    assert len(segs) == 2
    assert segs[0] == (500, 549, 50)
    assert segs[1] == (550, 599, 50)
    # nested leaves are addressable by their dotted path, flat name is not
    assert stats.parquet_rowgroup_stats(path, "meta.b")[0][0] == -1000
    assert stats.parquet_rowgroup_stats(path, "meta") == []


def test_rank_gapless_empty_input(spark):
    from clickhouse_only_importer_prototype_spark.operators.ids import rank_gapless

    empty = spark.createDataFrame([], "k long, line long")
    out = rank_gapless(empty, ["k", "line"])
    assert out.columns == ["k", "line", "seq_id"]
    assert out.count() == 0


def test_aligned_counts_sorted_multigroup(spark, tmp_path):
    """Key-sorted multi-row-group file: cuts sit on group gaps, counts
    come from footers only, and rank_gapless with them reproduces the
    global ORDER BY ids with a single data pass."""
    from clickhouse_only_importer_prototype_spark.operators.ids import rank_gapless

    rng = np.random.default_rng(5)
    n = 20_000
    # sorted pareto keys with duplicates -> groups disjoint, gaps real
    keys = np.sort((rng.pareto(1.2, n) * 500).astype("int64"))
    path = _write_skewed(tmp_path, keys, row_group_size=1000)
    segs = stats.parquet_rowgroup_stats(path, "k")
    assert len(segs) == 20
    aligned = stats.aligned_counts_from_stats(segs, 8)
    assert aligned is not None
    bounds, counts = aligned
    assert sum(counts) == n and len(counts) == len(bounds) + 1
    # counts are exact: every bucket's metadata count matches the data
    df = spark.read.parquet(path)
    from pyspark.sql import functions as F

    real = {
        r["b"]: r["cnt"]
        for r in df.groupBy(stats.bucket_expr("k", bounds).alias("b"))
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    assert [real.get(i, 0) for i in range(len(counts))] == counts
    out = rank_gapless(df, ["k", "line"], bounds=bounds, bucket_counts=counts)
    pdf = out.toPandas().sort_values(["k", "line"]).reset_index(drop=True)
    assert pdf["seq_id"].tolist() == list(range(n))
    # the plan has NO count aggregate: the only data pass is the rank
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1


def test_aligned_counts_refuses_unsorted_and_single_group(tmp_path):
    rng = np.random.default_rng(6)
    # single row group -> no gaps
    (tmp_path / "one").mkdir()
    one = _write_skewed(tmp_path / "one", np.arange(100, dtype="int64"), 1000)
    assert (
        stats.aligned_counts_from_stats(
            stats.parquet_rowgroup_stats(one, "k"), 8
        )
        is None
    )
    # unsorted write -> groups overlap -> no usable gaps
    import pandas as pd_

    p = str(tmp_path / "shuf.parquet")
    keys = rng.permutation(np.arange(10_000, dtype="int64"))
    tbl = pa.table({"k": keys, "line": np.arange(10_000, dtype="int64")})
    pq.write_table(tbl, p, row_group_size=1000)
    assert (
        stats.aligned_counts_from_stats(
            stats.parquet_rowgroup_stats(p, "k"), 8
        )
        is None
    )
    with pytest.raises(ValueError, match="bucket_counts requires"):
        from clickhouse_only_importer_prototype_spark.operators.ids import (
            rank_gapless,
        )

        rank_gapless(None, ["k"], bounds=None, bucket_counts=[1])


def test_violation_counts_one_pass_and_exact(spark):
    from pyspark.sql import functions as F

    from clickhouse_only_importer_prototype_spark.operators.profile import (
        violation_counts,
    )

    df = spark.range(0, 100).select(F.col("id").alias("v"))
    out = {
        r.check: r.n_violations
        for r in violation_counts(
            df,
            {"over_90": F.col("v") > 90, "even": F.col("v") % 2 == 0},
        ).collect()
    }
    assert out == {"over_90": 9, "even": 50}
    plan = (
        violation_counts(df, {"x": F.col("v") > 0})
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan  # one scan-agg, no joins


def test_violation_counts_requires_checks(spark):
    import pytest

    from clickhouse_only_importer_prototype_spark.operators.profile import (
        violation_counts,
    )

    with pytest.raises(ValueError, match="no checks"):
        violation_counts(spark.range(1), {})


def test_violation_counts_empty_input_reports_zero(spark):
    from pyspark.sql import functions as F

    from clickhouse_only_importer_prototype_spark.operators.profile import (
        violation_counts,
    )

    df = spark.range(0, 10).select(F.col("id").alias("v")).where("v < 0")
    out = {
        r.check: r.n_violations
        for r in violation_counts(df, {"neg": F.col("v") < 0}).collect()
    }
    assert out == {"neg": 0}  # empty scan -> clean audit, never NULL


def test_violation_counts_quote_in_check_name_is_safe(spark):
    from pyspark.sql import functions as F

    from clickhouse_only_importer_prototype_spark.operators.profile import (
        violation_counts,
    )

    df = spark.range(0, 5).select(F.col("id").alias("v"))
    out = {
        r.check: r.n_violations
        for r in violation_counts(df, {"bob's rule": F.col("v") > 2}).collect()
    }
    assert out == {"bob's rule": 2}


def test_profile_table_quote_in_column_name_is_safe(spark):
    from pyspark.sql import functions as F

    from clickhouse_only_importer_prototype_spark.operators.profile import (
        profile_table,
    )

    df = spark.range(0, 6).select(
        F.col("id").alias("it's a col"),
        F.when(F.col("id") % 2 == 0, F.col("id")).alias("plain"),
    )
    out = {
        r.column: (r.n_rows, r.n_null, r.n_distinct)
        for r in profile_table(df).collect()
    }
    assert out == {"it's a col": (6, 0, 6), "plain": (6, 3, 3)}


def test_table_checksum_order_independent_and_sensitive(spark):
    from clickhouse_only_importer_prototype_spark.operators.profile import (
        table_checksum,
    )

    a = spark.createDataFrame(
        [("1", "x"), ("2", "y"), ("3", "z")], "k string, v string"
    )
    shuffled = spark.createDataFrame(
        [("3", "z"), ("1", "x"), ("2", "y")], "k string, v string"
    ).repartition(3)
    ra, rs = table_checksum(a).first(), table_checksum(shuffled).first()
    assert (ra.n_rows, ra.checksum) == (rs.n_rows, rs.checksum)
    mutated = spark.createDataFrame(
        [("1", "x"), ("2", "y"), ("3", "w")], "k string, v string"
    )
    rm = table_checksum(mutated).first()
    assert rm.checksum != ra.checksum


def test_table_checksum_rendering_is_injective(spark):
    """NULL position and embedded delimiters must change the checksum:
    a convergence audit that renders ('a', NULL, 'b') and
    ('a', 'b', NULL) — or ('a|b', 'c') and ('a', 'b|c') — identically
    would certify non-identical tables as converged."""
    from clickhouse_only_importer_prototype_spark.operators.profile import (
        table_checksum,
    )

    null_mid = spark.createDataFrame(
        [("a", None, "b")], "x string, y string, z string"
    )
    null_end = spark.createDataFrame(
        [("a", "b", None)], "x string, y string, z string"
    )
    assert (
        table_checksum(null_mid).first().checksum
        != table_checksum(null_end).first().checksum
    )
    pipe_left = spark.createDataFrame([("a|b", "c")], "x string, y string")
    pipe_right = spark.createDataFrame([("a", "b|c")], "x string, y string")
    assert (
        table_checksum(pipe_left).first().checksum
        != table_checksum(pipe_right).first().checksum
    )


def test_fixed_width_histogram_clamps_and_drops_nulls(spark):
    from clickhouse_only_importer_prototype_spark.operators.profile import (
        fixed_width_histogram,
    )

    rows = [(-5.0,), (0.0,), (9.99,), (10.0,), (35.0,), (None,)]
    df = spark.createDataFrame(rows, "v double")
    out = {
        r.bucket: (r.lo_edge, r.n, r.total)
        for r in fixed_width_histogram(df, "v", 10.0, 0.0, 3).collect()
    }
    # -5 clamps into bucket 0; 35 clamps into last bucket 2; NULL drops
    assert out[0] == (0.0, 3, -5.0 + 0.0 + 9.99)
    assert out[1] == (10.0, 1, 10.0)
    assert out[2] == (20.0, 1, 35.0)
    assert sum(n for _, n, _ in out.values()) == 5


def test_mad_outlier_stats_counts_planted_outliers(spark):
    from clickhouse_only_importer_prototype_spark.operators.profile import (
        mad_outlier_stats,
    )

    rows = [("g", float(v)) for v in (10, 11, 12, 13, 14)]
    rows += [("g", 1000.0), ("g", -500.0)]  # planted gross outliers
    rows += [("h", 5.0), ("h", 6.0), ("h", 7.0)]  # clean group
    df = spark.createDataFrame(rows, "grp string, v double")
    out = {
        r.grp: (r.median, r.mad, r.n_rows, r.n_outliers)
        for r in mad_outlier_stats(df, "grp", "v").collect()
    }
    med, mad, n, n_out = out["g"]
    assert med == 12.0 and n == 7
    assert n_out == 2  # exactly the planted pair
    assert out["h"][3] == 0  # clean group stays clean
