"""Layout planning operators (operators/layout): Morton interleave
correctness, zone-map skipping, compaction bins, skew audit."""

from __future__ import annotations

from pyspark.sql import functions as F

from clickhouse_only_importer_prototype_spark.operators import layout


def _py_interleave(x: int, y: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_interleave_matches_python_reference(spark):
    rows = [(x, y) for x in (0, 1, 5, 170, 255) for y in (0, 3, 128, 255)]
    df = spark.createDataFrame(rows, "x long, y long")
    out = df.select(
        "x", "y", layout.interleave_bits(F.col("x"), F.col("y"), 8).alias("z")
    )
    for r in out.collect():
        assert r.z == _py_interleave(r.x, r.y, 8), (r.x, r.y)


def test_grid_cell_bounds_and_monotonicity(spark):
    df = spark.range(0, 1000).select(F.col("id").cast("long").alias("v"))
    lo, hi = F.lit(0), F.lit(999)
    out = df.select(
        "v", layout.grid_cell(F.col("v"), lo, hi, 64).alias("c")
    ).collect()
    cells = {r.v: r.c for r in out}
    assert min(cells.values()) == 0 and max(cells.values()) == 63
    assert all(cells[v] <= cells[v + 1] for v in range(999))


def test_grid_cell_degenerate_span_maps_to_cell_zero(spark):
    df = spark.createDataFrame([(5,), (5,)], "v long")
    out = df.select(
        layout.grid_cell(F.col("v"), F.lit(5), F.lit(5), 64).alias("c")
    ).collect()
    assert [r.c for r in out] == [0, 0]


def test_zorder_skips_more_than_single_dim_sort_on_2d_predicates(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_custkey", "o_totalprice"
    )
    stats = o.agg(
        F.min("o_custkey").alias("xmin"),
        F.max("o_custkey").alias("xmax"),
        F.min("o_totalprice").alias("ymin"),
        F.max("o_totalprice").alias("ymax"),
    )
    d = o.crossJoin(F.broadcast(stats))
    cx = layout.grid_cell(F.col("o_custkey"), F.col("xmin"), F.col("xmax"), 256)
    cy = layout.grid_cell(
        F.col("o_totalprice"), F.col("ymin"), F.col("ymax"), 256
    )
    z = layout.interleave_bits(cx, cy, 8)
    filed = d.select(
        "o_custkey",
        "o_totalprice",
        F.shiftright(z, 10).alias("file_z"),
        F.shiftright(cx, 2).alias("file_x"),
    )
    sr = stats.collect()[0]
    xspan, yspan = sr.xmax - sr.xmin, sr.ymax - sr.ymin
    preds = spark.createDataFrame(
        [
            (
                1,
                float(sr.xmin + 0.4 * xspan),
                float(sr.xmin + 0.6 * xspan),
                sr.ymin + 0.4 * yspan,
                sr.ymin + 0.6 * yspan,
            )
        ],
        "pred_id long, lo_o_custkey double, hi_o_custkey double,"
        " lo_o_totalprice double, hi_o_totalprice double",
    )
    dims = ["o_custkey", "o_totalprice"]

    def scanned(file_col):
        zones = layout.zone_map(filed, file_col, dims)
        row = layout.skipping_audit(zones, preds, dims).collect()[0]
        return row.rows_scanned, row.rows_total

    z_scanned, total = scanned("file_z")
    x_scanned, _ = scanned("file_x")
    # a centered 20% x 20% rectangle: z-order prunes on BOTH dims,
    # the custkey sort only on x — z must scan strictly less
    assert z_scanned < x_scanned
    assert z_scanned < total


def test_zone_map_counts_cover_table(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").withColumn(
        "f", F.col("o_orderkey") % 8
    )
    zones = layout.zone_map(o, "f", ["o_totalprice"])
    assert zones.count() == 8
    total = zones.agg(F.sum("n_rows")).collect()[0][0]
    assert total == o.count()


def test_compaction_plan_respects_target_and_order(spark):
    # 10 files of 30 bytes in one dir: bins of floor(cum_before/100)
    inv = spark.createDataFrame(
        [("d", i, 30) for i in range(10)], "part string, fid long, bytes long"
    )
    out = sorted(
        layout.compaction_plan(inv, "part", "bytes", "fid", 100).collect(),
        key=lambda r: r.bin,
    )
    # cum_before: 0,30,..,270 -> bins 0,0,0,0,1,1,1,2,2,2
    assert [(r.bin, r.n_files, r.total_bytes) for r in out] == [
        (0, 4, 120),
        (1, 3, 90),
        (2, 3, 90),
    ]


def test_compaction_plan_partitions_independent(spark):
    inv = spark.createDataFrame(
        [("a", 1, 50), ("b", 1, 50), ("a", 2, 60), ("a", 3, 10), ("b", 2, 10)],
        "part string, fid long, bytes long",
    )
    out = {
        (r.part, r.bin): (r.n_files, r.total_bytes)
        for r in layout.compaction_plan(inv, "part", "bytes", "fid", 100).collect()
    }
    # part a: cum_before 0,50,110 -> bins 0,0,1 (a bin closes once the
    # bytes before the next file reach the target); part b: 0,50 -> 0,0
    assert out == {("a", 0): (2, 110), ("a", 1): (1, 10), ("b", 0): (2, 60)}


def test_skew_audit_flags_hot_key(spark):
    rows = [(1,)] * 96 + [(2,), (3,), (4,), (5,)]
    df = spark.createDataFrame(rows, "k long")
    r = layout.skew_audit(df, "k").collect()[0]
    assert r.key_col == "k"
    assert r.n_keys == 5 and r.n_rows == 100 and r.max_rows == 96
    assert r.top1_share_per_mille == 960
    assert r.skewed == 1


def test_skew_audit_balanced_not_flagged(spark):
    df = spark.range(0, 1000).select((F.col("id") % 100).alias("k"))
    r = layout.skew_audit(df, "k").collect()[0]
    assert r.skewed == 0 and r.max_rows == 10


def test_zorder_file_assignment_plan_has_no_sort_or_window(spark, sf_dir):
    """The quad-tree tiling claim: file ids come from top z-bits — a
    pure projection — never from a global sort or ntile window."""
    from clickhouse_only_importer_prototype_spark.queries import _REGISTRY

    plan = (
        _REGISTRY["zorder_skipping_audit"](spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan
    assert "Sort" not in plan
    assert "rangepartitioning" not in plan
    assert "CartesianProduct" not in plan


def test_skipping_audit_plan_broadcasts_predicates(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").withColumn(
        "f", F.col("o_orderkey") % 8
    )
    zones = layout.zone_map(o, "f", ["o_totalprice"])
    preds = spark.createDataFrame(
        [(1, 0.0, 1e9)], "pred_id long, lo_o_totalprice double, hi_o_totalprice double"
    )
    plan = (
        layout.skipping_audit(zones, preds, ["o_totalprice"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" in plan or "Broadcast" in plan


def test_route_join_strategy_regimes(spark):
    from clickhouse_only_importer_prototype_spark.operators.layout import (
        route_join_strategy,
        skew_audit,
    )
    from pyspark.sql import functions as F

    # balanced: uniform keys
    bal = spark.range(0, 1000).select((F.col("id") % 100).alias("k"))
    assert route_join_strategy(skew_audit(bal, "k").first()) == "plain"
    # adversarial: one key holds 90% of rows
    adv = spark.range(0, 1000).select(
        F.when(F.col("id") < 900, F.lit(0)).otherwise(F.col("id")).alias("k")
    )
    assert route_join_strategy(skew_audit(adv, "k").first()) == "salted"
    # moderate: hottest key 4x mean but a tiny share of the table
    mod = spark.range(0, 10000).select(
        F.when(F.col("id") < 200, F.lit(0))
        .otherwise(F.col("id") % 4000)
        .alias("k")
    )
    row = skew_audit(mod, "k").first()
    assert row["skewed"] == 1 and row["top1_share_per_mille"] < 200
    assert route_join_strategy(row) == "aqe_skew"


def test_routed_join_salts_adversarial_and_matches_plain(spark):
    from clickhouse_only_importer_prototype_spark.operators.layout import (
        routed_join,
    )
    from pyspark.sql import functions as F

    fact = spark.range(0, 2000).select(
        F.when(F.col("id") < 1800, F.lit(0)).otherwise(F.col("id") % 10).alias("k"),
        (F.col("id") % 7).alias("v"),
    )
    dim = spark.range(0, 10).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("lbl")
    )
    out = routed_join(fact, dim, "k")
    # the salted path must actually be in the plan for this fixture
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "__salt" in plan
    got = sorted(tuple(r) for r in out.collect())
    want = sorted(tuple(r) for r in fact.join(dim, "k").collect())
    assert got == want


def test_routed_join_plain_for_balanced(spark):
    from clickhouse_only_importer_prototype_spark.operators.layout import (
        routed_join,
    )
    from pyspark.sql import functions as F

    fact = spark.range(0, 1000).select((F.col("id") % 50).alias("k"))
    dim = spark.range(0, 50).select(F.col("id").alias("k"))
    out = routed_join(fact, dim, "k")
    assert "__salt" not in out._jdf.queryExecution().executedPlan().toString()
    assert out.count() == 1000
