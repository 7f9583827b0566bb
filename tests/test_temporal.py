"""As-of join and interval join semantics on hand-built fixtures."""

from __future__ import annotations

from clickhouse_only_importer_prototype_spark.operators.temporal import (
    asof_join,
    interval_join,
    rolling_zscore_flags,
)


def test_asof_backward_inclusive(spark):
    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 5, "c"), (2, 10, "d")],
        "k long, ts long, lval string",
    )
    right = spark.createDataFrame(
        [(1, 10, 100.0), (1, 15, 150.0), (2, 11, 300.0)],
        "k long, ts long, rval double",
    )
    out = {
        r.lval: (r.r_ts, r.r_rval)
        for r in asof_join(left, right, on=["k"]).collect()
    }
    assert out["a"] == (10, 100.0)  # inclusive: right AT left ts matches
    assert out["b"] == (15, 150.0)  # latest preceding
    assert out["c"] == (None, None)  # nothing before -> nulls
    assert out["d"] == (None, None)  # right row is after the left ts


def test_asof_preserves_left_rowcount(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    clicks = e.where("event_type = 'click'").select(
        "event_id", "user_id", e.ts.alias("t")
    )
    purchases = (
        e.where("event_type = 'purchase'")
        .groupBy("user_id", e.ts.alias("t"))
        .agg({"value": "max"})
        .withColumnRenamed("max(value)", "bval")
    )
    joined = asof_join(clicks, purchases, on=["user_id"], left_ts="t", right_ts="t")
    assert joined.count() == clicks.count()


def test_interval_join_buckets(spark):
    # interval [10, 30) with bucket width 8 spans buckets 1..3
    intervals = spark.createDataFrame(
        [(1, 10, 30), (2, 0, 4), (3, 50, 50)],  # id 3 is empty (start==end)
        "ival_id long, t0 long, t1 long",
    )
    points = spark.createDataFrame(
        [(100, 10), (101, 29), (102, 30), (103, 3), (104, 55)],
        "pt_id long, t long",
    )
    # no shared key: join on nothing but the bucket
    out = interval_join(
        points.withColumn("k", points.pt_id * 0),
        intervals.withColumn("k", intervals.ival_id * 0),
        on=["k"],
        point_ts="t",
        start_col="t0",
        end_col="t1",
        bucket_width=8,
    )
    pairs = {(r.ival_id, r.pt_id) for r in out.collect()}
    assert pairs == {(1, 100), (1, 101), (2, 103)}


def test_interval_join_no_duplicates(spark):
    # a long interval spanning many buckets must match each point once
    intervals = spark.createDataFrame([(1, 0, 1000)], "ival_id long, t0 long, t1 long")
    points = spark.createDataFrame(
        [(i, i * 7) for i in range(100)], "pt_id long, t long"
    )
    out = interval_join(
        points.withColumn("k", points.pt_id * 0),
        intervals.withColumn("k", intervals.ival_id * 0),
        on=["k"],
        point_ts="t",
        start_col="t0",
        end_col="t1",
        bucket_width=10,
    )
    rows = out.collect()
    assert len(rows) == len({(r.ival_id, r.pt_id) for r in rows}) == 100


def test_asof_ignores_null_right_timestamps(spark):
    left = spark.createDataFrame([(1, 10, "a")], "k long, ts long, lval string")
    right = spark.createDataFrame(
        [(1, None, 999.0), (1, 20, 500.0)], "k long, ts long, rval double"
    )
    out = asof_join(left, right, on=["k"]).collect()
    assert len(out) == 1
    # the NULL-ts row must not be carried forward as a phantom match
    assert out[0].r_ts is None and out[0].r_rval is None


def test_funnel_stages_orders_strictly(spark):
    from clickhouse_only_importer_prototype_spark.operators.temporal import (
        funnel_stages,
    )

    rows = [
        # user 1: full ordered funnel
        (1, "view", 10), (1, "click", 20), (1, "purchase", 30),
        # user 2: purchase BEFORE view -> stage stops at click
        (2, "purchase", 5), (2, "view", 10), (2, "click", 20),
        # user 3: click at the same instant as view -> not strictly after
        (3, "view", 10), (3, "click", 10),
        # user 4: unrelated events only -> stage 0
        (4, "error", 10),
        # user 5: click before the first view never counts
        (5, "click", 5), (5, "view", 10),
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_type string, ts long")
    out = {
        r.user_id: r.funnel_stage
        for r in funnel_stages(ev, ["view", "click", "purchase"]).collect()
    }
    assert out == {1: 3, 2: 2, 3: 1, 4: 0, 5: 1}


def test_funnel_stages_earliest_qualifying_timestamps(spark):
    from clickhouse_only_importer_prototype_spark.operators.temporal import (
        funnel_stages,
    )

    rows = [
        (1, "view", 10), (1, "view", 5),        # earliest view wins
        (1, "click", 7), (1, "click", 50),      # click@7 is after view@5
        (1, "purchase", 6),                     # before click@7 -> ignored
        (1, "purchase", 99),
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_type string, ts long")
    r = funnel_stages(ev, ["view", "click", "purchase"]).collect()[0]
    assert (r.t_1, r.t_2, r.t_3, r.funnel_stage) == (5, 7, 99, 3)


def test_funnel_stages_requires_stages(spark):
    import pytest

    from clickhouse_only_importer_prototype_spark.operators.temporal import (
        funnel_stages,
    )

    with pytest.raises(ValueError, match="no funnel stages"):
        funnel_stages(spark.range(1), [])


def test_funnel_stages_conversion_window_bounds_each_step(spark):
    from clickhouse_only_importer_prototype_spark.operators.temporal import (
        funnel_stages,
    )

    rows = [
        (1, "view", 0), (1, "click", 100), (1, "purchase", 150),  # in window
        (2, "view", 0), (2, "click", 300),                        # click too late
        (3, "view", 0), (3, "click", 50), (3, "purchase", 400),   # purchase late
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_type string, ts long")
    out = {
        r.user_id: r.funnel_stage
        for r in funnel_stages(
            ev, ["view", "click", "purchase"], within=200
        ).collect()
    }
    assert out == {1: 3, 2: 1, 3: 2}


def test_cohort_retention_matrix(spark):
    from clickhouse_only_importer_prototype_spark.operators.temporal import (
        cohort_retention,
    )

    d = 86_400_000_000_000  # one day of nanos
    rows = [
        # user 1: cohort day 0, active days 0, 1, 8 (weeks 0, 0, 1)
        (1, 0), (1, d), (1, 8 * d),
        # user 2: cohort day 1, active days 1 and 15 (weeks 0 and 2)
        (2, d), (2, 15 * d),
        # user 3: cohort day 0, active day 0 only
        (3, 0), (3, 1),  # same-day second event must not double count
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts long")
    out = {
        (r.cohort_bucket, r.offset): r.n_active
        for r in cohort_retention(ev).collect()
    }
    assert out == {(0, 0): 2, (0, 1): 1, (1, 0): 1, (1, 2): 1}


def test_interval_join_pre_epoch_timestamps_floor_bucket(spark):
    # points/intervals strictly before the epoch: truncating div would
    # bucket -1 into 0 and miss the join row
    intervals = spark.createDataFrame(
        [(1, -30, -10)], "ival_id long, t0 long, t1 long"
    )
    points = spark.createDataFrame(
        [(100, -30), (101, -11), (102, -10), (103, -31)],
        "pt_id long, t long",
    )
    out = sorted(
        r.pt_id
        for r in interval_join(
            points.withColumn("k", points.pt_id * 0),
            intervals.withColumn("k", intervals.ival_id * 0),
            on=["k"],
            point_ts="t",
            start_col="t0",
            end_col="t1",
            bucket_width=8,
        ).collect()
    )
    assert out == [100, 101]


def test_cohort_retention_pre_epoch_cohorts(spark):
    from clickhouse_only_importer_prototype_spark.operators.temporal import (
        cohort_retention,
    )

    d = 86_400_000_000_000
    # user 1 first active half a day BEFORE the epoch: floor-div puts
    # the cohort at day -1, and day+6.5 activity lands offset 1
    rows = [(1, -d // 2), (1, 6 * d + d // 2)]
    ev = spark.createDataFrame(rows, "user_id long, ts long")
    out = {
        (r.cohort_bucket, r.offset): r.n_active
        for r in cohort_retention(ev).collect()
    }
    assert out == {(-1, 0): 1, (-1, 1): 1}


def test_funnel_anymatch_reanchors_and_bounds_greedy(spark):
    from clickhouse_only_importer_prototype_spark.operators.temporal import (
        funnel_stages,
        funnel_stages_anymatch,
    )

    rows = [
        # user 1: straight conversion, but purchase misses the window
        (1, "view", 0), (1, "click", 5), (1, "purchase", 100),
        # user 2: first attempt times out; a later attempt converts —
        # greedy says 2, anymatch says 3
        (2, "view", 0), (2, "click", 5),
        (2, "view", 50), (2, "click", 55), (2, "purchase", 60),
        # user 3: purchase ties with the latest click; the EARLIER
        # reachable click must anchor it (strictly-before rule)
        (3, "view", 0), (3, "click", 10), (3, "click", 12),
        (3, "purchase", 12),
        # user 4: click with no view never starts the funnel
        (4, "click", 5),
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_type string, ts long")
    any_out = {
        r.user_id: r.funnel_stage
        for r in funnel_stages_anymatch(
            ev, ["view", "click", "purchase"], within=10
        ).collect()
    }
    assert any_out == {1: 2, 2: 3, 3: 3, 4: 0}
    greedy = {
        r.user_id: r.funnel_stage
        for r in funnel_stages(
            ev, ["view", "click", "purchase"], within=10
        ).collect()
    }
    assert greedy == {1: 2, 2: 2, 3: 3, 4: 0}
    # anymatch dominates greedy pointwise (upper bound)
    assert all(any_out[u] >= greedy[u] for u in greedy)


def test_funnel_anymatch_rejects_duplicate_stages(spark):
    import pytest

    from clickhouse_only_importer_prototype_spark.operators.temporal import (
        funnel_stages_anymatch,
    )

    ev = spark.createDataFrame([(1, "a", 0)], "user_id long, event_type string, ts long")
    with pytest.raises(ValueError, match="distinct"):
        funnel_stages_anymatch(ev, ["a", "a"])


def test_gap_fill_fills_empty_buckets(spark):
    from clickhouse_only_importer_prototype_spark.operators.temporal import (
        gap_fill,
    )

    rows = [
        ("a", 0), ("a", 5), ("a", 35),   # buckets 0, 0, 3 (width 10)
        ("b", 20),                        # single bucket 2
    ]
    ev = spark.createDataFrame(rows, "k string, ts long")
    out = {
        (r.k, r.bucket): r.n_events
        for r in gap_fill(ev, ["k"], bucket_ns=10).collect()
    }
    assert out == {
        ("a", 0): 2, ("a", 1): 0, ("a", 2): 0, ("a", 3): 1,
        ("b", 2): 1,
    }


def test_gap_fill_extra_aggs_null_on_gaps(spark):
    from pyspark.sql import functions as F

    from clickhouse_only_importer_prototype_spark.operators.temporal import (
        gap_fill,
    )

    ev = spark.createDataFrame(
        [("a", 0, 2.0), ("a", 25, 4.0)], "k string, ts long, v double"
    )
    out = {
        r.bucket: (r.n_events, r.v_sum)
        for r in gap_fill(
            ev, ["k"], bucket_ns=10, agg_specs={"v_sum": F.sum("v")}
        ).collect()
    }
    assert out == {0: (1, 2.0), 1: (0, None), 2: (1, 4.0)}


def test_event_ngrams_orders_by_ts_with_tiebreak(spark):
    from clickhouse_only_importer_prototype_spark.operators.temporal import (
        event_ngrams,
    )

    rows = [
        # user 1: b and c share ts=10 -> event_id breaks the tie
        (1, 1, 5, "a"),
        (2, 1, 10, "b"),
        (3, 1, 10, "c"),
        (4, 2, 7, "x"),  # single event: no bigram
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts long, event_type string"
    )
    out = {
        (r.user_id, r.e0, r.e1)
        for r in event_ngrams(ev, n=2).collect()
    }
    assert out == {(1, "a", "b"), (1, "b", "c")}
    tri = [
        (r.e0, r.e1, r.e2) for r in event_ngrams(ev, n=3).collect()
    ]
    assert tri == [("a", "b", "c")]
    import pytest

    with pytest.raises(ValueError):
        event_ngrams(ev, n=1)


def test_gap_fill_rejects_reserved_agg_names(spark):
    from clickhouse_only_importer_prototype_spark.operators.temporal import (
        gap_fill,
    )
    from pyspark.sql import functions as F
    import pytest

    ev = spark.createDataFrame(
        [(1, 10, 1.0)], "k long, ts long, v double"
    )
    for bad in ("n_events", "bucket", "k"):
        with pytest.raises(ValueError):
            gap_fill(ev, ["k"], bucket_ns=10, agg_specs={bad: F.sum("v")})


def test_ohlc_bars_tiebreak_and_prices(spark):
    from clickhouse_only_importer_prototype_spark.operators.temporal import (
        ohlc_bars,
    )

    rows = [
        # bucket 0 (width 100): ts ties at 10 broken by event_id
        (1, 10, 5.0, "a"),
        (2, 10, 7.0, "a"),   # same ts, higher event_id
        (3, 50, 1.0, "a"),
        (4, 99, 4.0, "a"),
        (5, 120, 9.0, "a"),  # bucket 1
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts long, value double, event_type string"
    )
    out = {
        r.bucket: (r.open, r.high, r.low, r.close, r.n_events)
        for r in ohlc_bars(ev, ["event_type"], bucket_ns=100).collect()
    }
    # open = event_id 1 (ts tie -> lower id), close = ts 99
    assert out[0] == (5.0, 7.0, 1.0, 4.0, 4)
    assert out[1] == (9.0, 9.0, 9.0, 9.0, 1)


def test_twap_holds_value_until_next_and_to_bucket_end(spark):
    from clickhouse_only_importer_prototype_spark.operators.temporal import (
        twap,
    )
    from pyspark.sql import functions as F

    rows = [
        (1, 0, 10.0, "a"),    # holds [0, 60)  -> 60 units at 10
        (2, 60, 20.0, "a"),   # holds [60, 100) -> 40 units at 20
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts long, value double, event_type string"
    )
    out = twap(
        ev,
        ["event_type"],
        F.col("value").cast("decimal(14,2)"),
        bucket_ns=100,
    ).collect()
    assert len(out) == 1
    r = out[0]
    # (10*60 + 20*40) / 100 = 14.0, weighted NOT the plain avg 15.0
    assert r.twap == 14.0 and r.dur_ns_total == 100 and r.n_events == 2


def test_cusum_matches_sequential_recurrence(spark):
    """The window linearization must replay the textbook recurrence
    s_t = max(0, s_{t-1} + (x_t - target)) exactly (and its mirror)."""
    from clickhouse_only_importer_prototype_spark.operators.temporal import (
        cusum_drift,
    )
    from pyspark.sql import functions as F

    vals = [5.0, 9.0, 1.0, 9.0, 9.0, 1.0, 1.0, 9.0, 2.0, 3.0]
    rows = [("a", i, i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "event_type: string, ts: long, event_id: long, value: double"
    )
    cents = [round(v * 100) for v in vals]
    target = sum(cents) // len(cents)
    s_pos = s_neg = 0
    max_pos = max_neg = n_pos = n_neg = 0
    thr = 300
    for c in cents:
        s_pos = max(0, s_pos + (c - target))
        s_neg = max(0, s_neg - (c - target))
        max_pos, max_neg = max(max_pos, s_pos), max(max_neg, s_neg)
        n_pos += s_pos > thr
        n_neg += s_neg > thr
    row = cusum_drift(df, threshold_cents=thr).collect()[0]
    assert row["target_cents"] == target
    assert row["max_pos_drift"] == max_pos
    assert row["max_neg_drift"] == max_neg
    assert row["n_pos_alerts"] == n_pos
    assert row["n_neg_alerts"] == n_neg
    assert row["n"] == len(vals)


def test_cusum_keys_independent(spark):
    from clickhouse_only_importer_prototype_spark.operators.temporal import (
        cusum_drift,
    )

    rows = [("a", 0, 0, 1.0), ("a", 1, 1, 3.0), ("b", 0, 2, 10.0)]
    df = spark.createDataFrame(
        rows, "event_type: string, ts: long, event_id: long, value: double"
    )
    got = {r["key"]: r for r in cusum_drift(df).collect()}
    assert set(got) == {"a", "b"}
    assert got["b"]["max_pos_drift"] == 0  # single point: no drift
    assert got["a"]["target_cents"] == (100 + 300) // 2


# ------------------------------------------------- rolling z-score


def test_rolling_zscore_flags_planted_spike(spark):
    # 30 steady hours of x=10 with one x=100 spike at hour 20
    rows = [("m", h, 100 if h == 20 else 10) for h in range(30)]
    df = spark.createDataFrame(rows, "k string, t long, x long")
    got = {
        r.order: r.is_anomaly
        for r in rolling_zscore_flags(
            df, "k", "t", "x", lookback=24, min_n=12, z=3
        ).collect()
    }
    # warm-up: hours 0-11 unscored
    assert set(got) == set(range(12, 30))
    assert got[20] == 1
    # constant-window hours: sigma=0, x=mean -> never flagged
    assert all(v == 0 for h, v in got.items() if h != 20)


def test_rolling_zscore_constant_series_no_flags(spark):
    df = spark.createDataFrame(
        [("m", h, 7) for h in range(20)], "k string, t long, x long"
    )
    out = rolling_zscore_flags(
        df, "k", "t", "x", lookback=24, min_n=5, z=3
    ).collect()
    assert out and all(r.is_anomaly == 0 for r in out)


def test_rolling_zscore_sigma_zero_flags_any_deviation(spark):
    # constant window then a tiny step: sigma=0 so ANY deviation flags
    rows = [("m", h, 10) for h in range(15)] + [("m", 15, 11)]
    df = spark.createDataFrame(rows, "k string, t long, x long")
    got = {
        r.order: r.is_anomaly
        for r in rolling_zscore_flags(
            df, "k", "t", "x", lookback=24, min_n=12, z=3
        ).collect()
    }
    assert got[15] == 1
