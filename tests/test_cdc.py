"""CDC merge (operators/cdc.merge_changes) and SCD2 history
(operators/cdc.scd2_history) semantics on hand fixtures."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from clickhouse_only_importer_prototype_spark.operators import cdc


def _base(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, name string, val double",
    )


def test_merge_upsert_delete_and_insert(spark):
    changes = spark.createDataFrame(
        [
            (2, "U", 1, "b2", 21.0),   # update existing
            (3, "D", 1, None, None),   # delete existing
            (4, "I", 1, "d", 40.0),    # insert new
            (5, "U", 1, "e", 50.0),    # tolerant upsert: U on missing key
        ],
        "k long, op string, seq long, name string, val double",
    )
    out = {
        r.k: (r.name, r.val)
        for r in cdc.merge_changes(_base(spark), changes, ["k"]).collect()
    }
    assert out == {
        1: ("a", 10.0),
        2: ("b2", 21.0),
        4: ("d", 40.0),
        5: ("e", 50.0),
    }


def test_merge_latest_seq_wins_and_delete_of_missing_is_noop(spark):
    changes = spark.createDataFrame(
        [
            (2, "U", 1, "first", 1.0),
            (2, "U", 3, "third", 3.0),
            (2, "U", 2, "second", 2.0),
            (9, "D", 1, None, None),  # delete of a key the base lacks
        ],
        "k long, op string, seq long, name string, val double",
    )
    out = {
        r.k: r.name
        for r in cdc.merge_changes(_base(spark), changes, ["k"]).collect()
    }
    assert out == {1: "a", 2: "third", 3: "c"}
    assert 9 not in out


def test_merge_output_schema_is_base_schema(spark):
    changes = spark.createDataFrame(
        [(1, "U", 1, "a2", 11.0)],
        "k long, op string, seq long, name string, val double",
    )
    out = cdc.merge_changes(_base(spark), changes, ["k"])
    assert out.columns == ["k", "name", "val"]


def test_merge_missing_payload_column_raises(spark):
    changes = spark.createDataFrame(
        [(1, "U", 1, "a2")], "k long, op string, seq long, name string"
    )
    with pytest.raises(ValueError, match="missing base columns"):
        cdc.merge_changes(_base(spark), changes, ["k"])


def test_merge_plan_single_join_no_cartesian(spark):
    changes = spark.createDataFrame(
        [(1, "U", 1, "a2", 11.0)],
        "k long, op string, seq long, name string, val double",
    )
    plan = (
        cdc.merge_changes(_base(spark), changes, ["k"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Cartesian" not in plan


def test_snapshot_diff_classifies_all_statuses(spark):
    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")], "k long, v string"
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B"), (4, "d"), (5, "e")], "k long, v string"
    )
    out = {r.status: r.n_keys for r in cdc.snapshot_diff(old, new, ["k"]).collect()}
    assert out == {"unchanged": 2, "changed": 1, "removed": 1, "added": 1}


def test_snapshot_diff_null_values_compare_null_safely(spark):
    old = spark.createDataFrame([(1, None), (2, None)], "k long, v string")
    new = spark.createDataFrame([(1, None), (2, "x")], "k long, v string")
    out = {r.status: r.n_keys for r in cdc.snapshot_diff(old, new, ["k"]).collect()}
    assert out == {"unchanged": 1, "changed": 1}


def test_snapshot_diff_surfaces_duplicate_keys(spark):
    # a MERGE that accidentally duplicates a row must NOT audit clean
    old = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    new = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "b")], "k long, v string"
    )
    out = {r.status: r.n_keys for r in cdc.snapshot_diff(old, new, ["k"]).collect()}
    assert out == {"dup_key": 1, "unchanged": 1}


def test_snapshot_diff_rejects_schema_mismatch(spark):
    old = spark.createDataFrame([(1, "a")], "k long, v string")
    new = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="differ in columns"):
        cdc.snapshot_diff(old, new, ["k"])


def test_snapshot_diff_agrees_with_merge_change_set(spark):
    base = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 11)], "k long, v double"
    )
    changes = spark.createDataFrame(
        [(11, "I", 1, 11.0), (3, "U", 1, 33.0), (7, "D", 1, None)],
        "k long, op string, seq long, v double",
    )
    merged = cdc.merge_changes(base, changes, ["k"])
    out = {
        r.status: r.n_keys
        for r in cdc.snapshot_diff(base, merged, ["k"]).collect()
    }
    assert out == {"unchanged": 8, "changed": 1, "removed": 1, "added": 1}


def _ts(day: int):
    return dt.datetime(2024, 1, day)


def test_scd2_collapses_runs_and_chains_ranges(spark):
    log = spark.createDataFrame(
        [
            (1, "LOW", _ts(1), 10),
            (1, "LOW", _ts(2), 11),    # unchanged -> same version
            (1, "HIGH", _ts(3), 12),   # change -> version 2
            (1, "HIGH", _ts(4), 13),
            (1, "LOW", _ts(5), 14),    # back -> version 3 (not merged w/ v1)
            (2, "MED", _ts(2), 20),    # single-version key
        ],
        "k long, attr string, ts timestamp, tb long",
    )
    rows = sorted(
        cdc.scd2_history(log, "k", "attr", "ts", "tb").collect(),
        key=lambda r: (r.k, r.version),
    )
    got = [
        (r.k, r.attr, r.eff_from, r.eff_to, r.version, r.is_current)
        for r in rows
    ]
    high = dt.datetime(2261, 12, 31)
    assert got == [
        (1, "LOW", _ts(1), _ts(3), 1, 0),
        (1, "HIGH", _ts(3), _ts(5), 2, 0),
        (1, "LOW", _ts(5), high, 3, 1),
        (2, "MED", _ts(2), high, 1, 1),
    ]


def test_merge_rejects_base_column_named_op_or_seq(spark):
    base = spark.createDataFrame([(1, "x", 1)], "k long, op string, seq long")
    changes = spark.createDataFrame(
        [(1, "U", 1, "y", 2)], "k long, op string, seq long, name string, v long"
    )
    with pytest.raises(ValueError, match="collide with CDC marker"):
        cdc.merge_changes(base, changes, ["k"])


def test_scd2_null_attribute_is_a_real_version(spark):
    # A -> NULL -> A must yield three versions, incl. a NULL one; a
    # NULL-attr FIRST observation must not vanish either
    log = spark.createDataFrame(
        [
            (1, "A", _ts(1), 10),
            (1, None, _ts(2), 11),
            (1, "A", _ts(3), 12),
            (2, None, _ts(1), 20),
        ],
        "k long, attr string, ts timestamp, tb long",
    )
    rows = sorted(
        cdc.scd2_history(log, "k", "attr", "ts", "tb").collect(),
        key=lambda r: (r.k, r.version),
    )
    assert [(r.k, r.attr, r.version) for r in rows] == [
        (1, "A", 1),
        (1, None, 2),
        (1, "A", 3),
        (2, None, 1),
    ]
    assert rows[1].eff_from == _ts(2) and rows[1].eff_to == _ts(3)


def test_scd2_tiebreak_orders_same_timestamp_changes(spark):
    # two changes at the same ts: tiebreak column decides run order
    log = spark.createDataFrame(
        [(1, "A", _ts(1), 2), (1, "B", _ts(1), 1)],
        "k long, attr string, ts timestamp, tb long",
    )
    rows = sorted(
        cdc.scd2_history(log, "k", "attr", "ts", "tb").collect(),
        key=lambda r: r.version,
    )
    assert [r.attr for r in rows] == ["B", "A"]
    assert rows[0].is_current == 0 and rows[1].is_current == 1


def test_scd2_versions_cover_log_span_gaplessly(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    hist = cdc.scd2_history(
        o, "o_custkey", "o_orderpriority", "o_orderdate", "o_orderkey"
    )
    # half-open ranges chain: next version's eff_from == prior eff_to
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy("version")
    bad = (
        hist.withColumn("next_from", F.lead("eff_from").over(w))
        .where(
            F.col("next_from").isNotNull()
            & (F.col("next_from") != F.col("eff_to"))
        )
        .count()
    )
    assert bad == 0
    # exactly one current version per key
    cur = hist.groupBy("o_custkey").agg(
        F.sum("is_current").alias("n")
    )
    assert cur.where(F.col("n") != 1).count() == 0


def test_scd2_long_ts_requires_integer_sentinel(spark):
    log = spark.createDataFrame(
        [(1, "a", 10, 1), (1, "b", 20, 2)],
        "k long, attr string, ts long, tb long",
    )
    # string sentinel over a long ts column would cast to NULL and
    # mislabel every current row: refused loudly
    with pytest.raises(TypeError, match="integer high_ts"):
        cdc.scd2_history(log, "k", "attr", "ts", "tb")
    hist = {
        (r.version): (r.eff_from, r.eff_to, r.is_current)
        for r in cdc.scd2_history(
            log, "k", "attr", "ts", "tb", high_ts=9_000_000_000_000_000_000
        ).collect()
    }
    assert hist[1] == (10, 20, 0)
    assert hist[2] == (20, 9_000_000_000_000_000_000, 1)


def test_scd2_timestamp_ts_rejects_integer_sentinel(spark):
    log = spark.createDataFrame(
        [(1, "a", dt.datetime(2020, 1, 1), 1)],
        "k long, attr string, ts timestamp, tb long",
    )
    with pytest.raises(TypeError, match="string high_ts"):
        cdc.scd2_history(log, "k", "attr", "ts", "tb", high_ts=5)


def test_scd2_accepts_iso_string_ts(spark):
    """ISO-8601 string ts columns order lexicographically-
    chronologically and the string sentinel casts as identity — a
    formerly working input class the integral-sentinel guard must not
    reject."""
    from clickhouse_only_importer_prototype_spark.operators.cdc import (
        scd2_history,
    )

    log = spark.createDataFrame(
        [
            (1, "a", "2020-01-01", 0),
            (1, "b", "2020-01-03", 1),
            (2, "x", "2020-01-02", 2),
        ],
        "k long, attr string, ts string, seq long",
    )
    out = {
        (r.k, r.attr): (r.eff_from, r.eff_to, r.is_current)
        for r in scd2_history(
            log,
            key_col="k",
            attr_col="attr",
            ts_col="ts",
            tiebreak_col="seq",
            high_ts="2261-12-31",
        ).collect()
    }
    assert out[(1, "a")] == ("2020-01-01", "2020-01-03", 0)
    assert out[(1, "b")] == ("2020-01-03", "2261-12-31", 1)
    assert out[(2, "x")] == ("2020-01-02", "2261-12-31", 1)
