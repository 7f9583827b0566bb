"""Focused pins for localframe.arrow_local_df (round-11 optimization):
the Arrow local relation must be a drop-in for createDataFrame(list) —
exact schema (incl. TIMESTAMP_NTZ), exact values (incl. NULL-bearing
int64 at the 2^63-8 edge pandas would destroy), and a working fallback
for types the Arrow converter rejects."""

from __future__ import annotations

import datetime

from pyspark.sql.types import StructType

from clickhouse_only_importer_prototype_spark.localframe import arrow_local_df


def test_schema_and_values_match_classic_path(spark):
    dt = datetime.datetime(2024, 2, 29, 23, 59, 25, 261702)
    rows = [
        (-1, dt, -1, "view", 0.0, None),
        (2**63 - 8, dt, None, "click", None, "x\\N"),
    ]
    ddl = (
        "event_id long, ts timestamp_ntz, user_id long,"
        " event_type string, value double, props string"
    )
    got = arrow_local_df(spark, rows, ddl)
    ref = spark.createDataFrame(rows, ddl)
    assert got.schema == ref.schema  # NTZ stays NTZ, longs stay longs
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, ref.collect())
    )
    # the big-int edge survives exactly (pandas would float64 it)
    vals = {r["event_id"] for r in got.collect()}
    assert 2**63 - 8 in vals


def test_no_python_stage_in_plan(spark):
    df = arrow_local_df(spark, [(1, "a"), (2, None)], "k long, s string")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" not in plan
    assert "BatchEvalPython" not in plan


def test_structtype_schema_and_row_objects(spark):
    src = spark.range(3).selectExpr("id", "cast(id as string) s")
    rebuilt = arrow_local_df(spark, src.collect(), src.schema)
    assert rebuilt.schema == src.schema
    assert sorted(map(tuple, rebuilt.collect())) == sorted(
        map(tuple, src.collect())
    )


def test_empty_rows(spark):
    df = arrow_local_df(spark, [], "a long, b string")
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == ["a", "b"]


def test_fallback_on_unconvertible_rows(spark):
    # a value Arrow cannot coerce to the declared type must fall back
    # to the classic path rather than surface a pyarrow error: any
    # exception out of the helper has to be Spark's own type rejection
    schema = StructType.fromDDL("a long, b string")
    rows = [(1, {"not": "a string"})]
    try:
        df = arrow_local_df(spark, rows, schema)
    except Exception as exc:
        assert "pyarrow" not in type(exc).__module__
        return
    assert df.schema == schema
