"""Streaming MERGE sink (streaming/upsert.py): per-micro-batch CDC
merge into a versioned parquet target must converge to the batch
MERGE of the full change set, survive restarts, and keep the manifest
flip atomic."""

from __future__ import annotations

import time

import pandas as pd
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from clickhouse_only_importer_prototype_spark.operators import cdc as cdc_ops
from clickhouse_only_importer_prototype_spark.streaming import upsert as su

CHANGE_SCHEMA = StructType(
    [
        StructField("k", LongType(), True),
        StructField("val", DoubleType(), True),
        StructField("op", StringType(), True),
        StructField("seq", LongType(), True),
    ]
)


def _write(spark, path, rows):
    pdf = pd.DataFrame(rows, columns=["k", "val", "op", "seq"])
    spark.createDataFrame(pdf, CHANGE_SCHEMA).coalesce(1).write.parquet(
        str(path)
    )


def _base(spark):
    return spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "k: long, val: double"
    )


def test_stream_merge_converges_to_batch_merge(spark, tmp_path):
    src = tmp_path / "changes"
    src.mkdir()
    b1 = [(1, 11.0, "U", 1), (4, 40.0, "I", 2)]
    b2 = [(2, 0.0, "D", 3), (4, 44.0, "U", 4)]
    _write(spark, src / "b1", b1)
    time.sleep(1.1)
    _write(spark, src / "b2", b2)

    stream = (
        spark.readStream.schema(CHANGE_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = su.merge_sink(
        stream,
        str(tmp_path / "target"),
        _base(spark),
        ["k"],
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination()

    got = {
        r["k"]: r["val"]
        for r in su.read_target(spark, str(tmp_path / "target")).collect()
    }
    all_changes = spark.createDataFrame(pd.DataFrame(b1 + b2, columns=["k", "val", "op", "seq"]), CHANGE_SCHEMA)
    want = {
        r["k"]: r["val"]
        for r in cdc_ops.merge_changes(
            _base(spark), all_changes, ["k"]
        ).collect()
    }
    assert got == want == {1: 11.0, 3: 30.0, 4: 44.0}


def test_stream_merge_restart_applies_only_new_batches(spark, tmp_path):
    src = tmp_path / "changes"
    src.mkdir()
    target = str(tmp_path / "target")
    ckpt = str(tmp_path / "ckpt")

    def run():
        stream = (
            spark.readStream.schema(CHANGE_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "*"))
        )
        su.merge_sink(
            stream, target, _base(spark), ["k"], checkpoint_dir=ckpt
        ).awaitTermination()

    _write(spark, src / "b1", [(1, 99.0, "U", 1)])
    run()
    v1 = {r["k"]: r["val"] for r in su.read_target(spark, target).collect()}
    assert v1 == {1: 99.0, 2: 20.0, 3: 30.0}

    # delete arrives after the first run committed; restart must merge
    # it against the COMMITTED snapshot (not re-seed from base, which
    # would lose the first update)
    _write(spark, src / "b2", [(3, 0.0, "D", 2)])
    run()
    v2 = {r["k"]: r["val"] for r in su.read_target(spark, target).collect()}
    assert v2 == {1: 99.0, 2: 20.0}


def test_manifest_points_at_latest_version_only(spark, tmp_path):
    src = tmp_path / "changes"
    src.mkdir()
    target = str(tmp_path / "target")
    _write(spark, src / "b1", [(1, 1.0, "U", 1)])
    time.sleep(1.1)
    _write(spark, src / "b2", [(1, 2.0, "U", 2)])
    stream = (
        spark.readStream.schema(CHANGE_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    su.merge_sink(
        stream,
        target,
        _base(spark),
        ["k"],
        checkpoint_dir=str(tmp_path / "ckpt"),
    ).awaitTermination()
    live = su.current_version_path(target)
    assert live is not None and live.endswith("v" + "0" * 19 + "1")
    got = {r["k"]: r["val"] for r in su.read_target(spark, target).collect()}
    assert got[1] == 2.0  # later version wins; v0 still on disk (history)
