"""Streaming exact dedup (streaming/dedup.py): cross-micro-batch
suppression, agreement with the batch fingerprint."""

from __future__ import annotations

import time

import pandas as pd
from pyspark.sql.types import LongType, StringType, StructField, StructType

from clickhouse_only_importer_prototype_spark.streaming import dedup as sdd

DOC_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), True),
        StructField("text", StringType(), True),
    ]
)


def _write(spark, path, rows):
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    spark.createDataFrame(pdf).coalesce(1).write.parquet(str(path))


def test_dedup_stream_across_batches(spark, tmp_path):
    src = tmp_path / "docs"
    src.mkdir()
    # batch 1: two distinct texts + an in-batch dup (whitespace/case
    # variants normalize to the same fingerprint)
    _write(spark, src / "b1", [(0, "Hello  World"), (1, "hello world"), (2, "other text")])
    time.sleep(1.1)
    # batch 2: a cross-batch dup and a genuinely new doc
    _write(spark, src / "b2", [(3, "HELLO WORLD"), (4, "brand new doc")])

    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    out = sdd.dedup_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("dd_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination()
    kept = {r.doc_id for r in spark.sql("select * from dd_test").collect()}
    # one survivor per distinct normalized text; 0-or-1 from the first
    # batch's dup pair, never the cross-batch copy (doc 3)
    assert 3 not in kept
    assert 2 in kept and 4 in kept
    assert len(kept & {0, 1}) == 1
    assert len(kept) == 3


def test_dedup_stream_matches_batch_fingerprints(spark, sf_dir, tmp_path):
    """Streamed over the real documents table in one batch, the
    survivor count equals the batch operator's distinct-text count."""
    from clickhouse_only_importer_prototype_spark.operators.dedup import (
        exact_duplicates,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    n_distinct = exact_duplicates(docs).count()
    src = tmp_path / "docs_dir"
    src.mkdir()
    import os

    os.symlink(f"{sf_dir}/documents.parquet", src / "documents.parquet")
    stream = spark.readStream.schema(docs.schema).parquet(str(src))
    out = sdd.dedup_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("dd_full")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    q.awaitTermination()
    assert spark.sql("select count(*) from dd_full").first()[0] == n_distinct


def test_restart_from_checkpoint_exactly_once_with_state(spark, tmp_path):
    """The recovery contract at 100 TB: stop a stateful query, restart
    it from the SAME checkpoint, and (a) already-committed input is not
    reprocessed into the sink (file-source offsets + file-sink
    _spark_metadata = end-to-end exactly-once), (b) the dedup state
    SURVIVES the restart — a post-restart duplicate of a pre-restart
    text is still suppressed."""
    src = tmp_path / "docs"
    src.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        stream = (
            spark.readStream.schema(DOC_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "*"))
        )
        q = (
            sdd.dedup_stream(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    _write(spark, src / "b1", [(0, "alpha text"), (1, "beta text")])
    run_once()  # run 1: commits b1, state = {alpha, beta}
    first = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert first == {0, 1}

    # between runs: a cross-restart duplicate + a genuinely new doc
    _write(spark, src / "b2", [(2, "ALPHA   TEXT"), (3, "gamma text")])
    run_once()  # run 2: restart from the same checkpoint

    rows = spark.read.parquet(out).collect()
    ids = sorted(r.doc_id for r in rows)
    # no b1 reprocessing (0/1 appear exactly once), dup 2 suppressed by
    # restored state, new doc 3 admitted
    assert ids == [0, 1, 3]
