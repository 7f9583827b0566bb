"""Streaming MERGE sink: apply a CDC change stream to a parquet
target via ``foreachBatch`` — the production streaming-lakehouse
pattern (Kafka/Debezium feed -> continuously-merged dimension table).

Structured Streaming's native sinks are append-shaped; MERGE needs a
read-modify-write per micro-batch, which is exactly what foreachBatch
is for: each batch runs the SAME batch operator
(operators/cdc.merge_changes — max_by collapse + one co-partitioned
full-outer join) against the current target, so stream and batch
agree on MERGE semantics by construction.

Exactly-once story: the checkpoint makes batch DELIVERY
at-least-once; idempotence must come from the write. Here each batch
rewrites the target to a fresh versioned directory and flips a
manifest pointer LAST (parquet has no atomic overwrite; a crash
between write and flip leaves the old version live, and a replayed
batch simply regenerates the version — a Delta/Iceberg table would
get this from its transaction log; this is the minimal parquet-native
equivalent of their commit protocol).

Scale: the per-batch merge is one shuffle on the merge keys, sized by
|target| + |batch|. For 100 TB targets, partition the target on a
key prefix and merge only affected partitions (dynamic partition
overwrite) — noted where it applies; the semantics here are the
contract.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from clickhouse_only_importer_prototype_spark.operators import cdc as cdc_ops

_MANIFEST = "_CURRENT"


def current_version_path(target_dir: str) -> str | None:
    """Path of the live snapshot, or None before the first commit."""
    manifest = os.path.join(target_dir, _MANIFEST)
    if not os.path.exists(manifest):
        return None
    with open(manifest, encoding="utf-8") as fh:
        name = fh.read().strip()
    return os.path.join(target_dir, name) if name else None


def read_target(spark: SparkSession, target_dir: str) -> DataFrame | None:
    path = current_version_path(target_dir)
    return spark.read.parquet(path) if path else None


def _commit(df: DataFrame, target_dir: str, batch_id: int) -> None:
    version = f"v{batch_id:020d}"
    out = os.path.join(target_dir, version)
    df.write.mode("overwrite").parquet(out)
    tmp = os.path.join(target_dir, f"{_MANIFEST}.tmp.{batch_id}")
    with open(tmp, "w", encoding="utf-8") as fh:
        fh.write(version)
    os.replace(tmp, os.path.join(target_dir, _MANIFEST))  # atomic flip


def merge_sink(
    changes: DataFrame,
    target_dir: str,
    base: DataFrame,
    key_cols: list[str],
    seq_col: str = "seq",
    op_col: str = "op",
    checkpoint_dir: str | None = None,
    query_name: str = "merge_sink",
):
    """Start a foreachBatch query merging ``changes`` (streaming, with
    ``op_col``/``seq_col`` CDC markers) into a versioned parquet target
    seeded from ``base``. Returns the StreamingQuery handle.

    A replayed micro-batch (restart after crash, before its commit
    flipped the manifest) re-merges against the pre-batch snapshot and
    regenerates the identical version — idempotent by construction
    since merge_changes is deterministic.
    """
    os.makedirs(target_dir, exist_ok=True)

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        target = read_target(spark, target_dir)
        if target is None:
            target = base
        merged = cdc_ops.merge_changes(
            target, batch_df, key_cols, seq_col=seq_col, op_col=op_col
        )
        # the merge plan lazily references the CURRENT manifest; commit
        # writes a NEW version directory, so the read and write never
        # collide (the reason plain overwrite-in-place is unsafe here)
        _commit(merged, target_dir, batch_id)

    writer = (
        changes.writeStream.foreachBatch(_apply)
        .queryName(query_name)
        .trigger(availableNow=True)
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
