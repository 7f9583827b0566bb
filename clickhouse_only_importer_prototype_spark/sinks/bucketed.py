"""Bucketed parquet tables: pre-shuffled storage for co-located joins.

At 100 TB the expensive part of a fact-fact join is the shuffle. Spark
buckets solve it at WRITE time: ``bucketBy(n, key)`` hash-partitions
rows into n files per partition and records the layout in the catalog;
two tables bucketed on the join key with the same bucket count then
sort-merge join with NO Exchange on either side — the shuffle is paid
once at ingest and amortized over every subsequent join/aggregation on
that key (the classic warehouse trick Hive/Spark share). ``sortBy``
additionally pre-orders within buckets, letting the join skip its sort.

The one-shuffle-per-query savings compound for the importer's
mutation↔mutation_event FK co-generation and any star-join pipeline
run repeatedly over the same keys. Bucket pruning also kicks in for
equality predicates on the bucket key (scan n-th of the files).

Bucketed layout requires the table catalog (``saveAsTable``): plain
``.parquet(path)`` files carry no bucket metadata. Pass ``path`` to
keep the data external at a chosen location; the catalog entry then
just points at it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    buckets: int,
    keys: list[str],
    sort_keys: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (and within-bucket sorted) parquet
    table registered as ``table`` in the session catalog."""
    writer = (
        df.write.format("parquet").mode(mode).bucketBy(buckets, *keys)
    )
    writer = writer.sortBy(*(sort_keys or keys))
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back WITH its bucket metadata (must go
    through the catalog — a raw parquet read of the same files would
    lose the layout and reintroduce the shuffle)."""
    return spark.table(table)
