"""TSV sources: CNA wide matrix and mutation MAF readers.

Spark-first restatement of the reference's Arrow CSV scans:
  * CNA (cna/reader.go:15-55): tab-separated, header row, every column
    string. Spark's csv reader with header=True and no inferSchema is
    semantically identical to the reference's header-only schema
    inference — and distributes the scan.
  * MAF (mutation/reader.go:15-69): same plus leading ``#`` comment
    lines skipped before the header — ``option("comment", "#")``.

The reference chunks 100 rows/batch through Go channels
(cna/transformer.go:316); Spark's columnar batching supersedes that —
scan tasks are split by ``spark.sql.files.maxPartitionBytes`` so a
100 TB input becomes ~800k well-sized parallel tasks with no code here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from clickhouse_only_importer_prototype_spark.schemas import (
    MAF_READ_OPTIONS,
    TSV_READ_OPTIONS,
)


def read_cna_matrix(spark: SparkSession, path: str) -> DataFrame:
    """Read a wide CNA matrix TSV; all columns string, header names kept.

    Column contract (cna/transformer.go:496-503): position 0 = gene
    symbol, 1 = entrez id, 2..N = one column per sample, in file order.
    Spark preserves header order in ``df.columns`` — the ordering
    contract costs nothing.
    """
    return spark.read.options(**TSV_READ_OPTIONS).csv(path)


def read_maf(spark: SparkSession, path: str | list[str]) -> DataFrame:
    """Read mutation MAF TSV(s); leading '#' comments skipped natively."""
    paths = [path] if isinstance(path, str) else list(path)
    return spark.read.options(**MAF_READ_OPTIONS).csv(paths)
