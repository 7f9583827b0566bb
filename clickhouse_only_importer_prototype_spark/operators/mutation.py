"""Mutation operators: by-name projection with "" fallback, the two
table builders, and the gapless surrogate-key assigner.

Reference semantics (mutation/transformer.go):
  * ``getFieldValue`` — column looked up by name, absent column -> ""
    (:311-325). Spark restatement: ``col if present else lit("")``,
    resolved at plan time (schema is known), so the fallback constant-
    folds — no per-row cost.
  * ``mutation_event`` / ``mutation`` — fixed projections (:348-407),
    co-generated from the same scan sharing MUTATION_EVENT_ID.
  * MUTATION_EVENT_ID — int64, starts at ``start``, dense/gapless,
    incremented per MAF row, threaded across files (:30-52, :410).

Scale design for the surrogate key (SURVEY §7.5.1): a naive global
``row_number()`` funnels 100 TB through one partition. Instead:
two-pass prefix-sum — (1) count rows per file (an aggregate over
file-name, metadata-sized result), (2) ``row_number() OVER
(PARTITION BY file ORDER BY scan_order)`` plus the file's broadcast
offset. The only shuffle is the per-file window partition, parallel
across files. The reference's own file order is nondeterministic (Go
map iteration, cmd/cli/main.go:309,496); we define sorted-path order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from clickhouse_only_importer_prototype_spark.functions import ns, underscore_join
from clickhouse_only_importer_prototype_spark.schemas import (
    MUTATION_COLUMNS,
    MUTATION_EVENT_COLUMNS,
)

_FILE = "__file"
_SCAN_ORDER = "__scan_order"
EVENT_ID = "MUTATION_EVENT_ID"


def field_or_empty(df: DataFrame, name: str) -> F.Column:
    """By-name projection with "" default (getFieldValue parity, P1)."""
    if name is not None and name in df.columns:
        return ns(F.col(name))
    return F.lit("")


def with_sequential_ids(df: DataFrame, start: int = 0) -> DataFrame:
    """Assign dense, gapless int64 ids in (file, scan-order) order.

    Two-pass prefix-sum (see module docstring), partition-parallel
    WITHIN each file: ``__mid`` (monotonically_increasing_id) encodes
    ``partition_id << 33 + row_offset``, so ordering by ``__mid``
    within a file is identical to ordering by (scan partition, row
    offset). Ranking therefore partitions the window by (file, scan
    partition) — a single 100 GB MAF ranks across all its scan splits
    in parallel instead of funneling through one task — and the driver
    prefix-sums per-(file, partition) counts (metadata-scale: one row
    per scan split) in (sorted path, partition) order, which yields
    byte-identical ids to a per-file global rank.

    ASSUMPTION (load-bearing): ``__pid``/``__mid`` are identical across
    the counts pass and the rank pass. True when both evaluate the same
    plan over unchanged files — FilePartition packing is a stable sort
    of splits — but a scan-conf change between the passes (AQE
    coalesce, ``spark.sql.files.maxPartitionBytes``) would repartition
    the second scan. Rather than silently permuting ids, the rank pass
    re-checks every (file, partition) row count against the broadcast
    expectation and raises mid-plan on any drift.
    """
    spark = df.sparkSession
    tagged = (
        df.withColumn(_FILE, F.input_file_name())
        .withColumn("__pid", F.spark_partition_id())
        .withColumn("__mid", F.monotonically_increasing_id())
    )
    # no persist: per-(file, partition) counts are recompute-invariant
    # and __pid/__mid are stable for an identical plan over identical
    # files (same FilePartition packing), so the counts pass and the
    # ranking pass can each evaluate the scan — a pinned full-MAF cache
    # per file would leak for the session lifetime
    counts = tagged.groupBy(_FILE, "__pid").count().collect()
    offsets, acc = [], start
    for row in sorted(counts, key=lambda r: (r[_FILE], r["__pid"])):
        offsets.append((row[_FILE], row["__pid"], acc, row["count"]))
        acc += row["count"]
    offsets_df = spark.createDataFrame(
        offsets, f"{_FILE} string, __pid int, __offset long, __expect long"
    )
    w = Window.partitionBy(_FILE, "__pid").orderBy("__mid")
    # same partition keys as `w`: shares its exchange, adds no shuffle
    w_full = Window.partitionBy(_FILE, "__pid")
    # left join so a partition the counts pass never saw surfaces as a
    # null expectation (raise) instead of vanishing through an inner join
    guard_ok = F.col("__expect").isNotNull() & (
        F.count("*").over(w_full) == F.col("__expect")
    )
    out = (
        tagged.join(F.broadcast(offsets_df), [_FILE, "__pid"], "left")
        .withColumn(
            EVENT_ID,
            F.when(
                guard_ok,
                F.row_number().over(w) - F.lit(1) + F.col("__offset"),
            )
            .otherwise(
                F.raise_error(
                    F.concat_ws(
                        " ",
                        F.lit(
                            "with_sequential_ids: FilePartition packing"
                            " drifted between the counts pass and the"
                            " rank pass for"
                        ),
                        F.col(_FILE),
                        F.lit("pid"),
                        F.col("__pid").cast("string"),
                    )
                ).cast("long")
            )
            .cast("long"),
        )
        .drop(_FILE, "__pid", "__mid", "__offset", "__expect")
    )
    return out


def next_event_id(df_with_ids: DataFrame, start: int = 0) -> int:
    """Final id + 1, for threading into a subsequent run
    (mutation/transformer.go:131,167-169). An empty file returns
    ``start`` unchanged — returning 0 would reset the cross-file
    counter and duplicate ids for every later file."""
    row = df_with_ids.agg(F.max(EVENT_ID).alias("m")).first()
    return (row["m"] + 1) if row["m"] is not None else start


def mutation_event(df: DataFrame) -> DataFrame:
    """MAF -> mutation_event projection (mutation/transformer.go:348-371).

    ``df`` must already carry MUTATION_EVENT_ID. Absent MAF columns and
    the 7 reserved columns become "" (constant-folded by Catalyst).
    """
    cols = [F.col(EVENT_ID)]
    for out_name, src in MUTATION_EVENT_COLUMNS:
        expr = field_or_empty(df, src) if src else F.lit("")
        cols.append(expr.alias(out_name))
    return df.select(*cols)


def mutation(df: DataFrame, study: str, profile: str) -> DataFrame:
    """MAF -> mutation projection (mutation/transformer.go:373-407).

    SAMPLE_ID = ``<study>_<Tumor_Sample_Barcode>`` (:377-380);
    GENETIC_PROFILE_ID is the profile literal; ANNOTATION_JSON "".
    """
    cols = [
        F.col(EVENT_ID),
        F.lit(profile).alias("GENETIC_PROFILE_ID"),
        underscore_join(study, field_or_empty(df, "Tumor_Sample_Barcode")).alias(
            "SAMPLE_ID"
        ),
    ]
    for out_name, src in MUTATION_COLUMNS:
        expr = field_or_empty(df, src) if src else F.lit("")
        cols.append(expr.alias(out_name))
    return df.select(*cols)
