"""Physical-layout planning: z-order (Morton) clustering, zone-map
file-skipping audits, small-file compaction plans, join-key skew
audits.

The reference's only layout decision is "one parquet file per (study,
table)" (cna/transformer.go:266-297); at 100 TB layout IS the query
optimizer's raw material — which files a predicate can skip (parquet
footer min/max), whether small files drown the scan in open costs,
and whether a join key's distribution will strangle a shuffle. These
operators plan and audit that layout *from metadata-scale inputs*
(file manifests, zone maps, per-key counts) — none of them rewrites
data.

Scale shapes:

* z-values and grid cells are pure row-local projections (bit ops in
  whole-stage codegen). Clustering a real table = write with
  ``repartitionByRange(zvalue)``; file ids here are the top z-bits —
  the canonical quad-tree tiling — so layout simulation needs no sort
  at all.
* zone maps are one groupBy over (file) — map-side partial min/max.
* the skipping audit joins per-file zone maps (thousands of rows at
  100 TB) against a broadcast predicate workload — metadata × tiny.
* compaction planning is a prefix-sum window partitioned by directory
  over the file manifest — metadata-scale, embarrassingly parallel
  across directories.
* the skew audit folds per-key counts with map-side combine, then
  aggregates the count distribution — the diagnosis that decides
  between plain shuffle, AQE skew-split, and salting
  (functions.salted_join).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window, functions as F


def grid_cell(v: Column, lo: Column, hi: Column, cells: int) -> Column:
    """Affine map of ``v`` from [lo, hi] onto integer cells
    0..cells-1. Float expression order is fixed — (v - lo) * cells,
    then / span — so an engine mirroring it (see ``grid_cell_sql``)
    computes bit-identical doubles. A degenerate dimension (hi == lo)
    maps to cell 0 instead of dividing by zero (ANSI mode would
    otherwise kill the job on a constant column)."""
    span = hi.cast("double") - lo.cast("double")
    raw = F.when(span == 0, F.lit(0)).otherwise(
        F.floor(
            (v.cast("double") - lo.cast("double")) * F.lit(float(cells)) / span
        )
    )
    return F.least(F.greatest(raw, F.lit(0)), F.lit(cells - 1)).cast("long")


def grid_cell_sql(v: str, lo: str, hi: str, cells: int) -> str:
    """DuckDB twin of ``grid_cell`` — identical operation order and
    the same degenerate-span guard."""
    span = f"(CAST({hi} AS DOUBLE) - CAST({lo} AS DOUBLE))"
    raw = (
        f"CASE WHEN {span} = 0 THEN 0 ELSE "
        f"floor((CAST({v} AS DOUBLE) - CAST({lo} AS DOUBLE)) * {float(cells)} / {span}) END"
    )
    return f"CAST(least(greatest({raw}, 0), {cells - 1}) AS BIGINT)"


def interleave_bits(cx: Column, cy: Column, bits: int) -> Column:
    """Morton z-value of two grid cells: bit i of x -> bit 2i, bit i
    of y -> bit 2i+1. Linear-size expression, pure JVM."""
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(cx, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(F.shiftleft(F.shiftright(cy, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    return reduce(lambda a, b: a + b, terms).cast("long")


def interleave_bits_sql(cx: str, cy: str, bits: int) -> str:
    """DuckDB twin of ``interleave_bits``."""
    terms = []
    for i in range(bits):
        terms.append(f"((({cx} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({cy} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def zone_map(df: DataFrame, file_col: str, dims: list[str]) -> DataFrame:
    """Per-file min/max/rowcount over ``dims`` — the parquet-footer
    zone map a skipping planner consumes, one partial-agg groupBy."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for d in dims:
        aggs.append(F.min(d).alias(f"min_{d}"))
        aggs.append(F.max(d).alias(f"max_{d}"))
    return df.groupBy(F.col(file_col).alias("file_id")).agg(*aggs)


def skipping_audit(
    zones: DataFrame,
    preds: DataFrame,
    dims: list[str],
) -> DataFrame:
    """Which files would each rectangular predicate scan?

    ``zones``: output of ``zone_map``. ``preds``: one row per
    predicate with columns (pred_id, lo_<dim>, hi_<dim>). A file is
    scanned iff every dimension's [min,max] intersects the
    predicate's [lo,hi] — exactly parquet row-group pruning.

    Returns (pred_id, files_scanned, rows_scanned, files_total,
    rows_total).
    """
    overlap = reduce(
        lambda a, b: a & b,
        [
            (F.col(f"min_{d}") <= F.col(f"hi_{d}"))
            & (F.col(f"max_{d}") >= F.col(f"lo_{d}"))
            for d in dims
        ],
    )
    joined = zones.crossJoin(F.broadcast(preds))
    hit = overlap.cast("long")
    return joined.groupBy("pred_id").agg(
        F.sum(hit).alias("files_scanned"),
        F.sum(F.col("n_rows") * hit).alias("rows_scanned"),
        F.count(F.lit(1)).alias("files_total"),
        F.sum("n_rows").alias("rows_total"),
    )


def compaction_plan(
    inventory: DataFrame,
    part_col: str,
    size_col: str,
    order_col: str,
    target_bytes: int,
) -> DataFrame:
    """Group small files into target-size output bins, preserving
    ``order_col`` order within each partition directory: a file joins
    bin floor(bytes_before_it / target). Sequential packing — the
    deterministic, window-expressible cousin of first-fit-decreasing,
    and what compactors actually run (order preservation keeps
    time-clustered data clustered).

    Returns (part, bin, n_files, total_bytes) — the compaction
    work-list; each row is one rewrite task.
    """
    w = (
        Window.partitionBy(part_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_before = F.sum(size_col).over(w) - F.col(size_col)
    binned = inventory.withColumn(
        "bin", F.floor(cum_before / F.lit(target_bytes)).cast("long")
    )
    return binned.groupBy(part_col, "bin").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum(size_col).cast("long").alias("total_bytes"),
    )


def skew_audit(df: DataFrame, key_col: str, label: str | None = None) -> DataFrame:
    """Join-key distribution diagnosis: per-key counts folded to
    (key_col, n_keys, n_rows, max_rows, p95_rows, top1_share_per_mille,
    skewed).

    ``skewed`` flags the hottest key holding >= 4x the mean row count.
    The mean is computed as a double (sum/keys) rather than the
    algebraically equivalent max*n_keys >= 4*n_rows — the integer
    product overflows BIGINT at exactly the adversarial scale this
    audit exists to catch (1e12-row hot key x 1e7 keys). Double ops
    are identical across engines, so the flag stays exact. The
    verdict routes the join: balanced -> plain shuffle; few hot
    keys -> AQE skew split; adversarial -> salting.
    """
    counts = df.groupBy(F.col(key_col).alias("__k")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    mean_rows = F.sum("cnt").cast("double") / F.count(F.lit(1))
    return counts.agg(
        F.lit(label or key_col).alias("key_col"),
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").cast("long").alias("n_rows"),
        F.max("cnt").alias("max_rows"),
        F.percentile("cnt", 0.95).alias("p95_rows"),
        F.floor(
            F.lit(1000) * F.max("cnt") / F.sum("cnt")
        ).cast("long").alias("top1_share_per_mille"),
        (F.max("cnt") >= F.lit(4) * mean_rows)
        .cast("long")
        .alias("skewed"),
    )


def route_join_strategy(audit_row) -> str:
    """Close the audit->action loop: pick the join execution strategy
    from a ``skew_audit`` verdict row.

    * ``plain``    — distribution is balanced; a vanilla shuffle (or
      AQE broadcast, if one side is small) is optimal.
    * ``aqe_skew`` — the hottest key is oversized (>= 4x mean) but no
      single key dominates the table: AQE's runtime skew-split
      handles it by splitting oversized sort-merge partitions, no
      plan surgery needed.
    * ``salted``   — one key holds an outright share of ALL rows
      (>= 20%, per-mille 200): even a split partition is one key's
      rows on one joined stream; explicit salting
      (functions.salted_join) is the only shape that spreads a
      single key across reducers for shuffle-hash paths too.

    Thresholds are deliberately coarse — the audit's job is to spot
    the two regimes that need intervention, not to fine-tune.
    """
    if not audit_row["skewed"]:
        return "plain"
    if audit_row["top1_share_per_mille"] >= 200:
        return "salted"
    return "aqe_skew"


def routed_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    how: str = "inner",
    salt: int = 16,
    audit_row=None,
) -> DataFrame:
    """Skew-aware equi-join: measure the left side's key distribution
    (``skew_audit`` — one small aggregate job, the AQE philosophy of
    spending a metadata-scale measurement to pick the plan), then
    dispatch to a plain join, an AQE-handled join, or
    ``functions.salted_join``. All three produce identical rows for
    the supported join types, so callers get skew insurance with no
    semantic risk. Pass ``audit_row`` to reuse an existing audit
    (e.g. the nightly ``join_skew_audit`` output) and skip the
    measurement job.
    """
    from clickhouse_only_importer_prototype_spark.functions import (
        salted_join,
    )

    if audit_row is None:
        audit_row = skew_audit(left, on).first()
    strategy = route_join_strategy(audit_row)
    if strategy == "salted":
        return salted_join(left, right, on, salt=salt, how=how)
    # aqe_skew: AQE's skewJoin handles oversized partitions at
    # runtime; the logical plan is the plain join either way
    return left.join(right, on, how)
