"""Driver-side statistics helpers: skew-calibrated range boundaries
from parquet footer metadata.

Range-bucketing a table on a sort key needs split points. A uniform
split of [min, max] is one data pass and breaks on skewed key domains
(a pareto-ish key puts most rows in bucket 0). Spark's own
``repartitionByRange`` samples the data — but its sampling is
re-executed per evaluation, so the boundaries are not stable across the
two passes a gapless-id assignment needs (see queries.surrogate_ids).

This module gets both properties — deterministic AND skew-calibrated —
for free from parquet footers: every row group records (min, max,
num_rows) per column (the zone maps written at ingest,
cf. parquet-format Statistics). Reading footers is a metadata-only
driver operation, the same class of work as Spark's file listing; at
100 TB / ~100k files it is thousands of small reads, embarrassingly
parallelizable and still no data scan.

Boundary quality is bounded by row-group granularity: each row group
contributes its row count spread uniformly between its recorded min and
max, so the cumulative-weight quantiles are exact up to one row group's
worth of rows per bucket — the same guarantee a sampled sort
(TeraSort-style range partitioner) gives, without the nondeterminism.

Limitation shared with every key-range scheme: rows with EQUAL keys
always land in one bucket, so a single key holding a large fraction of
the table is an irreducible straggler for order-preserving bucketing
(tie-break columns cannot help — the bucket function may only read the
range key, or bucket order stops matching key order).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, functions as F


def parquet_rowgroup_stats(
    path: str, column: str
) -> list[tuple[float, float, int]]:
    """(min, max, num_rows) per row group for ``column`` across all
    parquet fragments under ``path`` (a file or a directory).

    Returns [] when any row group lacks statistics for the column —
    callers fall back to a data-pass strategy.
    """
    import pyarrow.dataset as pads

    dataset = pads.dataset(path, format="parquet")
    segs: list[tuple[float, float, int]] = []
    for frag in dataset.get_fragments():
        # fragment metadata comes from the footer only — no data pages
        md = frag.metadata
        # row-group columns are indexed by LEAF position in the parquet
        # schema, which diverges from the arrow field index once any
        # earlier field is nested (struct/list explodes into several
        # leaves) — so resolve the index against the leaf paths, not
        # the arrow schema. A top-level flat column has path == name.
        # leaves are addressed by dotted path ('meta.b'); a top-level
        # flat column's path is just its name
        idx = next(
            (
                i
                for i in range(len(md.schema.names))
                if md.schema.column(i).path == column
            ),
            -1,
        )
        if idx < 0:
            return []
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(idx)
            st = col.statistics
            if st is None or not st.has_min_max:
                return []
            segs.append((st.min, st.max, md.row_group(rg).num_rows))
    return segs


def boundaries_from_stats(
    segs: list[tuple[float, float, int]], n_buckets: int
) -> list[int]:
    """n_buckets-1 ascending split values from row-group zone maps.

    Model: each row group spreads its rows UNIFORMLY across
    [min, max] — the honest reading of a zone map, which carries no
    intra-range information. Summing the per-group densities gives a
    piecewise-uniform CDF; boundaries sit at its quantiles (linear
    inversion inside each piece). Two regimes fall out naturally:

    * key-sorted / clustered ingest → row groups are narrow and
      disjoint → the CDF tracks the real distribution to row-group
      granularity → skew-calibrated split;
    * unsorted / replicated data → every row group spans ~the whole
      domain → the CDF degrades to a uniform-domain split — the best
      any metadata-only scheme can do, and critically NOT the
      edge-clustered collapse an endpoint point-mass model produces
      (half the weight piled on global min/max puts nearly every row
      in one middle bucket).

    Values are ints (the engine's range keys are integral ids);
    duplicates collapse, so concentrated domains may yield fewer,
    wider buckets — which is what their key resolution supports.
    """
    if not segs or n_buckets <= 1:
        return []
    deltas: dict[int, float] = {}
    total = 0.0
    for mn, mx, rows in segs:
        lo, hi = int(mn), int(mx)
        d = rows / (hi - lo + 1)
        deltas[lo] = deltas.get(lo, 0.0) + d
        deltas[hi + 1] = deltas.get(hi + 1, 0.0) - d
        total += rows
    xs = sorted(deltas)
    targets = [total * i / n_buckets for i in range(1, n_buckets)]
    bounds: list[int] = []
    ti = 0
    cum = 0.0
    dens = 0.0
    for k in range(len(xs) - 1):
        dens += deltas[xs[k]]
        width = xs[k + 1] - xs[k]
        mass = dens * width
        while ti < len(targets) and targets[ti] <= cum + mass:
            if dens > 0:
                bounds.append(int(xs[k] + (targets[ti] - cum) / dens))
            ti += 1
        cum += mass
    return sorted(set(bounds))


def bucket_expr(col: Column | str, bounds: list[int]) -> Column:
    """Deterministic bucket id: count of boundaries strictly below the
    key — a pure row-local function (stable under task retry, unlike
    repartitionByRange's sampled partitioner). len(bounds) comparisons
    per row, JVM-side; for hundreds of buckets switch to a broadcast
    range join, but shuffle-partition counts live in the tens.
    """
    c = F.col(col) if isinstance(col, str) else col
    if not bounds:
        return F.lit(0)
    return reduce(
        lambda a, b: a + b,
        [(c > F.lit(int(v))).cast("int") for v in bounds],
    ).cast("int")


def aligned_counts_from_stats(
    segs: list[tuple[float, float, int]], n_buckets: int
) -> tuple[list[int], list[int]] | None:
    """(bounds, exact per-bucket row counts) cut ONLY at row-group key
    gaps — or None when the footer layout can't support it.

    When a cut sits at a gap (every earlier row group's max < every
    later one's min), ``bucket_expr``'s strict-``>`` assignment puts
    exactly the earlier groups' rows below it, so the per-bucket counts
    are the row-group ``num_rows`` sums: EXACT from metadata, no
    counts data-pass needed (rank_gapless accepts them as
    ``bucket_counts``). Key-sorted ingest — the common shape for large
    sorted fact tables — has a gap at nearly every group edge; a
    single-row-group file (the small-SF fixtures) or overlapping
    groups return None and callers fall back to the counted path.

    Cuts greedily chase the uniform target total/n_buckets, so balance
    is row-group-granular: within 1 group size of even.
    """
    if not segs or n_buckets <= 1:
        return None
    s = sorted(segs, key=lambda x: (x[0], x[1]))
    total = sum(r for _, _, r in s)
    if total == 0:
        return None
    # gap before group i: all groups 0..i-1 end strictly below min_i
    prefix_max = []
    running = None
    for mn, mx, _ in s:
        running = mx if running is None else max(running, mx)
        prefix_max.append(running)
    gaps = {i for i in range(1, len(s)) if s[i][0] > prefix_max[i - 1]}
    if not gaps:
        return None
    target = total / n_buckets
    bounds: list[int] = []
    counts: list[int] = []
    acc = 0  # rows in groups before i
    used = 0  # rows already assigned to closed buckets
    for i, (_, _, rows) in enumerate(s):
        if (
            i in gaps
            and len(bounds) < n_buckets - 1
            and acc >= target * (len(bounds) + 1)
        ):
            bounds.append(int(prefix_max[i - 1]))
            counts.append(acc - used)
            used = acc
        acc += rows
    if not bounds:
        return None
    counts.append(total - used)
    return bounds, counts
