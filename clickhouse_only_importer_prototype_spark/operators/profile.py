"""Column profiling: per-column row/null/distinct counts in one pass.

The first query any engine user runs against an unfamiliar table, and
the input to null-threshold data-quality gates. One aggregation job
emits every column's stats; the wide one-row aggregate is unpivoted to
(column, n_rows, n_null, n_distinct) long form so downstream checks
join on column name.

Scale: exact multi-column COUNT(DISTINCT) compiles to a single Expand
+ aggregate — one shuffle, but the Expand multiplies scan rows by the
column count, the standard exact-profiling cost. ``approx=True`` swaps
in HyperLogLog++ sketches (no Expand, fixed-size partial state): the
right default at 100 TB, with hll_distinct_audit certifying the
accuracy contract in the hard gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def violation_counts(df: DataFrame, checks: dict[str, Column]) -> DataFrame:
    """Data-quality constraint audit: every row-local check in ONE
    scan (conditional sums, map-side partial agg), unpivoted to
    (check, n_violations) rows. Cross-row constraints (FK orphans,
    key uniqueness) don't fit a row-local pass — compute those
    separately and union. At 100 TB this is the nightly expectations
    job: one pass over the fact table however many checks are
    registered."""
    if not checks:
        raise ValueError("no checks given")
    # count_if (not sum-of-casts): an EMPTY input yields 0 per check,
    # not NULL — the expectations job must report clean, not unknown.
    wide = df.agg(
        *[
            F.count_if(cond).alias(f"__c{i}")
            for i, cond in enumerate(checks.values())
        ]
    )
    # unpivot via explode of literal-name structs — check names are
    # free-form labels, never interpolated into SQL text
    entries = F.array(
        *[
            F.struct(
                F.lit(name).alias("check"),
                F.col(f"__c{i}").cast("long").alias("n_violations"),
            )
            for i, name in enumerate(checks)
        ]
    )
    return wide.select(F.explode(entries).alias("__e")).select(
        "__e.check", "__e.n_violations"
    )


def profile_table(
    df: DataFrame, cols: list[str] | None = None, approx: bool = False
) -> DataFrame:
    """(column, n_rows, n_null, n_distinct) per profiled column.

    ``n_distinct`` counts non-null distincts (COUNT(DISTINCT col)
    semantics in both engines). Column order of the output follows
    ``cols``; row order is undefined (sort downstream).
    """
    cols = list(cols) if cols is not None else list(df.columns)
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in DataFrame: {missing}")
    distinct = (
        (lambda c: F.approx_count_distinct(c))
        if approx
        else (lambda c: F.count_distinct(F.col(c)))
    )
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    # positional aliases: column NAMES never enter generated SQL text
    # (a quote-bearing name would break a string-built stack()) — the
    # same literal-name struct-explode pattern as violation_counts
    for i, c in enumerate(cols):
        aggs.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"__null_{i}")
        )
        aggs.append(distinct(c).alias(f"__dist_{i}"))
    wide = df.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"__null_{i}").cast("long").alias("n_null"),
                F.col(f"__dist_{i}").cast("long").alias("n_distinct"),
            )
            for i, c in enumerate(cols)
        ]
    )
    return wide.select(
        F.explode(entries).alias("__e"),
        F.col("n_rows").cast("long").alias("n_rows"),
    ).select(
        "__e.column",
        "n_rows",
        "__e.n_null",
        "__e.n_distinct",
    )


def table_checksum(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Order-independent, engine-portable table fingerprint:
    (n_rows, checksum) where checksum = (SUM over rows of
    md5(rendered row)'s first 15 hex digits as int64 mod 1_000_000_007)
    mod 1_000_000_007.

    The replication/MERGE audit primitive: two engines (or two sides
    of a CDC apply) holding the same logical rows produce the same
    checksum regardless of row order, partitioning, or file layout —
    so "did the merge converge?" is one scan per side and an integer
    compare, not a sort-and-diff. The md5-hex-to-int64 idiom is the
    same one the winnowing/simhash oracles use, so DuckDB reproduces
    it bit-for-bit.

    Row rendering is injective: each column becomes
    ``len:value`` (or the bare token ``N`` for NULL — rendered values
    always start with a digit, so the token cannot collide), joined
    with '|'. The length prefix makes delimiter injection impossible
    ('a|b','c' vs 'a','b|c') and the NULL token makes NULL position
    significant (('a',NULL,'b') vs ('a','b',NULL)) — without these, a
    convergence audit could certify non-identical tables as equal.

    Overflow: the per-row mod keeps terms under 2^30, but a plain
    int64 SUM of ~1e9-sized terms still wraps past ~9.2e9 rows —
    exactly nightly-audit table scale — so the sum runs in
    decimal(38,0) (DuckDB: HUGEINT) and the TOTAL is folded mod
    1_000_000_007 at the end. Both engines stay exact the whole way.

    Callers must render non-string columns to strings deterministically
    BEFORE passing them (e.g. floor(price*100+0.5) cents for doubles):
    native float/timestamp-to-string rendering differs across engines,
    and a checksum that depends on it would false-mismatch.

    One scan, map-side partial sums, one row out — metadata-scale at
    any table size.
    """
    cols = list(cols) if cols is not None else list(df.columns)
    rendered = [
        F.when(F.col(c).isNull(), F.lit("N")).otherwise(
            F.concat(
                F.length(F.col(c)).cast("string"), F.lit(":"), F.col(c)
            )
        )
        for c in cols
    ]
    row_hash = F.conv(
        F.substring(F.md5(F.concat_ws("|", *rendered)), 1, 15), 16, 10
    ).cast("long")
    total = F.sum(
        (row_hash % F.lit(1_000_000_007)).cast("decimal(38,0)")
    )
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        (total % F.lit(1_000_000_007)).cast("long").alias("checksum"),
    )


def fixed_width_histogram(
    df: DataFrame,
    col: str,
    width: float,
    lo: float = 0.0,
    n_buckets: int | None = None,
) -> DataFrame:
    """Fixed-width histogram of a numeric column: (bucket, lo_edge,
    n, total) with bucket = floor((col - lo) / width), clamped into
    [0, n_buckets-1] when n_buckets is given (overflow rows land in
    the last bucket, width_bucket-style).

    Fixed edges, not data-dependent ones: a quantile-based histogram
    needs a pre-pass over the data; fixed edges make the whole thing
    ONE map-side-combinable groupBy — the shuffle carries at most
    n_buckets rows per mapper whatever the table size, the same
    footprint as the reference's count/summary stats (pipeline.go
    summary counters) but bucketed. NULLs drop (no bucket).

    Money columns: `total` aggregates in exact DECIMAL and is emitted
    as DOUBLE per the engine's cross-engine money rules.
    """
    c = F.col(col)
    bucket = F.floor((c - F.lit(lo)) / F.lit(width)).cast("long")
    if n_buckets is not None:
        bucket = F.least(
            F.greatest(bucket, F.lit(0)), F.lit(int(n_buckets) - 1)
        )
    return (
        df.where(c.isNotNull())
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(c.cast("decimal(18,2)")).cast("double").alias("total"),
        )
        .select(
            "bucket",
            (F.lit(lo) + F.col("bucket") * F.lit(width)).alias("lo_edge"),
            "n",
            "total",
        )
    )


def group_tv_distance(
    df: DataFrame, group_col: str, item_col: str
) -> DataFrame:
    """Pairwise total-variation distance between the per-group
    distributions of ``item_col``: (group_a, group_b, tv_1e6) for every
    unordered group pair, where each group's distribution is its
    integer per-million item shares (share = count * 1e6 div n_group)
    and tv_1e6 = sum|share_a - share_b| div 2.

    The corpus drift / domain-shift audit: "how differently do two
    sources (or two snapshot dates) use the vocabulary?" 0 = identical
    usage, ~1e6 = disjoint. TV is chosen over KL/PSI deliberately —
    those need log(), whose float rounding differs across engines,
    while integer-share TV is EXACT in int64 at any corpus size: shares
    are <= 1e6 by construction, so no product ever approaches overflow
    (contrast the naive cross-multiplied form |c_a*n_b - c_b*n_a|,
    which overflows int64 near ~3e9-token groups).

    Shape: one groupBy for per-group item counts, tiny per-group
    totals BROADCAST back, then an inner self-join on item with
    group_a < group_b — each item fans out to at most G^2/2 pairs, so
    cost is |vocab| * G^2; G is slice-scale (tens of sources), never
    data-scale. Pairs sharing NO items still get a row: the pair
    skeleton is a crossJoin of the group LIST (G rows, broadcast) and
    the matched-item stats left-join onto it. Disjoint-item mass needs
    no second join: sum over a-only items of share_a equals the
    group's total share mass minus its matched mass, both already in
    hand."""
    items = df.select(
        F.col(group_col).alias("__g"), F.col(item_col).alias("__i")
    ).where(F.col(item_col).isNotNull())
    c = items.groupBy("__g", "__i").agg(F.count(F.lit(1)).alias("__c"))
    tot = c.groupBy("__g").agg(F.sum("__c").alias("__n"))
    shares = c.join(F.broadcast(tot), "__g").select(
        "__g", "__i", F.expr("__c * 1000000 div __n").alias("__s")
    )
    # per-group share mass: ~1e6 minus floor dust, needed for the
    # unmatched-item correction
    z = shares.groupBy("__g").agg(F.sum("__s").alias("__z"))
    a = shares.select(
        F.col("__g").alias("group_a"), "__i", F.col("__s").alias("__sa")
    )
    b = shares.select(
        F.col("__g").alias("group_b"), "__i", F.col("__s").alias("__sb")
    )
    matched = (
        a.join(b, "__i")
        .where(F.col("group_a") < F.col("group_b"))
        .groupBy("group_a", "group_b")
        .agg(
            F.sum(F.abs(F.col("__sa") - F.col("__sb"))).alias("__m"),
            F.sum("__sa").alias("__s1"),
            F.sum("__sb").alias("__s2"),
        )
    )
    ga = z.select(F.col("__g").alias("group_a"), F.col("__z").alias("__za"))
    gb = z.select(F.col("__g").alias("group_b"), F.col("__z").alias("__zb"))
    pairs = ga.crossJoin(F.broadcast(gb)).where(
        F.col("group_a") < F.col("group_b")
    )
    return (
        pairs.join(F.broadcast(matched), ["group_a", "group_b"], "left")
        .select(
            "group_a",
            "group_b",
            F.expr(
                "(coalesce(__m, 0) + (__za - coalesce(__s1, 0))"
                " + (__zb - coalesce(__s2, 0))) div 2"
            ).alias("tv_1e6"),
        )
    )


def mad_outlier_stats(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: float = 3.0,
) -> DataFrame:
    """Robust per-group outlier screen: count values with
    |x - median| > k * 1.4826 * MAD (median absolute deviation;
    1.4826 is the normal-consistency constant). Returns
    (group_col, median_price->median, mad, n_rows, n_outliers).

    Unlike mean/stddev z-scores, the median/MAD screen is not dragged
    by the very outliers it hunts — the standard robust DQ check.

    Scale shape: two grouped exact percentiles (median, then MAD over
    deviations) + one counting fold — three key-partitioned passes,
    each map-side combinable, with the tiny per-group stats BROADCAST
    back onto the scan both times (never a shuffle of the fact side
    against stats)."""
    vals = df.select(group_col, value_col)
    med = vals.groupBy(group_col).agg(
        F.percentile(value_col, 0.5).alias("median")
    )
    dev = vals.join(F.broadcast(med), group_col).withColumn(
        "__adev", F.abs(F.col(value_col) - F.col("median"))
    )
    mad = dev.groupBy(group_col, "median").agg(
        F.percentile("__adev", 0.5).alias("mad")
    )
    out = dev.join(F.broadcast(mad.select(group_col, "mad")), group_col)
    is_out = F.col("__adev") > F.lit(k) * 1.4826 * F.col("mad")
    return out.groupBy(group_col, "median", "mad").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(is_out.cast("long")).alias("n_outliers"),
    )
