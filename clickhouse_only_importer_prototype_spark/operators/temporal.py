"""Temporal join operators: as-of join and interval (range) join.

The reference has no temporal operators (SURVEY §2.3/§2.5 — its only
joins are driver-side metadata pairing), but an analytics engine over
the events surface needs both. Spark ships neither natively, so each
is built as a composition of DataFrame ops with an explicitly
shuffle-bounded shape:

  * as-of join — "for each left row, the latest right row with
    right.ts <= left.ts, per key". Implemented as union + one
    partitioned window (last non-null carry-forward): ONE shuffle by
    key, no range cross-product, state bounded per key. This is the
    standard log-enrichment join (trades ↔ quotes, events ↔ dim
    snapshots).
  * interval join — "points falling inside [start, end) intervals,
    per key". Implemented by bucketizing time: intervals explode to
    the fixed-width buckets they overlap, points map to exactly one
    bucket, and the join becomes an equi-join on (key, bucket) plus a
    residual range predicate. No O(n·m) nested loop; shuffle volume =
    points + intervals × avg_buckets_spanned. Bucket width trades
    duplication (long intervals) against candidate fan-in (dense
    buckets) — set it near the typical interval length.

Both are exactly SQL-expressible, so the driver oracles them
(DuckDB ASOF JOIN / inequality join).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def _floordiv_sql(expr: str, width: int) -> str:
    """Exact int64 floor-division as a SQL fragment: ``div`` truncates
    toward zero, so shift the quotient down by one when the remainder
    is negative (Spark's ``%`` follows the dividend's sign).

    NOTE: DuckDB 1.0's integer ``//`` ALSO truncates toward zero
    (``-7 // 2 = -3``), so oracles paired with this fragment must apply
    the identical ``- CASE WHEN x % w < 0 THEN 1 ELSE 0 END`` correction
    — both engines then bucket negative pre-epoch instants with exact
    floor semantics (``ORACLE_FLOORDIV`` in queries.py emits it)."""
    return (
        f"(({expr}) div {width}) - "
        f"(CASE WHEN ({expr}) % {width} < 0 THEN 1 ELSE 0 END)"
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Sequence[str] | None = None,
    right_prefix: str = "r_",
    direction: str = "backward",
) -> DataFrame:
    """As-of left join. ``direction="backward"`` (default): latest
    right row with ts <= left ts — log enrichment, trades <-> quotes.
    ``direction="forward"``: EARLIEST right row with ts >= left ts —
    next-action attribution (each click's next purchase, each error's
    next successful retry). Forward is the same carry-forward window
    run in descending timestamp order; identical single-shuffle shape.

    Ties on timestamp are inclusive in both directions (a right row AT
    the left timestamp matches). If multiple right rows share
    (key, ts), callers must pre-aggregate the right side —
    carry-forward order would otherwise be nondeterministic.

    Output: all left columns + right_ts and right_cols under
    ``right_prefix`` (NULL where no right row qualifies).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    on = list(on)
    right_cols = [c for c in (right_cols or right.columns) if c not in on and c != right_ts]
    rpayload = F.struct(
        F.col(right_ts).alias(f"{right_prefix}{right_ts}"),
        *[F.col(c).alias(f"{right_prefix}{c}") for c in right_cols],
    )
    r_struct_type = (
        right.select(rpayload.alias("__r")).schema["__r"].dataType
    )
    left_cols = [c for c in left.columns]
    lpayload = F.struct(*[F.col(c) for c in left_cols])
    l_struct_type = left.select(lpayload.alias("__l")).schema["__l"].dataType

    lpart = left.select(
        *on,
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__prio"),
        lpayload.alias("__l"),
        F.lit(None).cast(r_struct_type).alias("__r"),
    )
    # NULL right timestamps would sort first (Spark nulls-first) and be
    # carried forward as phantom matches; SQL ASOF semantics never match
    # a NULL timestamp, so drop them up front
    rpart = right.where(F.col(right_ts).isNotNull()).select(
        *on,
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__prio"),
        F.lit(None).cast(l_struct_type).alias("__l"),
        rpayload.alias("__r"),
    )
    # same-ts right rows must precede left rows in iteration order so
    # inclusive ties match: ascending for backward, descending for
    # forward (carry-forward in reverse time = earliest at-or-after)
    order = (
        [F.col("__t").asc(), F.col("__prio").asc()]
        if direction == "backward"
        else [F.col("__t").desc(), F.col("__prio").asc()]
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        lpart.unionByName(rpart)
        .withColumn("__rm", F.last("__r", ignorenulls=True).over(w))
        .where(F.col("__prio") == 1)
    )
    out_cols: list[Column] = [F.col(f"__l.{c}").alias(c) for c in left_cols]
    out_cols.append(
        F.col(f"__rm.{right_prefix}{right_ts}").alias(f"{right_prefix}{right_ts}")
    )
    out_cols.extend(
        F.col(f"__rm.{right_prefix}{c}").alias(f"{right_prefix}{c}")
        for c in right_cols
    )
    return matched.select(*out_cols)


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: Sequence[str],
    point_ts: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bucket_width: int = 3_600_000_000_000,
) -> DataFrame:
    """Inner join of points into half-open [start, end) intervals.

    Equi-join on (keys, time-bucket): each interval explodes to every
    bucket it overlaps, each point maps to exactly one bucket (so no
    output dedup is needed), and the residual range predicate filters
    within the bucket. Returns all interval columns + all point
    columns (names must not collide apart from the join keys).

    Bucketing is integer floor-division — epoch-scale nanos exceed
    2^53, so float division has a ~256ns ulp that can round a
    boundary-adjacent timestamp into the wrong bucket and silently
    drop its join row; and plain ``div`` truncates toward zero, which
    would mis-bucket negative (pre-epoch) instants, so the ``div`` is
    corrected by the remainder's sign (exact floor for any int64).
    """
    on = list(on)

    def bucket_of(col: str, minus_one: bool = False) -> Column:
        expr = f"(`{col}` - 1)" if minus_one else f"`{col}`"
        return F.expr(_floordiv_sql(expr, bucket_width))

    ivals = intervals.where(F.col(start_col) < F.col(end_col)).withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                bucket_of(start_col), bucket_of(end_col, minus_one=True)
            )
        ),
    )
    pts = points.withColumn("__bucket", bucket_of(point_ts))
    joined = ivals.join(pts, on + ["__bucket"]).where(
        (F.col(point_ts) >= F.col(start_col)) & (F.col(point_ts) < F.col(end_col))
    )
    return joined.drop("__bucket")


def funnel_stages(
    events: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    within: int | None = None,
) -> DataFrame:
    """Ordered funnel progression per user: stage k is reached only by
    an event of ``stages[k]`` STRICTLY AFTER the timestamp that
    reached stage k-1 (a purchase before the first view does not
    count), and, when ``within`` is given, no more than ``within``
    ts-units after it.

    This is the EARLIEST-ANCHOR (greedy) funnel: stage k always
    anchors on the earliest qualifying stage-k event. With a
    conversion window that is the strictest common definition — a
    user whose first attempt times out is NOT re-anchored onto a
    later attempt, so bounded-funnel counts are a lower bound.
    Re-anchoring ("any attempt converts") semantics need a per-user
    ordered scan (sessionize-style stateful pass), not these groupBy
    folds; the oracle encodes the same greedy chain.

    Returns one row per user ever seen: (user_col, funnel_stage,
    t_1..t_n) where funnel_stage in 0..len(stages) and t_k is the
    earliest qualifying stage-k timestamp (NULL past the reached
    stage).

    Scale shape: stage k is one filtered groupBy(user) fold joined to
    stage k-1's per-user row — every frame after the first fold is
    one row per user, every join is on the same key the groupBys
    already partitioned by, and nothing is windowed or sorted. The
    event table is scanned once per stage with the stage's type
    filter pushed to the scan.
    """
    if not stages:
        raise ValueError("no funnel stages given")
    reserved = {"funnel_stage", *(f"t_{k}" for k in range(1, len(stages) + 1))}
    clash = sorted(reserved & set(events.columns))
    if clash:
        raise ValueError(
            f"input columns {clash} collide with funnel output columns"
        )
    users = events.select(user_col).distinct()
    per_stage: list[DataFrame] = []
    prev: DataFrame | None = None
    for k, stage in enumerate(stages, start=1):
        cur = events.where(F.col(type_col) == stage)
        if prev is not None:
            cond = F.col(ts_col) > F.col(f"t_{k - 1}")
            if within is not None:
                cond = cond & (
                    F.col(ts_col) <= F.col(f"t_{k - 1}") + F.lit(within)
                )
            cur = cur.join(
                prev.select(user_col, f"t_{k - 1}"), user_col
            ).where(cond)
        cur = cur.groupBy(user_col).agg(F.min(ts_col).alias(f"t_{k}"))
        per_stage.append(cur)
        prev = cur
    out = users
    for k, s in enumerate(per_stage, start=1):
        out = out.join(s.select(user_col, f"t_{k}"), user_col, "left")
    stage_expr = F.lit(0)
    for k in range(1, len(stages) + 1):
        stage_expr = F.when(
            F.col(f"t_{k}").isNotNull(), F.lit(k)
        ).otherwise(stage_expr)
    return out.select(
        user_col,
        stage_expr.cast("long").alias("funnel_stage"),
        *[f"t_{k}" for k in range(1, len(stages) + 1)],
    )


def gap_fill(
    events: DataFrame,
    key_cols: Sequence[str],
    ts_col: str = "ts",
    bucket_ns: int = 3_600_000_000_000,
    agg_specs: dict[str, Column] | None = None,
) -> DataFrame:
    """Dense time-bucket rollup: per key, one row for EVERY bucket
    between that key's first and last activity — empty buckets filled
    with zero counts. The hypertable/timeseries gap-fill every
    monitoring query needs (a rate chart with missing hours silently
    interpolates; a gap-filled one shows the outage).

    Returns (key_cols..., bucket, n_events, <agg_specs...>) with
    ``bucket`` = floor-div of ``ts_col`` by ``bucket_ns``. Extra
    aggregates land NULL on filled gaps (their zero is
    aggregate-specific; COALESCE downstream), n_events lands 0.

    Scale shape: ONE scan of the input — the per-bucket fold reads
    events once, and each key's (min, max) bucket span re-aggregates
    the already-reduced counts frame (|keys x active buckets| rows,
    output-scale not input-scale); the spine explodes
    ``sequence(min, max)`` per key — rows proportional to the output,
    never a global calendar cross-join — and the fill join is on the
    (key, bucket) the counts fold already partitioned by. Bound the
    span upstream (filter the time range) exactly as you would any
    dense rollup; a key spanning years at second granularity is a
    dense-output problem, not a plan problem.
    """
    key_cols = list(key_cols)
    reserved = set(key_cols) | {"bucket", "n_events"}
    bad = [n for n in (agg_specs or {}) if n in reserved]
    if bad:
        raise ValueError(
            f"agg_specs names collide with reserved columns {sorted(reserved)}: {bad}"
        )
    # keep the full row width: agg_specs may reference any input column
    bucketed = events.withColumn(
        "bucket", F.expr(_floordiv_sql(f"`{ts_col}`", bucket_ns))
    )
    # persisted: both the spine (span re-aggregate) and the fill join
    # read this frame — without the persist each branch re-scans the
    # raw input (Catalyst does not share common subplans), with it the
    # input is read ONCE and the reread is output-scale
    counts = bucketed.groupBy(*key_cols, "bucket").agg(
        F.count(F.lit(1)).alias("n_events"),
        *[
            expr.alias(name)
            for name, expr in (agg_specs or {}).items()
        ],
    ).persist()
    spans = counts.groupBy(*key_cols).agg(
        F.min("bucket").alias("__lo"), F.max("bucket").alias("__hi")
    )
    spine = spans.select(
        *key_cols,
        F.explode(F.sequence(F.col("__lo"), F.col("__hi"))).alias("bucket"),
    )
    return spine.join(counts, key_cols + ["bucket"], "left").select(
        *key_cols,
        "bucket",
        F.coalesce(F.col("n_events"), F.lit(0)).cast("long").alias("n_events"),
        *[F.col(name) for name in (agg_specs or {})],
    )


def funnel_stages_anymatch(
    events: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    within: int | None = None,
) -> DataFrame:
    """Re-anchoring ("any attempt converts") funnel: a user reaches
    stage k if ANY chain e_1 < e_2 < ... < e_k exists with
    type(e_i) = stages[i-1] and, when ``within`` is given, each hop
    no more than ``within`` ts-units after the previous one. This is
    the definition most product-analytics tools default to — a user
    whose first attempt times out still converts via a later attempt —
    and an upper bound on ``funnel_stages``' greedy first-attempt
    count.

    Returns (user_col, funnel_stage) for every user ever seen,
    funnel_stage in 0..len(stages).

    Implementation: one groupBy(user) packs the user's funnel-typed
    events into a sorted (ts, type) array, then a single JVM-side
    ``aggregate`` fold walks it once. Per stage the state carries the
    two latest distinct reachable-attempt timestamps (L, P with
    P < L): events arrive in ts order, so the best anchor for a
    stage-k event at time t is the latest reachable stage-(k-1)
    attempt STRICTLY before t — L when L < t, else P (ties on ts can
    never anchor each other). Linear in events-per-user, no window,
    no self-join; the event scan filters to funnel types before the
    fold. Re-anchoring is inherently an ordered scan, which is why
    this is a fold rather than ``funnel_stages``' per-stage groupBy
    chain.
    """
    if not stages:
        raise ValueError("no funnel stages given")
    if len(set(stages)) != len(stages):
        raise ValueError("funnel stages must be distinct event types")
    n = len(stages)
    users = events.select(user_col).distinct()
    packed = (
        events.where(F.col(type_col).isin(list(stages)))
        .groupBy(user_col)
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col(ts_col).cast("long").alias("t"),
                        F.col(type_col).alias("et"),
                    )
                )
            ).alias("__evs")
        )
    )
    null_t = F.lit(None).cast("long")
    init = F.struct(
        *[
            c.alias(nm)
            for k in range(1, n + 1)
            for c, nm in [(null_t, f"l{k}"), (null_t, f"p{k}")]
        ]
    )

    def step(acc: Column, e: Column) -> Column:
        t, et = e["t"], e["et"]
        fields = []
        for k in range(1, n + 1):
            lk, pk = acc[f"l{k}"], acc[f"p{k}"]
            if k == 1:
                ok = et == F.lit(stages[0])
            else:
                lp, pp = acc[f"l{k - 1}"], acc[f"p{k - 1}"]
                # latest reachable stage-(k-1) attempt strictly before t
                anchor = F.when(lp.isNotNull() & (lp < t), lp).otherwise(pp)
                ok = (et == F.lit(stages[k - 1])) & anchor.isNotNull()
                if within is not None:
                    ok = ok & (t <= anchor + F.lit(within))
            adv = ok & (lk.isNull() | (t > lk))
            fields.append(F.when(adv, t).otherwise(lk).alias(f"l{k}"))
            fields.append(
                F.when(adv & lk.isNotNull(), lk).otherwise(pk).alias(f"p{k}")
            )
        return F.struct(*fields)

    folded = packed.select(
        user_col, F.aggregate(F.col("__evs"), init, step).alias("__st")
    )
    stage_expr = F.lit(0)
    for k in range(1, n + 1):
        stage_expr = F.when(
            F.col(f"__st.l{k}").isNotNull(), F.lit(k)
        ).otherwise(stage_expr)
    return users.join(folded, user_col, "left").select(
        user_col, stage_expr.cast("long").alias("funnel_stage")
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    bucket_ns: int = 86_400_000_000_000,
    offset_buckets: int = 7,
) -> DataFrame:
    """Cohort retention matrix: users cohort by their FIRST activity
    bucket (default: day); each later activity bucket rolls up into
    offset groups of ``offset_buckets`` (default: weekly offsets) —
    (cohort_bucket, offset, n_active) with n_active = distinct users
    of that cohort active in that offset window.

    Scale shape: one groupBy(user) fold finds each user's cohort, one
    distinct projects (user, bucket) activity, and the join between
    them is on the user key both sides are already partitioned by.
    Integer floor-div arithmetic throughout — epoch-scale nanos exceed
    2^53, so float division would corrupt bucket boundaries, and
    truncating ``div`` would mis-bucket pre-epoch instants (the offset
    div needs no sign fix: __b >= cohort_bucket by construction).
    """
    bucket = F.expr(_floordiv_sql(f"`{ts_col}`", bucket_ns))
    first = events.select(user_col, bucket.alias("__b")).groupBy(
        user_col
    ).agg(F.min("__b").alias("cohort_bucket"))
    active = events.select(user_col, bucket.alias("__b")).distinct()
    joined = active.join(first, user_col)
    offset = F.expr(f"(__b - cohort_bucket) div {offset_buckets}")
    return joined.groupBy(
        "cohort_bucket", offset.alias("offset")
    ).agg(F.count_distinct(F.col(user_col)).alias("n_active"))


def event_ngrams(
    events: DataFrame,
    n: int = 2,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Consecutive n-step event-type sequences per user: one row per
    position where the user has ``n`` more events, with columns
    ``e0..e{n-1}`` (plus ``user_col``). The building block for Markov
    transition matrices (n=2) and top-k path mining (n=3+) — the
    reference's surface has nothing sequential (SURVEY §2.5 empty);
    this is the product-analytics companion to funnel_stages.

    Scale shape: ONE window partitioned by user ordered by
    (ts, tiebreak) — n-1 lead() columns ride the same sort, so the
    cost is a single key-partitioned shuffle regardless of n. No
    self-joins (the naive n-gram formulation is n-1 self-joins on
    consecutive ranks). Deterministic under ts ties via the tiebreak
    column.
    """
    if n < 2:
        raise ValueError(f"event_ngrams needs n >= 2, got {n}")
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    cols = [F.col(type_col).alias("e0")]
    cols += [F.lead(type_col, i).over(w).alias(f"e{i}") for i in range(1, n)]
    out = events.select(F.col(user_col), *cols)
    return out.where(F.col(f"e{n - 1}").isNotNull())


def ohlc_bars(
    events: DataFrame,
    key_cols: Sequence[str],
    value_col: str = "value",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    bucket_ns: int = 3_600_000_000_000,
) -> DataFrame:
    """Open/high/low/close bars per (key, time bucket) — the candle
    rollup every timeseries store ships. Returns (key_cols..., bucket,
    open, high, low, close, n_events).

    ONE map-side-combinable aggregate: open/close are min_by/max_by on
    the lexicographic (ts, tiebreak) struct — deterministic under ts
    ties, no ROW_NUMBER window, no second shuffle. high/low/open/close
    SELECT input values (never arithmetic on them), so doubles pass
    through bit-identically cross-engine.
    """
    bucket = F.expr(_floordiv_sql(f"`{ts_col}`", bucket_ns))
    pos = F.struct(F.col(ts_col), F.col(tiebreak_col))
    return events.groupBy(*key_cols, bucket.alias("bucket")).agg(
        F.min_by(value_col, pos).alias("open"),
        F.max(value_col).alias("high"),
        F.min(value_col).alias("low"),
        F.max_by(value_col, pos).alias("close"),
        F.count(F.lit(1)).alias("n_events"),
    )


def twap(
    events: DataFrame,
    key_cols: Sequence[str],
    value_dec: Column,
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    bucket_ns: int = 3_600_000_000_000,
) -> DataFrame:
    """Time-weighted average value per (key, bucket): each observation
    holds until the next one in the same (key, bucket); the last one
    holds to the bucket's end. Returns (key_cols..., bucket, twap,
    dur_ns_total, n_events).

    The plain AVG over-weights bursts (ten ticks in one second count
    ten times a value held for an hour); TWAP weights by holding
    time — the hypertable/financial rollup semantics.

    Determinism contract: ``value_dec`` must be a DECIMAL expression
    (the caller picks precision) — the weighted sum value*duration
    then aggregates EXACTLY, and the final twap divides two exact
    numbers as doubles (identical inputs -> identical bits on any
    engine; a double sum would be partition-order-dependent).

    Scale shape: one window over (key, bucket) ordered by
    (ts, tiebreak) computes each observation's holding time — the
    same single key-partitioned shuffle the gap-fill/rollup family
    uses — then one map-side-combinable groupBy folds the weighted
    sums. No self-joins, no global sort.
    """
    key_cols = list(key_cols)
    bucketed = events.withColumn(
        "bucket", F.expr(_floordiv_sql(f"`{ts_col}`", bucket_ns))
    )
    w = Window.partitionBy(*key_cols, "bucket").orderBy(ts_col, tiebreak_col)
    bucket_end = (F.col("bucket") + 1) * F.lit(bucket_ns)
    dur = F.coalesce(F.lead(ts_col).over(w), bucket_end) - F.col(ts_col)
    weighted = bucketed.select(
        *key_cols,
        "bucket",
        value_dec.alias("__v"),
        dur.alias("__dur"),
    )
    return weighted.groupBy(*key_cols, "bucket").agg(
        (
            F.sum(F.col("__v") * F.col("__dur")).cast("double")
            / F.sum("__dur").cast("double")
        ).alias("twap"),
        F.sum("__dur").cast("long").alias("dur_ns_total"),
        F.count(F.lit(1)).alias("n_events"),
    )


def cusum_drift(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    value_cents: Column | None = None,
    threshold_cents: int = 5_000,
) -> DataFrame:
    """Two-sided CUSUM drift screen per series, exact-integer.

    The classic recurrence s_t = max(0, s_{t-1} + (x_t - target)) is
    sequential, but it has a closed window form: with
    c_t = cumsum(x - target),
        pos_t = c_t - min(0, min_{k<=t} c_k)
        neg_t = max(0, max_{k<=t} c_k) - c_t
    so the whole detector is TWO prefix windows over one key-partitioned
    sort — no applyInPandas, no per-row state. x is integer cents and
    target the per-key integer-floor mean, so every engine agrees
    bit-for-bit.

    Output: one row per key — (key, n, target_cents, max_pos_drift,
    max_neg_drift, n_pos_alerts, n_neg_alerts) with alerts counting
    observations whose drift exceeds ``threshold_cents``.

    Scale: the per-key mean is one map-side-combinable agg broadcast
    back (keys are catalog-scale); the windows partition by the series
    key — the inherently-per-series scan every sequential detector
    needs. Millions of series parallelize across executors; a single
    100-TB series would need bucket-chunked re-anchoring (documented
    limit, same as any order-dependent scan).
    """
    if value_cents is None:
        value_cents = F.expr("CAST(round(value * 100) AS BIGINT)")
    base = df.select(
        F.col(key_col).alias("key"),
        F.col(ts_col).alias("__ts"),
        F.col(tiebreak_col).alias("__tb"),
        value_cents.alias("cents"),
    )
    target = base.groupBy("key").agg(
        F.expr("div(sum(cents), count(*))").alias("target_cents")
    )
    w = (
        Window.partitionBy("key")
        .orderBy("__ts", "__tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    j = base.join(F.broadcast(target), "key")
    c = F.sum(F.col("cents") - F.col("target_cents")).over(w)
    run = j.select(
        "key",
        "target_cents",
        c.alias("__c"),
        F.min(c).over(w).alias("__cmin"),
        F.max(c).over(w).alias("__cmax"),
    ).select(
        "key",
        "target_cents",
        (F.col("__c") - F.least(F.lit(0).cast("long"), F.col("__cmin"))).alias(
            "pos"
        ),
        (
            F.greatest(F.lit(0).cast("long"), F.col("__cmax")) - F.col("__c")
        ).alias("neg"),
    )
    thr = F.lit(threshold_cents).cast("long")
    return run.groupBy("key", "target_cents").agg(
        F.count("*").alias("n"),
        F.max("pos").alias("max_pos_drift"),
        F.max("neg").alias("max_neg_drift"),
        F.sum(F.when(F.col("pos") > thr, 1).otherwise(0)).alias(
            "n_pos_alerts"
        ),
        F.sum(F.when(F.col("neg") > thr, 1).otherwise(0)).alias(
            "n_neg_alerts"
        ),
    )


def rolling_zscore_flags(
    series: DataFrame,
    key_col: str,
    order_col: str,
    x_col: str,
    lookback: int = 24,
    min_n: int = 12,
    z: int = 3,
) -> DataFrame:
    """Flag points deviating > z·σ from the trailing ``lookback``-row
    window (exclusive of the current row; rows with < ``min_n`` prior
    observations are dropped as warm-up). Returns (key, order, x,
    is_anomaly 0/1).

    The test is exact integer algebra: (x·n − S)² > z²·(n·Q − S²)
    — (x − μ)² > z²σ² with both divisions cleared — so no float
    mean/stddev summation drift can flip a flag, and a constant
    window (σ = 0) only flags x ≠ μ. ``z`` is integer by contract.

    Scale: ONE key-partitioned window; the quadratics stay in int64
    while x·n < 2^31 — cast x to DECIMAL(38,0) upstream for
    larger-magnitude series (same shape, still exact)."""
    win = (
        Window.partitionBy(key_col)
        .orderBy(order_col)
        .rowsBetween(-lookback, -1)
    )
    w = series.select(
        F.col(key_col).alias("key"),
        F.col(order_col).alias("order"),
        F.col(x_col).alias("x"),
        F.count(x_col).over(win).alias("__n"),
        F.coalesce(F.sum(x_col).over(win), F.lit(0)).alias("__s"),
        F.coalesce(
            F.sum(F.col(x_col) * F.col(x_col)).over(win), F.lit(0)
        ).alias("__q"),
    )
    dev = F.col("x") * F.col("__n") - F.col("__s")
    var = F.col("__n") * F.col("__q") - F.col("__s") * F.col("__s")
    return w.where(F.col("__n") >= min_n).select(
        "key",
        "order",
        "x",
        F.when(dev * dev > z * z * var, F.lit(1))
        .otherwise(F.lit(0))
        .alias("is_anomaly"),
    )
