"""Deterministic corpus sampling and splitting.

Training pipelines need train/val/test assignment and subsampling that
are (a) stable across runs, task retries, and engine versions, (b) pure
row-local projections — no shuffle, no state, no rand(). Both operators
key on md5 of a salted id (the cross-engine idiom used throughout:
first 15 hex digits parsed as int64), so a DuckDB oracle reproduces
every assignment bit-for-bit and re-running a 100 TB job never moves a
document between splits (rand()-based splits do, under task retry —
the same determinism point as functions.salted_join).

The salt namespaces assignments: different salts give independent
splits (changing the salt re-rolls every document), the same salt is
stable forever.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

BUCKETS = 10_000  # per-myriad resolution: weights are exact to 0.01%


def _hash_bucket(id_col: Column, salt: str) -> Column:
    """Uniform bucket in [0, BUCKETS) from md5(salt:id) — row-local."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.lit(":"), id_col.cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    return F.pmod(h, F.lit(BUCKETS))


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    salt: str = "split-v1",
) -> DataFrame:
    """Assign each row to a named split by hashed id.

    ``weights`` maps split name -> fraction (need not sum to 1; the
    remainder is unassigned as 'rest'). Assignment: bucket =
    md5-hash(id) mod 10000; split boundaries at cumulative
    weight * 10000, in the given dict order. Returns the input columns
    plus ``split``.
    """
    weights = weights or {"train": 0.98, "val": 0.01, "test": 0.01}
    if any(w < 0 for w in weights.values()):
        raise ValueError(f"negative split weight: {weights}")
    if sum(weights.values()) > 1.0 + 1e-9:
        raise ValueError(f"split weights sum past 1: {weights}")
    bucket = _hash_bucket(F.col(id_col), salt)
    expr: Column = F.lit("rest")
    acc = 0.0
    cuts: list[tuple[str, int, int]] = []
    for name, w in weights.items():
        lo = round(acc * BUCKETS)
        acc += w
        hi = round(acc * BUCKETS)
        cuts.append((name, lo, hi))
    if cuts and abs(acc - 1.0) < 1e-9:
        # avoid an unreachable 'rest' branch when weights cover exactly 1
        cuts[-1] = (cuts[-1][0], cuts[-1][1], BUCKETS)
    for name, lo, hi in reversed(cuts):
        expr = F.when((bucket >= lo) & (bucket < hi), F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


def hash_sample(
    df: DataFrame,
    rate: float,
    id_col: str = "doc_id",
    salt: str = "sample-v1",
) -> DataFrame:
    """Deterministic ``rate`` subsample by hashed id (same row set on
    every run/engine; nested samples: a 1% sample with the same salt is
    a subset of the 10% sample)."""
    cut = round(rate * BUCKETS)
    return df.where(_hash_bucket(F.col(id_col), salt) < cut)


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    group_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
    salt: str = "strat-v1",
) -> DataFrame:
    """Per-group deterministic subsample: keep each row of group g with
    probability ``rates[g]`` (``default_rate`` for unlisted groups),
    decided by the salted id hash.

    The mixture-rebalancing primitive (up/down-weight languages or
    sources to a target distribution) with the same guarantees as
    hash_sample: pure row-local projection — no shuffle, no rand(),
    stable under retries — and nested (a group's 1% is a subset of its
    10% under the same salt).
    """
    for g, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate out of [0,1] for {g!r}: {r}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate out of [0,1]: {default_rate}")
    cut: Column = F.lit(round(default_rate * BUCKETS))
    for g, r in rates.items():
        cut = F.when(F.col(group_col) == g, F.lit(round(r * BUCKETS))).otherwise(cut)
    return df.where(_hash_bucket(F.col(id_col), salt) < cut)


def _salted_order(id_col: str, salt: str) -> Column:
    """md5(salt:id) — the uniform random-but-stable per-group draw
    order quota_per_group and token_budget_per_group share (ties break
    on the id itself at the window orderBy)."""
    return F.md5(
        F.concat(F.lit(salt), F.lit(":"), F.col(id_col).cast("string"))
    )


def quota_per_group(
    df: DataFrame,
    quota: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "quota-v1",
) -> DataFrame:
    """Cap each group at ``quota`` rows, chosen deterministically by
    the salted id hash (a uniform random-but-stable draw, NOT head-of-
    file order, which over-represents whatever sorted first).

    The domain-capping primitive: stop one crawl source from dominating
    the mixture. Shape: per-group top-K via row_number over the hash —
    one shuffle on group_col, windows run per-group in parallel. A
    group with far more rows than the quota is exactly the hot-key case
    the hash order tolerates (ties broken by id, so the draw is total);
    for quotas in the millions prefer two-stage: hash_sample down to
    ~quota-scale first, then cap exactly.
    """
    if quota < 1:
        raise ValueError(f"quota must be >= 1: {quota}")
    w = Window.partitionBy(group_col).orderBy(
        _salted_order(id_col, salt), F.col(id_col)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= quota)
        .drop("__rn")
    )


def token_budget_per_group(
    df: DataFrame,
    budget_tokens: int,
    token_col: str,
    group_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "budget-v1",
) -> DataFrame:
    """Cap each group at ``budget_tokens`` TOKENS (not rows): keep the
    greedy prefix of the group's salted-hash order whose running token
    total stays within budget. Adds ``cum_tokens`` (the running total
    including the row itself).

    Mixture weights for training corpora are token budgets, not
    document counts — a source of 10-word tweets and a source of
    100k-token books need capping in the unit the loss sees.
    quota_per_group's hash order is kept (uniform stable draw, no
    head-of-file bias); the only change is the stop rule, so a doc
    larger than the remaining budget ends its group's intake (greedy
    prefix, the deterministic contract — no knapsack backfill).

    Shape: one shuffle on group_col; the running sum is a per-group
    window in hash order (same cost as quota_per_group's row_number).
    Same hot-group caveat: pre-thin a group far above budget with
    hash_sample first.
    """
    if budget_tokens < 1:
        raise ValueError(f"budget_tokens must be >= 1: {budget_tokens}")
    w = (
        Window.partitionBy(group_col)
        .orderBy(_salted_order(id_col, salt), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("cum_tokens", F.sum(token_col).over(w).cast("long"))
        .where(F.col("cum_tokens") <= budget_tokens)
    )


def _hash_u60(id_col: Column, salt: str) -> Column:
    """Raw 60-bit uniform hash (md5 first 15 hex digits as int64) —
    the same idiom as _hash_bucket without the modulus."""
    return F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.lit(":"), id_col.cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")


def priority_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    salt: str = "wsample-v1",
) -> DataFrame:
    """Weight-proportional sample WITHOUT replacement of ``k`` rows —
    deterministic priority sampling (Duffield–Lund–Thorup, JACM '07).

    Each row draws u_i = (2*h_i + 1) / 2^61 from the salted md5 hash
    (uniform, retry-stable — same determinism contract as hash_split)
    and gets priority w_i / u_i; the k highest priorities win, which
    is the same ordering as u_i / w_i ASCENDING — computed as
    ``CAST(2h+1 AS DOUBLE) / CAST(w AS DOUBLE)``. Heavy rows draw
    small keys more often: inclusion probability ≈ min(1, w_i/τ).

    CROSS-ENGINE EXACT: int→double casts and a single division are
    IEEE correctly-rounded primitives, so the sort key is bit-identical
    in any engine — unlike the classic A-ES exponential key, whose
    ``ln`` differs in the last ulp across libm implementations and can
    flip a boundary rank. Ties (impossible unless hash AND weight
    collide) break on id.

    Non-positive weights are excluded (a zero weight must never be
    sampled; negative weights are undefined).

    Scale shape: global top-k via orderBy+limit compiles to
    TakeOrderedAndProject — per-partition heap of k, driver merges
    n_partitions×k candidate rows, no global sort shuffle. For k in
    the millions prefer a two-level variant (per-partition top-k, then
    repartition(1) top-k); at manifest-building sizes (k ≤ ~100k)
    this single-pass plan is the right one.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    key = (
        (F.lit(2) * _hash_u60(F.col(id_col), salt) + F.lit(1)).cast("double")
        / F.col(weight_col).cast("double")
    )
    return (
        df.where(F.col(weight_col) > 0)
        .withColumn("__key", key)
        .orderBy(F.col("__key").asc(), F.col(id_col).asc())
        .limit(k)
        .drop("__key")
    )


def contrastive_negatives(
    df: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    salt: str = "cneg-v1",
) -> DataFrame:
    """k deterministic uniform negatives per anchor over a DENSE
    0..N-1 id space: (anchor_id, j, negative_id) with
    negative_id = (id + 1 + H(salt:id:j) mod (N-1)) mod N.

    The negative-pair construction step of contrastive training
    (in-batch negatives bias toward whatever sharded together; this
    samples the WHOLE corpus uniformly). The +1 shift makes the
    anchor itself unreachable — offset ranges over [1, N-1] — and the
    md5 hash keeps the draw reproducible and engine-portable (rerun,
    backfill, or audit produces identical pairs). Draws are
    independent per j, so an anchor's negatives may repeat
    (with-replacement sampling — the standard contrastive setup; k is
    tiny relative to N, collisions are ~k²/N).

    Dense ids are a PRECONDITION (validated via one metadata-scale
    aggregate: min=0, max=N-1); sparse id spaces need a surrogate
    rank first (operators/ids). Scale: pure row-local projection
    exploded k-wide — no join against the corpus here; fetching the
    negatives' payloads downstream is a co-partitioned id equi-join.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    r = df.agg(
        F.min(id_col).alias("mn"),
        F.max(id_col).alias("mx"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    n = r["n"]
    if n < 2:
        raise ValueError(f"need >= 2 rows to sample negatives, got {n}")
    if r["mn"] != 0 or r["mx"] != n - 1:
        raise ValueError(
            f"{id_col} must be dense 0..N-1 (got min={r['mn']}, "
            f"max={r['mx']}, n={n}); build a surrogate rank first"
        )
    ks = df.select(
        F.col(id_col).alias("anchor_id"),
        # a generator can't nest inside cast(); cast the literals
        F.explode(
            F.array(*[F.lit(i).cast("long") for i in range(k)])
        ).alias("j"),
    )
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(salt),
                    F.lit(":"),
                    F.col("anchor_id").cast("string"),
                    F.lit(":"),
                    F.col("j").cast("string"),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    neg = F.pmod(
        F.col("anchor_id") + F.lit(1) + F.pmod(h, F.lit(n - 1)), F.lit(n)
    )
    return ks.select(
        "anchor_id", "j", neg.cast("long").alias("negative_id")
    )


def kfold(
    df: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    salt: str = "kfold-v1",
) -> DataFrame:
    """Deterministic k-fold assignment: fold = md5-hash(salt:id) mod k,
    appended as a ``fold`` column. The cross-validation sibling of
    hash_split: folds are disjoint and exhaustive by construction,
    stable under reruns/backfills (no shuffle-order dependence), and a
    document keeps its fold when the corpus grows — only NEW ids land
    in folds, existing assignments never migrate (the property that
    makes incremental re-training comparable across corpus versions).
    Row-local projection; no shuffle."""
    if k < 2:
        raise ValueError(f"k must be >= 2: {k}")
    return df.withColumn(
        "fold", F.pmod(_hash_u60(F.col(id_col), salt), F.lit(k))
    )
