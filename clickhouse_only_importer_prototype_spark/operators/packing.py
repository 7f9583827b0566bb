"""Sequence packing: lay a document corpus out as fixed-size training
sequences (GPT-style concat-then-chunk).

Semantics: documents are concatenated in ``order_col`` order into one
global token stream; the stream is cut every ``budget`` tokens. Each
document's placement is fully determined by the exclusive prefix sum
of token counts: ``start_tok`` (its offset in the stream),
``seq_first``/``seq_last`` (the first/last training sequence it
touches). Zero-token documents ride at their position (seq_last =
seq_first) without consuming budget.

Scale shape: the prefix sum is the whole problem — a naive
``sum().over(Window.orderBy(order_col))`` funnels 100 TB through ONE
task, the same cliff queries.surrogate_ids documents for ranking. Same
cure: range-bucket on the order key (optionally with skew-calibrated
boundaries from stats.py), per-bucket token totals to the driver
(dozens of rows), prefix-sum the offsets there, then an in-bucket
cumulative window that runs one task per bucket, all parallel. Two
passes over the data, no global sort, no single-task stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from clickhouse_only_importer_prototype_spark import stats
from clickhouse_only_importer_prototype_spark.localframe import arrow_local_df


def pack_sequences(
    df: DataFrame,
    tokens_col: Column | str,
    budget: int,
    order_col: str = "doc_id",
    bounds: list[int] | None = None,
    carry: list[str] | None = None,
) -> DataFrame:
    """(order_col, [carry...,] n_tokens, start_tok, seq_first,
    seq_last) per doc.

    ``tokens_col`` is a column/expression giving the document's token
    count (callers pick the tokenizer — e.g. text.wordpiece_count).
    ``bounds`` are optional ascending range-bucket split values for the
    order key (from stats.boundaries_from_stats); without them the key
    domain is split uniformly from a min/max pass. ``carry`` columns
    ride through unchanged — cheaper than re-deriving the input subplan
    for a post-hoc join when upstream is an expensive pipeline.

    Cache lifetime: the tokenized base frame is persisted (three
    consumers below) and the returned frame is lazy, so the persist
    follows the house caller-owns-unpersist contract — a long-lived
    session calling this repeatedly should ``spark.catalog.
    clearCache()`` (or let LRU evict) after its action; bench/gate
    runs clear between queries. Eagerly unpersisting here would drop
    the cache before the caller's action ever runs.
    """
    tc = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    carry = list(carry or [])
    # three consumers below (key min/max, bucket totals, the ranked
    # window itself); tokens_col is typically an expensive text
    # expression (wordpiece_count), so without a persist each pass
    # re-runs the full tokenize pipeline — the curriculum_order /
    # rank_gapless pattern. The persisted frame is order key + carry +
    # one long: the natural checkpoint before a global ordering.
    base = df.select(
        F.col(order_col), *carry, tc.cast("long").alias("n_tokens")
    ).persist()
    n_parts = int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    if bounds:
        bucket = stats.bucket_expr(order_col, bounds)
    else:
        lo, hi = base.agg(F.min(order_col), F.max(order_col)).first()
        if lo is None:  # empty input: emit the packed schema, no rows
            return base.select(
                F.col(order_col),
                *[F.col(c) for c in carry],
                F.col("n_tokens"),
                F.lit(0).cast("long").alias("start_tok"),
                F.lit(0).cast("long").alias("seq_first"),
                F.lit(0).cast("long").alias("seq_last"),
            )
        span = max(int(hi) - int(lo) + 1, 1)
        bucket = F.least(
            F.lit(n_parts - 1),
            F.floor((F.col(order_col) - F.lit(int(lo))) * n_parts / span),
        ).cast("int")
    bucketed = base.withColumn("__bkt", bucket)
    totals = {
        r["__bkt"]: r["toks"]
        for r in bucketed.groupBy("__bkt")
        .agg(F.sum("n_tokens").alias("toks"))
        .collect()
    }
    offsets, acc = [], 0
    for b in sorted(totals):
        offsets.append((b, acc))
        acc += int(totals[b])
    off_df = arrow_local_df(df.sparkSession, offsets, "__bkt int, __offset long")
    w = (
        Window.partitionBy("__bkt")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = (
        F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) + F.col("__offset")
    ).cast("long")
    return (
        bucketed.join(F.broadcast(off_df), "__bkt")
        .select(
            F.col(order_col),
            *[F.col(c) for c in carry],
            F.col("n_tokens"),
            start.alias("start_tok"),
            F.floor(start / budget).cast("long").alias("seq_first"),
            F.floor(
                (start + F.greatest(F.col("n_tokens"), F.lit(1)) - 1) / budget
            )
            .cast("long")
            .alias("seq_last"),
        )
    )
