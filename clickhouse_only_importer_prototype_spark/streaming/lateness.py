"""Watermark lateness semantics — the DROP rule, exercised for real.

The reference has no streaming at all (SURVEY §2.8; its Go pipeline is
bounded batch), and the engine's other eight streaming twins run their
fixture through a single availableNow micro-batch or in update mode —
regimes where ``withWatermark``'s late-data eviction can never fire.
This module is the missing semantic: an APPEND-mode windowed count
whose state is finalized by the watermark, so a row arriving in a
later micro-batch with an event time whose window is already closed is
DROPPED by Spark's stateful aggregation, not merged.

Mechanics being pinned (public Structured Streaming contract):

* the watermark advances to ``max(event_time seen) - delay`` at the
  END of a micro-batch, and takes effect for the NEXT batch;
* in append mode a window is emitted exactly once, when the watermark
  passes its end; state for the window is then evicted;
* input rows whose window is at-or-below the watermark are dropped and
  surface in ``StreamingQueryProgress.stateOperators[*]
  .numRowsDroppedByWatermark``.

The batch twin of a stream with drops is therefore NOT the plain
rollup: it is the rollup over ``events MINUS the late cohort`` — the
oracle filters by the same deterministic cutoff the harness used to
route rows into the late micro-batch (queries.stream_late_drop).

Scale: the watermark is exactly what bounds state at 100 TB — without
eviction a windowed aggregation over an unbounded stream accretes one
state row per (window, key) forever. This twin is the proof that the
engine's eviction actually evicts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

HOUR_NS = 3_600_000_000_000


def windowed_counts_append(
    df: DataFrame, window: str = "1 hour", delay: str = "1 hour"
) -> DataFrame:
    """Tumbling per-type counts, watermarked for APPEND mode.

    Unlike events.tumbling_counts (update mode — every touched window
    re-emits each batch) this shape is for append sinks: each window
    row is emitted exactly once, after the watermark passes its end,
    and late rows below the watermark are dropped. Works on batch
    frames too (watermark is a no-op there) so tests can diff the two
    regimes directly."""
    src = df
    if df.isStreaming:
        src = df.withWatermark("event_time", delay)
    return (
        src.groupBy(F.window("event_time", window), F.col("event_type"))
        .agg(F.count("*").cast("long").alias("n_events"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
        )
    )


def dropped_by_watermark(progress_rows: list) -> int:
    """Total rows dropped by watermark across a query's recorded
    progress. ``progress_rows`` is ``query.recentProgress`` (list of
    per-batch dicts); each batch reports per-state-operator
    ``numRowsDroppedByWatermark``. NOTE the counter ticks at the
    stateful operator, i.e. AFTER partial aggregation — it counts
    dropped partial-aggregate rows, not raw input rows, so callers
    assert ``> 0`` (the mechanism fired) and prove the exact extent
    via the oracle equality instead."""
    total = 0
    for p in progress_rows or []:
        for op in (p or {}).get("stateOperators", []) or []:
            total += int(op.get("numRowsDroppedByWatermark", 0) or 0)
    return total


def late_cutoff_ns(tmax_ns: int, delay_ns: int = HOUR_NS) -> int:
    """The deterministic lateness cutoff for a fixture whose max event
    time is ``tmax_ns``: one full window BELOW the hour-floor of the
    post-primer watermark (``tmax - delay``). Rows under this cutoff
    sit in windows that end strictly (>= one window) below the
    watermark, so their drop is unambiguous under either boundary
    convention (event-time < wm, or window.end <= wm) — the
    construction never places a row in the gray window containing the
    watermark itself. Positive-domain floor (fixture timestamps are
    epoch-positive)."""
    if tmax_ns <= 0:
        raise ValueError(f"expected epoch-positive max ts: {tmax_ns}")
    return ((tmax_ns - delay_ns) // HOUR_NS) * HOUR_NS - HOUR_NS


def removed_rows(progress_rows: list) -> int:
    """Total state rows REMOVED (evicted) across a query's recorded
    progress — the companion counter to dropped_by_watermark: drops
    prove late input died at the door, removals prove expired state
    left the store. Used by the eviction-asserting twins
    (stream_dedup_eviction, stream_session_native)."""
    total = 0
    for p in progress_rows or []:
        for op in (p or {}).get("stateOperators", []) or []:
            total += int(op.get("numRowsRemoved", 0) or 0)
    return total
