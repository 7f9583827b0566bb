"""Per-user daily rate-limit audit — the ingestion-throttling /
abuse-detection primitive: how many events per user-day exceed the
allowed budget, as a running stateful count over the event stream.

Two wire-ups of the SAME semantics:

- ``applyInPandasWithState`` (the API the sessionizer uses,
  streaming/events.py:164): state is the per-user (day buckets,
  counts) pair of arrays.
- ``transformWithStateInPandas`` (the Spark 4 StatefulProcessor
  surface: typed MapState handle keyed by day bucket, per-key pandas
  iteration) — where Structured Streaming's custom-state API is
  headed. Its Python worker requires the ``google.protobuf`` package
  and the RocksDB state store provider; THIS container ships neither
  protobuf nor a way to install it, so the path is environment-gated
  exactly like the media codecs: real code, importable and unit-
  covered up to the gate, selected automatically when the runtime
  supports it.

``api="auto"`` picks transformWithState when protobuf is importable,
else applyInPandas. Output rows are update-mode re-statements of a
(user, day)'s running count; n_events is monotonically non-decreasing
across batches, so a multi-batch run collapses downstream with
max(n_events) per key.

State shape at scale: one entry per (user, active day) — bounded by
the retention the caller enforces (a production deployment expires
old day buckets via timers / state TTL; the audit twin runs bounded
fixtures and keeps the processors minimal). Counts are merged
batch-side per day FIRST (vectorized value_counts), so state
round-trips per (user, day), not per event.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import LongType, StructField, StructType

DAY_NS = 86_400_000_000_000

_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("day_bucket", LongType(), False),
        StructField("n_events", LongType(), False),
        StructField("n_throttled", LongType(), False),
    ]
)


def _fold_batches(pdfs) -> dict[int, int]:
    """Per-day event counts for one key's batch input (vectorized)."""
    batch: dict[int, int] = {}
    for pdf in pdfs:
        for b, c in (pdf["ts"] // DAY_NS).value_counts().items():
            batch[int(b)] = batch.get(int(b), 0) + int(c)
    return batch


def new_api_available() -> bool:
    """transformWithStateInPandas needs the protobuf-based state
    client in its Python worker (and the RocksDB provider JVM-side)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def throttle_audit_apply(events: DataFrame, limit: int = 3) -> DataFrame:
    """applyInPandasWithState wiring: state = parallel arrays of
    (day bucket, running count) per user."""
    if limit < 1:
        raise ValueError(f"limit must be >= 1: {limit}")
    # arrays of longs — applyInPandasWithState state rows are plain
    # tuples matching this struct
    from pyspark.sql.types import ArrayType

    state_schema = StructType(
        [
            StructField("buckets", ArrayType(LongType()), True),
            StructField("counts", ArrayType(LongType()), True),
        ]
    )

    def fn(key, pdfs, state):
        (user_id,) = key
        batch = _fold_batches(pdfs)
        held: dict[int, int] = {}
        if state.exists:
            buckets, counts = state.get
            held = dict(zip(buckets, counts))
        out = []
        for b in sorted(batch):
            n = held.get(b, 0) + batch[b]
            held[b] = n
            out.append((user_id, b, n, max(0, n - limit)))
        ks = sorted(held)
        state.update((ks, [held[k] for k in ks]))
        if out:
            yield pd.DataFrame(
                out,
                columns=[
                    "user_id",
                    "day_bucket",
                    "n_events",
                    "n_throttled",
                ],
            )

    return events.select("user_id", "ts").groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=_OUT_SCHEMA,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf="NoTimeout",
    )


def make_processor(limit: int = 3):
    """StatefulProcessor for the Spark 4 API (env-gated; see module
    docstring). Defined inside a factory so importing this module
    never requires the gated dependencies."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    if limit < 1:
        raise ValueError(f"limit must be >= 1: {limit}")

    class ThrottleProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self.counts = handle.getMapState(
                "day_counts", "bucket long", "n long"
            )

        def handleInputRows(self, key, rows, timerValues):
            batch = _fold_batches(rows)
            out = []
            for b in sorted(batch):
                prev = (
                    int(self.counts.getValue((b,))[0])
                    if self.counts.containsKey((b,))
                    else 0
                )
                n = prev + batch[b]
                self.counts.updateValue((b,), (n,))
                out.append((key[0], b, n, max(0, n - limit)))
            yield pd.DataFrame(
                out,
                columns=[
                    "user_id",
                    "day_bucket",
                    "n_events",
                    "n_throttled",
                ],
            )

        def close(self) -> None:
            pass

    return ThrottleProcessor()


def throttle_audit_tws(events: DataFrame, limit: int = 3) -> DataFrame:
    """transformWithStateInPandas wiring (requires protobuf in the
    Python workers AND spark.sql.streaming.stateStore.providerClass =
    RocksDBStateStoreProvider on the query)."""
    return (
        events.select("user_id", "ts")
        .groupBy("user_id")
        .transformWithStateInPandas(
            make_processor(limit),
            _OUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


def throttle_audit(
    events: DataFrame, limit: int = 3, api: str = "auto"
) -> DataFrame:
    """Rate-limit audit over a streaming events frame carrying
    raw-long-nanos ``ts`` (streaming/events.normalize_ts). ``api``:
    'apply' | 'tws' | 'auto' (tws when the runtime supports it)."""
    if api == "auto":
        api = "tws" if new_api_available() else "apply"
    if api == "apply":
        return throttle_audit_apply(events, limit)
    if api == "tws":
        return throttle_audit_tws(events, limit)
    raise ValueError(f"unknown api: {api!r}")
