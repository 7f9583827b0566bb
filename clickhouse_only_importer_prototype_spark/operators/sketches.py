"""Bounded-memory frequency sketching: Misra-Gries heavy hitters with
an exact rescore pass.

The crawl-profiling question "which n-grams / URLs / domains exceed
x% of the corpus?" has two Spark shapes. When distinct-key cardinality
is vocabulary-scale (Zipf text tokens), a plain map-side-combinable
groupBy is already optimal — the shuffle carries at most |vocab| rows
per mapper. But when the key space is data-scale (full URLs, 13-gram
shingles, user agents), partial aggregation degenerates: every mapper
emits nearly its whole input and the shuffle IS the dataset. That is
the regime this module exists for: a Misra-Gries summary per input
partition (fixed k counters, one pass, no shuffle) nominates a small
candidate set, and only candidates are counted exactly.

Guarantee (weighted Misra-Gries): a summary with k counters
undercounts any key by at most n_p/(k+1) decrement mass in a
partition of n_p tokens, so a key with partition count > n_p/(k+1)
always survives. If a key's GLOBAL count is >= N/den then by averaging
some partition holds >= n_p/den of it, so k = 2*den counters make the
candidate set a superset of the true >= N/den heavy hitters — the
exact rescore then removes false positives. The final output is
therefore EXACT (set equality with the full groupBy answer), which is
what lets a DuckDB oracle hash-match it; only the intermediate
candidate nomination is approximate.

Scale: the MG pass is mapInPandas with O(k) state and no shuffle; the
candidate set is <= k per input partition (bounded by sketch size,
not data); the rescore is a broadcast LEFT SEMI prune of the token
stream followed by a groupBy whose key space is the candidate set.
Nothing in the pipeline shuffles the full key cardinality.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

from clickhouse_only_importer_prototype_spark.localframe import arrow_local_df


def bigram_tokens(text_norm: Column) -> Column:
    """Adjacent-word-pair array from a normalized text column: split
    on single spaces, zip the array against itself shifted by one,
    drop pairs touching an empty token. Pure JVM higher-order
    functions — the tokenize stage stays inside whole-stage codegen.

    Shape matters here: zip_with over two slice()s references the
    split array a constant number of times per ROW. The tempting
    transform(sequence(...), i -> ts[i] ...) form references ``ts``
    inside the lambda, and Catalyst inlines the whole
    split(regexp_replace(...)) subtree at every reference — i.e.
    re-tokenizes the document once per ELEMENT (measured 20x slower
    on the documents corpus). slice() length is clamped >= 0 (a
    1-token doc would otherwise pass a negative length)."""
    ts = F.split(text_norm, " ")
    n = F.greatest(F.size(ts) - 1, F.lit(0))
    pairs = F.zip_with(
        F.slice(ts, 1, n),
        F.slice(ts, 2, n),
        lambda a, b: F.when(
            (a != "") & (b != ""), F.concat(a, F.lit(" "), b)
        ),
    )
    return F.filter(pairs, lambda x: x.isNotNull())


def misra_gries_candidates(
    tokens: DataFrame, tok_col: str, k: int
) -> DataFrame:
    """One-column frame of per-partition Misra-Gries survivors (the
    candidate heavy hitters), at most k per input partition.

    mapInPandas receives each partition as an iterator of Arrow
    batches, so one generator call = one partition = one summary:
    counters persist across batches and only the surviving KEYS are
    emitted. Each batch is pre-folded with value_counts (vectorized)
    so the Python dict sees one weighted insert per distinct token per
    batch, not one per row. The decrement step subtracts the minimum
    counter from all k+1 counters at once — the weighted-MG form whose
    total decrement mass is bounded by n_p/(k+1) per counter."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    def mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        for pdf in batches:
            for tok, cnt in pdf[tok_col].value_counts().items():
                if tok in counters:
                    counters[tok] += int(cnt)
                else:
                    counters[tok] = int(cnt)
                    if len(counters) > k:
                        m = min(counters.values())
                        counters = {
                            t: c - m for t, c in counters.items() if c > m
                        }
        yield pd.DataFrame({tok_col: list(counters.keys())})

    return tokens.mapInPandas(mg, f"{tok_col} string")


def heavy_hitters(
    tokens: DataFrame,
    tok_col: str,
    den: int,
    counters: int | None = None,
    persist: bool = True,
) -> DataFrame:
    """Exact tokens with global frequency >= total/den, found via
    MG-candidate nomination + exact rescore of candidates only.
    Returns (token, n_occurrences, share_1e6) with share_1e6 =
    n * 1e6 div total (floor; int64-safe to ~9e12 total tokens —
    beyond that widen to decimal, same as table_checksum's sum).

    Three passes over the token stream (total count, MG nomination,
    candidate rescore), none of which shuffles more than the
    candidate set. ``persist=True`` (default) caches the token frame
    so tokenization runs once, not three times — the cache is sized
    by the token stream; at corpus scales where that doesn't fit
    memory-and-disk, pass False and pay the extra tokenize passes
    instead (they are scan-local, no shuffle either way).
    ``counters`` defaults to 2*den, the smallest sketch that makes
    nomination a guaranteed superset (see module docstring); raising
    it only shrinks the false-positive rescore."""
    if den < 1:
        raise ValueError(f"den must be >= 1, got {den}")
    k = 2 * den if counters is None else counters
    if persist:
        tokens = tokens.persist()
    total = tokens.count()
    cands = misra_gries_candidates(tokens, tok_col, k).distinct()
    out = (
        tokens.join(F.broadcast(cands), tok_col, "left_semi")
        .groupBy(tok_col)
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .where(F.col("n_occurrences") * den >= F.lit(total))
        .select(
            F.col(tok_col).alias("token"),
            "n_occurrences",
            F.expr(f"n_occurrences * 1000000 div {total}").alias(
                "share_1e6"
            ),
        )
    )
    if not persist:
        return out
    # at most den tokens can hold a >= 1/den share (pigeonhole), so the
    # result is bounded-small by construction: materialize it, release
    # the cached token frame (a session running many audits must not
    # accumulate cached corpora), and hand back a local frame
    schema = out.schema
    rows = out.collect()
    tokens.unpersist()
    return arrow_local_df(tokens.sparkSession, rows, schema)


def rolling_distinct_estimate(
    keyed: DataFrame,
    key_col: str,
    bucket_col: str,
    window: int = 7,
    lg_k: int = 12,
) -> DataFrame:
    """(bucket, est): approximate COUNT(DISTINCT key) over the trailing
    ``window`` buckets ending at each bucket — the sketch-native shape
    of a rolling-WAU/MAU metric.

    Why a sketch is the only 100 TB shape: the exact rolling distinct
    count is not decomposable — a (user, day) row must reach EVERY
    window that covers it, so the exact plan replicates the distinct
    active-set ``window``-fold and pays one corpus-scale
    COUNT(DISTINCT) shuffle per replica (queries.events_wau: 700M
    expanded rows at the 100M-event tier). HLL sketches ARE mergeable,
    which moves the replication from data rows to sketch digests:

      1. one groupBy(bucket) folds the key stream into ONE Datasketches
         HLL sketch per bucket (hll_sketch_agg: map-side partial merge,
         the shuffle carries <= 2^lg_k bytes per bucket per mapper);
      2. the window replication explodes the per-bucket SKETCH rows —
         n_buckets x window rows total, metadata-scale regardless of
         corpus size;
      3. hll_union_agg + hll_sketch_estimate per window-end bucket.

    Standard error is ~1.04/sqrt(2^lg_k) (~1.6% at the default lg_k=12,
    a 4 KB sketch); callers pin their own tolerance against an exact
    twin at gate scale (queries.events_wau_approx asserts 5%).

    Trailing window-end buckets past the data's last bucket are NOT
    cut here (the caller knows its domain bound); leading partial
    windows are reported, matching events_wau's contract.
    """
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    b = F.col(bucket_col)
    daily = keyed.groupBy(bucket_col).agg(
        F.hll_sketch_agg(key_col, F.lit(lg_k)).alias("__sk")
    )
    ends = daily.select(
        F.explode(F.sequence(b, b + F.lit(window - 1))).alias(bucket_col),
        "__sk",
    )
    return ends.groupBy(bucket_col).agg(
        F.hll_sketch_estimate(F.hll_union_agg("__sk")).alias("est")
    )
