"""Query catalog: every operator surfaced as a (Spark builder, DuckDB
oracle SQL) pair for the driver's correctness gate.

Cross-engine determinism rules (both sides follow them):
  * Money math in exact decimals: inputs are 2-dp doubles; cast to
    DECIMAL before arithmetic/aggregation (exact, associative), cast
    the final aggregate to DOUBLE (same exact decimal -> same bits).
  * Averages = decimal-sum-as-double / count (decimal division scales
    differ between engines; double division of identical inputs
    doesn't).
  * Counts/ids/ratios as BIGINT; scores int-scaled (floor(x * 1e6)).
  * Dates emitted as formatted strings; event timestamps as raw
    nanos (Spark reads TIMESTAMP(NANOS) as long via nanosAsLong,
    DuckDB via epoch_ns).
  * Deterministic ORDER BY + tie-breaks anywhere a LIMIT applies.

Each entry also carries the scale rationale in its docstring — these
run on local[32] here, but the plan shapes (broadcasts, partial aggs,
no global sorts outside explicit top-k) are the 100 TB design.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession, Window, functions as F
from pyspark.sql.types import TimestampNTZType, TimestampType

from clickhouse_only_importer_prototype_spark import stats
from clickhouse_only_importer_prototype_spark.operators import (
    ann_index as annix_ops,
    cdc as cdc_ops,
    dedup as dedup_ops,
    graph as graph_ops,
    ids as ids_ops,
    incremental as inc_ops,
    layout as layout_ops,
    multimodal as mm_ops,
    packing as packing_ops,
    sampling as sampling_ops,
    similarity as sim_ops,
    sketches as sketch_ops,
    temporal as temporal_ops,
    text as text_ops,
)
from clickhouse_only_importer_prototype_spark.operators.cna import (
    genetic_alterations_from_long,
)
from clickhouse_only_importer_prototype_spark.localframe import arrow_local_df

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, sql: str | None):
    def deco(fn: QueryFn) -> QueryFn:
        _REGISTRY[name] = fn
        if sql is not None:
            _ORACLES[name] = sql
        return fn

    return deco


def _dbl(col: Column) -> Column:
    """Exact int64 -> double cast (lossless below 2^53) — the building
    block of row-local IEEE closed forms that must hash bit-identically
    against the DuckDB oracle's CAST(x AS DOUBLE)."""
    return col.cast("double")


def ORACLE_FLOORDIV(expr: str, width: int) -> str:
    """Floor-division fragment for DuckDB oracles. DuckDB 1.0's integer
    ``//`` truncates toward zero (``-7 // 2 = -3``), same as Spark's
    ``div`` — but the engine buckets timestamps with exact FLOOR
    (operators/temporal._floordiv_sql), so oracles must apply the same
    remainder-sign correction or negative pre-epoch instants would
    bucket one slot apart across engines."""
    return (
        f"(({expr}) // {width} - "
        f"CASE WHEN ({expr}) % {width} < 0 THEN 1 ELSE 0 END)"
    )


_SCHEMA_CACHE: dict[tuple[str, str], object] = {}

_RUNTIME_CONF = (
    # externally-built sessions (the driver's) may lack the engine conf;
    # all of these are runtime-settable and load() is the common gate
    ("spark.sql.session.timeZone", "UTC"),  # timestamp literals vs DuckDB
    ("spark.sql.adaptive.enabled", "true"),
    ("spark.sql.adaptive.coalescePartitions.enabled", "true"),
    ("spark.sql.execution.arrow.pyspark.enabled", "true"),
    ("spark.sql.shuffle.partitions", "32"),
    # broadcast policy: hints mark bounded frames only; scaling dims
    # rely on size-based selection being generous enough to pick them
    # up while they fit (see session.py for the 64m rationale)
    ("spark.sql.autoBroadcastJoinThreshold", "64m"),
    ("spark.sql.adaptive.autoBroadcastJoinThreshold", "64m"),
    # runtime bloom-filter pruning at fact scale (see session.py):
    # q19 at the 600M-row tier 142.5s -> 7.8-16s; sub-1GB scans never
    # pay a bloom build
    ("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "256MB"),
    (
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold",
        "1GB",
    ),
)
_CONF_APPLIED: set[str] = set()


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    # keyed by applicationId, not id(spark): a GC'd session's address
    # can be reused by a fresh unconfigured one
    app_id = spark.sparkContext.applicationId
    if app_id not in _CONF_APPLIED:
        for k, v in _RUNTIME_CONF:
            try:
                spark.conf.set(k, v)
            except Exception:
                pass
        _CONF_APPLIED.add(app_id)
    if table == "events":
        # TIMESTAMP(NANOS) parquet reads as long nanos only with this
        # conf (driver sessions may not have it; runtime-settable)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = f"{sf_dir}/{table}.parquet"
    key = (sf_dir, table)
    cached = _SCHEMA_CACHE.get(key)
    if cached is None:
        df = spark.read.parquet(path)
        _SCHEMA_CACHE[key] = df.schema
    else:
        # skip the footer/schema-inference pass on repeat loads
        df = spark.read.schema(cached).parquet(path)
    if table == "events":
        df = _ts_to_nanos(df)
    return df


_FOOTER_META: dict[tuple, tuple[int, int] | None] = {}


def _footer_meta(sf_dir: str, table: str) -> tuple[int, int] | None:
    """(num_rows, num_row_groups) from the parquet footer — a
    metadata-only probe, no Spark job. Keyed by mtime so an in-process
    fixture regeneration (or a cached probe error) never pins stale
    metadata for the process lifetime (round-12 ADVICE fix)."""
    path = f"{sf_dir}/{table}.parquet"
    try:
        mtime = os.stat(path).st_mtime_ns
    except OSError:
        mtime = None
    key = (sf_dir, table, mtime)
    if key not in _FOOTER_META:
        try:
            import pyarrow.parquet as pq

            md = pq.ParquetFile(path).metadata
            _FOOTER_META[key] = (md.num_rows, md.num_row_groups)
        except Exception:
            _FOOTER_META[key] = None
    return _FOOTER_META[key]


def _footer_rows(sf_dir: str, table: str) -> int | None:
    """Exact row count of an UNFILTERED table scan, from the parquet
    footer (None when unreadable). Passed to the ANN trainers as their
    sizing count so the per-query count job disappears — exactness
    matters (the sliver, and therefore the trained centroids, depend
    on it), which is why this only ever describes a bare ``load`` of
    the table, never a filtered/derived frame."""
    meta = _footer_meta(sf_dir, table)
    return None if meta is None else meta[0]


def _sload(
    spark: SparkSession, sf_dir: str, table: str, max_rows: int | None = None
) -> DataFrame:
    """``load`` + scan fan-out for CPU-dense per-row pipelines
    (shingling, tokenize+explode, hashing): guide §2.5's
    unsplittable-input fix, footer-gated so it disappears at scale.

    A parquet file splits into at most one scan task per ROW GROUP, so
    the single-row-group bench fixtures (documents: 5k rows, 1 group)
    run every downstream explode/hash in ONE task however many cores
    exist — measured r11: dedup_containment's shingle build 1.6s and
    bigram_lm_scores' three concurrent explode subtrees 2.7s each, all
    single-task. A round-robin repartition right after the read spreads
    that work across the session's cores.

    Footer gate (same metadata-only pattern as _collapse_gate): when
    the file already carries >= half-the-cores row groups the scan
    parallelizes by itself and the frame passes through UNTOUCHED — at
    production layouts (the 10x/100x gen writes ~16 MB groups) this
    helper adds no exchange, no plan change. Tiny frames (< 256 rows)
    also pass through: the exchange would cost more than it spreads.
    Only used by queries whose downstream per-row work dwarfs the
    one-task parquet decode; plain scan+aggregate queries keep bare
    ``load`` (the decode itself is their floor, and an extra exchange
    buys nothing).

    ``max_rows``: per-site ceiling for consumers whose plan changes
    shape past a corpus size — dedup_ngram_jaccard's representative
    collapse (gate: 20k rows) moves the explode onto the collapsed
    frame, where a pre-collapse fan-out only disturbs the join-size
    statistics (measured at the 10x tier: 5.9s -> 8.4s with fan-out,
    all other _sload sites improved). Align the ceiling with the
    consumer's own collapse threshold."""
    df = load(spark, sf_dir, table)
    meta = _footer_meta(sf_dir, table)
    if meta is None:
        return df
    rows, groups = meta
    cores = spark.sparkContext.defaultParallelism
    if rows < 256 or groups >= max(2, cores // 2):
        return df
    if max_rows is not None and rows > max_rows:
        return df
    return df.repartition(min(cores, max(8, rows // 64)))


_MEDIA_FIXTURE_DIRS: dict[tuple[str, str], str] = {}

_MEDIA_SYNTH = {
    "ppm": mm_ops.documents_as_ppm_media,
    "wav": mm_ops.documents_as_wav_media,
    "avi": mm_ops.documents_as_avi_media,
    "av": mm_ops.documents_as_av_media,
}


def media_fixture(spark: SparkSession, sf_dir: str, kind: str) -> DataFrame:
    """Synthesized media payloads for ``documents`` as a session-cached
    parquet fixture (round-7 verdict #4). The JVM hex-assembly
    synthesis (documents_as_*_media) exists only because the driver
    testdata ships no binary columns — in production, payloads are
    STORED data. Timing the synthesis inside every media query row
    therefore double-charges the operator under test (at the 1000x
    tier, av_demux was ~76s synthesis vs ~38s walk). Each (sf_dir,
    kind) synthesizes ONCE per session into a tempdir parquet; every
    subsequent call is a plain parquet scan of identical bytes, so
    oracles are unchanged and bench rows measure the walk. bench.py
    pre-builds the fixtures outside the timed region and reports the
    synthesis cost as its own metric."""
    key = (sf_dir, kind)
    path = _MEDIA_FIXTURE_DIRS.get(key)
    if path is None:
        import atexit
        import shutil
        import tempfile

        path = tempfile.mkdtemp(prefix=f"media_fixture_{kind}_")
        # register cleanup BEFORE the write: a mid-write failure (disk
        # full, executor loss) must not orphan a half-written tempdir
        atexit.register(shutil.rmtree, path, ignore_errors=True)
        _MEDIA_SYNTH[kind](load(spark, sf_dir, "documents")).write.mode(
            "overwrite"
        ).parquet(path)
        _MEDIA_FIXTURE_DIRS[key] = path
    return spark.read.parquet(path)


def _collapse_gate(
    sf_dir: str, table: str, min_rows: int = 100_000
) -> bool | None:
    """Footer-count pre-gate for the embedding dup-ratio probes
    (round-5 verdict #5): the similarity operators' HLL probe decides
    whether the representative-collapse rewrite pays, but the probe is
    itself one aggregate JOB over the corpus — at toy scale (2k vectors
    at sf0.1) the probe jobs cost more than the collapse could ever
    save (measured: semantic_dedup 2.5s -> 4.7s when the r5 probes
    landed). One metadata-only parquet-footer row count settles it:

      * rows < min_rows  -> False (skip the probe AND the collapse —
        both-paths-equal is pinned by tests, so this is cost-only);
      * rows >= min_rows -> None  (let the operator probe; the 100x
        tier is where collapse took embedding_neardup >15min -> 14.1s);
      * unreadable footer (dir-of-fragments, remote FS) -> None — fall
        back to the probe, never to a blind skip.

    min_rows=100k sits between the 10x tier (20k vectors: probe never
    pays) and the 100x tier (200k: probe decides).
    """
    try:
        import pyarrow.parquet as pq

        rows = pq.ParquetFile(
            f"{sf_dir}/{table}.parquet"
        ).metadata.num_rows
    except Exception:
        return None
    return False if rows < min_rows else None


def _ts_to_nanos(df: DataFrame) -> DataFrame:
    """Normalize ``events.ts`` to raw long nanos regardless of the
    parquet physical type. Driver fixtures have shipped both
    TIMESTAMP(NANOS) (read as long via nanosAsLong — pass-through) and
    timestamp[us] (read as TIMESTAMP_NTZ — converted here). Session
    timezone is UTC, so the NTZ -> instant interpretation matches
    DuckDB's ``epoch_ns`` on the same naive timestamps, and every
    query/oracle keeps the established raw-nanos contract."""
    t = df.schema["ts"].dataType
    if isinstance(t, (TimestampType, TimestampNTZType)):
        ns = F.unix_micros(F.col("ts").cast("timestamp_ltz")) * F.lit(1000)
        return df.withColumn("ts", ns.cast("long"))
    return df


def _dec(col: str | Column, prec: int = 12, scale: int = 2) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({prec},{scale})")


def _revenue() -> Column:
    """price * (1 - discount) in exact decimal."""
    one = F.lit(1).cast("decimal(6,4)")
    return _dec("l_extendedprice") * (one - _dec("l_discount", 6, 4))


# Keep every intermediate inside DECIMAL(38): DuckDB silently converts
# to DOUBLE when a decimal product would exceed width 38, which breaks
# exactness — so literals are cast tight and the tax multiplier is
# folded into the discount multiplier before touching the price.
_SQL_ONE = "CAST(1.0 AS DECIMAL(6,4))"
_SQL_REV = (
    f"CAST(l_extendedprice AS DECIMAL(12,2)) * ({_SQL_ONE} - CAST(l_discount AS DECIMAL(6,4)))"
)
_SQL_CHARGE = (
    "CAST(l_extendedprice AS DECIMAL(12,2)) * "
    f"(({_SQL_ONE} - CAST(l_discount AS DECIMAL(6,4))) * "
    f"({_SQL_ONE} + CAST(l_tax AS DECIMAL(6,4))))"
)


# --------------------------------------------------------------------------
# TPC-H-style analytics: scan/filter/project/agg/join/window/sort/limit
# --------------------------------------------------------------------------


# Exact decimal-string -> double rendering of a scaled-integer sum:
# one correctly-rounded parse of the exact decimal string, identical
# on both engines by construction (no decimal division/precision rules
# anywhere). ip/fp are the integer/fraction longs, width = scale.
def _SCALED_DOUBLE_SQL(ip: str, fp: str, width: int) -> str:
    # STRING parses as a type on both engines (Spark rejects bare
    # VARCHAR; DuckDB accepts STRING as a VARCHAR alias)
    return (
        f"CAST(concat(CAST({ip} AS STRING), '.', "
        f"lpad(CAST({fp} AS STRING), {width}, '0')) AS DOUBLE)"
    )


@register(
    "q1_pricing_summary",
    f"""
    WITH c AS (
      SELECT l_returnflag, l_linestatus,
             CAST(round(l_quantity * 100) AS BIGINT) AS qc,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS pc,
             CAST(round(l_discount * 10000) AS BIGINT) AS d4,
             CAST(round(l_tax * 10000) AS BIGINT) AS t4
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
    ),
    g AS (
      SELECT l_returnflag, l_linestatus,
             SUM(qc) AS sq, SUM(pc) AS sp,
             SUM(pc * (10000 - d4)) AS sr,
             SUM(pc * (10000 - d4) * (10000 + t4)) AS sch,
             COUNT(*) AS n
      FROM c GROUP BY l_returnflag, l_linestatus
    )
    SELECT l_returnflag, l_linestatus,
           {_SCALED_DOUBLE_SQL('sq // 100', 'sq % 100', 2)} AS sum_qty,
           {_SCALED_DOUBLE_SQL('sp // 100', 'sp % 100', 2)} AS sum_base_price,
           {_SCALED_DOUBLE_SQL('sr // 1000000', 'sr % 1000000', 6)} AS sum_disc_price,
           {_SCALED_DOUBLE_SQL('sch // 10000000000', 'sch % 10000000000', 10)} AS sum_charge,
           {_SCALED_DOUBLE_SQL('sq // 100', 'sq % 100', 2)} / n AS avg_qty,
           n AS count_order
    FROM g
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: filtered scan -> partial+final hash agg.

    Scale: map-side combine on 6 cells/group × 6 groups — the shuffle
    carries ~groups×partitions rows, independent of input size.

    Arithmetic: exact SCALED-INT64, not decimal. The natural
    decimal form (price(12,2) × multiplier(14,8) = precision-27
    intermediates) runs every per-row multiply through Spark's
    BigDecimal slow path — measured 13.1s for the charge sum alone vs
    1.7s for the long path over 60M rows. Instead each measure is an
    exact scale-k integer (cents / per-10^6 revenue / per-10^10
    charge; the round(x*10^k)-to-BIGINT derivation is this repo's
    established cross-engine cents convention), the per-row products
    and sums stay in whole-stage-codegen longs, and the only
    non-int64-safe quantity — the grand total — is carried as two
    longs (integer part + fraction part, split per row BEFORE the
    sum; exact because every term is non-negative). The final double
    is parsed from the exact decimal string the two longs spell, so
    both engines round once from the same exact rational — no decimal
    precision/division rules involved. ANSI overflow bounds (crash,
    never corruption): per-row charge needs price·(1-d)(1+t) <
    $9.2e8; fraction sums clear int64 to ~1000x this corpus.
    """
    l = load(spark, sf_dir, "lineitem")
    pre = l.where(
        F.col("l_shipdate") <= F.to_timestamp(F.lit("1998-09-01"))
    ).selectExpr(
        "l_returnflag",
        "l_linestatus",
        "CAST(round(l_quantity * 100) AS BIGINT) AS qc",
        "CAST(round(l_extendedprice * 100) AS BIGINT) AS pc",
        "CAST(round(l_discount * 10000) AS BIGINT) AS d4",
        "CAST(round(l_tax * 10000) AS BIGINT) AS t4",
    ).selectExpr(
        "l_returnflag",
        "l_linestatus",
        "qc",
        "pc",
        "pc * (10000 - d4) AS rev6",
        "pc * (10000 - d4) * (10000 + t4) AS ch10",
    )
    agg = pre.groupBy("l_returnflag", "l_linestatus").agg(
        F.expr("SUM(qc)").alias("sq"),
        F.expr("SUM(pc)").alias("sp"),
        F.expr("SUM(rev6 div 1000000)").alias("sri"),
        F.expr("SUM(rev6 % 1000000)").alias("srf"),
        F.expr("SUM(ch10 div 10000000000)").alias("sci"),
        F.expr("SUM(ch10 % 10000000000)").alias("scf"),
        F.count("*").alias("n"),
    )
    return agg.selectExpr(
        "l_returnflag",
        "l_linestatus",
        f"{_SCALED_DOUBLE_SQL('sq div 100', 'sq % 100', 2)} AS sum_qty",
        f"{_SCALED_DOUBLE_SQL('sp div 100', 'sp % 100', 2)} AS sum_base_price",
        f"""{_SCALED_DOUBLE_SQL(
            'sri + srf div 1000000', 'srf % 1000000', 6
        )} AS sum_disc_price""",
        f"""{_SCALED_DOUBLE_SQL(
            'sci + scf div 10000000000', 'scf % 10000000000', 10
        )} AS sum_charge""",
        f"{_SCALED_DOUBLE_SQL('sq div 100', 'sq % 100', 2)} / n AS avg_qty",
        "n AS count_order",
    )


@register(
    "q3_shipping_priority",
    f"""
    SELECT l.l_orderkey,
           CAST(CAST(SUM({_SQL_REV.replace('l_', 'l.l_')}) AS VARCHAR) AS DOUBLE) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           o.o_orderpriority AS orderpriority
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter -> fact join -> top-k.

    Scale: no hints — customer broadcasts by SIZE (compile-time footer
    estimate under the session threshold), and the orders⨝customer
    build side is fact-derived (scales with data; 3M rows at the 100x
    stress scale), so AQE decides it from measured shuffle sizes
    instead of a force-broadcast that would collect an unbounded frame
    on the driver. Measured at 100x: hinted 52.2s → size-based 9.9s.
    Top-10 via global sort of the tiny aggregated result only.
    """
    c = load(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.to_timestamp(F.lit("1998-03-15"))
    )
    l = load(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.to_timestamp(F.lit("1998-03-15"))
    )
    return (
        l.join(o.join(c, o.o_custkey == c.c_custkey),
               l.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.col("o_orderpriority").alias("orderpriority"),
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@register(
    "q5_local_supplier",
    f"""
    SELECT n.n_name,
           CAST(CAST(SUM({_SQL_REV.replace('l_', 'l.l_')}) AS VARCHAR) AS DOUBLE) AS revenue
    FROM region r JOIN nation n ON r.r_regionkey = n.n_regionkey
                  JOIN customer c ON c.c_nationkey = n.n_nationkey
                  JOIN orders o ON o.o_custkey = c.c_custkey
                  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
                  JOIN supplier s ON s.s_suppkey = l.l_suppkey
                                 AND s.s_nationkey = c.c_nationkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
)
def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: star join (4 broadcast dims + 1 fact-fact join).

    Scale: region/nation hint (bounded cardinality); customer/supplier
    scale with data so they broadcast by SIZE while they fit and
    degrade to shuffle past the threshold. orders⨝lineitem is the one
    unavoidable shuffle join (both sides huge) — AQE picks sort-merge
    and handles skew. Aggregation output is |nations| rows. Measured
    at 100x: hinted 47.2s → size-based 33.6s.
    """
    r = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .join(
            s,
            (l.l_suppkey == s.s_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
        .groupBy("n_name")
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
    )


@register(
    "q6_forecast_revenue",
    """
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(l_discount AS DECIMAL(6,4))) AS VARCHAR) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure filtered scan + scalar agg — the pushdown
    showcase: every predicate reaches the parquet reader."""
    l = load(spark, sf_dir, "lineitem")
    return (
        l.where(
            (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01")))
            & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-01-01")))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_dec("l_extendedprice") * _dec("l_discount", 6, 4))
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "q10_returned_items",
    f"""
    SELECT c.c_custkey, c.c_name,
           CAST(CAST(SUM({_SQL_REV.replace('l_', 'l.l_')}) AS VARCHAR) AS DOUBLE) AS revenue,
           c.c_acctbal
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue per customer, top 20.
    customer scales with data — broadcast is size-decided, not hinted."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name", "c_acctbal")
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "q17_small_quantity_revenue",
    """
    WITH pa AS (
      SELECT l_partkey, 0.2 * (CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)))
                                         AS VARCHAR) AS DOUBLE) / COUNT(*))
               AS qty_cut
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS VARCHAR)
                AS DOUBLE) / 7.0 AS avg_yearly,
           COUNT(*) AS n_items
    FROM lineitem l JOIN pa ON l.l_partkey = pa.l_partkey
    WHERE CAST(l.l_quantity AS DOUBLE) < pa.qty_cut
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery decorrelated into a
    per-part aggregate + self-join. The aggregate side collapses to one
    row per part before the join, so it is bounded by |parts| — and its
    compile-time estimate is NOT (it derives from lineitem), so without
    help the planner picks a sort-merge join that shuffles AND sorts
    the whole fact side (600M-row tier: 277s measured). Same gate as
    q2/copurchase_recs: while the part domain (footer row count, no
    scan) fits the broadcast policy, hint the aggregate broadcast —
    lineitem never shuffles (127s measured even at a 20M-part forced
    broadcast). Past the gate, hint shuffle_hash instead: the build
    side is the |parts|-bounded aggregate split across partitions
    (KBs per task), and skipping the two 600M-row sorts measured 186s
    vs SMJ's 277s on the same tier."""
    l = load(spark, sf_dir, "lineitem")
    per_part = l.groupBy("l_partkey").agg(
        (
            F.lit(0.2)
            * (F.sum(_dec("l_quantity")).cast("double") / F.count("*"))
        ).alias("qty_cut")
    )
    try:
        n_parts = sum(
            n for _, _, n in stats.parquet_rowgroup_stats(
                f"{sf_dir}/part.parquet", "p_partkey"
            )
        )
    except Exception:
        n_parts = None
    if n_parts is not None and 0 < n_parts <= 4_000_000:
        per_part = F.broadcast(per_part)
    else:
        per_part = per_part.hint("shuffle_hash")
    return (
        l.join(per_part, "l_partkey")
        .where(F.col("l_quantity").cast("double") < F.col("qty_cut"))
        .agg(
            (F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            ),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "q18_large_orders",
    """
    SELECT o.o_orderkey, strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           CAST(CAST(SUM(CAST(l.l_quantity AS DECIMAL(12,2))) AS VARCHAR)
                AS DOUBLE) AS total_qty
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderkey, o.o_orderdate
    HAVING SUM(CAST(l.l_quantity AS DECIMAL(12,2))) >= 140
    ORDER BY total_qty DESC, o.o_orderkey
    LIMIT 20
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: group-filter (HAVING over a fact aggregate) +
    top-k. The quantity sum aggregates before any wide join; top-20
    sorts only the filtered aggregate output."""
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.sum(_dec("l_quantity")).alias("__qty"))
        .where(F.col("__qty") >= 140)
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.col("__qty").cast("double").alias("total_qty"),
        )
        .orderBy(F.col("total_qty").desc(), "o_orderkey")
        .limit(20)
    )


@register(
    "q4_priority_exists",
    """
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-04-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_returnflag = 'R')
    GROUP BY o.o_orderpriority
    """,
)
def q4_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS -> left-semi join -> 5-row agg
    (the slim schema has no commit/receipt dates, so the existence
    predicate is a returned line — same semi-join plan).

    Scale: both sides shuffle once on orderkey for the semi join (the
    filtered quarter of orders and the R-flag slice of lineitem); semi
    join emits at most one row per order, so the aggregate input is
    bounded by the orders slice.
    """
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1997-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1997-04-01")))
    )
    l = load(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@register(
    "q7_nation_volume",
    f"""
    SELECT supp_nation, cust_nation, l_year,
           CAST(CAST(SUM(volume) AS VARCHAR) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l.l_shipdate) AS l_year,
             {_SQL_REV.replace('l_', 'l.l_')} AS volume
      FROM supplier s
        JOIN lineitem l ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
             OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l.l_shipdate BETWEEN TIMESTAMP '1996-01-01'
                             AND TIMESTAMP '1997-12-31'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bilateral trade volume by year between two nations.

    Scale: nation hints twice (bounded 25 rows); supplier/customer
    scale with data, so their broadcasts are size-decided. The
    symmetric nation-pair predicate prunes rows after the one
    orders⨝lineitem shuffle. Output is 2 pairs × years.
    """
    s = load(spark, sf_dir, "supplier")
    l = load(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate").between("1996-01-01", "1997-12-31")
    )
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
    )


@register(
    "q8_market_share",
    f"""
    SELECT o_year,
           CAST(floor(1000000.0 *
                 CAST(CAST(COALESCE(SUM(CASE WHEN nation = 'NATION_1'
                                             THEN volume END),
                                    0) AS VARCHAR) AS DOUBLE)
                 / CAST(CAST(SUM(volume) AS VARCHAR) AS DOUBLE))
                AS BIGINT) AS mkt_share_1e6
    FROM (
      SELECT year(o.o_orderdate) AS o_year,
             {_SQL_REV.replace('l_', 'l.l_')} AS volume,
             n2.n_name AS nation
      FROM part p
        JOIN lineitem l ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
        JOIN region r ON n1.n_regionkey = r.r_regionkey
        JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
      WHERE r.r_name = 'AMERICA' AND p.p_type = 'PROMO'
        AND o.o_orderdate BETWEEN TIMESTAMP '1996-01-01'
                              AND TIMESTAMP '1997-12-31'
    ) all_nations
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one nation's share of a region's PROMO-part revenue
    per year, as int-scaled micro-units (floor(share * 1e6) — both
    engines divide the identical decimal-sum doubles, so the quotient
    is bit-stable).

    Scale: nation/region hint (bounded); part/supplier/customer
    broadcast by size while they fit; orders⨝lineitem is again the
    only unavoidable shuffle. The conditional
    numerator uses null-skipping SUM(CASE) so no decimal-vs-zero type
    unification is involved.
    """
    p = load(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    s = load(spark, sf_dir, "supplier")
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").where(
        F.col("o_orderdate").between("1996-01-01", "1997-12-31")
    )
    c = load(spark, sf_dir, "customer")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    r = load(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    vol = _revenue()
    joined = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(p, l.l_partkey == p.p_partkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == r.r_regionkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
    )
    num = F.sum(F.when(F.col("nation") == "NATION_1", vol)).cast("double")
    den = F.sum(vol).cast("double")
    return joined.groupBy(
        F.year("o_orderdate").cast("long").alias("o_year")
    ).agg(
        F.floor(F.lit(1000000.0) * F.coalesce(num, F.lit(0.0)) / den)
        .cast("long")
        .alias("mkt_share_1e6")
    )


@register(
    "q12_priority_lines",
    """
    SELECT l.l_linestatus,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l.l_linestatus
    """,
)
def q12_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: fact-fact join + dual conditional counts (the
    slim schema keys the CASE on order priority instead of shipmode).

    Scale: one shuffle join on orderkey, two ELSE-0 counting sums with
    map-side combine — shuffle output is |linestatus| rows/partition.
    """
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01")))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q13_order_distribution",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
        LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                           AND o.o_orderpriority <> '5-LOW'
      GROUP BY c.c_custkey
    ) c_orders
    GROUP BY c_count
    """,
)
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: histogram of orders-per-customer, keeping zero-order
    customers via the left outer join (priority filter stands in for
    the comment anti-pattern).

    Scale: one shuffle join on custkey, then per-customer counts whose
    re-aggregation input is |customers| rows; the second groupBy's
    domain is tiny (max orders per customer).
    """
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "5-LOW"
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


@register(
    "q14_promo_revenue",
    f"""
    SELECT CAST(floor(1000000.0 *
             CAST(CAST(COALESCE(SUM(CASE WHEN p.p_type = 'PROMO'
                                         THEN {_SQL_REV.replace('l_', 'l.l_')}
                                    END), 0) AS VARCHAR) AS DOUBLE)
             / CAST(CAST(SUM({_SQL_REV.replace('l_', 'l.l_')})
                    AS VARCHAR) AS DOUBLE)) AS BIGINT) AS promo_share_1e6
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-09-01'
      AND l.l_shipdate < TIMESTAMP '1997-10-01'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo parts' revenue share in one month, int-scaled.

    Scale: part joins the month slice of lineitem (size-decided
    broadcast — part scales with data); a single global aggregate row
    — partials combine map-side, the final reduce sees one row per
    partition.
    """
    l = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-09-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-10-01")))
    )
    p = load(spark, sf_dir, "part")
    vol = _revenue()
    num = F.sum(F.when(F.col("p_type") == "PROMO", vol)).cast("double")
    den = F.sum(vol).cast("double")
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .agg(
            F.floor(
                F.lit(1000000.0) * F.coalesce(num, F.lit(0.0)) / den
            )
            .cast("long")
            .alias("promo_share_1e6")
        )
    )


@register(
    "q19_bracket_revenue",
    f"""
    SELECT CAST(CAST(SUM({_SQL_REV.replace('l_', 'l.l_')}) AS VARCHAR)
                AS DOUBLE) AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1 AND l.l_quantity <= 30)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity >= 10 AND l.l_quantity <= 40)
       OR (p.p_brand = 'Brand#9' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity >= 20 AND l.l_quantity <= 50)
    """,
)
def q19_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-AND predicate brackets across the join
    (brand/size/quantity stand in for the container/shipmode columns
    the slim schema lacks).

    Scale: Catalyst pushes the brand/size disjunction down to the part
    scan (visible in PushedFilters) and part joins by size-decided
    broadcast; the residual
    per-bracket quantity conjunctions evaluate post-join, JVM codegen.
    """
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    q = F.col("l_quantity").cast("double")
    bracket = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & q.between(1, 30)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(10, 30)
            & q.between(10, 40)
        )
        | (
            (F.col("p_brand") == "Brand#9")
            & F.col("p_size").between(20, 50)
            & q.between(20, 50)
        )
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .where(bracket)
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
    )


@register(
    "q21_waiting_supplier",
    """
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
      JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
      JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 20
    """,
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the sole at-fault supplier in multi-supplier
    finalized orders — correlated EXISTS + NOT EXISTS (returnflag
    stands in for the receipt-after-commit lag).

    Scale: instead of the literal semi + anti joins (three lineitem
    exchanges on orderkey), ONE per-order aggregate computes distinct
    suppliers and distinct at-fault suppliers; for an R-flagged l1 row,
    EXISTS(other supplier) == n_supp >= 2 and NOT EXISTS(other at-fault
    supplier) == n_r_supp == 1. Two lineitem shuffles total (aggregate
    + join, both on orderkey), with map-side partial aggregation; row
    multiplicity of l1 is preserved, so counts match the correlated
    form exactly. supplier joins for the name by size-decided
    broadcast; top-20 sorts only the |suppliers|-bounded aggregate.
    """
    s = load(spark, sf_dir, "supplier")
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    per_order = li.groupBy("l_orderkey").agg(
        F.count_distinct(F.col("l_suppkey")).alias("__n_supp"),
        F.count_distinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("__n_r_supp"),
    )
    l1 = li.where(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_suppkey"
    )
    base = (
        l1.join(per_order, "l_orderkey")
        .where((F.col("__n_supp") >= 2) & (F.col("__n_r_supp") == 1))
        .join(o, F.col("l_orderkey") == o.o_orderkey)
    )
    return (
        base.join(s, F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


@register(
    "q22_idle_balances",
    """
    WITH pos AS (
      SELECT CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2)))
                  AS VARCHAR) AS DOUBLE)
             / COUNT(*) AS avg_bal
      FROM customer
      WHERE c_acctbal > 0.0 AND c_nationkey IN (3, 8, 13, 18, 23)
    )
    SELECT c.c_nationkey AS cntry, COUNT(*) AS numcust,
           CAST(CAST(SUM(CAST(c.c_acctbal AS DECIMAL(12,2)))
                AS VARCHAR) AS DOUBLE) AS totacctbal
    FROM customer c, pos
    WHERE c.c_nationkey IN (3, 8, 13, 18, 23)
      AND CAST(c.c_acctbal AS DOUBLE) > pos.avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey)
    GROUP BY c.c_nationkey
    """,
)
def q22_idle_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no orders,
    grouped by country (nationkey stands in for the phone prefix).

    Scale: the scalar average is a one-row broadcast cross join (exact
    decimal sum / count, so both engines derive the identical double
    threshold); the NOT EXISTS is a shuffle anti join on custkey.
    """
    sel = F.col("c_nationkey").isin(3, 8, 13, 18, 23)
    c = load(spark, sf_dir, "customer").where(sel)
    o = load(spark, sf_dir, "orders")
    avg_bal = c.where(F.col("c_acctbal") > 0.0).agg(
        (F.sum(_dec("c_acctbal")).cast("double") / F.count("*")).alias(
            "avg_bal"
        )
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal").cast("double") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntry"))
        .agg(
            F.count("*").alias("numcust"),
            F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
    )


@register(
    "region_rollup",
    """
    SELECT r.r_name,
           COUNT(*) AS n_orders,
           CAST(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(14,2))) AS VARCHAR) AS DOUBLE) AS total_price
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
                  JOIN nation n ON c.c_nationkey = n.n_nationkey
                  JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def region_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension-chain rollup: three broadcast joins (customer's is
    size-decided — it scales with data), zero fact shuffles before the
    final 5-row aggregate."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(_dec("o_totalprice", 14, 2)).cast("double").alias("total_price"),
        )
    )


@register(
    "rollup_region_nation",
    """
    SELECT COALESCE(r.r_name, '(all)') AS region,
           COALESCE(n.n_name, '(all)') AS nation,
           CAST(GROUPING(r.r_name) * 2 + GROUPING(n.n_name) AS BIGINT)
             AS grouping_lvl,
           COUNT(*) AS n_customers,
           CAST(CAST(SUM(CAST(c.c_acctbal AS DECIMAL(12,2))) AS VARCHAR)
                AS DOUBLE) AS acctbal_sum
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
                    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
)
def rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical ROLLUP aggregate (region -> nation -> grand total)
    — partial-aggregable in one pass; grouping_id disambiguates levels
    so NULL data values can't collide with rollup NULLs."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.grouping_id().cast("long").alias("grouping_lvl"),
            F.count("*").alias("n_customers"),
            F.sum(_dec("c_acctbal")).cast("double").alias("acctbal_sum"),
        )
        .select(
            F.coalesce(F.col("r_name"), F.lit("(all)")).alias("region"),
            F.coalesce(F.col("n_name"), F.lit("(all)")).alias("nation"),
            "grouping_lvl",
            "n_customers",
            "acctbal_sum",
        )
    )


@register(
    "hll_distinct_audit",
    """
    SELECT 'o_custkey' AS col,
           COUNT(DISTINCT o_custkey) AS exact_distinct,
           TRUE AS approx_ok
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority' AS col,
           COUNT(DISTINCT o_orderpriority) AS exact_distinct,
           TRUE AS approx_ok
    FROM orders
    """,
)
def hll_distinct_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch audit: HyperLogLog++ distinct counts checked against the
    exact ones in-engine, oracle-pinned like ann_recall_check — the
    exact side reproduces in SQL, the sketch side folds into a
    tolerance boolean (rsd 5% -> assert within 15%), so sketch
    regressions fail the hard gate.

    Scale rationale: at 100 TB exact COUNT(DISTINCT key) over a
    high-cardinality column shuffles every distinct value; HLL carries
    a fixed few-KB sketch per partition with map-side merge. The audit
    certifies the accuracy contract at the SF where exact is cheap.
    """
    o = load(spark, sf_dir, "orders")

    def one(col: str) -> DataFrame:
        exact = F.count_distinct(F.col(col))
        approx = F.approx_count_distinct(col, rsd=0.05)
        return o.agg(
            F.lit(col).alias("col"),
            exact.alias("exact_distinct"),
            (
                F.abs(approx - exact)
                <= F.lit(0.15) * exact.cast("double")
            ).alias("approx_ok"),
        )

    return one("o_custkey").unionByName(one("o_orderpriority"))


@register(
    "order_gaps",
    """
    WITH g AS (
      SELECT o_custkey,
             date_diff('day',
                       LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                              ORDER BY o_orderdate, o_orderkey),
                       o_orderdate) AS gap_days
      FROM orders
    )
    SELECT o_custkey,
           COUNT(gap_days) AS n_gaps,
           CAST(MAX(gap_days) AS BIGINT) AS max_gap_days,
           CAST(SUM(gap_days) AS BIGINT) AS total_gap_days
    FROM g WHERE gap_days IS NOT NULL
    GROUP BY o_custkey
    """,
)
def order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-order gap statistics per customer via LAG over a total
    order ((o_orderdate, o_orderkey) — ties broken, both engines agree
    row-for-row).

    Scale: one shuffle on custkey; windows run per-customer in
    parallel (bounded partitions — no global sort); the aggregate
    reuses the window's exchange.
    """
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gap = F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w))
    return (
        o.withColumn("gap_days", gap)
        .where(F.col("gap_days").isNotNull())
        .groupBy("o_custkey")
        .agg(
            F.count("gap_days").alias("n_gaps"),
            F.max("gap_days").cast("long").alias("max_gap_days"),
            F.sum("gap_days").cast("long").alias("total_gap_days"),
        )
    )


@register(
    "customer_spend_deciles",
    """
    WITH spend AS (
      SELECT o_custkey,
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2)))
                  AS VARCHAR) AS DOUBLE) AS total_spend
      FROM orders GROUP BY o_custkey
    ),
    tiled AS (
      SELECT o_custkey, total_spend,
             NTILE(10) OVER (ORDER BY total_spend DESC, o_custkey) AS decile
      FROM spend
    )
    SELECT decile, COUNT(*) AS n_customers,
           CAST(CAST(SUM(CAST(CAST(total_spend AS VARCHAR)
                AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS decile_spend
    FROM tiled GROUP BY decile
    """,
)
def customer_spend_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer lifetime-spend deciles: NTILE(10) over a total order
    (spend desc, custkey) — both engines tile identically because the
    order is total and NTILE's floor-division bucket sizes are part of
    the SQL standard.

    Scale: the global NTILE sorts only the per-customer AGGREGATE
    (|customers| rows, not |orders|); the per-customer sum shuffles
    once with map-side combine. Deciles of a 100 TB fact table are
    really deciles of its distinct-key aggregate — keep the window on
    the small side of the aggregation.
    """
    o = load(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        F.sum(_dec("o_totalprice", 14, 2)).cast("double").alias("total_spend")
    )
    w = Window.orderBy(F.col("total_spend").desc(), "o_custkey")
    return (
        spend.withColumn("decile", F.ntile(10).over(w))
        .groupBy("decile")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum(
                F.col("total_spend").cast("string").cast("decimal(18,2)")
            )
            .cast("double")
            .alias("decile_spend"),
        )
    )


@register(
    "embedding_norm_stats",
    """
    SELECT label,
           COUNT(*) AS n_vecs,
           CAST(floor(1000000.0 *
                 SUM(sqrt(list_inner_product(CAST(embedding AS DOUBLE[]),
                                             CAST(embedding AS DOUBLE[]))))
                 / COUNT(*)) AS BIGINT) AS avg_norm_1e6
    FROM embeddings
    GROUP BY label
    """,
)
def embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean L2 norm of the embedding column, int-scaled —
    the sanity pass a vector pipeline runs before cosine math
    (operators/similarity.norm: JVM-side aggregate/zip_with fold,
    deterministic left-to-right like DuckDB's list_inner_product).

    Scale: pure row-local norm + one partial-agg shuffle of |labels|
    cells; the array column never leaves the JVM.
    """
    emb = load(spark, sf_dir, "embeddings")
    nrm = sim_ops.norm(F.col("embedding").cast("array<double>"))
    return (
        emb.groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            F.floor(F.lit(1000000.0) * F.sum(nrm) / F.count("*"))
            .cast("long")
            .alias("avg_norm_1e6"),
        )
        .select(F.col("label").cast("long").alias("label"), "n_vecs", "avg_norm_1e6")
    )


@register(
    "sql_yearly_revenue",
    f"""
    SELECT year(o.o_orderdate) AS o_year,
           COUNT(DISTINCT o.o_orderkey) AS n_orders,
           CAST(CAST(SUM({_SQL_REV.replace('l_', 'l.l_')}) AS VARCHAR)
                AS DOUBLE) AS revenue
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY year(o.o_orderdate)
    """,
)
def sql_yearly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL front-end path: temp views + ``spark.sql`` — same
    Catalyst plan as the DataFrame API (this is the one catalog query
    exercising it, so a user embedding the engine via SQL strings has
    a gate-checked example). Session-scoped view names are suffixed
    per sf_dir to avoid collisions across concurrent gates."""
    tag = abs(hash(sf_dir)) % 100000
    load(spark, sf_dir, "orders").createOrReplaceTempView(f"orders_v{tag}")
    load(spark, sf_dir, "lineitem").createOrReplaceTempView(
        f"lineitem_v{tag}"
    )
    one = "CAST(1 AS DECIMAL(6,4))"
    rev = (
        f"CAST(l.l_extendedprice AS DECIMAL(12,2)) * "
        f"({one} - CAST(l.l_discount AS DECIMAL(6,4)))"
    )
    return spark.sql(
        f"""
        SELECT year(o.o_orderdate) AS o_year,
               COUNT(DISTINCT o.o_orderkey) AS n_orders,
               CAST(SUM({rev}) AS DOUBLE) AS revenue
        FROM orders_v{tag} o JOIN lineitem_v{tag} l
          ON o.o_orderkey = l.l_orderkey
        GROUP BY year(o.o_orderdate)
        """
    ).select(
        F.col("o_year").cast("long").alias("o_year"),
        "n_orders",
        "revenue",
    )


@register(
    "orders_profile",
    """
    SELECT col AS column, (SELECT COUNT(*) FROM orders) AS n_rows,
           CAST(n_null AS BIGINT) AS n_null, n_distinct
    FROM (
      SELECT 'o_custkey' AS col,
             SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS n_null,
             COUNT(DISTINCT o_custkey) AS n_distinct FROM orders
      UNION ALL
      SELECT 'o_orderstatus',
             SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END),
             COUNT(DISTINCT o_orderstatus) FROM orders
      UNION ALL
      SELECT 'o_orderpriority',
             SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END),
             COUNT(DISTINCT o_orderpriority) FROM orders
    ) s
    """,
)
def orders_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile of orders (operators/profile.profile_table): one
    aggregation pass emits rows/nulls/distincts for every profiled
    column via Expand — the oracle recomputes each column separately,
    checking the fused pass against the naive per-column form."""
    from clickhouse_only_importer_prototype_spark.operators.profile import (
        profile_table,
    )

    return profile_table(
        load(spark, sf_dir, "orders"),
        cols=["o_custkey", "o_orderstatus", "o_orderpriority"],
    )


@register(
    "priority_quantiles",
    """
    SELECT o_orderpriority,
           quantile_cont(o_totalprice, 0.25) AS p25,
           quantile_cont(o_totalprice, 0.50) AS p50,
           quantile_cont(o_totalprice, 0.75) AS p75,
           quantile_cont(o_totalprice, 0.90) AS p90,
           COUNT(*) AS n_orders
    FROM orders GROUP BY o_orderpriority
    """,
)
def priority_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous quantiles per priority class. Spark's
    percentile() and DuckDB's quantile_cont share the (n-1)*q linear
    interpolation, so identical inputs give identical doubles. At
    scale the exact sort-based percentile is the deliberate choice for
    grouped columns of bounded cardinality; approx_percentile is the
    t-digest alternative when groups are huge."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.percentile("o_totalprice", 0.25).alias("p25"),
        F.percentile("o_totalprice", 0.50).alias("p50"),
        F.percentile("o_totalprice", 0.75).alias("p75"),
        F.percentile("o_totalprice", 0.90).alias("p90"),
        F.count("*").alias("n_orders"),
    )


@register(
    "window_topk_orders",
    """
    SELECT o_custkey, o_orderkey, o_totalprice, rk
    FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rk
          FROM orders)
    WHERE rk <= 3
    """,
)
def window_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k via ranked window — partitioned by customer, so
    the sort is per-partition, never global."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rk"),
        ).where(F.col("rk") <= 3)
    )


@register(
    "segment_distinct_stats",
    """
    SELECT c.c_mktsegment,
           COUNT(DISTINCT o.o_custkey) AS active_customers,
           COUNT(DISTINCT c.c_nationkey) AS nations,
           COUNT(*) AS n_orders
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def segment_distinct_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-distinct aggregate: Catalyst expands to partial aggs —
    no driver-side distinct anywhere. customer joins by size-decided
    broadcast (it scales with data)."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("o_custkey").alias("active_customers"),
            F.countDistinct("c_nationkey").alias("nations"),
            F.count("*").alias("n_orders"),
        )
    )


@register(
    "union_all_slices",
    """
    SELECT l_returnflag, COUNT(*) AS n
    FROM (SELECT l_returnflag FROM lineitem WHERE l_linenumber = 1
          UNION ALL
          SELECT l_returnflag FROM lineitem WHERE l_quantity >= 25)
    GROUP BY l_returnflag
    """,
)
def union_all_slices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-preserving union-all (U1 parity shape) + count."""
    l = load(spark, sf_dir, "lineitem")
    u = l.where(F.col("l_linenumber") == 1).select("l_returnflag").unionAll(
        l.where(F.col("l_quantity") >= 25).select("l_returnflag")
    )
    return u.groupBy("l_returnflag").agg(F.count("*").alias("n"))


# --------------------------------------------------------------------------
# Reference-parity operator shapes on the testdata tables
# --------------------------------------------------------------------------


@register(
    "pivot_concat_values",
    """
    SELECT l_orderkey,
           string_agg(CAST(CAST(floor(l_quantity) AS BIGINT) AS VARCHAR),
                      ',' ORDER BY l_linenumber,
                      CAST(CAST(floor(l_quantity) AS BIGINT) AS VARCHAR)) AS vals,
           COUNT(*) AS n_items
    FROM lineitem
    GROUP BY l_orderkey
    """,
)
def pivot_concat_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 parity (order-sensitive pivot-concat): per-order quantities
    comma-joined in line-number order — genetic_alterations.VALUES shape
    (cna/transformer.go:511-532). Single partial+final agg; the sort
    happens inside each group's collected array, not as a shuffle.
    l_linenumber repeats within orders in this synthetic data, so both
    engines tie-break on the value string."""
    l = load(spark, sf_dir, "lineitem")
    qty_str = F.floor(F.col("l_quantity")).cast("long").cast("string")
    collected = F.array_sort(
        F.collect_list(F.struct(F.col("l_linenumber").alias("idx"), qty_str.alias("v")))
    )
    return (
        l.groupBy("l_orderkey")
        .agg(
            F.array_join(
                F.transform(collected, lambda s: s["v"]), ","
            ).alias("vals"),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "melt_unpivot_part",
    """
    SELECT p_partkey, 'p_brand' AS attr, p_brand AS val FROM part
    UNION ALL
    SELECT p_partkey, 'p_type' AS attr, p_type AS val FROM part
    """,
)
def melt_unpivot_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Melt parity (cna derived shape, cna/transformer.go:565-625):
    native unpivot — narrow generator, no shuffle."""
    p = load(spark, sf_dir, "part")
    return p.unpivot(
        ids=["p_partkey"],
        values=["p_brand", "p_type"],
        variableColumnName="attr",
        valueColumnName="val",
    )


@register(
    "surrogate_ids",
    """
    SELECT l_orderkey, l_linenumber,
           ROW_NUMBER() OVER (ORDER BY l_orderkey, l_linenumber) - 1 AS seq_id
    FROM lineitem
    """,
)
def surrogate_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 parity: dense gapless surrogate keys over a defined order.

    Two-pass partition-parallel rank (a bare global row_number funnels
    the whole table through ONE partition — 9s at 6M rows, fatal at
    100 TB): range-partition on the sort key, rank within each range
    partition in parallel, then add per-partition offsets (a 32-row
    prefix sum computed on the driver). Same gapless contract as the
    pipeline's per-file assigner (operators/mutation.py).

    Bucket boundaries come from parquet footer row-group statistics
    (stats.py) — a metadata-only read, so the only data passes are the
    per-bucket counts and the rank itself, and the split is calibrated
    by actual row counts (a skewed key domain can't unbalance it the
    way a uniform [min,max] split does). Buckets must be a PURE
    FUNCTION of the row: repartitionByRange samples
    nondeterministically per evaluation, so its boundaries can't be
    trusted across the counts pass and the ranking pass."""
    l = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber")
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    try:
        segs = stats.parquet_rowgroup_stats(
            f"{sf_dir}/lineitem.parquet", "l_orderkey"
        )
    except Exception:
        segs = []
    # key-sorted multi-row-group layout: cut on row-group gaps and take
    # EXACT counts from the footers — the counting data-pass vanishes
    # and the rank is the only scan. Only worth it when enough gaps
    # exist to keep the rank parallel (each bucket is one window task);
    # too-few gaps, a single row group (the small-SF fixtures), or
    # overlapping groups fall back to the counted two-pass. The aligned
    # path is differential-tested on multi-group files
    # (tests/test_stats.py) and exercised at scale by the 10x gate
    # (bench.py --gen-10x writes lineitem key-aligned).
    aligned = stats.aligned_counts_from_stats(segs, n_parts)
    if aligned and len(aligned[1]) >= max(2, n_parts // 2):
        return ids_ops.rank_gapless(
            l,
            ["l_orderkey", "l_linenumber"],
            bounds=aligned[0],
            bucket_counts=aligned[1],
        )
    bounds = stats.boundaries_from_stats(segs, n_parts)
    return ids_ops.rank_gapless(
        l, ["l_orderkey", "l_linenumber"], bounds=bounds
    ).select("l_orderkey", "l_linenumber", "seq_id")


@register(
    "long_to_values_rebuild",
    """
    SELECT l_orderkey,
           string_agg(CAST(CAST(floor(l_quantity) AS BIGINT) AS VARCHAR),
                      ',' ORDER BY l_linenumber,
                      CAST(CAST(floor(l_quantity) AS BIGINT) AS VARCHAR)) AS "VALUES",
           'tpch' AS "CANCER_STUDY"
    FROM lineitem GROUP BY l_orderkey
    """,
)
def long_to_values_rebuild(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 long-path parity through the actual engine operator
    (genetic_alterations_from_long), mapped onto lineitem."""
    l = load(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey"),
        F.col("l_linenumber").alias("sample_idx"),
        F.floor(F.col("l_quantity")).cast("long").cast("string").alias("alt"),
        F.lit("tpch").alias("study"),
        F.lit("profile").alias("profile"),
    )
    out = genetic_alterations_from_long(
        l,
        gene_col="l_orderkey",
        sample_idx_col="sample_idx",
        value_col="alt",
        study_col="study",
        profile_col="profile",
    )
    return out.select(
        F.col("GENE_SYMBOL").cast("long").alias("l_orderkey"),
        F.col("VALUES"),
        F.col("CANCER_STUDY"),
    )


# --------------------------------------------------------------------------
# Events: time-bucket aggregation + sessionization
# --------------------------------------------------------------------------


@register(
    "events_hourly",
    """
    SELECT epoch_ns(ts) // 3600000000000 AS hour_bucket,
           event_type,
           COUNT(*) AS n_events,
           CAST(CAST(SUM(CAST(value AS DECIMAL(14,2))) AS VARCHAR) AS DOUBLE) AS value_sum
    FROM events
    GROUP BY hour_bucket, event_type
    """,
)
def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window batch equivalent: hour buckets from raw nanos.
    (The streaming twin with watermarks is streaming/events.py.)"""
    e = load(spark, sf_dir, "events")
    return (
        e.select(
            F.expr("ts div 3600000000000").alias("hour_bucket"),
            "event_type",
            "value",
        )
        .groupBy("hour_bucket", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(_dec("value", 14, 2)).cast("double").alias("value_sum"),
        )
    )


@register(
    "events_sessionize",
    """
    WITH x AS (SELECT user_id, epoch_ns(ts) AS t FROM events),
    y AS (SELECT user_id,
                 CASE WHEN lag(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL
                        OR t - lag(t) OVER (PARTITION BY user_id ORDER BY t)
                           > 1800000000000
                      THEN 1 ELSE 0 END AS new_session
          FROM x)
    SELECT user_id,
           CAST(SUM(new_session) AS BIGINT) AS n_sessions,
           COUNT(*) AS n_events
    FROM y GROUP BY user_id
    """,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (30-min gap) as lag + cumulative flags — the
    batch twin of a session_window stream. Partitioned by user: state
    never crosses executors."""
    # micro-truncate nanos (DuckDB timestamp precision) so gaps within
    # 1us of the threshold agree across engines — see events_asof_join
    e = load(spark, sf_dir, "events").withColumn(
        "ts", F.expr("ts div 1000") * 1000
    )
    w = Window.partitionBy("user_id").orderBy("ts")
    gap = F.col("ts") - F.lag("ts").over(w)
    new_session = F.when(
        F.lag("ts").over(w).isNull() | (gap > 1_800_000_000_000), 1
    ).otherwise(0)
    return (
        e.select("user_id", new_session.alias("new_session"))
        .groupBy("user_id")
        .agg(
            F.sum("new_session").cast("long").alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
    )


@register(
    "intersect_except_customers",
    """
    WITH y96 AS (SELECT DISTINCT o_custkey FROM orders
                 WHERE o_orderdate >= TIMESTAMP '1996-01-01'
                   AND o_orderdate <  TIMESTAMP '1997-01-01'),
    y97 AS (SELECT DISTINCT o_custkey FROM orders
            WHERE o_orderdate >= TIMESTAMP '1997-01-01'
              AND o_orderdate <  TIMESTAMP '1998-01-01')
    SELECT o_custkey, 'both' AS cohort
    FROM (SELECT o_custkey FROM y96 INTERSECT SELECT o_custkey FROM y97)
    UNION ALL
    SELECT o_custkey, 'only_1996' AS cohort
    FROM (SELECT o_custkey FROM y96 EXCEPT SELECT o_custkey FROM y97)
    """,
)
def intersect_except_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations (INTERSECT / EXCEPT) as customer cohorting:
    active-both-years vs churned-after-1996. Both plan as hash
    semi/anti joins over the distinct key sets — no sort-based set
    difference."""
    o = load(spark, sf_dir, "orders")

    def active(year: int):
        return (
            o.where(
                (F.col("o_orderdate") >= F.to_timestamp(F.lit(f"{year}-01-01")))
                & (F.col("o_orderdate") < F.to_timestamp(F.lit(f"{year + 1}-01-01")))
            )
            .select("o_custkey")
            .distinct()
        )

    y96, y97 = active(1996), active(1997)
    both = y96.intersect(y97).select(
        "o_custkey", F.lit("both").alias("cohort")
    )
    only96 = y96.exceptAll(y97).select(
        "o_custkey", F.lit("only_1996").alias("cohort")
    )
    return both.unionByName(only96)


@register(
    "anti_join_idle_customers",
    """
    SELECT c.c_custkey, c.c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def anti_join_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers with no orders. Broadcast or shuffled
    anti-join by Catalyst's choice; never a subquery-per-row."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_mktsegment"
    )


@register(
    "events_json_extract",
    """
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS k_sum,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS k_max,
           COUNT(*) AS n
    FROM events GROUP BY event_type
    """,
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction over the props column, JVM-side
    (get_json_object — no Python, stays in codegen), aggregated per
    event type."""
    e = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return e.groupBy("event_type").agg(
        F.sum(k).cast("long").alias("k_sum"),
        F.max(k).cast("long").alias("k_max"),
        F.count("*").alias("n"),
    )


@register(
    "events_pivot_counts",
    """
    SELECT user_id,
           COUNT(*) FILTER (event_type = 'click') AS click,
           COUNT(*) FILTER (event_type = 'error') AS error,
           COUNT(*) FILTER (event_type = 'purchase') AS purchase,
           COUNT(*) FILTER (event_type = 'signup') AS signup,
           COUNT(*) FILTER (event_type = 'view') AS view
    FROM events GROUP BY user_id
    """,
)
def events_pivot_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long -> wide): per-user event counts, one column per
    event type. The values list is explicit, so Catalyst skips the
    extra distinct-values job a dynamic pivot needs and the plan is a
    single partial+final aggregate — the 100 TB-safe pivot shape."""
    e = load(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    out = (
        e.groupBy("user_id")
        .pivot("event_type", types)
        .count()
    )
    cols = [F.col("user_id")]
    cols += [F.coalesce(F.col(t), F.lit(0)).cast("long").alias(t) for t in types]
    return out.select(*cols)


@register(
    "events_sliding_counts",
    """
    WITH e AS (
      SELECT epoch_ns(ts) // 1800000000000 AS b, event_type FROM events
    )
    SELECT CAST((b - u.k) * 1800000000000 AS BIGINT) AS w_start_ns,
           event_type, COUNT(*) AS n_events
    FROM e, UNNEST([0, 1]) AS u(k)
    GROUP BY 1, 2
    """,
)
def events_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window counts (1h window, 30m slide) as an explicit
    window-replication explode — each event lands in exactly 2 windows.
    The streaming twin uses F.window(...); this formulation keeps the
    window start as raw nanos for the oracle. Replication factor =
    window/slide, visible in the plan (a 2-row generator, not a range
    join)."""
    e = load(spark, sf_dir, "events")
    b = F.expr("ts div 1800000000000")
    return (
        e.select(
            F.explode(F.array(b - 1, b)).alias("__s"),
            "event_type",
        )
        .select(
            (F.col("__s") * F.lit(1_800_000_000_000)).alias("w_start_ns"),
            "event_type",
        )
        .groupBy("w_start_ns", "event_type")
        .agg(F.count("*").alias("n_events"))
    )


@register(
    "events_asof_join",
    """
    WITH a AS (SELECT event_id, user_id, epoch_ns(ts) AS t
               FROM events WHERE event_type = 'click'),
    b AS (SELECT user_id, epoch_ns(ts) AS t, max(value) AS bval
          FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
    SELECT a.event_id, a.user_id, a.t,
           b.t AS r_t, b.bval AS r_bval
    FROM a ASOF LEFT JOIN b ON a.user_id = b.user_id AND a.t >= b.t
    """,
)
def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each click enriched with the user's most recent
    purchase at-or-before it (operators/temporal.asof_join — union +
    one keyed window, no range cross-product)."""
    # DuckDB reads TIMESTAMP(NANOS) at microsecond precision; truncate
    # our nanos the same way so both engines match on identical values
    e = load(spark, sf_dir, "events").withColumn(
        "ts", F.expr("ts div 1000") * 1000
    )
    clicks = e.where(F.col("event_type") == "click").select(
        "event_id", "user_id", F.col("ts").alias("t")
    )
    purchases = (
        e.where(F.col("event_type") == "purchase")
        .groupBy("user_id", F.col("ts").alias("t"))
        .agg(F.max("value").alias("bval"))
    )
    return temporal_ops.asof_join(
        clicks, purchases, on=["user_id"], left_ts="t", right_ts="t"
    )


@register(
    "events_asof_forward",
    """
    WITH a AS (SELECT event_id, user_id, epoch_ns(ts) AS t
               FROM events WHERE event_type = 'click'),
    b AS (SELECT user_id, epoch_ns(ts) AS t, max(value) AS bval
          FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
    SELECT a.event_id, a.user_id, a.t,
           b.t AS r_t, b.bval AS r_bval
    FROM a ASOF LEFT JOIN b ON a.user_id = b.user_id AND a.t <= b.t
    """,
)
def events_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: each click enriched with the user's NEXT
    purchase at-or-after it — next-action attribution
    (operators/temporal.asof_join, direction="forward": the same
    carry-forward window run in descending time, one keyed shuffle).
    Oracle: DuckDB ASOF with the inequality flipped (a.t <= b.t picks
    the smallest qualifying right timestamp)."""
    e = load(spark, sf_dir, "events").withColumn(
        "ts", F.expr("ts div 1000") * 1000
    )
    clicks = e.where(F.col("event_type") == "click").select(
        "event_id", "user_id", F.col("ts").alias("t")
    )
    purchases = (
        e.where(F.col("event_type") == "purchase")
        .groupBy("user_id", F.col("ts").alias("t"))
        .agg(F.max("value").alias("bval"))
    )
    return temporal_ops.asof_join(
        clicks,
        purchases,
        on=["user_id"],
        left_ts="t",
        right_ts="t",
        direction="forward",
    )


@register(
    "events_interval_join",
    """
    WITH s AS (SELECT event_id AS signup_id, user_id, epoch_ns(ts) AS t0
               FROM events WHERE event_type = 'signup'),
    c AS (SELECT user_id, epoch_ns(ts) AS t FROM events
          WHERE event_type = 'click')
    SELECT s.signup_id, s.user_id, COUNT(c.t) AS n_clicks
    FROM s LEFT JOIN c ON s.user_id = c.user_id
                      AND c.t >= s.t0 AND c.t < s.t0 + 3600000000000
    GROUP BY 1, 2
    """,
)
def events_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (range) join: clicks inside each signup's next hour,
    counted per signup (operators/temporal.interval_join — bucketized
    equi-join, no O(n·m) range scan). Left semantics restored with a
    join back to the signup set."""
    # micro-truncate nanos to mirror DuckDB's timestamp precision at
    # the window boundaries (see events_asof_join)
    e = load(spark, sf_dir, "events").withColumn(
        "ts", F.expr("ts div 1000") * 1000
    )
    signups = e.where(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"),
        "user_id",
        F.col("ts").alias("t0"),
        (F.col("ts") + F.lit(3_600_000_000_000)).alias("t1"),
    )
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("t")
    )
    matched = temporal_ops.interval_join(
        clicks,
        signups,
        on=["user_id"],
        point_ts="t",
        start_col="t0",
        end_col="t1",
    )
    counts = matched.groupBy("signup_id").agg(
        F.count("*").cast("long").alias("n_clicks")
    )
    return (
        signups.select("signup_id", "user_id")
        .join(counts, "signup_id", "left")
        .select(
            "signup_id",
            "user_id",
            F.coalesce(F.col("n_clicks"), F.lit(0)).cast("long").alias("n_clicks"),
        )
    )


# --------------------------------------------------------------------------
# LLM-pipeline operators: dedup / text analysis / similarity
# --------------------------------------------------------------------------

_SQL_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"


@register(
    "dedup_exact",
    f"""
    SELECT md5({_SQL_NORM}) AS fingerprint,
           MIN(doc_id) AS keeper_doc_id,
           COUNT(*) AS dup_count
    FROM documents GROUP BY fingerprint
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup groups (operators/dedup.exact_duplicates)."""
    return dedup_ops.exact_duplicates(load(spark, sf_dir, "documents"))


@register(
    "dedup_ngram_jaccard",
    f"""
    WITH toks AS (
      SELECT doc_id, string_split({_SQL_NORM}, ' ') AS t FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id,
             t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
      FROM toks, UNNEST(range(1, greatest(len(t) - 1, 1))) AS u(i)
      WHERE len(t) >= 3
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter_size
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT i.doc_a, i.doc_b, i.inter_size,
           sa.set_size AS size_a, sb.set_size AS size_b,
           CAST(floor(1000.0 * i.inter_size
                      / (sa.set_size + sb.set_size - i.inter_size)) AS BIGINT)
             AS jaccard_per_1000
    FROM inter i JOIN sizes sa ON i.doc_a = sa.doc_id
                 JOIN sizes sb ON i.doc_b = sb.doc_id
    WHERE floor(1000.0 * i.inter_size
                / (sa.set_size + sb.set_size - i.inter_size)) >= 800
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-3-gram Jaccard near-dup pairs >= 0.8 via inverted-index
    join (operators/dedup.ngram_jaccard_pairs)."""
    # fan-out ceiling = the collapse gate's threshold: past it the
    # explode runs on the collapsed frame and pre-collapse fan-out
    # only hurt (measured 10x: 5.9s -> 8.4s; 1x win 4.1s -> 2.0s kept)
    return dedup_ops.ngram_jaccard_pairs(
        _sload(spark, sf_dir, "documents", max_rows=20_000),
        n=3,
        threshold=0.8,
        collapse=_collapse_gate(sf_dir, "documents", min_rows=20_000),
    )


# Shared SQL twin of operators/text.quality_features (the n/m CTE
# bodies): stated ONCE so the stopword list / punct class / token
# regex can't drift between the text_quality and quality_score
# oracles.
_SQL_QF_CTES = f"""n AS (
      SELECT doc_id, text, {_SQL_NORM} AS norm FROM documents
    ),
    m AS (
      SELECT doc_id,
             CAST(length(text) AS BIGINT) AS n_chars,
             CASE WHEN norm = '' THEN 0
                  ELSE CAST(len(string_split(norm, ' ')) AS BIGINT) END AS n_tokens,
             CAST(len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^\\sA-Za-z0-9_]'))
                  AS BIGINT) AS n_pieces,
             CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g'))
                  AS BIGINT) AS n_punct,
             CAST(len(list_filter(string_split(norm, ' '),
                                  x -> x IN ('the', 'and', 'is', 'of')))
                  AS BIGINT) AS n_stopwords
      FROM n
    )"""


@register(
    "text_quality",
    f"""
    WITH {_SQL_QF_CTES}
    SELECT doc_id, n_chars, n_tokens, n_pieces, n_punct, n_stopwords,
           CAST(floor(1000 * n_punct / greatest(n_chars, 1)) AS BIGINT)
             AS punct_per_1000_chars,
           CAST(floor(1000 * n_stopwords / greatest(n_tokens, 1)) AS BIGINT)
             AS stop_per_1000_tokens,
           CAST(floor(n_chars / greatest(n_tokens, 1)) AS BIGINT)
             AS mean_token_len_floor
    FROM m
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality features (operators/text.quality_features)."""
    return text_ops.quality_features(load(spark, sf_dir, "documents"))


@register(
    "text_repetition",
    f"""
    WITH b AS (
      SELECT doc_id, string_split({_SQL_NORM}, ' ') AS t FROM documents
    ),
    g AS (
      SELECT doc_id, t,
             CASE WHEN len(t) >= 3
                  THEN list_transform(range(1, len(t) - 1),
                                      i -> array_to_string(t[i:i+2], ' '))
                  ELSE [] END AS gr
      FROM b
    ),
    m AS (
      SELECT doc_id,
             CAST(len(gr) AS BIGINT) AS n_grams,
             CAST(len(list_distinct(gr)) AS BIGINT) AS n_distinct_grams,
             CAST(len(t) AS BIGINT) AS n_toks,
             CAST(coalesce(list_max(list_transform(list_distinct(t),
                    x -> len(list_filter(t, y -> y = x)))), 0) AS BIGINT)
               AS top_tok
      FROM g
    )
    SELECT doc_id, n_grams, n_distinct_grams,
           CAST(floor(1000 * (n_grams - n_distinct_grams)
                      / greatest(n_grams, 1)) AS BIGINT) AS dup_gram_per_1000,
           CAST(floor(1000 * top_tok / greatest(n_toks, 1)) AS BIGINT)
             AS top_token_per_1000
    FROM m
    """,
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals
    (operators/text.repetition_features)."""
    return text_ops.repetition_features(_sload(spark, sf_dir, "documents"), n=3)


@register(
    "text_redact_pii",
    """
    WITH e AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT)
               AS n_email,
             regexp_replace(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                 '<EMAIL>', 'g') AS t1
      FROM documents
    ), u AS (
      SELECT doc_id, n_email,
             CAST(len(regexp_extract_all(t1, 'https?://[^\\s]+')) AS BIGINT)
               AS n_url,
             regexp_replace(t1, 'https?://[^\\s]+', '<URL>', 'g') AS t2
      FROM e
    )
    SELECT doc_id,
           md5(regexp_replace(t2,
               '\\+?[0-9][0-9()\\- ]{7,}[0-9]', '<PHONE>', 'g')) AS redacted_md5,
           n_email, n_url,
           CAST(len(regexp_extract_all(t2,
               '\\+?[0-9][0-9()\\- ]{7,}[0-9]')) AS BIGINT) AS n_phone
    FROM u
    """,
)
def text_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub (operators/text.redact_pii) — the redacted text is
    md5-compressed for hashing so the oracle verifies the exact
    replacement output, not just the counts."""
    out = text_ops.redact_pii(load(spark, sf_dir, "documents"))
    return out.select(
        "doc_id",
        F.md5(F.col("redacted")).alias("redacted_md5"),
        "n_email",
        "n_url",
        "n_phone",
    )


@register(
    "top_trigrams",
    f"""
    WITH toks AS (
      SELECT doc_id, string_split({_SQL_NORM}, ' ') AS t FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id,
             t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
      FROM toks, UNNEST(range(1, greatest(len(t) - 1, 1))) AS u(i)
      WHERE len(t) >= 3
    )
    SELECT shingle, COUNT(*) AS doc_freq
    FROM sh GROUP BY shingle
    ORDER BY doc_freq DESC, shingle LIMIT 20
    """,
)
def top_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary statistics: the 20 most document-frequent word
    trigrams, via WEIGHTED rep-collapse: the trigram explode (the cost
    center) runs once per distinct normalized text, and each rep
    carries its duplicate count as a weight — doc_freq = sum of
    weights is exactly the per-doc count, since a shingle's presence
    is a pure function of the text. Map-side combine collapses the
    weighted shingles before the shuffle; the top-k sorts only the
    aggregated counts. (10x stress: 10.0s -> explode shrinks by the
    dup ratio; on a dup-free corpus the fp pass adds one slim shuffle.)
    """
    docs = load(spark, sf_dir, "documents")
    keyed = docs.select(
        F.md5(text_ops._norm(F.col("text"))).alias("__fp"), "text"
    )
    wts = keyed.groupBy("__fp").agg(F.count("*").alias("__w"))
    reps = keyed.dropDuplicates(["__fp"]).withColumnRenamed("__fp", "doc_id")
    sh = text_ops.shingles(reps, n=3)
    return (
        sh.join(wts.withColumnRenamed("__fp", "doc_id"), "doc_id")
        .groupBy("shingle")
        .agg(F.sum("__w").cast("long").alias("doc_freq"))
        .orderBy(F.col("doc_freq").desc(), "shingle")
        .limit(20)
    )


@register("lang_id", None)  # SQL generated below from the same markers
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language-ID heuristic (operators/text.language_id)."""
    return text_ops.language_id(_sload(spark, sf_dir, "documents"))


def _lang_score_sql_parts() -> tuple[str, str, str]:
    """Score columns, argmax, and tie-broken CASE — generated from the
    same LANG_MARKERS constants the Spark operator uses (one source of
    truth), token-exact via list_filter like text.marker_count."""
    score_cols = ",\n             ".join(
        "CAST(len(list_filter(toks, x -> x IN ({0}))) AS BIGINT) AS s_{1}".format(
            ", ".join(f"'{m}'" for m in ms), lang
        )
        for lang, ms in text_ops.LANG_MARKERS.items()
    )
    langs_sorted = sorted(text_ops.LANG_MARKERS)  # ascending: first wins ties
    best = "greatest(" + ", ".join(f"s_{x}" for x in text_ops.LANG_MARKERS) + ")"
    case = "CASE " + " ".join(
        f"WHEN best > 0 AND s_{x} = best THEN '{x}'" for x in langs_sorted
    ) + " ELSE 'unknown' END"
    return score_cols, best, case


def _lang_id_sql() -> str:
    score_cols, best, case = _lang_score_sql_parts()
    return f"""
    WITH n AS (
      SELECT doc_id, string_split({_SQL_NORM}, ' ') AS toks FROM documents
    ),
    s AS (
      SELECT doc_id,
             {score_cols}
      FROM n
    ),
    b AS (SELECT *, {best} AS best FROM s)
    SELECT doc_id, {case} AS predicted_lang, best AS marker_hits FROM b
    """


_ORACLES["lang_id"] = _lang_id_sql()


@register("corpus_curation", None)  # SQL generated below (shared markers)
def corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship training-data pipeline composition: quality filter
    (>= 30 tokens) -> language filter (predicted 'en') -> exact dedup
    (keep min doc_id per normalized text). Every stage is a previously
    oracled operator; the composition stays one declarative plan —
    Catalyst pipelines the filters into the scan and the only shuffles
    are the dedup groupBy and its keeper semi-join."""
    docs = _sload(spark, sf_dir, "documents")
    pred, _ = text_ops.language_expr(F.col("text"))
    # one projection fuses tokenization + language-ID: a single scan,
    # filters push into it, no join
    filt = docs.select(
        "doc_id",
        F.md5(text_ops._norm(F.col("text"))).alias("__fp"),
        text_ops.token_count(F.col("text")).alias("n_tokens"),
        pred.alias("predicted_lang"),
    ).where((F.col("n_tokens") >= 30) & (F.col("predicted_lang") == "en"))
    # keeper = min doc per fingerprint. n_tokens/predicted_lang are
    # pure functions of the text, hence CONSTANT within a fingerprint
    # group — so min() reproduces the keeper's values exactly and the
    # whole reduction is one partial-agged groupBy: the shuffle carries
    # per-fp minima, not every duplicate row through a window sort
    # (same groupBy-beats-window argument as dedup._exact_groups).
    return (
        filt.groupBy("__fp")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.min("n_tokens").alias("n_tokens"),
            F.min("predicted_lang").alias("predicted_lang"),
        )
        .select("doc_id", "n_tokens", "predicted_lang")
    )


def _corpus_curation_sql() -> str:
    score_cols, best, case = _lang_score_sql_parts()
    return f"""
    WITH n AS (
      SELECT doc_id, {_SQL_NORM} AS nrm,
             string_split({_SQL_NORM}, ' ') AS toks
      FROM documents
    ),
    s AS (
      SELECT doc_id, nrm,
             CASE WHEN nrm = '' THEN 0
                  ELSE CAST(len(toks) AS BIGINT) END AS n_tokens,
             {score_cols}
      FROM n
    ),
    b AS (SELECT *, {best} AS best FROM s),
    p AS (SELECT doc_id, nrm, n_tokens, {case} AS predicted_lang FROM b),
    filt AS (SELECT * FROM p WHERE n_tokens >= 30 AND predicted_lang = 'en'),
    keep AS (SELECT md5(nrm) AS fp, MIN(doc_id) AS doc_id FROM filt GROUP BY 1)
    SELECT f.doc_id, f.n_tokens, f.predicted_lang
    FROM filt f JOIN keep k ON f.doc_id = k.doc_id
    """


_ORACLES["corpus_curation"] = _corpus_curation_sql()


@register("training_manifest", None)  # SQL generated below (shared CTEs)
def training_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end training-data manifest: curate (quality + language
    + exact dedup, = corpus_curation) -> deterministic 90/5/5 split ->
    concat-then-chunk sequence packing at budget 2048 over the
    surviving docs in id order. One declarative plan composing four
    previously-oracled operators; output is everything a loader needs:
    (doc_id, split, n_tokens, start_tok, seq_first, seq_last).

    Scale: curation fuses into the scan; split is a projection; the
    pack's prefix sum is the bucketed two-pass (no global window). The
    only shuffles are dedup's groupBy and the pack's bucket exchange."""
    cur = corpus_curation(spark, sf_dir)
    split = sampling_ops.hash_split(
        cur.select("doc_id", "n_tokens"),
        weights={"train": 0.9, "val": 0.05, "test": 0.05},
    )
    # pack_sequences makes up to three passes over its input (key
    # span, bucket totals, ranked output); without a boundary the
    # whole curation pipeline would re-execute per pass. The frame is
    # three slim columns per SURVIVING doc — metadata-scale next to
    # the corpus — so persist is the documented cache-wins exception.
    split = split.persist()
    packed = packing_ops.pack_sequences(
        split, "n_tokens", budget=2048, carry=["split"]
    )
    return packed.select(
        "doc_id", "split", "n_tokens", "start_tok", "seq_first", "seq_last"
    )


def _training_manifest_sql() -> str:
    bucket = _SQL_HASH_BUCKET.format(salt="split-v1")
    return f"""
    WITH cur AS ({_corpus_curation_sql()}),
    sp AS (
      SELECT doc_id, n_tokens,
             CASE WHEN {bucket} < 9000 THEN 'train'
                  WHEN {bucket} < 9500 THEN 'val'
                  ELSE 'test' END AS split
      FROM cur
    ),
    c AS (
      SELECT doc_id, split, n_tokens,
             COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS start_tok
      FROM sp
    )
    SELECT doc_id, split, n_tokens, CAST(start_tok AS BIGINT) AS start_tok,
           CAST(floor(start_tok / 2048) AS BIGINT) AS seq_first,
           CAST(floor((start_tok + greatest(n_tokens, 1) - 1) / 2048)
                AS BIGINT) AS seq_last
    FROM c
    """


@register(
    "doc_fingerprint",
    f"""
    SELECT doc_id, md5({_SQL_NORM}) AS fingerprint,
           CAST(length(text) AS BIGINT) AS n_chars
    FROM documents
    """,
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting (operators/text.fingerprint)."""
    return text_ops.fingerprint(load(spark, sf_dir, "documents"))


# md5-bucket idiom of operators/sampling._hash_bucket as SQL
_SQL_HASH_BUCKET = (
    "CAST(('0x' || substr(md5('{salt}:' || CAST(doc_id AS VARCHAR)), 1, 15)) "
    "AS BIGINT) % 10000"
)

# generated here (needs _SQL_HASH_BUCKET); the query fn is registered
# next to corpus_curation, whose CTEs the SQL composes
_ORACLES["training_manifest"] = _training_manifest_sql()


@register(
    "train_val_test_split",
    f"""
    WITH b AS (
      SELECT doc_id, {_SQL_HASH_BUCKET.format(salt="split-v1")} AS bucket
      FROM documents
    )
    SELECT doc_id,
           CASE WHEN bucket < 9000 THEN 'train'
                WHEN bucket < 9500 THEN 'val'
                ELSE 'test' END AS split
    FROM b
    """,
)
def train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 split by salted md5 of doc_id
    (operators/sampling.hash_split) — stable under re-runs and task
    retries, reproduced bucket-for-bucket by the SQL oracle."""
    return sampling_ops.hash_split(
        load(spark, sf_dir, "documents").select("doc_id"),
        weights={"train": 0.9, "val": 0.05, "test": 0.05},
    ).select("doc_id", "split")


@register(
    "corpus_hash_sample",
    f"""
    SELECT doc_id
    FROM documents
    WHERE {_SQL_HASH_BUCKET.format(salt="sample-v1")} < 1000
    """,
)
def corpus_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 10% corpus subsample
    (operators/sampling.hash_sample); nested rates with the same salt
    are subsets of one another."""
    return sampling_ops.hash_sample(
        load(spark, sf_dir, "documents").select("doc_id"), rate=0.10
    )


@register(
    "stratified_lang_sample",
    f"""
    SELECT doc_id, lang
    FROM documents
    WHERE {_SQL_HASH_BUCKET.format(salt="strat-v1")} <
          CASE lang WHEN 'en' THEN 2000 WHEN 'de' THEN 5000 ELSE 10000 END
    """,
)
def stratified_lang_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture rebalancing (operators/sampling.stratified_sample):
    downsample dominant languages (en 20%, de 50%), keep the tail —
    a pure row-local projection with per-group hash cuts, reproduced
    cut-for-cut by the oracle."""
    return sampling_ops.stratified_sample(
        load(spark, sf_dir, "documents").select("doc_id", "lang"),
        rates={"en": 0.2, "de": 0.5},
        default_rate=1.0,
    )


@register(
    "source_quota_sample",
    """
    SELECT doc_id, source FROM (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5('quota-v1:' || CAST(doc_id AS VARCHAR)), doc_id
             ) AS rn
      FROM documents
    ) ranked WHERE rn <= 20
    """,
)
def source_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain capping (operators/sampling.quota_per_group): at most 20
    docs per crawl source, drawn by salted hash (stable, uniform — not
    head-of-file). One shuffle on source; per-group windows in
    parallel. Oracle orders by the identical md5 hex string."""
    return sampling_ops.quota_per_group(
        load(spark, sf_dir, "documents").select("doc_id", "source"),
        quota=20,
    )


@register(
    "domain_mixture",
    """
    SELECT source, lang, COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE length(trim(regexp_replace(text, '\\s+', ' ', 'g')))
                         - length(replace(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ', ''))
                         + 1 END) AS BIGINT) AS n_tokens
    FROM documents
    GROUP BY source, lang
    """,
)
def domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture report: docs and whitespace tokens per
    (source, lang) cell (operators/text.token_count) — the table a
    mixture-weighting pass reads before setting stratified rates.
    One partial-agg shuffle of |sources × langs| cells."""
    docs = load(spark, sf_dir, "documents")
    return docs.groupBy("source", "lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(text_ops.token_count(F.col("text"))).alias("n_tokens"),
    )


@register(
    "sequence_packing",
    """
    WITH t AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(text,
                 '[A-Za-z0-9_]+|[^\\sA-Za-z0-9_]')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    c AS (
      SELECT doc_id, n_tokens,
             COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS start_tok
      FROM t
    )
    SELECT doc_id, n_tokens, CAST(start_tok AS BIGINT) AS start_tok,
           CAST(floor(start_tok / 2048) AS BIGINT) AS seq_first,
           CAST(floor((start_tok + greatest(n_tokens, 1) - 1) / 2048)
                AS BIGINT) AS seq_last
    FROM c
    """,
)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style concat-then-chunk packing at budget 2048
    (operators/packing.pack_sequences): each document's offset and
    sequence span in the global token stream. The oracle's global
    window cumsum is the single-task cliff the operator's range-bucket
    prefix sum avoids; boundaries come from parquet footer stats."""
    docs = load(spark, sf_dir, "documents")
    try:
        bounds = stats.boundaries_from_stats(
            stats.parquet_rowgroup_stats(f"{sf_dir}/documents.parquet", "doc_id"),
            int(spark.conf.get("spark.sql.shuffle.partitions", "32")),
        )
    except Exception:
        bounds = []
    return packing_ops.pack_sequences(
        docs,
        text_ops.wordpiece_count(F.col("text")),
        budget=2048,
        order_col="doc_id",
        bounds=bounds,
    )


@register(
    "embedding_quantize",
    """
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ),
    s AS (
      SELECT vec_id, e,
             CASE WHEN list_max(list_transform(e, x -> abs(x))) = 0.0
                  THEN 1.0
                  ELSE list_max(list_transform(e, x -> abs(x))) END AS scale
      FROM v
    )
    SELECT vec_id,
           CAST(floor(scale * 1e9) AS BIGINT) AS scale_1e9,
           md5(array_to_string(
             list_transform(e, x -> CAST(CAST(floor(127.0 * x / scale)
                                              AS BIGINT) AS VARCHAR)),
             ',')) AS q_md5
    FROM s
    """,
)
def embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 embedding quantization
    (operators/similarity.quantize_embeddings), emitted as
    (vec_id, scale_1e9, q_md5) with q_md5 = md5 over the ordered
    comma-joined int8 values — the driver canonicalizer never sees a
    raw array (the multimodal_features lesson), and every element is
    still value-pinned (any single int8 flip changes the hash) without
    exploding dim rows per vector (64x fewer gate rows; the exploded
    form cost 11s at the 10x stress scale just materializing 20M
    rows). floor-based arithmetic keeps both engines bit-identical —
    no rounding-tie divergence; BIGINT-to-string rendering is
    locale-free in both."""
    out = sim_ops.quantize_embeddings(load(spark, sf_dir, "embeddings"))
    return out.select(
        "vec_id",
        "scale_1e9",
        F.md5(
            F.concat_ws(
                ",", F.transform("q", lambda x: x.cast("string"))
            )
        ).alias("q_md5"),
    )


@register(
    "ann_cosine_topk",
    """
    WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
               FROM embeddings WHERE vec_id < 10),
    c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
          FROM embeddings),
    scored AS (
      SELECT q.query_id, c.neighbor_id,
             CAST(floor(1000000.0 * list_inner_product(q.qv, c.cv)
                        / (sqrt(list_inner_product(q.qv, q.qv))
                           * sqrt(list_inner_product(c.cv, c.cv)))) AS BIGINT)
               AS cos_1e6
      FROM q CROSS JOIN c WHERE q.query_id != c.neighbor_id
    )
    SELECT query_id, neighbor_id, rank, cos_1e6
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY cos_1e6 DESC, neighbor_id)
                      AS rank
          FROM scored)
    WHERE rank <= 5
    """,
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for query vectors vec_id < 10
    (operators/similarity.cosine_topk_bruteforce)."""
    emb = load(spark, sf_dir, "embeddings")
    out = sim_ops.cosine_topk_bruteforce(
        emb, emb.where(F.col("vec_id") < 10), k=5
    )
    return out.withColumn("rank", F.col("rank").cast("long"))


@register(
    "embedding_neardup",
    """
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
    SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
           CAST(floor(1000000.0 * list_inner_product(a.e, b.e)
                      / (sqrt(list_inner_product(a.e, a.e))
                         * sqrt(list_inner_product(b.e, b.e)))) AS BIGINT)
             AS cos_1e6
    FROM v a JOIN v b ON a.vec_id < b.vec_id
    WHERE floor(1000000.0 * list_inner_product(a.e, b.e)
                / (sqrt(list_inner_product(a.e, a.e))
                   * sqrt(list_inner_product(b.e, b.e)))) >= 420000
    """,
)
def embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs above 0.42
    (operators/similarity.embedding_neardup_pairs). The dup-ratio
    probe is footer-pre-gated: toy corpora skip straight to the
    uncollapsed path (see _collapse_gate)."""
    return sim_ops.embedding_neardup_pairs(
        load(spark, sf_dir, "embeddings"),
        threshold_1e6=420000,
        collapse=_collapse_gate(sf_dir, "embeddings"),
    )


@register(
    "winnow_fingerprint",
    f"""
    WITH base AS (
      SELECT doc_id, string_split({_SQL_NORM}, ' ') AS t, {_SQL_NORM} AS nrm
      FROM documents
    ),
    g AS (
      SELECT doc_id,
             CASE WHEN len(t) >= 4
                  THEN list_transform(range(1, len(t) - 2),
                                      i -> array_to_string(t[i:i+3], ' '))
                  ELSE [nrm] END AS grams
      FROM base
    ),
    h AS (
      SELECT doc_id,
             list_transform(grams,
                            x -> CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT))
               AS hs
      FROM g
    ),
    w AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(hs) - 4, 1) + 1),
               j -> list_min(hs[j:j+4]))) AS fps
      FROM h
    )
    SELECT doc_id, UNNEST(fps) AS fp FROM w
    """,
)
def winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash winnowing fingerprints, k=4-gram, w=5 window
    (operators/text.winnow_fingerprints)."""
    return text_ops.winnow_fingerprints(
        load(spark, sf_dir, "documents"), k=4, w=5
    )


@register("winnow_fingerprint_fast", None)
def winnow_fingerprint_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """winnow_fingerprint's scale-path twin: identical winnowing
    semantics with the gram digest swapped md5 -> xxhash64 (round-5
    verdict #8). The gram hash dominates long-document cost at ~1
    digest per token, and xxhash64 is a single JVM codegen intrinsic
    where md5 allocates a hex string per gram and re-parses it with
    conv() — same fingerprint SET semantics, different (and
    incomparable) fingerprint values, so this entry is rows-only by
    construction: DuckDB has no xxhash64. Correctness is pinned
    instead by a pure-Python XXH64 replay of the full winnowing
    pipeline (tests/test_text.py::test_winnow_xxhash64_replay — Spark's
    xxhash64 is XXH64 seed=42 over the UTF-8 bytes) plus the oracled
    md5 sibling sharing every line of plan code except the digest."""
    return text_ops.winnow_fingerprints(
        load(spark, sf_dir, "documents"), k=4, w=5, hash_fn="xxhash64"
    )


@register(
    "winnow_fast_gate",
    """
    SELECT TRUE AS docs_match, TRUE AS fp_is_gram_subset,
           TRUE AS density_within_5pct
    """,
)
def winnow_fast_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-gate for the xxhash64 winnowing fast path (round-8 verdict
    next-#6): the fast path's VALUES are engine-only forever (DuckDB
    has no xxhash64), but three invariants of a correct winnowing
    implementation are checkable in-engine and folded to oracled
    booleans — the ann_recall_check pattern:

      * docs_match — fast and md5 paths fingerprint exactly the same
        document set (coverage can't silently drop);
      * fp_is_gram_subset — every fast fingerprint is one of its own
        document's xxhash64 gram hashes (an anti-join against the SAME
        gram plan via text.winnow_gram_hashes; a wrong window-min or a
        hash/tokenize drift between stages breaks this);
      * density_within_5pct — total fingerprint counts of the two
        paths agree within 5% (winnowing density depends on the hash
        only through argmin ties; measured ratio 0.999-1.001 at
        sf0.001-0.1 — a selection-logic bug shifts it far outside).

    Together with the pure-Python XXH64 full-pipeline replay
    (tests/test_text_ops.py) the fast path now has a driver-gated
    evidence row, not only pytest evidence."""
    docs = load(spark, sf_dir, "documents")
    fast = text_ops.winnow_fingerprints(
        docs, k=4, w=5, hash_fn="xxhash64"
    ).persist()
    slow = text_ops.winnow_fingerprints(docs, k=4, w=5).persist()
    fd = fast.select("doc_id").distinct()
    sd = slow.select("doc_id").distinct()
    docs_match = (
        fd.exceptAll(sd)
        .agg(F.count(F.lit(1)).alias("only_fast"))
        .crossJoin(
            sd.exceptAll(fd).agg(F.count(F.lit(1)).alias("only_slow"))
        )
        .select(
            ((F.col("only_fast") + F.col("only_slow")) == 0).alias(
                "docs_match"
            )
        )
    )
    gram_rows = text_ops.winnow_gram_hashes(
        docs, k=4, hash_fn="xxhash64"
    ).select("doc_id", F.explode("__hs").alias("fp"))
    subset = (
        fast.join(gram_rows, ["doc_id", "fp"], "left_anti")
        .agg((F.count(F.lit(1)) == 0).alias("fp_is_gram_subset"))
    )
    density = (
        fast.agg(F.count(F.lit(1)).alias("nf"))
        .crossJoin(slow.agg(F.count(F.lit(1)).alias("ns")))
        .select(
            (
                F.abs(F.col("nf") - F.col("ns"))
                <= F.lit(0.05) * F.col("ns").cast("double")
            ).alias("density_within_5pct")
        )
    )
    return docs_match.crossJoin(subset).crossJoin(density)


# Shared CTE prefix of the duplicate-span family oracles: every
# 12-token sliding window of the normalized text, md5-hashed. DuckDB
# list slicing is 1-based inclusive (toks[i:i+11] = 12 elements);
# Spark's posexplode pos is 0-based — coverage arithmetic is
# translation-invariant and detect never emits positions, so the two
# bases never meet in output.
_SPAN_WINDOW_SQL = f"""
    t AS (
      SELECT doc_id, string_split({_SQL_NORM}, ' ') AS toks
      FROM documents
    ),
    w AS (
      SELECT doc_id, i AS pos,
             md5(array_to_string(toks[i:i+11], ' ')) AS span_hash
      FROM t, UNNEST(generate_series(1, len(toks) - 11)) AS u(i)
      WHERE len(toks) >= 12
    )
"""


@register(
    "dup_span_detect",
    f"""
    WITH {_SPAN_WINDOW_SQL},
    pd AS (
      SELECT span_hash, doc_id, COUNT(*) AS c
      FROM w GROUP BY 1, 2
    )
    SELECT span_hash,
           CAST(SUM(c) AS BIGINT) AS n_occurrences,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           MIN(doc_id) AS first_doc
    FROM pd GROUP BY 1 HAVING COUNT(*) >= 2
    """,
)
def dup_span_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated 12-token spans across >= 2 distinct documents
    (operators/text.dup_spans) — the distributed fixed-window
    approximation of suffix-array substring dedup (Lee et al. 2022),
    the one canonical LLM-data dedup mode the family lacked: exact,
    MinHash-LSH, SimHash, n-gram Jaccard, containment and embedding
    near-dup all match whole documents; this finds the duplicated
    REGIONS inside otherwise-distinct documents (license boilerplate,
    quoted passages, templated headers)."""
    return text_ops.dup_spans(
        _sload(spark, sf_dir, "documents"),
        n=12,
        collapse=_collapse_gate(sf_dir, "documents", min_rows=20_000),
    )


@register(
    "dup_span_coverage",
    f"""
    WITH {_SPAN_WINDOW_SQL},
    dup AS (
      SELECT span_hash FROM w
      GROUP BY 1 HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    hits AS (SELECT w.doc_id, w.pos FROM w JOIN dup USING (span_hash)),
    isl AS (
      SELECT doc_id, pos,
             CASE WHEN pos > COALESCE(MAX(pos + 11) OVER (
                    PARTITION BY doc_id ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                  ), -1) + 1
                  THEN 1 ELSE 0 END AS new_island
      FROM hits
    ),
    isl2 AS (
      SELECT doc_id, pos,
             SUM(new_island) OVER (
               PARTITION BY doc_id ORDER BY pos
             ) AS island_id
      FROM isl
    ),
    cov AS (
      SELECT doc_id, MAX(pos + 11) - MIN(pos) + 1 AS covered
      FROM isl2 GROUP BY doc_id, island_id
    ),
    per_doc AS (
      SELECT doc_id, CAST(SUM(covered) AS BIGINT) AS covered_tokens
      FROM cov GROUP BY 1
    ),
    nt AS (
      SELECT doc_id,
             CASE WHEN {_SQL_NORM} = '' THEN 0
                  ELSE CAST(len(string_split({_SQL_NORM}, ' ')) AS BIGINT)
             END AS n_tokens
      FROM documents
    )
    SELECT n.doc_id, n.n_tokens,
           COALESCE(p.covered_tokens, 0) AS covered_tokens,
           CASE WHEN n.n_tokens = 0 THEN 0
                ELSE COALESCE(p.covered_tokens, 0) * 1000000 // n.n_tokens
           END AS coverage_1e6
    FROM nt n LEFT JOIN per_doc p USING (doc_id)
    """,
)
def dup_span_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-text budget: fraction of tokens inside a
    cross-doc duplicated 12-token span (operators/text.
    dup_span_coverage) — "fraction of tokens removed" from Lee et al.
    2022, the number a substring-dedup pass reports before deleting
    anything. Overlapping hits merge gaps-and-islands style so coverage
    never double-counts."""
    return text_ops.dup_span_coverage(
        _sload(spark, sf_dir, "documents"),
        n=12,
        collapse=_collapse_gate(sf_dir, "documents", min_rows=20_000),
    )


@register(
    "dup_span_strip",
    f"""
    WITH {_SPAN_WINDOW_SQL},
    dup AS (
      SELECT span_hash FROM w
      GROUP BY 1 HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    hits AS (SELECT w.doc_id, w.pos FROM w JOIN dup USING (span_hash)),
    isl AS (
      SELECT doc_id, pos,
             CASE WHEN pos > COALESCE(MAX(pos + 11) OVER (
                    PARTITION BY doc_id ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                  ), -1) + 1
                  THEN 1 ELSE 0 END AS new_island
      FROM hits
    ),
    isl2 AS (
      SELECT doc_id, pos,
             SUM(new_island) OVER (
               PARTITION BY doc_id ORDER BY pos
             ) AS island_id
      FROM isl
    ),
    bounds AS (
      SELECT doc_id, MIN(pos) AS s, MAX(pos + 11) AS e
      FROM isl2 GROUP BY doc_id, island_id
    ),
    tokpos AS (
      SELECT doc_id, i, toks[i] AS tok
      FROM t, UNNEST(generate_series(1, len(toks))) AS u(i)
    ),
    kept AS (
      SELECT tp.doc_id, tp.i, tp.tok FROM tokpos tp
      WHERE NOT EXISTS (
        SELECT 1 FROM bounds b
        WHERE b.doc_id = tp.doc_id AND tp.i BETWEEN b.s AND b.e
      )
    ),
    ka AS (
      SELECT doc_id, string_agg(tok, ' ' ORDER BY i) AS clean_text,
             COUNT(*) AS kept_n
      FROM kept GROUP BY doc_id
    ),
    raw AS (
      SELECT doc_id, len(toks) AS raw_n,
             CASE WHEN len(toks) = 1 AND toks[1] = '' THEN 0
                  ELSE len(toks) END AS n_tokens
      FROM t
    )
    SELECT r.doc_id,
           CAST(r.n_tokens AS BIGINT) AS n_tokens,
           CAST(r.raw_n - COALESCE(k.kept_n, 0) AS BIGINT)
             AS removed_tokens,
           COALESCE(k.clean_text, '') AS clean_text
    FROM raw r LEFT JOIN ka k USING (doc_id)
    """,
)
def dup_span_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The removal transform completing the duplicate-span family
    (operators/text.dup_span_strip): delete every token inside a
    cross-doc duplicated 12-token span and rebuild the text — the
    actual edit exact-substring dedup performs (all occurrences cut,
    per the published semantics). detect finds the spans, coverage
    budgets them, strip applies them; all three share one window-scan
    stage and the island merge."""
    return text_ops.dup_span_strip(
        _sload(spark, sf_dir, "documents"),
        n=12,
        collapse=_collapse_gate(sf_dir, "documents", min_rows=20_000),
    )


# --------------------------------------------------------------------------
# Multimodal: binary payload + typed metadata plumbing
# --------------------------------------------------------------------------


@register(
    "multimodal_meta",
    """
    SELECT doc_id AS media_id,
           CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
                WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS payload_md5
    FROM documents
    """,
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload metadata pass: octet_length + md5 over the binary
    column, JVM-side (operators/multimodal.media_metadata)."""
    media = mm_ops.documents_as_media(load(spark, sf_dir, "documents"))
    return mm_ops.media_metadata(media)


@register(
    "multimodal_frame_plan",
    """
    SELECT doc_id AS media_id,
           CAST(UNNEST(range(0, greatest(n_chars * 10, 1), 1000)) AS BIGINT)
             AS frame_ms
    FROM documents WHERE doc_id % 3 = 2
    """,
)
def multimodal_frame_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plan (1 row per sampled timestamp), pure
    generator — the prunable half of frame_sample_plan
    (operators/multimodal.frame_plan)."""
    media = mm_ops.documents_as_media(load(spark, sf_dir, "documents"))
    return mm_ops.frame_plan(media, every_ms=1000)


# --------------------------------------------------------------------------
# Approximate / non-SQL-expressible ops: rows-only driver check
# --------------------------------------------------------------------------


@register(
    "multimodal_features",
    """
    WITH dims AS (
      SELECT doc_id, 1 + n_chars % 13 AS h FROM documents
    ),
    px AS (
      SELECT d.doc_id, d.h, u.i, (d.doc_id * 31 + u.i) % 256 AS b
      FROM dims d, UNNEST(range(0, d.h * 24)) AS u(i)
    )
    SELECT doc_id AS media_id,
           CAST(8 AS BIGINT) AS width,
           CAST(MAX(h) AS BIGINT) AS height,
           CAST(MAX(h) * 8 AS BIGINT) AS n_pixels,
           CAST(SUM(CASE WHEN i % 3 = 0 THEN b END) AS BIGINT) AS sum_r,
           CAST(SUM(CASE WHEN i % 3 = 1 THEN b END) AS BIGINT) AS sum_g,
           CAST(SUM(CASE WHEN i % 3 = 2 THEN b END) AS BIGINT) AS sum_b,
           CAST(MIN(b) AS BIGINT) AS min_byte,
           CAST(MAX(b) AS BIGINT) AS max_byte
    FROM px GROUP BY doc_id
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL media decode + feature extraction, fully value-oracled:
    documents synthesize binary PPM (P6) payloads JVM-side (pixel byte
    i of doc d = (d*31 + i) % 256 over an 8 x (1 + n_chars % 13) image,
    hex-assembled + unhex — operators/multimodal.documents_as_ppm_media),
    then operators/multimodal.ppm_feature_stats byte-parses the actual
    PPM header + raster in mapInPandas and emits integral per-channel
    pixel statistics. The oracle recomputes every statistic closed-form
    from the pixel formula — no codec in DuckDB, yet every decoded
    value is hash-checked. The blake2b-stub path (extract_features)
    remains for opaque formats, pinned by tests/test_multimodal.py."""
    media = media_fixture(spark, sf_dir, "ppm")
    return mm_ops.ppm_feature_stats(media)


_PPM_OUT_HEADER_HEX = "P6\n4 4\n255\n".encode("ascii").hex().upper()

@register(
    "multimodal_resize",
    f"""
    WITH dims AS (
      SELECT doc_id, 1 + n_chars % 13 AS h FROM documents
    ),
    outpx AS (
      -- j = 3*(oy*4 + ox) + c over the 4x4 RGB output; nearest-neighbor
      -- floor mapping: src_y = oy*h // 4, src_x = ox*8 // 4
      SELECT d.doc_id, d.h, u.j,
             (d.doc_id * 31
              + 3 * (((u.j // 12) * d.h // 4) * 8 + ((u.j % 12) // 3) * 8 // 4)
              + u.j % 3) % 256 AS b
      FROM dims d, UNNEST(range(0, 48)) AS u(j)
    )
    SELECT doc_id AS media_id,
           CAST(4 AS BIGINT) AS out_width,
           CAST(4 AS BIGINT) AS out_height,
           CAST(10 + length(CAST(MAX(h) AS VARCHAR)) + 24 * MAX(h) AS BIGINT)
             AS n_bytes_in,
           CAST(59 AS BIGINT) AS n_bytes_out,
           '{_PPM_OUT_HEADER_HEX}'
             || string_agg(lpad(to_hex(b), 2, '0'), '' ORDER BY j)
             AS resized_hex
    FROM outpx GROUP BY doc_id
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image resize, byte-for-byte value-oracled: decode the
    synthesized PPM payloads (same formula as multimodal_features),
    nearest-neighbor gather to 4x4 (src_y = oy*h // 4 — floor mapping),
    re-encode canonical P6 (operators/multimodal.resize_ppm). The query
    emits the ENTIRE resized image as uppercase hex; the oracle
    reconstructs the identical 59 bytes (header + 48 raster bytes)
    closed-form — a byte-identical cross-engine check of the whole
    decode->resample->encode path. The blake2b-stub resize
    (resize_images) remains for opaque formats."""
    media = media_fixture(spark, sf_dir, "ppm")
    out = mm_ops.resize_ppm(media, out_w=4, out_h=4)
    return out.select(
        "media_id",
        "out_width",
        "out_height",
        "n_bytes_in",
        "n_bytes_out",
        F.hex(F.col("resized")).alias("resized_hex"),
    )


# Shared CTE prefix of the perceptual-hash oracles: the dHash band
# vector recomputed closed-form from the synthesized-PPM pixel formula
# (pixel byte i of doc d = (d*31 + i) % 256 over an 8 x (1+n_chars%13)
# image) — integer luma, floor-mapped 9x8 resample, horizontal
# comparison bits packed LSB-first into four 16-bit bands. The Spark
# side computes the SAME values by actually decoding the PPM bytes in
# mapInPandas (operators/multimodal.dhash_images).
_DHASH_BANDS_SQL = """
    dims AS (SELECT doc_id, 1 + n_chars % 13 AS h FROM documents),
    cells AS (
      SELECT d.doc_id, u.oy, v.ox,
             ((u.oy * d.h) // 8) AS sy, ((v.ox * 8) // 9) AS sx
      FROM dims d, UNNEST(range(0, 8)) AS u(oy), UNNEST(range(0, 9)) AS v(ox)
    ),
    gray AS (
      SELECT doc_id, oy, ox,
             (299 * ((doc_id*31 + 3*(sy*8+sx)) % 256)
            + 587 * ((doc_id*31 + 3*(sy*8+sx) + 1) % 256)
            + 114 * ((doc_id*31 + 3*(sy*8+sx) + 2) % 256)) // 1000 AS g
      FROM cells
    ),
    bits AS (
      SELECT a.doc_id, a.oy*8 + a.ox AS bi,
             CASE WHEN b.g > a.g THEN 1 ELSE 0 END AS bit
      FROM gray a
      JOIN gray b ON a.doc_id = b.doc_id AND a.oy = b.oy AND b.ox = a.ox + 1
      WHERE a.ox < 8
    ),
    bands AS (
      SELECT doc_id,
             CAST(SUM(CASE WHEN bi//16 = 0 THEN bit * (1 << (bi%16)) END)
                  AS BIGINT) AS b0,
             CAST(SUM(CASE WHEN bi//16 = 1 THEN bit * (1 << (bi%16)) END)
                  AS BIGINT) AS b1,
             CAST(SUM(CASE WHEN bi//16 = 2 THEN bit * (1 << (bi%16)) END)
                  AS BIGINT) AS b2,
             CAST(SUM(CASE WHEN bi//16 = 3 THEN bit * (1 << (bi%16)) END)
                  AS BIGINT) AS b3
      FROM bits GROUP BY doc_id
    )
"""


@register(
    "multimodal_audio_features",
    """
    WITH d AS (SELECT doc_id, 32 + n_chars % 64 AS n FROM documents),
    s AS (
      SELECT d.doc_id, d.n, u.i,
             CASE WHEN (d.doc_id*31 + u.i) % 65536 >= 32768
                  THEN (d.doc_id*31 + u.i) % 65536 - 65536
                  ELSE (d.doc_id*31 + u.i) % 65536 END AS v
      FROM d, UNNEST(range(0, d.n)) AS u(i)
    ),
    s2 AS (
      SELECT doc_id, n, i, v,
             LEAD(v) OVER (PARTITION BY doc_id ORDER BY i) AS nxt
      FROM s
    )
    SELECT doc_id AS media_id,
           CAST(8000 AS BIGINT) AS sample_rate,
           CAST(1 AS BIGINT) AS n_channels,
           CAST(MAX(n) AS BIGINT) AS n_samples,
           CAST(MAX(n) * 1000 // 8000 AS BIGINT) AS duration_ms,
           CAST(SUM(v * v) AS BIGINT) AS sum_sq,
           CAST(SUM(CASE WHEN nxt IS NOT NULL AND v * nxt < 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings,
           CAST(MIN(v) AS BIGINT) AS min_s,
           CAST(MAX(v) AS BIGINT) AS max_s
    FROM s2 GROUP BY doc_id
    """,
)
def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode + feature extraction, fully value-oracled —
    the audio twin of multimodal_features: documents synthesize binary
    PCM-WAV payloads JVM-side (unsigned word i of doc d = (d*31 + i) %
    65536 over 32 + n_chars % 64 mono samples at 8000 Hz, hex-assembled
    + unhex — operators/multimodal.documents_as_wav_media), then
    operators/multimodal.wav_feature_stats chunk-walks the actual
    RIFF/WAVE container in mapInPandas (a real dependency-free PCM16
    codec, not a stub) and emits integral audio features: total energy,
    strict-sign zero crossings, sample extrema, exact duration. The
    oracle recomputes every statistic closed-form from the sample
    formula — no codec in DuckDB, yet every decoded value is
    hash-checked. Compressed/float audio stays honestly opaque
    (NotImplementedError where ffmpeg would run)."""
    media = media_fixture(spark, sf_dir, "wav")
    return mm_ops.wav_feature_stats(media)


@register(
    "multimodal_phash_clusters",
    f"""
    WITH {_DHASH_BANDS_SQL},
    keep AS (
      SELECT b0, b1, b2, b3, MIN(doc_id) AS cluster_id
      FROM bands GROUP BY 1, 2, 3, 4
    )
    SELECT h.doc_id AS media_id, h.b0, h.b1, h.b2, h.b3, k.cluster_id
    FROM bands h JOIN keep k USING (b0, b1, b2, b3)
    """,
)
def multimodal_phash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash image dedup over the REAL decode path, fully
    value-oracled: the synthesized PPM payloads are byte-decoded in
    mapInPandas, dHashed (integer luma -> floor-mapped 9x8 resample ->
    64 horizontal-comparison bits as four 16-bit bands), and exact-hash
    groups cluster to their min media_id (operators/multimodal.
    dhash_images + phash_clusters). The oracle recomputes every band
    closed-form from the pixel formula — the codec-decoded hash and
    the arithmetic replay must agree bit-for-bit. Extends the
    multimodal family from plumbing/decode/resize to the actual
    image-dedup primitive a crawl pipeline runs."""
    media = media_fixture(spark, sf_dir, "ppm")
    return mm_ops.phash_clusters(mm_ops.dhash_images(media))


@register(
    "multimodal_phash_neardup",
    f"""
    WITH {_DHASH_BANDS_SQL},
    reps AS (
      SELECT b0, b1, b2, b3, MIN(doc_id) AS rep, COUNT(*) AS n_media
      FROM bands GROUP BY 1, 2, 3, 4
    )
    SELECT a.rep AS media_a, b.rep AS media_b,
           CAST(bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
              + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3))
                AS BIGINT) AS hamming,
           a.n_media AS n_media_a, b.n_media AS n_media_b
    FROM reps a JOIN reps b ON a.rep < b.rep
    WHERE bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
        + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3))
        BETWEEN 1 AND 3
    """,
)
def multimodal_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate image pairs at Hamming distance 1-3 between
    DISTINCT dHashes (operators/multimodal.phash_neardup_pairs) — the
    house dedup architecture applied to images: exact-hash groups
    collapse first, the banded self-join runs over representatives
    only (pigeonhole: <=3 differing bits leave at least one of four
    16-bit bands equal, so the band join is exact, never a recall
    trade), and group sizes ride along as the weights a review pass
    needs. The oracle brute-forces rep x rep with xor/bit_count —
    correct at fixture scale, exactly what the banding avoids at
    corpus scale."""
    media = media_fixture(spark, sf_dir, "ppm")
    return mm_ops.phash_neardup_pairs(mm_ops.dhash_images(media))


# Shared CTE prefix of the video-container oracles: per-doc AVI
# synthesis parameters and per-frame sizes, recomputed closed-form
# from the documents_as_avi_media formulas (doc d: n = 2 + n_chars%6
# frames, us_per_frame = 20000 + 5000*(d%5), frame i is
# 16 + 2*((d*7 + 13*i)%16) bytes, byte j of frame i = (d*31+17*i+j)%256).
_AVI_FRAMES_SQL = """
    d AS (
      SELECT doc_id, 2 + n_chars % 6 AS n,
             20000 + 5000 * (doc_id % 5) AS upf,
             16 * (1 + doc_id % 3) AS w,
             8 * (1 + n_chars % 4) AS h
      FROM documents
    ),
    fr AS (
      SELECT d.doc_id, u.i, d.upf,
             16 + 2 * ((d.doc_id * 7 + 13 * u.i) % 16) AS sz
      FROM d, UNNEST(range(0, d.n)) AS u(i)
    )
"""


@register(
    "multimodal_video_stats",
    f"""
    WITH {_AVI_FRAMES_SQL}
    SELECT d.doc_id AS media_id,
           CAST(d.w AS BIGINT) AS width,
           CAST(d.h AS BIGINT) AS height,
           CAST(d.n AS BIGINT) AS n_frames,
           CAST(d.upf AS BIGINT) AS us_per_frame,
           CAST(d.n * d.upf // 1000 AS BIGINT) AS duration_ms,
           CAST(SUM(f.sz) AS BIGINT) AS total_frame_bytes,
           CAST(MIN(f.sz) AS BIGINT) AS min_frame_bytes,
           CAST(MAX(f.sz) AS BIGINT) AS max_frame_bytes,
           CAST(1 AS BIGINT) AS header_frames_ok,
           CAST(1 AS BIGINT) AS idx1_ok
    FROM d JOIN fr f USING (doc_id)
    GROUP BY d.doc_id, d.w, d.h, d.n, d.upf
    """,
)
def multimodal_video_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video-container parsing, fully value-oracled — the video
    twin of multimodal_audio_features (round-6 verdict #6): documents
    synthesize genuine RIFF-AVI containers JVM-side (hdrl/avih + one
    MJPG strl + movi '00dc' chunks + a full idx1 — operators/
    multimodal.documents_as_avi_media, pinned byte-identical to
    encode_avi by test), then operators/multimodal.avi_video_stats
    chunk-walks the actual container in mapInPandas: dims + timing
    from avih, frame count/size distribution from the movi walk
    (header_frames_ok cross-checks avih AND strh against the walked
    count — headers are never trusted), idx1 verified entry-by-entry.
    Frame PIXELS stay honestly opaque (MJPEG entropy decode is ffmpeg
    territory — NotImplementedError on non-AVI payloads), matching the
    reference's binary-passthrough posture for media columns. The
    oracle recomputes every statistic closed-form from the synthesis
    formulas — no demuxer in DuckDB, yet every walked value is
    hash-checked."""
    media = media_fixture(spark, sf_dir, "avi")
    return mm_ops.avi_video_stats(media)


@register(
    "multimodal_video_frame_plan",
    f"""
    WITH {_AVI_FRAMES_SQL},
    off AS (
      SELECT doc_id, i, upf, sz,
             232 + 8 * i + COALESCE(SUM(sz) OVER (
                 PARTITION BY doc_id ORDER BY i
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS data_off
      FROM fr
    ),
    ck AS (
      SELECT f.doc_id, f.i,
             SUM((f.doc_id * 31 + 17 * f.i + u.j) % 256) AS cksum
      FROM fr f, UNNEST(range(0, f.sz)) AS u(j)
      GROUP BY f.doc_id, f.i
    )
    SELECT o.doc_id AS media_id,
           CAST(o.i AS BIGINT) AS frame_idx,
           CAST(o.data_off AS BIGINT) AS byte_offset,
           CAST(o.sz AS BIGINT) AS n_bytes,
           CAST(o.i * o.upf // 1000 AS BIGINT) AS pts_ms,
           CAST(c.cksum AS BIGINT) AS checksum,
           CAST(CASE WHEN o.i % 3 = 0 THEN 1 ELSE 0 END AS BIGINT) AS sampled
    FROM off o JOIN ck c ON o.doc_id = c.doc_id AND o.i = c.i
    """,
)
def multimodal_video_frame_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The frame-extraction MANIFEST over real AVI containers: one row
    per frame with its ABSOLUTE byte range in the source object, exact
    presentation time (pts_ms = i * us_per_frame div 1000), a raw-byte
    checksum proving the walk addressed the actual payload, and a
    deterministic every-3rd-frame sampling flag (operators/multimodal.
    avi_frame_plan). This is how a 100 TB video pipeline plans decode
    work: the manifest is container METADATA (~30 bytes/frame), a
    downstream GPU fleet range-reads ONLY the sampled frames' byte
    spans — whole files are never shipped to decoders. The oracle
    rebuilds every offset closed-form (fixed 232-byte header prefix +
    running chunk sizes) and every checksum arithmetically; both the
    walk and the replay must agree row-for-row. Replaces the former
    metadata-only frame-plan stub as the oracled video path
    (multimodal_frame_plan stays for opaque formats)."""
    media = media_fixture(spark, sf_dir, "avi")
    return mm_ops.avi_frame_plan(media, sample_stride=3)


@register(
    "multimodal_video_scene_cuts",
    f"""
    WITH {_AVI_FRAMES_SQL},
    lagd AS (
      SELECT doc_id, i, upf, sz,
             LAG(sz) OVER (PARTITION BY doc_id ORDER BY i) AS prev
      FROM fr
    )
    SELECT doc_id AS media_id,
           CAST(i AS BIGINT) AS frame_idx,
           CAST(i * upf // 1000 AS BIGINT) AS pts_ms,
           CAST(prev AS BIGINT) AS prev_bytes,
           CAST(sz AS BIGINT) AS n_bytes,
           CAST(abs(sz - prev) * 1000 // prev AS BIGINT)
             AS abs_delta_permille
    FROM lagd
    WHERE prev IS NOT NULL AND prev > 0
      AND abs(sz - prev) * 1000 >= 300 * prev
    """,
)
def multimodal_video_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode-free shot-boundary candidates — the classic production
    heuristic for compressed video: intra-coded (MJPEG) frame size
    tracks visual complexity, so a >=30% relative size jump against
    the previous frame flags a likely scene change, and only THOSE
    frames' byte ranges go to the expensive pixel-level verifier
    (operators/multimodal.scene_cut_candidates over the avi_frame_plan
    manifest). The window shuffles manifest metadata only (~30 bytes/
    frame) — at 100 TB of video the payloads never move. All-integer
    (abs-first floor-div), so the oracle's LAG replay over the
    closed-form frame sizes must agree on every candidate row."""
    media = media_fixture(spark, sf_dir, "avi")
    return mm_ops.scene_cut_candidates(
        mm_ops.avi_frame_plan(media), threshold_permille=300
    )


@register(
    "multimodal_av_demux",
    """
    WITH d AS (SELECT doc_id, 2 + n_chars % 6 AS n FROM documents),
    fr AS (
      SELECT d.doc_id, u.i,
             16 + 2 * ((d.doc_id * 7 + 13 * u.i) % 16) AS vsz,
             8 + 2 * ((d.doc_id * 3 + 7 * u.i) % 8) AS asz
      FROM d, UNNEST(range(0, d.n)) AS u(i)
    ),
    vck AS (
      SELECT f.doc_id, SUM((f.doc_id * 31 + 17 * f.i + u.j) % 256) AS c
      FROM fr f, UNNEST(range(0, f.vsz)) AS u(j) GROUP BY f.doc_id
    ),
    ack AS (
      SELECT f.doc_id, SUM((f.doc_id * 13 + 5 * f.i + u.j) % 256) AS c
      FROM fr f, UNNEST(range(0, f.asz)) AS u(j) GROUP BY f.doc_id
    )
    SELECT f.doc_id AS media_id,
           CAST(COUNT(*) AS BIGINT) AS n_video_frames,
           CAST(COUNT(*) AS BIGINT) AS n_audio_chunks,
           CAST(SUM(f.vsz) AS BIGINT) AS video_bytes,
           CAST(SUM(f.asz) AS BIGINT) AS audio_bytes,
           CAST(MAX(v.c) AS BIGINT) AS video_checksum,
           CAST(MAX(a.c) AS BIGINT) AS audio_checksum,
           CAST(1 AS BIGINT) AS interleave_ok,
           CAST(1 AS BIGINT) AS idx1_ok
    FROM fr f JOIN vck v USING (doc_id) JOIN ack a USING (doc_id)
    GROUP BY f.doc_id
    """,
)
def multimodal_av_demux(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-STREAM demux accounting over REAL two-stream containers —
    what a multimodal ingest runs before splitting modalities into
    their own pipelines: documents synthesize genuine interleaved A/V
    RIFF-AVI files JVM-side (MJPG '00dc' + PCM '01wb' chunks 1:1, two
    strl headers, idx1 over every chunk of BOTH streams in container
    order — operators/multimodal.documents_as_av_media, pinned
    byte-identical to encode_avi(audio=...) by test), then operators/
    multimodal.avi_av_demux walks each container ONCE and emits
    per-stream chunk counts, byte totals (what the per-modality
    extraction jobs get sized by), raw-byte checksums for both
    streams, the strict-alternation interleave verdict a seek-friendly
    consumer expects, and the whole-index idx1 verdict. The oracle
    recomputes every statistic closed-form from the synthesis
    formulas."""
    media = media_fixture(spark, sf_dir, "av")
    return mm_ops.avi_av_demux(media)


@register(
    "multimodal_quarantine_audit",
    """
    WITH med AS (
      SELECT doc_id, source,
             CASE WHEN doc_id % 10 = 0 THEN 1 ELSE 0 END AS corrupt
      FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_media,
           CAST(SUM(1 - corrupt) AS BIGINT) AS n_decoded,
           CAST(SUM(corrupt) AS BIGINT) AS n_quarantined,
           CAST(SUM(corrupt) * 1000000 // COUNT(*) AS BIGINT)
             AS quarantine_ppm
    FROM med GROUP BY source
    """,
)
def multimodal_quarantine_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dead-letter accounting for undecodable media — the query every
    100 TB ingest runs next to its decode pass: how much of each
    source failed the codec, without ever aborting the job (the batch
    twin of the TSV `_corrupt_record` quarantine, applied to binary
    payloads). Every 10th doc's AVI payload is deterministically
    truncated to 20 bytes (a torn upload); `avi_video_stats(on_opaque=
    'skip')` quarantines them, and the audit LEFT-anti-accounts the
    skipped media back to their source via one broadcast-sized
    aggregate per source — decoded + quarantined counts and an exact
    integer ppm rate. The oracle knows exactly which payloads were
    corrupted (doc_id % 10), so the skip path itself — not just the
    happy path — is value-checked end-to-end."""
    docs = load(spark, sf_dir, "documents")
    media = media_fixture(spark, sf_dir, "avi").withColumn(
        "payload",
        F.when(
            F.col("media_id") % 10 == 0,
            F.substring(F.col("payload"), 1, 20),
        ).otherwise(F.col("payload")),
    )
    decoded = mm_ops.avi_video_stats(media, on_opaque="skip")
    # one join, not two: the media manifest's id/source columns come
    # straight off the documents scan (media_id == doc_id by
    # construction), so the decode results anti-account against it
    # directly — at corpus scale that is a single id-keyed join on
    # manifest-width rows
    per_media = docs.select(
        F.col("doc_id").alias("media_id"), "source"
    ).join(
        decoded.select("media_id", F.lit(1).alias("ok")),
        "media_id",
        "left",
    )
    return per_media.groupBy("source").agg(
        F.count("*").cast("long").alias("n_media"),
        F.sum(F.when(F.col("ok").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_decoded"),
        F.sum(F.when(F.col("ok").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_quarantined"),
        F.expr(
            "div(sum(case when ok is null then 1 else 0 end) * 1000000,"
            " count(*))"
        ).alias("quarantine_ppm"),
    )


@register(
    "multimodal_quarantine_matrix",
    """
    SELECT k.media_kind, d.source,
           CAST(COUNT(*) AS BIGINT) AS n_media,
           CAST(SUM(CASE WHEN d.doc_id % 10 = k.r THEN 0 ELSE 1 END)
             AS BIGINT) AS n_decoded,
           CAST(SUM(CASE WHEN d.doc_id % 10 = k.r THEN 1 ELSE 0 END)
             AS BIGINT) AS n_quarantined,
           CAST(SUM(CASE WHEN d.doc_id % 10 = k.r THEN 1 ELSE 0 END)
             * 1000000 // COUNT(*) AS BIGINT) AS quarantine_ppm
    FROM documents d,
         (VALUES ('image', 0), ('audio', 3), ('video', 6))
           AS k(media_kind, r)
    GROUP BY k.media_kind, d.source
    """,
)
def multimodal_quarantine_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dead-letter accounting generalized across ALL THREE codec
    families in one pass (round-7 verdict #7): the AVI-only
    multimodal_quarantine_audit proved the video skip path; this
    matrix proves the image (PPM) and audio (WAV) skip paths with the
    same anti-accounting, per (media_kind, source). Each family gets
    its own deterministic corruption cohort (image doc_id%10==0,
    audio ==3, video ==6 — distinct residues so no payload is
    corrupted in two families and each family's ppm differs), torn to
    20 bytes: short enough to cut the PPM raster, the WAV fmt body,
    and the AVI header list in every synthesized payload. Each
    family's decoder runs on_opaque='skip' and the quarantined media
    anti-account back to their source via one id-keyed join on
    manifest-width rows — three independent decode passes, no barrier
    between them, each embarrassingly parallel at 100 TB. The oracle
    knows exactly which ids were torn, so all three skip paths are
    value-checked end-to-end."""
    docs = load(spark, sf_dir, "documents")
    families = [
        ("image", "ppm",
         lambda m: mm_ops.ppm_feature_stats(m, on_opaque="skip"), 0),
        ("audio", "wav",
         lambda m: mm_ops.wav_feature_stats(m, on_opaque="skip"), 3),
        ("video", "avi",
         lambda m: mm_ops.avi_video_stats(m, on_opaque="skip"), 6),
    ]
    parts = []
    for kind, fixture_kind, decode, residue in families:
        media = media_fixture(spark, sf_dir, fixture_kind).withColumn(
            "payload",
            F.when(
                F.col("media_id") % 10 == residue,
                F.substring(F.col("payload"), 1, 20),
            ).otherwise(F.col("payload")),
        )
        per = docs.select(
            F.col("doc_id").alias("media_id"), "source"
        ).join(
            decode(media).select("media_id", F.lit(1).alias("ok")),
            "media_id",
            "left",
        )
        parts.append(
            per.groupBy("source")
            .agg(
                F.count("*").cast("long").alias("n_media"),
                F.sum(F.when(F.col("ok").isNotNull(), 1).otherwise(0))
                .cast("long")
                .alias("n_decoded"),
                F.sum(F.when(F.col("ok").isNull(), 1).otherwise(0))
                .cast("long")
                .alias("n_quarantined"),
                F.expr(
                    "div(sum(case when ok is null then 1 else 0 end)"
                    " * 1000000, count(*))"
                ).alias("quarantine_ppm"),
            )
            .select(F.lit(kind).alias("media_kind"), "*")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@register(
    "dedup_clusters",
    f"""
    WITH RECURSIVE toks AS (
      SELECT doc_id, string_split({_SQL_NORM}, ' ') AS t FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id,
             t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
      FROM toks, UNNEST(range(1, greatest(len(t) - 1, 1))) AS u(i)
      WHERE len(t) >= 3
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter_size
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ),
    pairs AS (
      SELECT i.doc_a, i.doc_b
      FROM inter i JOIN sizes sa ON i.doc_a = sa.doc_id
                   JOIN sizes sb ON i.doc_b = sb.doc_id
      WHERE floor(1000.0 * i.inter_size
                  / (sa.set_size + sb.set_size - i.inter_size)) >= 800
    ),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL
      SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    reach(a, b) AS (
      SELECT src, src FROM edges
      UNION
      SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src
    )
    SELECT CAST(a AS BIGINT) AS doc_id, CAST(MIN(b) AS BIGINT) AS cluster_id
    FROM reach GROUP BY a
    """,
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup components from MinHash-verified pairs: (doc_id,
    cluster_id=keeper). Iterative min-label propagation over the
    representative graph, members inherit
    (operators/dedup.minhash_dedup_clusters).

    Oracle: connected components (transitive closure via recursive CTE)
    of the EXACT n-gram-Jaccard >= 0.8 pair graph — the same graph
    dedup_ngram_jaccard oracles. Valid because MinHash verification
    recomputes exact per-mille Jaccard on candidates (no false
    positives) and at j >= 0.8 with 16 bands x 2 rows the banding
    miss probability is 1-(1-0.64^2)^16 < 1e-7 (no false negatives in
    practice); identical-text members join their rep's component in
    both engines."""
    return dedup_ops.minhash_dedup_clusters(
        load(spark, sf_dir, "documents"),
        num_hashes=32,
        bands=16,
        threshold=0.8,
        collapse=_collapse_gate(sf_dir, "documents", min_rows=20_000),
    )


def _sql_shingle_cte(n: int, src: str = "documents") -> str:
    """DISTINCT word-n-gram shingles of ``src`` as a CTE body — the SQL
    twin of operators/text.shingles for arbitrary n."""
    gram = " || ' ' || ".join(f"t[i+{j}]" for j in range(n))
    return f"""
      SELECT DISTINCT doc_id, {gram} AS shingle
      FROM (SELECT doc_id, string_split({_SQL_NORM}, ' ') AS t FROM {src}),
           UNNEST(range(1, greatest(len(t) - {n - 2}, 1))) AS u(i)
      WHERE len(t) >= {n}
    """


@register(
    "decontamination_hits",
    f"""
    WITH corpus_sh AS ({_sql_shingle_cte(4)}),
    bench_sh AS (
      SELECT doc_id AS bench_id, shingle
      FROM ({_sql_shingle_cte(4)}) WHERE doc_id % 97 = 0
    )
    SELECT c.doc_id, b.bench_id,
           CAST(COUNT(*) AS BIGINT) AS overlap_ngrams
    FROM corpus_sh c JOIN bench_sh b ON c.shingle = b.shingle
    WHERE c.doc_id != b.bench_id
    GROUP BY c.doc_id, b.bench_id
    """,
)
def decontamination_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (operators/dedup.contamination_pairs):
    word-n-gram overlaps between the corpus and a deterministic
    'benchmark' slice (doc_id % 97 == 0), self-pairs excluded. Bench
    shingles broadcast; corpus data never shuffles. n=4 here because
    the synthetic docs are short (production windows run 8-13 word
    grams; at n=8 this corpus has zero overlaps and the gate would be
    vacuous)."""
    docs = load(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 97 == 0)
    return dedup_ops.contamination_pairs(
        docs, bench, n=4, collapse=_collapse_gate(sf_dir, "documents", min_rows=20_000)
    ).where(F.col("doc_id") != F.col("bench_id"))


# portable 60-bit SimHash signature as a DuckDB expression — the exact
# twin of operators/dedup.simhash_portable (md5-15-hex token hash,
# bit-serial votes); shared by the signature and pair oracles below
_SQL_SIMHASH = f"""
    WITH __sh_base AS (
      SELECT doc_id,
             list_filter(string_split({_SQL_NORM}, ' '), x -> x <> '') AS t
      FROM documents
    ),
    __sh_h AS (
      SELECT doc_id,
             list_transform(t,
               x -> CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT)) AS hs,
             len(t) AS n
      FROM __sh_base
    ),
    sigs AS (
      SELECT doc_id,
             CAST(coalesce(list_sum(list_transform(range(0, 60), j ->
               CASE WHEN 2 * list_sum(list_transform(hs, h -> (h >> j) & 1)) > n
                    THEN (1::BIGINT << j) ELSE 0 END)), 0) AS BIGINT) AS simhash
      FROM __sh_h
    )
"""


@register(
    "dedup_simhash_pairs",
    _SQL_SIMHASH
    + """
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
    FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (Hamming <= 3) via pigeonhole banding
    (operators/dedup.simhash_neardup_pairs, portable md5 variant).

    Oracle: brute-force Hamming over the same 60-bit signatures —
    valid because pigeonhole banding with 4 chunks is LOSSLESS for
    d <= 3 (a pair within distance 3 must agree on a full chunk); the
    quadratic form is oracle-only, the engine path stays bucketed."""
    return dedup_ops.simhash_neardup_pairs(
        _sload(spark, sf_dir, "documents"), max_hamming=3, hash_fn="md5"
    )


@register("ann_cosine_topk_ivf", None)
def ann_cosine_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (spherical k-means) approximate top-k — recall-bounded vs
    brute force in tests/test_similarity.py; approximate by design."""
    emb = load(spark, sf_dir, "embeddings")
    return sim_ops.cosine_topk_ivf(
        emb,
        emb.where(F.col("vec_id") < 10),
        dim=64,
        k=5,
        n_centroids=16,
        nprobe=4,  # training auto-sizes to ~256 points/centroid
        # footer-exact count of the unfiltered corpus: the trainer's
        # sizing count job is pure fixed overhead (r12, guide §1.2)
        corpus_rows=_footer_rows(sf_dir, "embeddings"),
    )


@register(
    "minhash_lsh_candidates",
    f"""
    WITH toks AS (
      SELECT doc_id, string_split({_SQL_NORM}, ' ') AS t FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id,
             t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
      FROM toks, UNNEST(range(1, greatest(len(t) - 1, 1))) AS u(i)
      WHERE len(t) >= 3
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter_size
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT i.doc_a, i.doc_b,
           CAST(floor(1000.0 * i.inter_size
                      / (sa.set_size + sb.set_size - i.inter_size)) AS BIGINT)
             AS jaccard_per_1000
    FROM inter i JOIN sizes sa ON i.doc_a = sa.doc_id
                 JOIN sizes sb ON i.doc_b = sb.doc_id
    WHERE floor(1000.0 * i.inter_size
                / (sa.set_size + sb.set_size - i.inter_size)) >= 800
    """,
)
def minhash_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs with exact-Jaccard verification
    (operators/dedup.minhash_dedup_pairs).

    Oracle: the exact n-gram-Jaccard >= 0.8 pair set (the
    dedup_ngram_jaccard graph). Valid because verification recomputes
    exact per-mille Jaccard on every candidate (no false positives)
    and with 16 bands x 2 rows the banding miss probability at
    j >= 0.8 is below 1e-7 (no false negatives in practice) — same
    argument that oracles dedup_clusters."""
    return dedup_ops.minhash_dedup_pairs(
        _sload(spark, sf_dir, "documents"),
        num_hashes=32,
        bands=16,
        threshold=0.8,
        collapse=_collapse_gate(sf_dir, "documents", min_rows=20_000),
    )


@register(
    "simhash_signatures",
    _SQL_SIMHASH + "SELECT doc_id, simhash FROM sigs",
)
def simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit portable SimHash per document
    (operators/dedup.simhash_portable): md5-derived token hashes and
    bit-serial votes reproduce bit-for-bit in DuckDB, turning the old
    rows-only check (blake2b pandas UDF) into a full value oracle. The
    vectorized blake2b variant remains as operators/dedup.simhash,
    pinned by tests/test_dedup.py."""
    return dedup_ops.simhash_portable(
        _sload(spark, sf_dir, "documents"), collapse=_collapse_gate(sf_dir, "documents", min_rows=20_000)
    )


@register("ann_cosine_topk_lsh", None)
def ann_cosine_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRP-LSH approximate top-k (recall-bounded vs brute force in
    tests/test_similarity.py; approximate by design => no SQL oracle)."""
    emb = load(spark, sf_dir, "embeddings")
    return sim_ops.cosine_topk_lsh(
        emb, emb.where(F.col("vec_id") < 10), dim=64, k=5, n_planes=4, n_tables=16
    )


@register("ann_cosine_topk_pq", None)
def ann_cosine_topk_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (operators/similarity.cosine_topk_pq):
    per-subspace L2 codebooks over normalized vectors (8 subspaces x
    32 codes — 32x smaller than raw float32 at production packing),
    ADC shortlist served from CODES ONLY via a broadcast lookup table,
    exact cosine rescore of the shortlist. The third approximate
    variant alongside SRP-LSH and IVF; recall-gated like them via
    ann_recall_check (approximate by design => no SQL oracle).
    Measured recall@5 vs brute force: 1.0 at sf0.01, 0.90 at sf0.1
    (shortlist 200, the 40x-k production shape)."""
    emb = load(spark, sf_dir, "embeddings")
    return sim_ops.cosine_topk_pq(
        emb,
        emb.where(F.col("vec_id") < 10),
        dim=64,
        k=5,
        m=8,
        n_codes=32,
        shortlist=200,
        corpus_rows=_footer_rows(sf_dir, "embeddings"),
    )


@register("ann_cosine_topk_ivfpq", None)
def ann_cosine_topk_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ composed serving shape (operators/similarity.
    cosine_topk_ivfpq): coarse cells prune to nprobe/n_centroids of
    the corpus, ADC over PQ codes ranks candidates without touching
    raw floats, exact rescore of the shortlist only — the classic
    100 TB ANN deployment (FAISS IVFPQ, public). Recall tracks the
    coarse prune (measured 0.54-0.58 vs standalone IVF's 0.56-0.60);
    gated in ann_recall_check at floor 0.45."""
    emb = load(spark, sf_dir, "embeddings")
    return sim_ops.cosine_topk_ivfpq(
        emb,
        emb.where(F.col("vec_id") < 10),
        dim=64,
        k=5,
        corpus_rows=_footer_rows(sf_dir, "embeddings"),
    )


@register("ann_cosine_topk_ivfpq_prebuilt", None)
def ann_cosine_topk_ivfpq_prebuilt(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """IVF-PQ SERVED FROM THE PERSISTED INDEX (operators/ann_index):
    centroids + codebooks load driver-side from the artifact, the
    candidate scan reads the stored (cell, codes) table — the query
    path runs ZERO training jobs and touches raw vectors only for the
    shortlist rescore. This is the bench row that prices the
    train-once/serve-many split against its in-session twin
    (ann_cosine_topk_ivfpq); result equality is hard-gated by
    ann_prebuilt_equivalence, recall by ann_recall_check (identical
    results => identical recall). Artifact build cost is reported
    separately by bench.py as ann_index_build_sec (offline pipeline
    cost, like stored media payloads)."""
    emb = load(spark, sf_dir, "embeddings")
    idx = ann_index_fixture(spark, sf_dir, "ivfpq")
    return sim_ops.cosine_topk_ivfpq(
        emb, emb.where(F.col("vec_id") < 10), dim=64, k=5, prebuilt=idx
    )


@register("ann_cosine_topk_pq_prebuilt", None)
def ann_cosine_topk_pq_prebuilt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ ADC serving from the persisted codes table (see
    ann_cosine_topk_ivfpq_prebuilt): no training jobs, no full
    raw-vector scan — at 100 TB the ADC pass reads m int64s per vector
    (m bytes packed) instead of dim floats, and here it reads them
    from the artifact instead of re-encoding the corpus per query.
    Codebooks come from the artifact (n_codes=16, the default pq
    build); shortlist=200 matches the in-session twin's rescore width
    so the two bench rows differ only by train+encode vs
    load+stored-scan — the split being priced. Result equality of the
    prebuilt path itself is hard-gated by ann_prebuilt_equivalence."""
    emb = load(spark, sf_dir, "embeddings")
    idx = ann_index_fixture(spark, sf_dir, "pq")
    return sim_ops.cosine_topk_pq(
        emb, emb.where(F.col("vec_id") < 10), dim=64, k=5,
        shortlist=200, prebuilt=idx,
    )


@register(
    "ann_recall_check",
    """
    WITH t AS (SELECT COUNT(*) AS nq FROM embeddings WHERE vec_id < 10)
    SELECT v.variant, CAST(t.nq * 5 AS BIGINT) AS truth_pairs,
           TRUE AS meets_floor
    FROM (SELECT 'ivf' AS variant UNION ALL SELECT 'lsh'
          UNION ALL SELECT 'pq' UNION ALL SELECT 'ivfpq') v, t
    """,
)
def ann_recall_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall audit of both approximate ANN variants against the
    oracled brute-force top-k (operators/similarity.topk_recall).

    The approximate side is engine-only forever (no SQL twin), but its
    RECALL against the deterministic brute force is computable
    in-engine and stable as a floor check: IVF >= 0.5, SRP-LSH >= 0.7
    (measured 0.56-0.60 / 0.90-0.98 at sf0.01-sf0.1; both floors hold
    with margin). The oracle recomputes truth_pairs (k rows per query
    — the brute-force contract) and pins meets_floor TRUE, so recall
    drift below the floor hash-mismatches the hard gate."""
    emb = load(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 10)
    # tiny (n_queries x k rows) but referenced by both variants' semi
    # joins and the totals — persist so brute force runs once
    truth = sim_ops.cosine_topk_bruteforce(emb, q, k=5).persist()
    # ivf and ivfpq share IDENTICAL coarse-training params (n_centroids
    # 16, iters 2, default seed), so train the seeded k-means ONCE and
    # inject it — deterministic training makes the shared array
    # bit-identical to per-variant retraining (r12, guide §2.4; pinned
    # by tests/test_similarity_shared_training.py). Footer-exact row
    # counts kill the trainers' sizing count jobs (guide §1.2).
    nrows = _footer_rows(sf_dir, "embeddings")
    cents = sim_ops.ivf_train_centroids(
        emb, dim=64, n_centroids=16, iters=2, n_rows=nrows
    )
    ivf = sim_ops.cosine_topk_ivf(
        emb, q, dim=64, k=5, n_centroids=16, nprobe=4, cents=cents
    )
    lsh = sim_ops.cosine_topk_lsh(
        emb, q, dim=64, k=5, n_planes=4, n_tables=16
    )
    pq = sim_ops.cosine_topk_pq(
        emb, q, dim=64, k=5, m=8, n_codes=32, shortlist=200,
        corpus_rows=nrows,
    )
    ivfpq = sim_ops.cosine_topk_ivfpq(
        emb, q, dim=64, k=5, cents=cents, corpus_rows=nrows
    )
    return (
        sim_ops.topk_recall(truth, ivf, "ivf", 500)
        .unionByName(sim_ops.topk_recall(truth, lsh, "lsh", 700))
        # PQ floor 0.6: measured 1.0 / 0.90 at sf0.01 / sf0.1
        .unionByName(sim_ops.topk_recall(truth, pq, "pq", 600))
        # IVFPQ floor 0.45: measured 0.58 / 0.54 — tracks the coarse
        # prune, like standalone IVF's 0.5 floor at measured 0.56
        .unionByName(sim_ops.topk_recall(truth, ivfpq, "ivfpq", 450))
    )


_ANN_INDEX_DIRS: dict[tuple[str, str], str] = {}


def ann_index_fixture(spark: SparkSession, sf_dir: str, kind: str):
    """Session-cached persisted ANN index artifact per (sf_dir, kind) —
    the media_fixture pattern applied to the train-once/serve-many
    lifecycle (operators/ann_index.py). First call per session trains
    + encodes + writes the parquet artifact into a tempdir; every
    later call is a driver-side metadata load (no Spark job) plus a
    lazy handle on the codes table. In production the artifact is a
    durable table and the build is an offline pipeline — caching here
    keeps repeated bench/gate runs measuring the SERVE path, exactly
    like stored media payloads."""
    key = (sf_dir, kind)
    path = _ANN_INDEX_DIRS.get(key)
    if path is None:
        import atexit
        import shutil
        import tempfile

        path = tempfile.mkdtemp(prefix=f"ann_index_{kind}_")
        atexit.register(shutil.rmtree, path, ignore_errors=True)
        annix_ops.build_ann_index(
            load(spark, sf_dir, "embeddings"), path, kind, dim=64
        )
        _ANN_INDEX_DIRS[key] = path
    return annix_ops.load_ann_index(path)


@register(
    "ann_prebuilt_equivalence",
    """
    SELECT 'ivf' AS variant, TRUE AS identical
    UNION ALL SELECT 'ivfpq', TRUE
    UNION ALL SELECT 'pq', TRUE
    """,
)
def ann_prebuilt_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-once / serve-many hard gate: for each trained ANN variant
    the top-k served from a PERSISTED index artifact (centroids /
    codebooks / codes loaded from parquet — zero training jobs on the
    query path) must equal the in-session-trained top-k row-for-row.

    The equality is provable because training is deterministic
    (seeded, partition-stable init) and float64 survives the parquet
    round-trip bit-exactly — so the oracle pins ``identical`` TRUE per
    variant and any artifact-layout, loader, or serving-path drift
    hash-mismatches the hard gate. The comparison runs in-engine as a
    signed-multiplicity fold: union the sides with weight +1/-1, group
    by the full row, and the multisets are equal iff no group's weight
    sum is nonzero — exactly symmetric-exceptAll emptiness, in ONE
    aggregation per variant instead of two exceptAll joins + crossJoin
    over two persisted frames (r11 optimization: each side is now
    referenced once, so the persists and their materialization jobs
    are gone; guide §2.4 — shared-subtree jobs removed outright;
    plan files in plans/r11).

    Scale rationale: at 100 TB the index IS the product — retraining
    per query is a toy posture. This gate certifies that switching to
    the artifact path changes NOTHING about results, which is what
    makes the offline-build + online-serve split deployable."""
    emb = load(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 8)
    # the in-session ivf and ivfpq sides train the SAME seeded coarse
    # k-means (identical default params) — train once, inject into
    # both (r12, guide §2.4; bit-identical by deterministic training,
    # and the oracle still pins identical=TRUE per variant); footer-
    # exact counts for the remaining trainers' sizing
    nrows = _footer_rows(sf_dir, "embeddings")
    cents = sim_ops.ivf_train_centroids(
        emb, dim=64, n_centroids=16, iters=2, n_rows=nrows
    )
    plans = []
    for kind, fn in (
        ("ivf", sim_ops.cosine_topk_ivf),
        ("ivfpq", sim_ops.cosine_topk_ivfpq),
        ("pq", sim_ops.cosine_topk_pq),
    ):
        idx = ann_index_fixture(spark, sf_dir, kind)
        extra = {"corpus_rows": nrows}
        if kind != "pq":
            extra["cents"] = cents
        insession = fn(emb, q, dim=64, k=5, **extra)
        served = fn(emb, q, dim=64, k=5, prebuilt=idx)
        cols = insession.columns
        signed = insession.withColumn("__w", F.lit(1)).unionByName(
            served.withColumn("__w", F.lit(-1))
        )
        plans.append(
            signed.groupBy(*cols)
            .agg(F.sum("__w").alias("__d"))
            .where(F.col("__d") != 0)
            .agg(F.count(F.lit(1)).alias("n_diff"))
            .select(
                F.lit(kind).alias("variant"),
                (F.col("n_diff") == 0).alias("identical"),
            )
        )
    out = plans[0]
    for p in plans[1:]:
        out = out.unionByName(p)
    return out


_ANN_LIFECYCLE_DIRS: dict[str, tuple[str, str, str]] = {}


def ann_lifecycle_fixture(
    spark: SparkSession, sf_dir: str
) -> tuple[str, str, str]:
    """Session-cached trio of ivfpq index artifacts staging the full
    production lifecycle arc (operators/ann_index.py), shared by the
    staleness and compaction gates so the build cost is paid once:

      * ``stale``     — built on HALF the corpus (even vec_ids): the
        ingest-lag posture whose recall audit must flag a rebuild;
      * ``fresh``     — a copy of ``stale`` plus three
        ``encode_new_vectors`` ingest batches covering the odd half
        against the FROZEN codebooks (no retrain): recall recovered,
        codes table accreted with per-append small files;
      * ``compacted`` — a copy of ``fresh`` after
        ``compact_ann_index``: same rows, ~1 file per inverted list.

    Copies are cheap (the artifacts are KB-to-MB at gate scale); in
    production the equivalents are three states of one durable table
    over time, and the gates below certify the transitions."""
    paths = _ANN_LIFECYCLE_DIRS.get(sf_dir)
    if paths is None:
        import atexit
        import os
        import shutil
        import tempfile

        base = tempfile.mkdtemp(prefix="ann_lifecycle_")
        atexit.register(shutil.rmtree, base, ignore_errors=True)
        stale = os.path.join(base, "stale")
        fresh = os.path.join(base, "fresh")
        compacted = os.path.join(base, "compacted")
        emb = load(spark, sf_dir, "embeddings")
        annix_ops.build_ann_index(
            emb.where(F.col("vec_id") % 2 == 0), stale, "ivfpq", dim=64
        )
        shutil.copytree(stale, fresh)
        idx_fresh = annix_ops.load_ann_index(fresh)
        # three ingest batches (vec_id % 6 in 1,3,5 partitions the odd
        # half) so the codes table accretes append small files — the
        # decay compaction exists to reverse
        for r in (1, 3, 5):
            annix_ops.encode_new_vectors(
                idx_fresh, emb.where(F.col("vec_id") % 6 == r)
            )
        shutil.copytree(fresh, compacted)
        annix_ops.compact_ann_index(
            annix_ops.load_ann_index(compacted), spark
        )
        paths = (stale, fresh, compacted)
        _ANN_LIFECYCLE_DIRS[sf_dir] = paths
    return paths


@register(
    "ann_staleness_gate",
    """
    WITH t AS (SELECT COUNT(*) AS nq FROM embeddings WHERE vec_id < 8)
    SELECT 'half_indexed' AS phase, CAST(t.nq * 5 AS BIGINT) AS truth_pairs,
           TRUE AS needs_rebuild FROM t
    UNION ALL
    SELECT 'after_ingest', CAST(t.nq * 5 AS BIGINT), FALSE FROM t
    """,
)
def ann_staleness_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rebuild-decision signal, driver-gated (round-9 verdict #1):
    ``index_staleness_audit`` = recall of the PREBUILT serve against
    exact brute force over the CURRENT corpus. An index built on half
    the corpus must audit below the floor (``needs_rebuild`` TRUE —
    unindexed rows can never be candidates, so recall caps near the
    indexed fraction), and the SAME artifact after frozen-codebook
    ``encode_new_vectors`` ingest of the missing half must audit above
    it (FALSE) — no retrain anywhere, which is the entire point of the
    incremental posture. Floor 450/1000 sits between the measured arc
    (~290-300 stale vs ~530-560 after ingest at sf0.001-0.1, the
    ivfpq coarse-prune recall class from ann_recall_check).

    The recall NUMBER is engine-only (approximate serving has no SQL
    twin); the oracle pins the DECISION per phase plus the exact
    truth-pair count — the ann_recall_check folding pattern."""
    stale, fresh, _ = ann_lifecycle_fixture(spark, sf_dir)
    emb = load(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 8)

    def audit(path: str, phase: str) -> DataFrame:
        a = annix_ops.index_staleness_audit(
            annix_ops.load_ann_index(path), emb, q, dim=64, k=5,
            floor_per_1000=450,
        )
        return a.select(
            F.lit(phase).alias("phase"),
            F.col("truth_pairs"),
            (~F.col("meets_floor")).alias("needs_rebuild"),
        )

    return audit(stale, "half_indexed").unionByName(
        audit(fresh, "after_ingest")
    )


@register(
    "ann_compaction_gate",
    """
    SELECT 'codes_identical' AS check_name, TRUE AS ok
    UNION ALL SELECT 'files_shrunk', TRUE
    UNION ALL SELECT 'serving_identical', TRUE
    """,
)
def ann_compaction_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compaction invariant gate (round-9 verdict #1): rewriting the
    append-accreted codes table to ~1 file per inverted list must (a)
    actually shrink the data file count, (b) preserve the codes table
    row-for-row (vec_id, cluster, codes — symmetric exceptAll folded
    to a boolean, the ann_prebuilt_equivalence pattern), and (c) serve
    byte-identical top-k from the compacted artifact. (a) is file-
    system metadata, computed driver-side and pinned as a literal; (b)
    and (c) run in-engine. Any compaction bug — dropped appends, code
    corruption, partition mislayout — flips a pinned boolean and
    hash-mismatches the hard gate."""
    import os

    _, fresh, compacted = ann_lifecycle_fixture(spark, sf_dir)
    idx_b = annix_ops.load_ann_index(fresh)
    idx_d = annix_ops.load_ann_index(compacted)
    emb = load(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 8)

    def nfiles(p: str) -> int:
        return sum(
            1
            for _, _, fs in os.walk(os.path.join(p, "codes.parquet"))
            for f in fs
            if f.endswith(".parquet")
        )

    def both_empty(a: DataFrame, b: DataFrame, name: str) -> DataFrame:
        return (
            a.exceptAll(b)
            .agg(F.count(F.lit(1)).alias("x"))
            .crossJoin(b.exceptAll(a).agg(F.count(F.lit(1)).alias("y")))
            .select(
                F.lit(name).alias("check_name"),
                ((F.col("x") + F.col("y")) == F.lit(0)).alias("ok"),
            )
        )

    codes_gate = both_empty(
        idx_b.codes(spark), idx_d.codes(spark), "codes_identical"
    )
    serve_b = sim_ops.cosine_topk_ivfpq(
        emb, q, dim=64, k=5, prebuilt=idx_b
    ).persist()
    serve_d = sim_ops.cosine_topk_ivfpq(
        emb, q, dim=64, k=5, prebuilt=idx_d
    ).persist()
    serve_gate = both_empty(serve_b, serve_d, "serving_identical")
    files_gate = spark.range(0, 1, 1, 1).select(
        F.lit("files_shrunk").alias("check_name"),
        F.lit(bool(nfiles(compacted) < nfiles(fresh))).alias("ok"),
    )
    return codes_gate.unionByName(files_gate).unionByName(serve_gate)


@register(
    "clickhouse_http_roundtrip",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS rows_sent,
           TRUE AS content_match, TRUE AS null_convention_ok
    FROM orders WHERE o_orderkey % 20 = 0
    """,
)
def clickhouse_http_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9 driver gate: the jar-free ClickHouse HTTP sink
    (sinks/clickhouse_http.py) pushed through a real distributed write
    against a local capturing HTTP server — the same harness posture
    as the streaming twins (the infrastructure is test scaffold; the
    DISTRIBUTED mechanics under audit are production code).

    A deterministic orders slice (1-in-20 keys) is written via
    per-task Arrow-batched JSONEachRow POSTs. The slice carries every
    serialization hazard the round-10 advice named: a NULL-bearing
    BIGINT column (Arrow widens the batch to float64; the sink must
    restore exact int64, never ``123.0``), a string column holding
    literal backslashes and the exact two-character ``\\N`` CSV-NULL
    literal (must survive byte-exact, not read back as NULL), and a
    quoting hazard (comma + double quote). The audit reconstructs
    every received body driver-side and folds three invariants to
    oracled values: ``rows_sent`` must equal the slice's exact count
    (the oracle recomputes it), ``content_match`` pins row-for-row
    value fidelity across all hazard columns, and
    ``null_convention_ok`` pins NULL<->JSON-null round-tripping on
    both the string and the bigint column. Any serialization,
    batching, or fan-out bug hash-mismatches the hard gate. The
    live-server half of S9 stays env-gated (no ClickHouse in the
    container); this row certifies everything up to the socket."""
    import json as _json
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from clickhouse_only_importer_prototype_spark.sinks.clickhouse_http import (
        write_clickhouse_http,
    )

    frame = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") % 20 == 0)
        .select(
            F.col("o_orderkey").cast("long").alias("k"),
            F.concat(F.lit('a,"b \\ '), F.col("o_orderpriority")).alias(
                "hazard"
            ),
            F.when(F.col("o_orderkey") % 40 == 0, F.lit(None))
            .otherwise(
                F.when(F.col("o_orderkey") % 60 == 0, F.lit("\\N"))
                .otherwise(F.lit("x"))
            )
            .cast("string")
            .alias("maybe"),
            F.when(F.col("o_orderkey") % 80 == 0, F.lit(None))
            .otherwise(F.col("o_orderkey") * F.lit(1_000_000_007))
            .cast("long")
            .alias("big"),
        )
        .repartition(4)
    )
    records: list[bytes] = []

    class _H(BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            records.append(self.rfile.read(n))
            self.send_response(200)
            self.end_headers()

        def log_message(self, *a):  # keep driver stderr clean
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), _H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        sent = write_clickhouse_http(
            frame,
            f"http://127.0.0.1:{srv.server_address[1]}",
            "audit_roundtrip",
        )
    finally:
        srv.shutdown()
        srv.server_close()
    got = []
    for body in records:
        # '\n'-split, not splitlines(): JSON strings may carry raw
        # U+2028/U+2029 under force_ascii=False (self-review finding)
        for line in body.decode("utf-8").split("\n"):
            if line:
                got.append(_json.loads(line))
    expect = [
        (r["k"], r["hazard"], r["maybe"], r["big"])
        for r in frame.collect()
    ]
    recon = [(o["k"], o["hazard"], o["maybe"], o["big"]) for o in got]
    # exact-int fidelity: every non-null big must round-trip as a JSON
    # int (json.loads gives int, never float) and match k*1e9+7 exactly
    ints_exact = all(
        isinstance(o["big"], int) for o in got if o["big"] is not None
    )
    content_match = bool(sorted(recon, key=str) == sorted(expect, key=str))
    n_nulls_sent = sum(1 for o in got if o["maybe"] is None)
    n_big_nulls_sent = sum(1 for o in got if o["big"] is None)
    n_nulls_expect = sum(1 for _, _, m, _ in expect if m is None)
    n_big_nulls_expect = sum(1 for *_, b in expect if b is None)
    n_escaped = sum(1 for o in got if o["maybe"] == "\\N")
    null_ok = (
        n_nulls_sent == n_nulls_expect
        and n_big_nulls_sent == n_big_nulls_expect
        and n_nulls_expect > 0
        and n_big_nulls_expect > 0
        and n_escaped > 0  # literal \N string stayed a string
    )
    return spark.range(0, 1, 1, 1).select(
        F.lit(sent).cast("long").alias("rows_sent"),
        F.lit(bool(content_match and ints_exact)).alias("content_match"),
        F.lit(bool(null_ok)).alias("null_convention_ok"),
    )


@register(
    "grouped_salvage_gate",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS rows_converted,
           TRUE AS ids_gapless, TRUE AS outputs_complete
    FROM orders WHERE o_orderkey % 50 = 0
    """,
)
def grouped_salvage_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D3/D4 driver gate for convert_mutations_grouped_salvage
    (plans/pipelines.py — round-10 verdict #3): the probe -> grouped
    single-job write -> rename machinery driven end-to-end inside the
    query, same harness posture as clickhouse_http_roundtrip (the
    study tree is test scaffold; the three-phase pipeline under audit
    is production code; the FAILURE seam itself is pytest-pinned via
    monkeypatch because PERMISSIVE csv makes organic read failures
    unreachable by construction).

    A deterministic orders slice (1-in-50 keys; bounded driver
    collect, ~3k rows at sf0.1 — the documented bounded class) is
    written as three MAF studies (study = o_orderkey % 3, rows sorted
    by key). The salvage conversion runs, then the outputs are read
    back and folded to oracled values: ``rows_converted`` must equal
    the slice's exact count (the oracle recomputes it),
    ``ids_gapless`` pins the corpus-wide dense 0..n-1 id contract
    across the grouped write (distinct == n, min 0, max n-1), and
    ``outputs_complete`` pins the reference output layout (both
    parquet files per study, per-study row counts equal to the
    slice's per-study counts). Any probe, id prefix-sum, shuffle, or
    rename-promotion bug hash-mismatches the hard gate."""
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile

    from clickhouse_only_importer_prototype_spark.plans.pipelines import (
        convert_mutations_grouped_salvage,
    )

    rows = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") % 50 == 0)
        .select("o_orderkey", "o_custkey", "o_orderpriority")
        .collect()
    )
    per_study: dict[str, list] = {"s0": [], "s1": [], "s2": []}
    for r in rows:
        per_study[f"s{int(r['o_orderkey']) % 3}"].append(r)
    work = _tempfile.mkdtemp(prefix="salvage_gate_")
    try:
        tsv_dir = _os.path.join(work, "studies")
        for study, srows in per_study.items():
            d = _os.path.join(tsv_dir, study)
            _os.makedirs(d, exist_ok=True)
            with open(_os.path.join(d, "meta_mutations.txt"), "w") as fh:
                fh.write(
                    f"cancer_study_identifier: {study}\n"
                    "stable_id: mutations\n"
                    "data_filename: data_mutations.txt\n"
                )
            with open(_os.path.join(d, "data_mutations.txt"), "w") as fh:
                fh.write(
                    "Hugo_Symbol\tEntrez_Gene_Id\tTumor_Sample_Barcode\n"
                )
                for r in sorted(srows, key=lambda x: int(x["o_orderkey"])):
                    fh.write(
                        f"P{r['o_custkey']}\t{r['o_orderkey']}\t"
                        f"S{r['o_orderkey']}_{r['o_orderpriority']}\n"
                    )
        out = _os.path.join(work, "out")
        summary = convert_mutations_grouped_salvage(spark, tsv_dir, out)
        n = len(rows)
        outputs_complete = len(summary.processed) == 3 and not summary.failed
        id_stats = None
        for study, srows in per_study.items():
            paths = (
                _os.path.join(out, f"{study}_data_mutations_mutation_event.parquet"),
                _os.path.join(out, f"{study}_data_mutations_mutation.parquet"),
            )
            if not all(_os.path.isdir(p) for p in paths):
                outputs_complete = False
                continue
            ev = spark.read.parquet(paths[0])
            if ev.count() != len(srows):
                outputs_complete = False
            part = ev.select("MUTATION_EVENT_ID")
            id_stats = part if id_stats is None else id_stats.union(part)
        if id_stats is None:
            gapless, read_back = False, 0
        else:
            agg = id_stats.agg(
                F.count("*").alias("n"),
                F.countDistinct("MUTATION_EVENT_ID").alias("d"),
                F.min("MUTATION_EVENT_ID").alias("lo"),
                F.max("MUTATION_EVENT_ID").alias("hi"),
            ).first()
            read_back = int(agg["n"])
            gapless = (
                agg["d"] == read_back
                and (
                    read_back == 0
                    or (agg["lo"] == 0 and agg["hi"] == read_back - 1)
                )
            )
        # rows_converted is the READ-BACK total, so a dropped or
        # duplicated row breaks the oracled count itself, not just a
        # boolean
        return spark.range(0, 1, 1, 1).select(
            F.lit(read_back).cast("long").alias("rows_converted"),
            F.lit(bool(gapless)).alias("ids_gapless"),
            F.lit(bool(outputs_complete)).alias("outputs_complete"),
        )
    finally:
        _shutil.rmtree(work, ignore_errors=True)


def _write_ordered_source_files(src: str, parts) -> None:
    """Write ``(stem, df)`` parts as single-file parquets in ``src``
    with mtimes 60s apart, so FileStreamSource (oldest-modified first)
    consumes them as separate, ordered micro-batches under
    maxFilesPerTrigger=1 — the multi-batch harness the lateness and
    state-eviction twins depend on for deterministic watermark
    sequencing."""
    import glob
    import os
    import shutil
    import tempfile
    import uuid

    base = None
    for i, (stem, df) in enumerate(parts):
        scratch = tempfile.mkdtemp(prefix="twin_batch_")
        df.coalesce(1).write.mode("overwrite").parquet(scratch)
        (part,) = glob.glob(os.path.join(scratch, "part-*.parquet"))
        dest = os.path.join(src, f"{stem}_{uuid.uuid4().hex[:8]}.parquet")
        shutil.move(part, dest)
        shutil.rmtree(scratch, ignore_errors=True)
        # pin micro-batch order; 60s spacing defeats fs timestamp
        # granularity
        if base is None:
            base = os.stat(dest).st_mtime
        os.utime(dest, (base + 60 * i, base + 60 * i))


def _stream_twin(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    prefix: str,
    build,
    output_mode: str = "append",
    setup=None,
    on_finish=None,
) -> DataFrame:
    """Shared scaffold for the streaming batch twins: symlink the
    fixture parquet into a fresh source dir, run ``build(src_dir)``'s
    streaming DataFrame through an availableNow trigger into a
    uniquely-named memory sink, and return the sink rows for the
    batch-side rollup. One place owns the tempdir/checkpoint/sink
    contract for every twin.

    The sink's rows are materialized into a fresh local DataFrame and
    the streaming query/memory sink/checkpoint tempdir are torn down
    before returning — a memory sink is driver-resident anyway, so the
    collect adds nothing, and repeated bench/gate runs (five twins x
    many rounds) no longer accumulate sink tables in the session or
    checkpoint dirs in /tmp. Test/gate scaffold only: production
    streams write parquet (sinks/parquet.py) and never pass here."""
    import os
    import shutil
    import tempfile
    import uuid

    work = tempfile.mkdtemp(prefix=prefix)
    src = os.path.join(work, "src")
    os.mkdir(src)
    os.symlink(
        os.path.join(sf_dir, f"{table}.parquet"),
        os.path.join(src, f"{table}.parquet"),
    )
    if setup is not None:
        # e.g. write extra source files (watermark sentinels) that the
        # availableNow read must see alongside the fixture
        setup(src)
    name = prefix + uuid.uuid4().hex[:8]
    # Streaming state partition count is pinned at first checkpoint
    # and every micro-batch pays per-store overhead (provider init,
    # commit, snapshot) regardless of state volume — at twin scale 32
    # stores cost ~5x the join itself (measured: stream_stream_join
    # 11.8s -> 2.5s at sf0.1). But a FIXED small count strangles the
    # per-key Python state functions once the fixture grows (100x
    # stress: 10M events / ~1M user keys through 8 partitions ran
    # sessionize at 155s). Size the pin to state volume, exactly as a
    # production deployment would: one metadata-only row count on the
    # fixture footer, ~300k rows per state partition, clamped to
    # [8, cores]. Semantics are partition-count-invariant (the oracle
    # equality is the proof). Restored for the batch rollup.
    try:
        import pyarrow.parquet as _pq

        _rows = _pq.ParquetFile(
            os.path.join(sf_dir, f"{table}.parquet")
        ).metadata.num_rows
    except Exception:
        _rows = 0
    stream_parts = max(8, min(os.cpu_count() or 8, _rows // 300_000))
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(stream_parts))
    try:
        handle = (
            build(src)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .start()
        )
        handle.awaitTermination()
        try:
            if on_finish is not None:
                # e.g. assert on the query's progress metrics (the
                # lateness twin requires numRowsDroppedByWatermark > 0
                # so a green oracle row proves the DROP mechanism
                # fired). on_finish is DESIGNED to raise; the sink
                # view/query must still be torn down on that path or
                # repeated gate runs accumulate memory-sink tables
                # (round-8 review finding)
                on_finish(handle)
        except BaseException:
            handle.stop()
            spark.catalog.dropTempView(name)
            raise
        sink = spark.table(name)
        # Arrow materialization, not collect(): an outer-join twin's
        # sink holds pairs PLUS every expired null row (~100k at the
        # 10x gate), and row-at-a-time py4j collect was 8x the join
        # itself. It must be toArrow(), NOT toPandas(): pandas widens
        # a nullable LongType column holding NULLs to float64, and an
        # externally-built session without Arrow conversion enabled
        # then rejects 88.0 for LongType on the rebuild
        # (FIELD_DATA_TYPE_UNACCEPTABLE_WITH_NAME — the round-6 driver
        # red). A pyarrow.Table keeps the exact Spark types through
        # the round-trip on every createDataFrame code path.
        tbl = sink.toArrow()
        handle.stop()
        spark.catalog.dropTempView(name)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        # tempdir (source files + checkpoint) must go on EVERY exit
        # path, including an on_finish/build raise (round-8 review
        # finding) — it only held scratch inputs, never results
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(tbl)


@register(
    "ingest_dedup",
    f"SELECT DISTINCT md5({_SQL_NORM}) AS fp FROM documents",
)
def ingest_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ingest dedup (streaming/dedup.dedup_stream) driven
    end-to-end as a batch twin: the documents fixture streams through
    an availableNow file source, engine-native dropDuplicates state
    suppresses re-seen fingerprints, and the surviving rows land in an
    in-memory sink.

    Which doc_id survives a duplicate group is arrival-order dependent
    (dropDuplicates keeps the first row the state store sees), so the
    deterministic contract — and the oracle — is the surviving
    FINGERPRINT SET, which must equal dedup_exact's group keys
    (SELECT DISTINCT md5(normalized text)). The memory sink is a
    test/gate convenience; production ingest writes the same stream to
    parquet (sinks/parquet.py) with identical dedup semantics."""
    from clickhouse_only_importer_prototype_spark.streaming import (
        dedup as streaming_dedup,
    )

    schema = load(spark, sf_dir, "documents").select("doc_id", "text").schema
    sink = _stream_twin(
        spark,
        sf_dir,
        "documents",
        "ingest_dedup_",
        lambda src: streaming_dedup.dedup_stream(
            spark.readStream.schema(schema).parquet(src).select("doc_id", "text")
        ),
    )
    return sink.select(
        F.md5(
            F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
        ).alias("fp")
    )


@register(
    "dedup_stats",
    f"""
    WITH g AS (
      SELECT md5({_SQL_NORM}) AS fp, COUNT(*) AS c
      FROM documents GROUP BY 1
    )
    SELECT CAST(SUM(c) AS BIGINT) AS total_docs,
           CAST(COUNT(*) AS BIGINT) AS distinct_texts,
           CAST(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS dup_groups
    FROM g
    """,
)
def dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus duplication summary (operators/dedup.dedup_stats): the
    one-row health check a pipeline runs before choosing a dedup
    strategy. Two partial-agged reductions, no row data shuffled."""
    return dedup_ops.dedup_stats(load(spark, sf_dir, "documents"))


@register(
    "decontaminate_corpus",
    f"""
    WITH corpus_sh AS ({_sql_shingle_cte(4)}),
    bench_sh AS (
      SELECT shingle FROM ({_sql_shingle_cte(4)}) WHERE doc_id % 97 = 0
    ),
    hits AS (
      SELECT DISTINCT c.doc_id
      FROM corpus_sh c JOIN bench_sh b ON c.shingle = b.shingle
    )
    SELECT d.doc_id FROM documents d
    WHERE d.doc_id NOT IN (SELECT doc_id FROM hits)
    """,
)
def decontaminate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The drop-side of decontamination (operators/dedup.decontaminate):
    surviving doc ids after removing everything sharing a 4-gram with
    the benchmark slice (bench docs remove themselves — a self-pair
    counts, matching the operator). Anti-join on the distinct
    contaminated set; the corpus row data never shuffles."""
    docs = load(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 97 == 0)
    return dedup_ops.decontaminate(
        docs, bench, n=4, collapse=_collapse_gate(sf_dir, "documents", min_rows=20_000)
    ).select("doc_id")


@register(
    "chunk_dedup",
    f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split({_SQL_NORM}, ' '), x -> x <> '') AS t
      FROM documents
    ),
    ch AS (
      SELECT doc_id, i - 1 AS idx,
             array_to_string(t[(i-1)*16+1 : (i-1)*16+16], ' ') AS chunk
      FROM toks,
           UNNEST(range(1, CAST(ceil(len(t) / 16.0) AS BIGINT) + 1)) AS u(i)
      WHERE len(t) > 0
    ),
    keep AS (
      SELECT md5(chunk) AS h, MIN(doc_id * 1000000 + idx) AS first_packed
      FROM ch GROUP BY 1
    )
    SELECT c.doc_id,
           COUNT(*) AS n_chunks,
           CAST(SUM(CASE WHEN c.doc_id * 1000000 + c.idx = k.first_packed
                    THEN 1 ELSE 0 END) AS BIGINT) AS kept_chunks,
           CAST(SUM(CASE WHEN c.doc_id * 1000000 + c.idx = k.first_packed
                    THEN len(string_split(c.chunk, ' ')) ELSE 0 END)
             AS BIGINT) AS kept_tokens
    FROM ch c JOIN keep k ON md5(c.chunk) = k.h
    GROUP BY c.doc_id
    """,
)
def chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-granular exact dedup (operators/dedup.chunk_dedup):
    16-token chunks, first occurrence kept, per-doc retention
    bookkeeping. Complements the exact/minhash/simhash/jaccard family
    at the finer-than-document granularity RefinedWeb-style pipelines
    rewrite with."""
    return dedup_ops.chunk_dedup(_sload(spark, sf_dir, "documents"))


@register(
    "stream_hourly",
    """
    SELECT epoch_ns(ts) // 3600000000000 AS hour_bucket,
           event_type,
           COUNT(*) AS n_events,
           CAST(CAST(SUM(CAST(value AS DECIMAL(14,2))) AS VARCHAR) AS DOUBLE)
             AS value_sum
    FROM events
    GROUP BY hour_bucket, event_type
    """,
)
def stream_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming tumbling-window counts (streaming/events.
    tumbling_counts) driven end-to-end as a batch twin, like
    ingest_dedup: the events fixture streams through an availableNow
    file source, the watermarked hourly aggregation runs in UPDATE
    mode (one batch -> exactly one update row per closed-or-open
    window), and the memory sink's contents must equal the BATCH
    hourly rollup (events_hourly's oracle) — pinning that the
    streaming operator computes the same aggregation the batch engine
    does. value is cast to DECIMAL before the stream so the sum is
    exact cross-engine; hour buckets derive from the window start."""
    from clickhouse_only_importer_prototype_spark.streaming import (
        events as streaming_events,
    )

    sink = _stream_twin(
        spark,
        sf_dir,
        "events",
        "stream_hourly_",
        lambda src: streaming_events.tumbling_counts(
            streaming_events.read_events_stream(spark, src).withColumn(
                "value", _dec("value", 14, 2)
            )
        ),
        output_mode="update",
    )
    return sink.select(
        (F.col("window_start").cast("long") / 3600)
        .cast("long")
        .alias("hour_bucket"),
        "event_type",
        "n_events",
        F.col("value_sum").cast("double").alias("value_sum"),
    )


@register(
    "stream_ohlc",
    """
    WITH b AS (
      SELECT event_type,
             epoch_ns(ts) // 3600000000000 AS bucket,
             value, epoch_ns(ts) AS tns, event_id
      FROM events
    ),
    r AS (
      SELECT *,
             row_number() OVER (PARTITION BY event_type, bucket
                                ORDER BY tns, event_id) AS rn_a,
             row_number() OVER (PARTITION BY event_type, bucket
                                ORDER BY tns DESC, event_id DESC) AS rn_d
      FROM b
    )
    SELECT event_type, bucket,
           MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
           COUNT(*) AS n_events
    FROM r GROUP BY event_type, bucket
    """,
)
def stream_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming OHLC candles (streaming/events.tumbling_ohlc) driven
    end-to-end as a batch twin: min_by/max_by open/close state
    maintained by the ordinary watermarked windowed aggregation — no
    custom stateful operator — in update mode through an availableNow
    source. Must equal the BATCH candle rollup (events_ohlc_hourly's
    oracle, bucket derived from the window start)."""
    from clickhouse_only_importer_prototype_spark.streaming import (
        events as streaming_events,
    )

    sink = _stream_twin(
        spark,
        sf_dir,
        "events",
        "stream_ohlc_",
        lambda src: streaming_events.tumbling_ohlc(
            streaming_events.read_events_stream(spark, src)
        ),
        output_mode="update",
    )
    return sink.select(
        "event_type",
        (F.col("window_start").cast("long") / 3600)
        .cast("long")
        .alias("bucket"),
        "open",
        "high",
        "low",
        "close",
        "n_events",
    )


@register(
    "stream_sessionize",
    """
    WITH x AS (SELECT user_id, epoch_ns(ts) AS t FROM events),
    y AS (
      SELECT user_id, t,
             CASE WHEN lag(t) OVER w IS NULL
                    OR t - lag(t) OVER w > 1800000000000
                  THEN 1 ELSE 0 END AS new_s
      FROM x WINDOW w AS (PARTITION BY user_id ORDER BY t)
    ),
    z AS (
      SELECT user_id, t,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY t
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM y
    ),
    s AS (
      SELECT user_id, MIN(t) AS session_start, MAX(t) AS session_end,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM z GROUP BY user_id, sid
    )
    SELECT user_id, session_start, session_end, n_events
    FROM s
    QUALIFY row_number() OVER (PARTITION BY user_id
                               ORDER BY session_start DESC) > 1
    """,
)
def stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The custom stateful sessionizer
    (streaming/events.sessionize_stateful, applyInPandasWithState)
    driven end-to-end through an availableNow file stream into a
    memory sink — the hard-gate row for the one operator Spark's
    built-in windows can't express.

    The deterministic contract: each user's OPEN tail session stays in
    state (it would be emitted only when later data closes it), so the
    stream's output is exactly the batch sessionization MINUS every
    user's last session — which is what the oracle computes (QUALIFY
    drops the max-start session per user). Event times are
    micro-truncated on the Spark side because DuckDB reads
    TIMESTAMP(NANOS) parquet at microsecond precision (the
    events_sessionize convention)."""
    from clickhouse_only_importer_prototype_spark.streaming import (
        events as streaming_events,
    )

    sink = _stream_twin(
        spark,
        sf_dir,
        "events",
        "stream_sessionize_",
        lambda src: streaming_events.sessionize_stateful(
            streaming_events.read_events_stream(spark, src).withColumn(
                "ts", F.expr("ts div 1000") * 1000
            )
        ),
    )
    return sink.select(
        "user_id", "session_start", "session_end", "n_events"
    )


# --------------------------------------------------------------------------
# TPC-H tail: the six reference queries whose canonical form needs the
# PARTSUPP table, adapted to this corpus's schema (TESTDATA.md has no
# partsupp) by deriving the part<->supplier relation from lineitem:
# "supply cost" = min unit price a supplier ever shipped a part at,
# "stock value" = shipped extended price. Plan SHAPES are the point —
# correlated min (Q2), multi-dim profit rollup (Q9), HAVING vs a global
# scalar (Q11), max-equality CTE reuse (Q15), distinct-count + NOT IN
# (Q16), nested threshold semi-join (Q20).
# --------------------------------------------------------------------------


@register(
    "q2_min_cost_supplier",
    """
    WITH cost AS (
      SELECT l_partkey, l_suppkey,
             MIN(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ), scoped AS (
      SELECT c.l_partkey, c.l_suppkey, c.unit_cost
      FROM cost c
        JOIN supplier s ON s.s_suppkey = c.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'AMERICA'
    ), best AS (
      SELECT l_partkey, MIN(unit_cost) AS best_cost FROM scoped
      GROUP BY l_partkey
    )
    SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_name
    FROM scoped c
      JOIN best b ON b.l_partkey = c.l_partkey
                 AND c.unit_cost = b.best_cost
      JOIN part p ON p.p_partkey = c.l_partkey
      JOIN supplier s ON s.s_suppkey = c.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_size = 10 AND p.p_type = 'STANDARD'
    ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (adapted): cheapest supplier per part within a region.

    The canonical query's correlated MIN subquery over partsupp becomes
    a groupBy+join over lineitem-derived unit costs: one shuffle builds
    per-(part,supplier) min unit price with map-side partial_min, a
    second tiny groupBy finds the per-part best, and the equality join
    back is on the already-partitioned part key. nation/region hint
    (bounded); supplier/part and the part-keyed ``best`` aggregate all
    SCALE with data, so their broadcasts are size-decided — forcing
    ``best`` (2M rows at the 100x stress scale) onto the driver is the
    unbounded-collect anti-pattern. The min-of-identical-doubles
    equality is bit-stable cross-engine. Scale: the only data-sized shuffle is the
    first groupBy, keyed (part,supplier) — no skew (pairs are near
    unique), no window, no correlated re-scan per part (the reference's
    N+1 subquery shape; cf. reference README modes: single-pass ethos).
    """
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").where(
        (F.col("p_size") == 10) & (F.col("p_type") == "STANDARD")
    )
    # per-part mins are independent across parts, so the selective part
    # predicate commutes through the aggregate: semi-filter lineitem by
    # the qualifying part keys BEFORE the (part,supplier) min — the
    # shuffle sees ~2% of the fact rows instead of computing (and then
    # discarding) best costs for every part. 100x: 49.1s → measured
    # below. Catalyst cannot reorder this itself (the filter sits above
    # the aggregate in the naive plan).
    li = li.join(
        p.select("p_partkey"), li.l_partkey == F.col("p_partkey"), "left_semi"
    )
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    region_suppliers = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    scoped = cost.join(
        region_suppliers, cost.l_suppkey == F.col("s_suppkey")
    )
    best = scoped.groupBy(F.col("l_partkey").alias("b_partkey")).agg(
        F.min("unit_cost").alias("best_cost")
    )
    return (
        scoped.join(
            best,
            (F.col("l_partkey") == F.col("b_partkey"))
            & (F.col("unit_cost") == F.col("best_cost")),
        )
        .join(p, F.col("l_partkey") == p.p_partkey)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name")
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


@register(
    "q9_product_profit",
    f"""
    SELECT nation, o_year,
           CAST(CAST(SUM(amount) AS VARCHAR) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
             {_SQL_REV.replace('l_', 'l.l_')}
               - CAST(p.p_retailprice AS DECIMAL(12,2))
                 * CAST(l.l_quantity AS DECIMAL(12,2)) AS amount
      FROM part p
        JOIN lineitem l ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE p.p_name LIKE '%gear%'
    ) profit
    GROUP BY nation, o_year
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (adapted): profit by supplier nation and order year for
    parts matching a name pattern; supply cost proxied by
    p_retailprice (no partsupp in this corpus).

    Scale: part's LIKE filter prunes lineitem FIRST (the selective
    dimension drives the probe; broadcast is size-decided since part
    scales with data); supplier likewise; nation hints (bounded 25);
    orders joins on the lineitem shuffle key. All decimal
    arithmetic stays in DECIMAL(38) — same exact sum both engines.
    """
    p = load(spark, sf_dir, "part").where(F.col("p_name").like("%gear%"))
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    n = load(spark, sf_dir, "nation")
    amount = _revenue() - _dec("p_retailprice") * _dec("l_quantity")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
    )


@register(
    "q11_important_stock",
    """
    WITH scoped AS (
      SELECT l.l_partkey,
             CAST(l.l_extendedprice AS DECIMAL(12,2)) AS val
      FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_3'
    ), per_part AS (
      SELECT l_partkey, CAST(CAST(SUM(val) AS VARCHAR) AS DOUBLE) AS value
      FROM scoped GROUP BY l_partkey
    ), total AS (
      SELECT CAST(CAST(SUM(val) AS VARCHAR) AS DOUBLE) AS grand FROM scoped
    )
    SELECT p.l_partkey AS p_partkey, p.value
    FROM per_part p, total t
    WHERE p.value > t.grand * 0.001
    ORDER BY p.value DESC, p_partkey
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (adapted): parts whose shipped value from one
    nation's suppliers exceeds a fraction of that nation's total —
    HAVING against a global scalar subquery.

    Scale: ONE shuffle computes both sides — the per-part partial sums
    are re-aggregated (32 rows -> 1) for the grand total instead of
    rescanning lineitem, then the one-row total broadcasts back onto
    per_part. Threshold compares the identical decimal-sum doubles
    both engines, so the boundary cannot flip. The canonical query
    scans partsupp twice; this shape reads the fact table once.
    """
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_3")
    nat_suppliers = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey"
    )
    scoped = li.join(nat_suppliers, li.l_suppkey == F.col("s_suppkey"))
    per_part = scoped.groupBy(F.col("l_partkey").alias("p_partkey")).agg(
        F.sum(_dec("l_extendedprice")).alias("dec_value")
    )
    # reuse the per-part partials for the grand total: 2000-row agg, no
    # second pass over lineitem
    total = per_part.agg(F.sum("dec_value").cast("double").alias("grand"))
    return (
        per_part.withColumn("value", F.col("dec_value").cast("double"))
        .crossJoin(F.broadcast(total))
        .where(F.col("value") > F.col("grand") * 0.001)
        .select("p_partkey", "value")
        .orderBy(F.col("value").desc(), "p_partkey")
    )


@register(
    "q15_top_supplier",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                 * (CAST(1.0 AS DECIMAL(6,4))
                    - CAST(l_discount AS DECIMAL(6,4)))) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(CAST(r.total_rev AS VARCHAR) AS DOUBLE) AS total_revenue
    FROM revenue r JOIN supplier s ON s.s_suppkey = r.supplier_no
    WHERE r.total_rev = (SELECT MAX(total_rev) FROM revenue)
    ORDER BY s.s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with maximum revenue in a quarter — the
    view-reuse query (revenue referenced twice: rows and its MAX).

    Scale: the revenue aggregate is supplier-count-sized (tiny), so it
    is computed ONCE and the max folds from its partials — a broadcast
    of the 1-row max back onto it, not a second lineitem scan. The
    decimal-equality against MAX is exact in both engines. The
    quarter filter is pushed to the parquet scan.
    """
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_revenue()).alias("total_rev")
    )
    best = revenue.agg(F.max("total_rev").alias("best_rev"))
    s = load(spark, sf_dir, "supplier")
    return (
        revenue.crossJoin(F.broadcast(best))
        .where(F.col("total_rev") == F.col("best_rev"))
        .join(s, F.col("supplier_no") == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_rev").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@register(
    "q16_supplier_cnt",
    """
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#4'
      AND p.p_type NOT LIKE 'MEDIUM%'
      AND p.p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7'
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
)
def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (adapted): distinct supplier count per part attribute
    triple, excluding a denylisted supplier set (NOT IN -> broadcast
    anti-join; the complaints LIKE becomes a name-suffix predicate —
    this corpus has no s_comment).

    Scale: part's compound predicate and the NOT IN anti-join side
    both join by size-decided broadcast (both scale with data;
    null-safe by construction: s_suppkey is a key). count(DISTINCT)
    expands to the two-level partial
    aggregate, so no single reducer sees all suppliers of a hot triple.
    """
    p = load(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#4")
        & (~F.col("p_type").like("MEDIUM%"))
        & (F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22))
    )
    denied = (
        load(spark, sf_dir, "supplier")
        .where(F.col("s_name").like("%7"))
        .select("s_suppkey")
    )
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(denied, li.l_suppkey == F.col("s_suppkey"), "left_anti")
        .join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@register(
    "q20_promotion_parts",
    """
    WITH shipped AS (
      SELECT l_suppkey, l_partkey,
             CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)))
                  AS VARCHAR) AS DOUBLE) AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY l_suppkey, l_partkey
    ), part_total AS (
      SELECT l_partkey, CAST(CAST(SUM(CAST(qty AS DECIMAL(18,2)))
                        AS VARCHAR) AS DOUBLE) AS total_qty
      FROM shipped GROUP BY l_partkey
    ), dominant AS (
      SELECT DISTINCT sh.l_suppkey
      FROM shipped sh
        JOIN part_total pt ON pt.l_partkey = sh.l_partkey
        JOIN part p ON p.p_partkey = sh.l_partkey
      WHERE p.p_name LIKE 'small%' AND sh.qty > pt.total_qty * 0.3
    )
    SELECT s.s_name, n.n_name
    FROM supplier s
      JOIN dominant d ON d.l_suppkey = s.s_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name IN ('NATION_5', 'NATION_6', 'NATION_7')
    ORDER BY s.s_name
    """,
)
def q20_promotion_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (adapted): suppliers who dominate the supply of some
    name-filtered part in a year (shipped > 30% of the part's total) —
    the nested threshold semi-join. partsupp availqty becomes shipped
    quantity; the availqty > 0.5 * SUM(qty) correlated subquery becomes
    a per-part total re-aggregated from the (supplier, part) partials.

    Scale: one lineitem shuffle on (suppkey, partkey); part_total
    reuses those partials (no second scan); part's LIKE side and the
    distinct-collapsed dominant-supplier set join by size-decided
    broadcast (both scale with data). Threshold compares identical decimal-sum
    doubles, so it cannot flip cross-engine.
    """
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    shipped = li.groupBy("l_suppkey", "l_partkey").agg(
        F.sum(_dec("l_quantity")).cast("double").alias("qty")
    )
    part_total = shipped.groupBy(F.col("l_partkey").alias("pt_partkey")).agg(
        F.sum(_dec("qty", 18, 2)).cast("double").alias("total_qty")
    )
    p = load(spark, sf_dir, "part").where(F.col("p_name").like("small%"))
    dominant = (
        shipped.join(p, shipped.l_partkey == p.p_partkey)
        .join(part_total, shipped.l_partkey == F.col("pt_partkey"))
        .where(F.col("qty") > F.col("total_qty") * 0.3)
        .select("l_suppkey")
        .distinct()
    )
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").where(
        F.col("n_name").isin("NATION_5", "NATION_6", "NATION_7")
    )
    return (
        s.join(dominant, s.s_suppkey == F.col("l_suppkey"))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


@register(
    "stream_dim_join",
    """
    WITH n AS (SELECT COUNT(*) AS n_cust FROM customer)
    SELECT c.c_mktsegment, e.event_type, COUNT(*) AS n_events,
           CAST(CAST(SUM(CAST(e.value AS DECIMAL(14,2))) AS VARCHAR)
                AS DOUBLE) AS value_sum
    FROM events e, n
    JOIN customer c ON c.c_custkey = e.user_id % n.n_cust
    GROUP BY c.c_mktsegment, e.event_type
    """,
)
def stream_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static dimension join driven end-to-end like the other
    streaming batch twins: the events fixture streams through an
    availableNow file source and joins the broadcast customer
    dimension row-by-row — the stateless enrichment every streaming
    ingest pipeline performs (no watermark, no state store for the
    join itself; at scale the dim is a broadcast that refreshes per
    micro-batch). The rollup runs IN-STREAM (complete-mode aggregate
    over the enriched rows): the memory sink holds
    |segments| x |event_types| cells, not raw enriched events — the
    shape a production stream materializes, and the only driver-side
    rows are the final cells. Must equal the oracle's static
    join+rollup. Events map onto the dimension by user_id mod
    |customer| (keys are 0-based contiguous)."""
    from clickhouse_only_importer_prototype_spark.streaming import (
        events as streaming_events,
    )

    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    n_cust = cust.count()

    def build(src: str) -> DataFrame:
        stream = streaming_events.read_events_stream(spark, src).select(
            (F.col("user_id") % F.lit(n_cust)).alias("__ck"),
            "event_type",
            _dec("value", 14, 2).alias("value"),
        )
        return (
            stream.join(
                F.broadcast(cust), stream["__ck"] == cust["c_custkey"]
            )
            .groupBy("c_mktsegment", "event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum("value").alias("value_sum_dec"),
            )
        )

    sink = _stream_twin(
        spark,
        sf_dir,
        "events",
        "stream_dim_join_",
        build,
        output_mode="complete",
    )
    return sink.select(
        "c_mktsegment",
        "event_type",
        "n_events",
        F.col("value_sum_dec").cast("double").alias("value_sum"),
    )


@register(
    "stream_stream_join",
    """
    WITH v AS (SELECT user_id, ts FROM events WHERE event_type = 'view'),
    c AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
    SELECT v.user_id,
           COUNT(*) AS n_attributed,
           CAST(MIN(epoch_ns(c.ts) - epoch_ns(v.ts)) AS BIGINT) AS min_lag_ns,
           CAST(MAX(epoch_ns(c.ts) - epoch_ns(v.ts)) AS BIGINT) AS max_lag_ns
    FROM v JOIN c ON v.user_id = c.user_id
      AND c.ts > v.ts
      AND epoch_ns(c.ts) <= epoch_ns(v.ts)
                            + CAST(21600 AS BIGINT) * 1000000000
    GROUP BY v.user_id
    """,
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (view -> click attribution within
    6 hours per user), driven end-to-end like the other streaming
    batch twins: both sides are watermarked event-time streams over
    the availableNow events source, the inner join's time-range
    condition bounds both sides' state (Spark retains only rows inside
    watermark + range — THE mechanism that keeps a 100 TB/day
    attribution join's state finite), and the append-mode sink's pairs
    roll up batch-side to hash-match the oracle's static self-join.
    Timestamps are micro-truncated before the join AND the lag math
    (the events_sessionize convention: DuckDB reads TIMESTAMP(NANOS)
    parquet at microsecond precision, so sub-microsecond residue would
    otherwise flip boundary pairs between engines on that testdata
    shape); the join condition itself runs on the event-time columns,
    as stream-stream state cleanup requires."""
    from clickhouse_only_importer_prototype_spark.streaming import (
        events as streaming_events,
    )

    def build(src: str) -> DataFrame:
        stream = streaming_events.read_events_stream(spark, src).withColumn(
            "ts", F.expr("ts div 1000") * 1000
        )
        v = (
            stream.where(F.col("event_type") == "view")
            .select(
                F.col("user_id").alias("v_user"),
                F.col("ts").alias("v_ns"),
                F.col("event_time").alias("v_time"),
            )
            .withWatermark("v_time", "12 hours")
        )
        c = (
            stream.where(F.col("event_type") == "click")
            .select(
                F.col("user_id").alias("c_user"),
                F.col("ts").alias("c_ns"),
                F.col("event_time").alias("c_time"),
            )
            .withWatermark("c_time", "12 hours")
        )
        return v.join(
            c,
            (F.col("v_user") == F.col("c_user"))
            & (F.col("c_time") > F.col("v_time"))
            & (F.col("c_time") <= F.col("v_time") + F.expr("INTERVAL 6 HOURS")),
        )

    sink = _stream_twin(
        spark, sf_dir, "events", "stream_stream_join_", build
    )
    return (
        sink.groupBy(F.col("v_user").alias("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_attributed"),
            F.min(F.col("c_ns") - F.col("v_ns")).alias("min_lag_ns"),
            F.max(F.col("c_ns") - F.col("v_ns")).alias("max_lag_ns"),
        )
    )


@register(
    "stream_stream_outer_join",
    """
    WITH v AS (SELECT user_id, epoch_ns(ts) // 1000 * 1000 AS ts
               FROM events WHERE event_type = 'view'),
    c AS (SELECT user_id, epoch_ns(ts) // 1000 * 1000 AS ts
          FROM events WHERE event_type = 'click')
    SELECT v.user_id,
           CAST(COUNT(c.ts) AS BIGINT) AS n_pairs,
           CAST(COUNT(*) - COUNT(c.ts) AS BIGINT) AS n_orphan_views
    FROM v LEFT JOIN c ON v.user_id = c.user_id
      AND c.ts > v.ts
      AND c.ts <= v.ts + CAST(21600 AS BIGINT) * 1000000000
    GROUP BY v.user_id
    """,
)
def stream_stream_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER interval join: views that never
    convert within the 6-hour window surface as null-extended rows —
    the 'unattributed impressions' feed a real attribution pipeline
    needs alongside the matched pairs (stream_stream_join covers
    those; this twin exercises the OTHER half of the operator: state
    expiry emitting the null side).

    Outer-join null rows only emit once the global watermark passes a
    view's join window, and the global watermark is min over BOTH
    sides of (max event time - delay) — so a finite fixture would
    strand every view in the last watermark+window hours in state
    forever, and the twin would undercount orphans vs the batch
    oracle. The deterministic fix is a watermark SENTINEL: one far-
    future 'view' + one far-future 'click' row (user_id -1) written as
    a second source file, pushing both sides' max event time 30 days
    past the data so every REAL view's window is closed when the
    availableNow run's final no-data micro-batch flushes state. The
    sentinels themselves stay in state (their own windows never close)
    and are filtered out of the rollup — the oracle is then the plain
    batch LEFT JOIN, no emission-boundary caveats. Same micro-
    truncated-nanos convention as the inner twin."""
    import os
    import uuid

    from clickhouse_only_importer_prototype_spark.streaming import (
        events as streaming_events,
    )

    def setup(src: str) -> None:
        # the NANOS-shape fixture needs this for the batch max-ts read,
        # same as read_events_stream does for the stream itself
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        ev = spark.read.parquet(os.path.join(src, "events.parquet"))
        t = ev.schema["ts"].dataType
        far: Column
        if isinstance(t, (TimestampType, TimestampNTZType)):
            far = F.max("ts") + F.expr("INTERVAL 30 DAYS")
        else:  # raw long nanos fixture shape
            far = F.max("ts") + F.lit(30 * 86_400 * 1_000_000_000)
        far_ts = ev.agg(far.alias("m")).first()["m"]
        rows = [
            (-1, far_ts, -1, "view", 0.0, None),
            (-2, far_ts, -1, "click", 0.0, None),
        ]
        # the file stream source lists plain FILES in src — a Spark
        # write would create a directory it silently skips, stranding
        # the watermark at (real max - delay); write to a scratch dir
        # and move the single part file in as a sibling of the fixture
        import glob
        import shutil
        import tempfile

        scratch = tempfile.mkdtemp(prefix="sentinel_")
        # arrow_local_df, not createDataFrame(list): the pickle-path
        # local relation executes as a Python-RDD scan whose write
        # task paid ~4.3s of Python round-trips (r11 optimization,
        # guide §4 — measured in plans/r11)
        arrow_local_df(
            spark, rows, "event_id long, ts " + t.simpleString()
            + ", user_id long, event_type string, value double,"
            " props string"
        ).coalesce(1).write.mode("overwrite").parquet(scratch)
        (part,) = glob.glob(os.path.join(scratch, "part-*.parquet"))
        shutil.move(
            part,
            os.path.join(src, f"sentinel_{uuid.uuid4().hex[:8]}.parquet"),
        )
        shutil.rmtree(scratch, ignore_errors=True)

    def build(src: str) -> DataFrame:
        stream = streaming_events.read_events_stream(spark, src).withColumn(
            "ts", F.expr("ts div 1000") * 1000
        )
        v = (
            stream.where(F.col("event_type") == "view")
            .select(
                F.col("user_id").alias("v_user"),
                F.col("ts").alias("v_ns"),
                F.col("event_time").alias("v_time"),
            )
            .withWatermark("v_time", "12 hours")
        )
        c = (
            stream.where(F.col("event_type") == "click")
            .select(
                F.col("user_id").alias("c_user"),
                F.col("ts").alias("c_ns"),
                F.col("event_time").alias("c_time"),
            )
            .withWatermark("c_time", "12 hours")
        )
        return v.join(
            c,
            (F.col("v_user") == F.col("c_user"))
            & (F.col("c_time") > F.col("v_time"))
            & (
                F.col("c_time")
                <= F.col("v_time") + F.expr("INTERVAL 6 HOURS")
            ),
            "left_outer",
        )

    sink = _stream_twin(
        spark,
        sf_dir,
        "events",
        "stream_stream_outer_",
        build,
        setup=setup,
    )
    return (
        sink.where(F.col("v_user") >= 0)
        .groupBy(F.col("v_user").alias("user_id"))
        .agg(
            F.count(F.col("c_user")).alias("n_pairs"),
            F.count_if(F.col("c_user").isNull()).alias("n_orphan_views"),
        )
    )


@register(
    "events_funnel",
    """
    WITH u AS (SELECT DISTINCT user_id FROM events),
    s1 AS (
      SELECT user_id, MIN(epoch_ns(ts)) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, MIN(epoch_ns(e.ts)) AS t2
      FROM events e JOIN s1 ON s1.user_id = e.user_id
      WHERE e.event_type = 'click' AND epoch_ns(e.ts) > s1.t1
        AND epoch_ns(e.ts) <= s1.t1 + CAST(21600 AS BIGINT) * 1000000000
      GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, MIN(epoch_ns(e.ts)) AS t3
      FROM events e JOIN s2 ON s2.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND epoch_ns(e.ts) > s2.t2
        AND epoch_ns(e.ts) <= s2.t2 + CAST(21600 AS BIGINT) * 1000000000
      GROUP BY e.user_id
    )
    SELECT CAST(CASE WHEN t3 IS NOT NULL THEN 3
                     WHEN t2 IS NOT NULL THEN 2
                     WHEN t1 IS NOT NULL THEN 1
                     ELSE 0 END AS BIGINT) AS funnel_stage,
           COUNT(*) AS n_users
    FROM u LEFT JOIN s1 USING (user_id)
           LEFT JOIN s2 USING (user_id)
           LEFT JOIN s3 USING (user_id)
    GROUP BY 1
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis (operators/temporal.funnel_stages):
    view -> click -> purchase, each stage reached only strictly after
    the previous stage's earliest qualifying event and within a 6-hour
    conversion window of it. Per-user stage
    frames are one filtered groupBy fold each, joined on the key they
    are already partitioned by — no windows, no sorts; the oracle
    replays the stage chain as correlated min-after CTEs."""
    ev = load(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    staged = temporal_ops.funnel_stages(
        ev, ["view", "click", "purchase"], within=21_600_000_000_000
    )
    return staged.groupBy("funnel_stage").agg(
        F.count(F.lit(1)).alias("n_users")
    )


@register(
    "events_funnel_anymatch",
    """
    WITH u AS (SELECT DISTINCT user_id FROM events),
    s1 AS (
      SELECT DISTINCT user_id, epoch_ns(ts) AS t FROM events
      WHERE event_type = 'view'
    ),
    s2 AS (
      SELECT DISTINCT e.user_id, epoch_ns(e.ts) AS t
      FROM events e JOIN s1 ON s1.user_id = e.user_id
      WHERE e.event_type = 'click' AND epoch_ns(e.ts) > s1.t
        AND epoch_ns(e.ts) <= s1.t + CAST(21600 AS BIGINT) * 1000000000
    ),
    s3 AS (
      SELECT DISTINCT e.user_id
      FROM events e JOIN s2 ON s2.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND epoch_ns(e.ts) > s2.t
        AND epoch_ns(e.ts) <= s2.t + CAST(21600 AS BIGINT) * 1000000000
    )
    SELECT CAST(CASE WHEN s3.user_id IS NOT NULL THEN 3
                     WHEN s2u.user_id IS NOT NULL THEN 2
                     WHEN s1u.user_id IS NOT NULL THEN 1
                     ELSE 0 END AS BIGINT) AS funnel_stage,
           COUNT(*) AS n_users
    FROM u LEFT JOIN (SELECT DISTINCT user_id FROM s1) s1u USING (user_id)
           LEFT JOIN (SELECT DISTINCT user_id FROM s2) s2u USING (user_id)
           LEFT JOIN s3 USING (user_id)
    GROUP BY 1
    """,
)
def events_funnel_anymatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-anchoring funnel (operators/temporal.funnel_stages_anymatch):
    view -> click -> purchase where ANY qualifying attempt chain
    converts — the product-analytics default that events_funnel's
    greedy first-attempt chain lower-bounds. One groupBy packs each
    user's funnel events into a sorted array; a single JVM-side
    aggregate fold walks it carrying the two latest reachable attempt
    timestamps per stage (ties on ts can never anchor each other, so
    the strictly-earlier anchor survives). The oracle materializes
    the reachable-attempt sets stage by stage as EXISTS-chain CTEs —
    quadratic per user, oracle-only; the engine path is the linear
    fold."""
    ev = load(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    staged = temporal_ops.funnel_stages_anymatch(
        ev, ["view", "click", "purchase"], within=21_600_000_000_000
    )
    return staged.groupBy("funnel_stage").agg(
        F.count(F.lit(1)).alias("n_users")
    )


@register(
    "events_cohort_retention",
    f"""
    WITH f AS (
      SELECT user_id,
             MIN({ORACLE_FLOORDIV('epoch_ns(ts)', 86400000000000)})
               AS cohort_bucket
      FROM events GROUP BY user_id
    ),
    a AS (
      SELECT DISTINCT user_id,
             {ORACLE_FLOORDIV('epoch_ns(ts)', 86400000000000)} AS day
      FROM events
    )
    SELECT f.cohort_bucket, (a.day - f.cohort_bucket) // 7 AS offset,
           CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_active
    FROM a JOIN f USING (user_id)
    GROUP BY 1, 2
    """,
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix (operators/temporal.cohort_retention):
    users cohort by first-activity day, activity rolls up to weekly
    offsets — the table behind every retention curve. Two folds and
    one user-key join, integer div throughout (epoch nanos exceed
    2^53; float division would corrupt bucket boundaries)."""
    ev = load(spark, sf_dir, "events").select("user_id", "ts")
    return temporal_ops.cohort_retention(ev)


@register(
    "events_rolling_counts",
    """
    SELECT event_id,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_events_6h,
           CAST(SUM(CAST(floor(value * 1000 + 0.5) AS BIGINT)) OVER w
                AS BIGINT) AS value_milli_6h
    FROM events
    WINDOW w AS (
      PARTITION BY user_id ORDER BY epoch_ns(ts)
      RANGE BETWEEN 21600000000000 PRECEDING AND CURRENT ROW
    )
    """,
)
def events_rolling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event trailing 6-hour rolling aggregates over each user's
    stream — the rate-limit / velocity-check shape (events in the
    last N hours AT each event), which tumbling/sliding windows
    (events_sliding_counts) cannot express: the frame is anchored per
    ROW, not per grid bucket. One RANGE window partitioned by user on
    the raw long-nanos ts; value folds through a deterministic
    round-to-milli integerization so the rolling sum is exact integer
    math on both engines (a float rolling sum would be
    accumulation-order-lucky). RANGE (not ROWS) framing makes
    same-timestamp peers symmetric — both engines include all peers.
    Scale: per-user window state, no global sort; the 100 TB variant
    partitions cleanly by user hash."""
    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"))
        .rangeBetween(-21_600_000_000_000, 0)
    )
    milli = F.floor(F.col("value") * 1000 + F.lit(0.5)).cast("long")
    return ev.select(
        "event_id",
        F.count(F.lit(1)).over(w).cast("long").alias("n_events_6h"),
        F.sum(milli).over(w).cast("long").alias("value_milli_6h"),
    )


@register(
    "events_gap_filled_hourly",
    f"""
    WITH b AS (
      SELECT event_type,
             {ORACLE_FLOORDIV('epoch_ns(ts)', 3600000000000)} AS bucket
      FROM events
    ),
    c AS (
      SELECT event_type, bucket, COUNT(*) AS n FROM b GROUP BY 1, 2
    ),
    spans AS (
      SELECT event_type, MIN(bucket) AS lo, MAX(bucket) AS hi
      FROM b GROUP BY 1
    ),
    spine AS (
      SELECT event_type, UNNEST(generate_series(lo, hi)) AS bucket
      FROM spans
    )
    SELECT s.event_type, s.bucket,
           CAST(COALESCE(c.n, 0) AS BIGINT) AS n_events
    FROM spine s LEFT JOIN c USING (event_type, bucket)
    """,
)
def events_gap_filled_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly rollup per event type with gap filling
    (operators/temporal.gap_fill): every hour between a type's first
    and last event gets a row, empty hours count 0 — the
    hypertable-style timeseries shape where a missing bucket is a
    signal (outage), not an absence. Spine = per-key explode of
    sequence(min_bucket, max_bucket); fill join lands on the (key,
    bucket) partitioning the counts fold already produced."""
    ev = load(spark, sf_dir, "events").select("event_type", "ts")
    return temporal_ops.gap_fill(ev, ["event_type"])


# --------------------------------------------------------------------------
# Lakehouse maintenance: CDC merge, SCD2 history, layout planning/audit
# --------------------------------------------------------------------------


# Shared CDC fixture: a derived change set over orders — inserts
# (keys = 0 mod 7, held out of the base snapshot), two competing
# updates per key (= 1 mod 7; higher seq must win), deletes
# (= 2 mod 7). Stated once for the merge query, the snapshot-diff
# audit, and their oracles.
_SQL_CDC_CTES = """o AS (SELECT o_orderkey, o_custkey, o_totalprice FROM orders),
    base AS (SELECT * FROM o WHERE o_orderkey % 7 <> 0),
    changes AS (
      SELECT o_orderkey, 'I' AS op, 1 AS seq, o_custkey, o_totalprice
      FROM o WHERE o_orderkey % 7 = 0
      UNION ALL
      SELECT o_orderkey, 'U', 1, o_custkey, o_totalprice + 50
      FROM o WHERE o_orderkey % 7 = 1
      UNION ALL
      SELECT o_orderkey, 'U', 2, o_custkey, o_totalprice + 100
      FROM o WHERE o_orderkey % 7 = 1
      UNION ALL
      SELECT o_orderkey, 'D', 1, o_custkey, o_totalprice
      FROM o WHERE o_orderkey % 7 = 2
    ),
    latest AS (
      SELECT o_orderkey, op, o_custkey, o_totalprice
      FROM (SELECT c.*, ROW_NUMBER() OVER (PARTITION BY o_orderkey
                                           ORDER BY seq DESC) AS rn
            FROM changes c)
      WHERE rn = 1
    ),
    merged AS (
      SELECT COALESCE(c.o_orderkey, b.o_orderkey) AS o_orderkey,
             CASE WHEN c.op IS NOT NULL THEN c.o_custkey
                  ELSE b.o_custkey END AS o_custkey,
             CASE WHEN c.op IS NOT NULL THEN c.o_totalprice
                  ELSE b.o_totalprice END AS o_totalprice
      FROM base b FULL OUTER JOIN latest c ON b.o_orderkey = c.o_orderkey
      WHERE c.op IS NULL OR c.op <> 'D'
    )"""


def _cdc_base_and_changes(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    k = F.col("o_orderkey") % 7
    base = o.where(k != 0)

    def change(mod: int, op: str, seq: int, price: Column) -> DataFrame:
        return o.where(k == mod).select(
            "o_orderkey",
            F.lit(op).alias("op"),
            F.lit(seq).alias("seq"),
            "o_custkey",
            price.alias("o_totalprice"),
        )

    tp = F.col("o_totalprice")
    changes = (
        change(0, "I", 1, tp)
        .unionByName(change(1, "U", 1, tp + 50))
        .unionByName(change(1, "U", 2, tp + 100))
        .unionByName(change(2, "D", 1, tp))
    )
    return base, changes


@register(
    "cdc_merge_orders",
    f"""
    WITH {_SQL_CDC_CTES}
    SELECT * FROM merged
    """,
)
def cdc_merge_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch MERGE (operators/cdc.merge_changes): apply the shared CDC
    change-set fixture to the base snapshot in one co-partitioned
    full-outer join. The oracle replays the same MERGE with a
    ROW_NUMBER latest-change collapse and CASE projection."""
    base, changes = _cdc_base_and_changes(spark, sf_dir)
    return cdc_ops.merge_changes(base, changes, ["o_orderkey"])


@register(
    "cdc_merge_checksum",
    f"""
    WITH {_SQL_CDC_CTES},
    rendered AS (
      -- mirror of table_checksum's injective rendering: len:value per
      -- column (the fixture columns are non-null, so no 'N' tokens)
      SELECT CONCAT_WS('|',
               CAST(length(k) AS VARCHAR) || ':' || k,
               CAST(length(c) AS VARCHAR) || ':' || c,
               CAST(length(p) AS VARCHAR) || ':' || p) AS row_str
      FROM (
        SELECT CAST(o_orderkey AS VARCHAR) AS k,
               CAST(o_custkey AS VARCHAR) AS c,
               CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                    AS VARCHAR) AS p
        FROM merged
      )
    )
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(CAST(('0x' || substr(md5(row_str), 1, 15)) AS BIGINT)
                    % 1000000007) % 1000000007 AS BIGINT) AS checksum
    FROM rendered
    """,
)
def cdc_merge_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replication-convergence audit (operators/profile.table_checksum
    over operators/cdc.merge_changes): the engine applies the shared
    CDC change set, then fingerprints the merged snapshot with an
    order-independent md5-sum checksum; the oracle replays the MERGE
    in SQL and fingerprints ITS snapshot with the identical hash
    math. Equal checksums certify row-level convergence of the two
    engines' MERGE implementations in one integer — the cross-system
    audit a 100 TB replication pipeline runs nightly instead of a
    sort-and-diff. Doubles fold through deterministic
    floor(x*100+0.5) cents before hashing (native float rendering is
    engine-specific)."""
    from clickhouse_only_importer_prototype_spark.operators.profile import (
        table_checksum,
    )

    base, changes = _cdc_base_and_changes(spark, sf_dir)
    merged = cdc_ops.merge_changes(base, changes, ["o_orderkey"])
    prepped = merged.select(
        F.col("o_orderkey").cast("string").alias("k"),
        F.col("o_custkey").cast("string").alias("c"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .cast("string")
        .alias("p"),
    )
    return table_checksum(prepped)


@register(
    "snapshot_diff_orders",
    f"""
    WITH {_SQL_CDC_CTES},
    d AS (
      SELECT CASE WHEN b.o_orderkey IS NULL THEN 'added'
                  WHEN m.o_orderkey IS NULL THEN 'removed'
                  WHEN b.o_custkey IS DISTINCT FROM m.o_custkey
                    OR b.o_totalprice IS DISTINCT FROM m.o_totalprice
                    THEN 'changed'
                  ELSE 'unchanged' END AS status
      FROM base b FULL OUTER JOIN merged m ON b.o_orderkey = m.o_orderkey
    )
    SELECT status, COUNT(*) AS n_keys FROM d GROUP BY status
    """,
)
def snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation (operators/cdc.snapshot_diff): diff the
    pre-merge base against the merged result — the audit that
    certifies a MERGE did exactly what the change set said (added =
    insert keys, removed = delete keys, changed = update keys,
    unchanged = the rest). One co-partitioned full-outer join."""
    base, changes = _cdc_base_and_changes(spark, sf_dir)
    merged = cdc_ops.merge_changes(base, changes, ["o_orderkey"])
    return cdc_ops.snapshot_diff(base, merged, ["o_orderkey"])


@register(
    "dq_audit",
    """
    SELECT 'negative_price' AS check, CAST(COUNT(*) FILTER (
             WHERE l_extendedprice < 0) AS BIGINT) AS n_violations
    FROM lineitem
    UNION ALL
    SELECT 'discount_over_10pct', CAST(COUNT(*) FILTER (
             WHERE l_discount > 0.1) AS BIGINT) FROM lineitem
    UNION ALL
    SELECT 'qty_over_45', CAST(COUNT(*) FILTER (
             WHERE l_quantity > 45) AS BIGINT) FROM lineitem
    UNION ALL
    SELECT 'tax_out_of_range', CAST(COUNT(*) FILTER (
             WHERE l_tax < 0 OR l_tax > 0.2) AS BIGINT) FROM lineitem
    UNION ALL
    SELECT 'orphan_lineitem', CAST(COUNT(*) AS BIGINT)
    FROM lineitem l WHERE NOT EXISTS (
      SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    UNION ALL
    SELECT 'dup_orderkey', CAST(COALESCE(SUM(n), 0) AS BIGINT)
    FROM (SELECT COUNT(*) AS n FROM orders
          GROUP BY o_orderkey HAVING COUNT(*) > 1)
    """,
)
def dq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality expectations job (operators/profile.
    violation_counts): every row-local constraint rides ONE lineitem
    scan as conditional counts; the cross-row constraints — FK
    orphans (left-anti join; orders is fact-sized, so no broadcast
    hint — AQE picks broadcast at bench scale and a shuffled anti-join
    at 100 TB) and key uniqueness — union in as their own small
    aggregates. The true-violation checks audit clean (0) on the
    synthetic data; the distribution checks prove the counting path
    with nonzero results."""
    from clickhouse_only_importer_prototype_spark.operators.profile import (
        violation_counts,
    )

    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    row_local = violation_counts(
        li,
        {
            "negative_price": F.col("l_extendedprice") < 0,
            "discount_over_10pct": F.col("l_discount") > 0.1,
            "qty_over_45": F.col("l_quantity") > 45,
            "tax_out_of_range": (F.col("l_tax") < 0) | (F.col("l_tax") > 0.2),
        },
    )
    orphans = (
        li.join(
            o.select("o_orderkey"),
            li["l_orderkey"] == F.col("o_orderkey"),
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("n_violations"))
        .select(F.lit("orphan_lineitem").alias("check"), "n_violations")
    )
    dups = (
        o.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 1)
        .agg(F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("n_violations"))
        .select(F.lit("dup_orderkey").alias("check"), "n_violations")
    )
    return row_local.unionByName(orphans).unionByName(dups)


@register(
    "scd2_priority_history",
    """
    WITH log AS (
      SELECT o_custkey, o_orderpriority AS attr, o_orderdate AS ts,
             o_orderkey AS tb
      FROM orders
    ),
    marked AS (
      SELECT o_custkey, attr, ts, tb,
             LAG(attr) OVER (PARTITION BY o_custkey ORDER BY ts, tb) AS prev
      FROM log
    ),
    starts AS (SELECT * FROM marked WHERE prev IS NULL OR attr <> prev)
    SELECT o_custkey, attr AS o_orderpriority, ts AS eff_from,
           COALESCE(LEAD(ts) OVER w,
                    TIMESTAMP '2261-12-31 00:00:00') AS eff_to,
           CAST(ROW_NUMBER() OVER w AS BIGINT) AS version,
           CAST(LEAD(ts) OVER w IS NULL AS BIGINT) AS is_current
    FROM starts WINDOW w AS (PARTITION BY o_custkey ORDER BY ts, tb)
    """,
)
def scd2_priority_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 dimension history (operators/cdc.scd2_history) over each
    customer's order-priority change log: consecutive unchanged
    observations collapse to one version, versions chain half-open
    [eff_from, eff_to) ranges, the open version carries the high-date
    sentinel. Both windows partition by customer — no global sort."""
    log = load(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority", "o_orderdate", "o_orderkey"
    )
    return cdc_ops.scd2_history(
        log, "o_custkey", "o_orderpriority", "o_orderdate", "o_orderkey"
    )


@register(
    "scd2_asof_lookup",
    """
    WITH log AS (
      SELECT o_custkey AS k, o_orderpriority AS attr, o_orderdate AS ts,
             o_orderkey AS tb
      FROM orders
    ),
    marked AS (
      SELECT k, attr, ts, tb,
             LAG(attr) OVER (PARTITION BY k ORDER BY ts, tb) AS prev
      FROM log
    ),
    starts AS (
      SELECT k, attr, ts,
             CAST(ROW_NUMBER() OVER (PARTITION BY k ORDER BY ts, tb)
                  AS BIGINT) AS version
      FROM marked WHERE prev IS NULL OR attr <> prev
    ),
    vlookup AS (
      SELECT k, ts, arg_max(attr, version) AS attr,
             MAX(version) AS version
      FROM starts GROUP BY k, ts
    )
    SELECT f.o_orderkey, f.o_custkey, f.o_orderdate,
           v.attr AS priority_at_order, v.version
    FROM orders f ASOF JOIN vlookup v
      ON f.o_custkey = v.k AND f.o_orderdate >= v.ts
    """,
)
def scd2_asof_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 x as-of integration — the standard dimension-lookup
    pattern: build the customer-priority SCD2 history
    (operators/cdc.scd2_history), then as-of-join each order fact to
    the version effective at its date (operators/temporal.asof_join).
    Two versions of one key can share an eff_from (two same-day orders
    flipping the attribute); their validity ranges are half-open, so
    the earlier one is empty and the LAST version at that instant
    wins — enforced by collapsing the lookup side to max-version per
    (key, eff_from) before the as-of join (asof_join requires unique
    (key, ts) on the right). Every order is itself a log entry, so
    every fact finds a version (no NULL matches) and the lookup is
    self-consistent. The oracle replays the history build with window
    functions and DuckDB's native ASOF JOIN over the same deduped
    version set. Scale: both windows and the as-of union partition by
    the customer key; no range cross-product anywhere."""
    o = load(spark, sf_dir, "orders")
    log = o.select(
        "o_custkey", "o_orderpriority", "o_orderdate", "o_orderkey"
    )
    hist = cdc_ops.scd2_history(
        log, "o_custkey", "o_orderpriority", "o_orderdate", "o_orderkey"
    )
    lookup = (
        hist.groupBy("o_custkey", "eff_from")
        .agg(
            F.max_by(
                F.struct("o_orderpriority", "version"), F.col("version")
            ).alias("__w")
        )
        .select(
            "o_custkey",
            F.col("eff_from").alias("vts"),
            F.col("__w.o_orderpriority").alias("priority_at_order"),
            F.col("__w.version").alias("version"),
        )
    )
    facts = o.select("o_orderkey", "o_custkey", "o_orderdate")
    joined = temporal_ops.asof_join(
        facts,
        lookup,
        on=["o_custkey"],
        left_ts="o_orderdate",
        right_ts="vts",
        right_prefix="",
    )
    return joined.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        "priority_at_order",
        "version",
    )


_ZORDER_PREDS = [
    (1, 0.0, 0.10, 0.0, 1.0),
    (2, 0.45, 0.55, 0.40, 0.60),
    (3, 0.0, 1.0, 0.90, 1.0),
    (4, 0.70, 0.80, 0.0, 0.20),
    (5, 0.20, 0.30, 0.60, 0.70),
    (6, 0.0, 0.50, 0.0, 0.50),
]


def _zorder_audit_sql() -> str:
    cx = layout_ops.grid_cell_sql("o_custkey", "xmin", "xmax", 256)
    cy = layout_ops.grid_cell_sql("o_totalprice", "ymin", "ymax", 256)
    z = layout_ops.interleave_bits_sql("cx", "cy", 8)
    vals = ", ".join(
        f"({p}, {a}, {b}, {c}, {d})" for p, a, b, c, d in _ZORDER_PREDS
    )
    hit = (
        "min_x <= hi_x AND max_x >= lo_x AND "
        "min_y <= hi_y AND max_y >= lo_y"
    )
    return f"""
    WITH s AS (
      SELECT MIN(o_custkey) AS xmin, MAX(o_custkey) AS xmax,
             MIN(o_totalprice) AS ymin, MAX(o_totalprice) AS ymax
      FROM orders
    ),
    cells AS (
      SELECT o_custkey, o_totalprice, {cx} AS cx, {cy} AS cy
      FROM orders, s
    ),
    zf AS (
      SELECT o_custkey, o_totalprice,
             ({z} >> 10) AS file_z, (cx >> 2) AS file_x
      FROM cells
    ),
    zones AS (
      SELECT 'zorder' AS layout, file_z AS file_id, COUNT(*) AS n_rows,
             MIN(o_custkey) AS min_x, MAX(o_custkey) AS max_x,
             MIN(o_totalprice) AS min_y, MAX(o_totalprice) AS max_y
      FROM zf GROUP BY file_z
      UNION ALL
      SELECT 'custkey_sorted', file_x, COUNT(*),
             MIN(o_custkey), MAX(o_custkey),
             MIN(o_totalprice), MAX(o_totalprice)
      FROM zf GROUP BY file_x
    ),
    preds AS (
      SELECT CAST(pred_id AS BIGINT) AS pred_id,
             xmin + fx_lo * (xmax - xmin) AS lo_x,
             xmin + fx_hi * (xmax - xmin) AS hi_x,
             ymin + fy_lo * (ymax - ymin) AS lo_y,
             ymin + fy_hi * (ymax - ymin) AS hi_y
      FROM (VALUES {vals})
           AS p(pred_id, fx_lo, fx_hi, fy_lo, fy_hi), s
    )
    SELECT z.layout, p.pred_id,
           CAST(SUM(CASE WHEN {hit} THEN 1 ELSE 0 END) AS BIGINT)
             AS files_scanned,
           CAST(SUM(CASE WHEN {hit} THEN n_rows ELSE 0 END) AS BIGINT)
             AS rows_scanned,
           COUNT(*) AS files_total,
           CAST(SUM(n_rows) AS BIGINT) AS rows_total
    FROM zones z CROSS JOIN preds p
    GROUP BY z.layout, p.pred_id
    """


@register("zorder_skipping_audit", _zorder_audit_sql())
def zorder_skipping_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Layout planning audit (operators/layout): z-order orders on
    (o_custkey, o_totalprice) into 64 quad-tree files (top 6 Morton
    bits — pure projection, no sort; a real rewrite is
    repartitionByRange on the z-value), build each layout's zone map,
    and measure parquet-style min/max skipping for a 6-predicate
    rectangular workload against the single-dimension-sorted layout.
    Everything after the scan is metadata-scale; the predicate
    workload joins broadcast."""
    o = load(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    stats = o.agg(
        F.min("o_custkey").alias("xmin"),
        F.max("o_custkey").alias("xmax"),
        F.min("o_totalprice").alias("ymin"),
        F.max("o_totalprice").alias("ymax"),
    )
    d = o.crossJoin(F.broadcast(stats))
    cx = layout_ops.grid_cell(
        F.col("o_custkey"), F.col("xmin"), F.col("xmax"), 256
    )
    cy = layout_ops.grid_cell(
        F.col("o_totalprice"), F.col("ymin"), F.col("ymax"), 256
    )
    z = layout_ops.interleave_bits(cx, cy, 8)
    filed = d.select(
        "o_custkey",
        "o_totalprice",
        F.shiftright(z, 10).alias("file_z"),
        F.shiftright(cx, 2).alias("file_x"),
    )
    dims = ["o_custkey", "o_totalprice"]
    pred_rows = arrow_local_df(
        spark,
        _ZORDER_PREDS,
        "pred_id long, fx_lo double, fx_hi double, fy_lo double, fy_hi double",
    )
    xspan = F.col("xmax") - F.col("xmin")
    yspan = F.col("ymax") - F.col("ymin")
    preds = pred_rows.crossJoin(F.broadcast(stats)).select(
        "pred_id",
        (F.col("xmin") + F.col("fx_lo") * xspan).alias("lo_o_custkey"),
        (F.col("xmin") + F.col("fx_hi") * xspan).alias("hi_o_custkey"),
        (F.col("ymin") + F.col("fy_lo") * yspan).alias("lo_o_totalprice"),
        (F.col("ymin") + F.col("fy_hi") * yspan).alias("hi_o_totalprice"),
    )
    audits = []
    for layout, file_col in (("zorder", "file_z"), ("custkey_sorted", "file_x")):
        zones = layout_ops.zone_map(filed, file_col, dims)
        audits.append(
            layout_ops.skipping_audit(zones, preds, dims).select(
                F.lit(layout).alias("layout"),
                "pred_id",
                "files_scanned",
                "rows_scanned",
                "files_total",
                "rows_total",
            )
        )
    return audits[0].unionByName(audits[1])


@register(
    "compaction_plan",
    """
    WITH inv AS (SELECT source, doc_id, n_chars AS bytes FROM documents),
    b AS (
      SELECT source, bytes,
             CAST(floor((SUM(bytes) OVER (PARTITION BY source
                           ORDER BY doc_id ROWS BETWEEN UNBOUNDED
                           PRECEDING AND CURRENT ROW) - bytes)
                        / 16384) AS BIGINT) AS bin
      FROM inv
    )
    SELECT source, bin, COUNT(*) AS n_files,
           CAST(SUM(bytes) AS BIGINT) AS total_bytes
    FROM b GROUP BY source, bin
    """,
)
def compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction work-list (operators/layout.
    compaction_plan): documents stand in for a file manifest (source =
    directory, n_chars = file bytes); sequential prefix-sum packing
    into 16 KiB bins, window partitioned per directory — the plan an
    OPTIMIZE/compaction job executes, computed from metadata only."""
    inv = load(spark, sf_dir, "documents").select(
        "source", "doc_id", F.col("n_chars").alias("bytes")
    )
    return layout_ops.compaction_plan(inv, "source", "bytes", "doc_id", 16384)


def _skew_audit_sql(key: str, table: str) -> str:
    return f"""
    SELECT '{key}' AS key_col, COUNT(*) AS n_keys,
           CAST(SUM(cnt) AS BIGINT) AS n_rows, MAX(cnt) AS max_rows,
           quantile_cont(cnt, 0.95) AS p95_rows,
           CAST(floor(1000 * MAX(cnt) / SUM(cnt)) AS BIGINT)
             AS top1_share_per_mille,
           CAST(MAX(cnt) >= 4 * (CAST(SUM(cnt) AS DOUBLE) / COUNT(*))
                AS BIGINT) AS skewed
    FROM (SELECT {key}, COUNT(*) AS cnt FROM {table} GROUP BY {key})
    """


@register(
    "join_skew_audit",
    " UNION ALL ".join(
        [
            _skew_audit_sql("l_suppkey", "lineitem"),
            _skew_audit_sql("l_orderkey", "lineitem"),
            _skew_audit_sql("o_custkey", "orders"),
        ]
    ),
)
def join_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnosis (operators/layout.skew_audit) for the
    catalog's three hottest join keys: per-key counts fold map-side,
    then the count distribution aggregates to max/p95/top-share and an
    integer-exact skew flag — the statistic that routes a join between
    plain shuffle, AQE skew split, and functions.salted_join."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    return (
        layout_ops.skew_audit(li, "l_suppkey")
        .unionByName(layout_ops.skew_audit(li, "l_orderkey"))
        .unionByName(layout_ops.skew_audit(o, "o_custkey"))
    )


@register(
    "skew_routed_join",
    """
    WITH fact AS (
      SELECT CASE WHEN l_orderkey % 100 < 90 THEN 0
                  ELSE l_orderkey % 100 END AS skew_key,
             l_quantity
      FROM lineitem
    ),
    dim AS (
      SELECT DISTINCT skew_key,
             'g' || CAST(skew_key % 7 AS VARCHAR) AS grp
      FROM fact
    )
    SELECT d.grp, COUNT(*) AS n_rows,
           CAST(CAST(SUM(CAST(f.l_quantity AS DECIMAL(12,2))) AS VARCHAR)
                AS DOUBLE) AS sum_qty
    FROM fact f JOIN dim d ON f.skew_key = d.skew_key
    GROUP BY 1
    """,
)
def skew_routed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audit-to-action skew routing (operators/layout.routed_join):
    an adversarially skewed fact key (one synthetic key holds ~90% of
    lineitem) is measured by skew_audit, the verdict routes to
    functions.salted_join (tests pin the choice and the salted plan),
    and the joined result aggregates per dim group. The oracle runs
    the plain equi-join — identical rows by salting's correctness
    contract, so the hard gate certifies the rewrite changes the
    PLAN, never the answer."""
    li = load(spark, sf_dir, "lineitem")
    key = F.col("l_orderkey") % 100
    fact = li.select(
        F.when(key < 90, F.lit(0))
        .otherwise(key)
        .cast("long")
        .alias("skew_key"),
        "l_quantity",
    )
    dim = (
        fact.select("skew_key")
        .distinct()
        .select(
            "skew_key",
            F.concat(
                F.lit("g"), (F.col("skew_key") % 7).cast("string")
            ).alias("grp"),
        )
    )
    joined = layout_ops.routed_join(fact, dim, "skew_key", salt=16)
    return joined.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
    )


@register(
    "incremental_agg_merge",
    """
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR)
                AS DOUBLE) AS sum_qty,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR)
                AS DOUBLE) / COUNT(*) AS avg_qty,
           MIN(l_shipdate) AS min_ship, MAX(l_shipdate) AS max_ship
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
)
def incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance (operators/incremental): partial
    aggregates of a historical slice and a delta slice fold into the
    exact single-pass aggregate — the oracle recomputes the one-pass
    total over the union, pinning the merge algebra (sum⊕sum, min⊕min,
    max⊕max, counts add; avg finalized from sum/count; decimal sums so
    re-fold equality is exact, not float-order-lucky)."""
    l = load(spark, sf_dir, "lineitem")
    cutoff = F.to_timestamp(F.lit("1997-01-01"))
    g = ["l_returnflag", "l_linestatus"]
    specs = {
        "sum_qty": ("sum", _dec("l_quantity")),
        "min_ship": ("min", F.col("l_shipdate")),
        "max_ship": ("max", F.col("l_shipdate")),
    }
    base = inc_ops.partial_aggs(l.where(F.col("l_shipdate") < cutoff), g, specs)
    delta = inc_ops.partial_aggs(l.where(F.col("l_shipdate") >= cutoff), g, specs)
    merged = inc_ops.merge_partials([base, delta], g, specs)
    return merged.select(
        *g,
        "n_rows",
        F.col("sum_qty").cast("double").alias("sum_qty"),
        (F.col("sum_qty").cast("double") / F.col("n_rows")).alias("avg_qty"),
        "min_ship",
        "max_ship",
    )


@register(
    "incremental_agg_cdc",
    f"""
    WITH {_SQL_CDC_CTES}
    SELECT o_custkey % 10 AS cust_bucket, COUNT(*) AS n_rows,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS VARCHAR)
                AS DOUBLE) AS sum_price,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS VARCHAR)
                AS DOUBLE) / COUNT(*) AS avg_price
    FROM merged GROUP BY 1
    """,
)
def incremental_agg_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance under CDC updates and deletes
    (operators/incremental.negate_partials + operators/cdc): the
    materialized per-bucket aggregate absorbs the shared I/U/D change
    set WITHOUT rescanning history — partials(base) ⊕ partials(new
    rows) ⊖ partials(prior rows of touched keys), where the prior
    rows come from one semi-join of base against the (small) changed
    key set. Counts and decimal sums retract exactly (a group, not
    just a monoid); min/max are non-retractable by construction and
    negate_partials refuses them. Zero-row groups drop to match a
    recompute. The oracle IS the full recompute: replay the MERGE,
    then one-pass aggregate the merged snapshot."""
    base, changes = _cdc_base_and_changes(spark, sf_dir)
    g = ["cust_bucket"]
    specs = {"sum_price": ("sum", _dec("o_totalprice"))}
    bucket = (F.col("o_custkey") % 10).alias("cust_bucket")
    latest = cdc_ops.latest_changes(changes, ["o_orderkey"])
    # prior rows of touched keys: ONE semi-join keyed on the merge key
    # (broadcast at bench scale; the change set is the small side)
    old = base.join(latest.select("o_orderkey"), "o_orderkey", "left_semi")
    new = latest.where(F.col("op") != "D").select(*base.columns)
    part = lambda df: inc_ops.partial_aggs(  # noqa: E731
        df.select(bucket, "o_totalprice"), g, specs
    )
    merged = inc_ops.merge_partials(
        [part(base), part(new), inc_ops.negate_partials(part(old), specs)],
        g,
        specs,
    ).where(F.col("n_rows") > 0)
    return merged.select(
        "cust_bucket",
        "n_rows",
        F.col("sum_price").cast("double").alias("sum_price"),
        (F.col("sum_price").cast("double") / F.col("n_rows")).alias(
            "avg_price"
        ),
    )


# Shared SQL twin of operators/text.quality_score's integer score (the
# f/q CTEs on top of the quality-features chain): stated ONCE so the
# weights can't drift between the quality_score, corpus_datacard, and
# curriculum oracles.
_SQL_QSCORE_CTES = f"""{_SQL_QF_CTES},
    f AS (
      SELECT doc_id, n_tokens,
             CAST(floor(1000 * n_punct / greatest(n_chars, 1)) AS BIGINT)
               AS punct_rate,
             CAST(floor(1000 * n_stopwords / greatest(n_tokens, 1)) AS BIGINT)
               AS stop_rate,
             CAST(floor(n_chars / greatest(n_tokens, 1)) AS BIGINT) AS mtl
      FROM m
    ),
    q AS (
      SELECT doc_id, n_tokens,
             CAST(5 * stop_rate - 2 * punct_rate - 50 * abs(mtl - 5)
                  + least(n_tokens, 256) AS BIGINT) AS quality_score
      FROM f
    )"""


@register(
    "quality_score",
    f"""
    WITH {_SQL_QSCORE_CTES}
    SELECT doc_id, quality_score,
           CASE WHEN quality_score >= 2000 THEN 'high'
                WHEN quality_score >= 800 THEN 'medium'
                ELSE 'low' END AS quality_label
    FROM q
    """,
)
def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear quality classifier (operators/text.quality_score) fused
    onto the quality-features pass — integer weights, exact labels."""
    return text_ops.quality_score(load(spark, sf_dir, "documents"))


@register(
    "event_transitions",
    """
    WITH seq AS (
      SELECT user_id, event_type AS src_type,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS dst_type
      FROM events
    ),
    cnt AS (
      SELECT src_type, dst_type, COUNT(*) AS n
      FROM seq WHERE dst_type IS NOT NULL
      GROUP BY src_type, dst_type
    )
    SELECT src_type, dst_type, n,
           CAST((n * 1000000) // SUM(n) OVER (PARTITION BY src_type)
                AS BIGINT) AS share_1e6
    FROM cnt
    """,
)
def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov transition matrix over consecutive user events:
    (src_type, dst_type, n, share_1e6) where share is the integer
    per-million conditional probability P(dst | src).

    Built on operators/temporal.event_ngrams (n=2): ONE user-keyed
    window produces every consecutive pair, the count groupBy is
    map-side combinable on a tiny (src, dst) key space, and the share
    window partitions by src_type over the already-aggregated counts
    (|event_type|² rows, metadata-scale whatever the input). Integer
    div both engines (positive counts: truncation == floor)."""
    seq = temporal_ops.event_ngrams(load(spark, sf_dir, "events"), n=2)
    cnt = (
        seq.groupBy(
            F.col("e0").alias("src_type"), F.col("e1").alias("dst_type")
        ).agg(F.count("*").alias("n"))
    )
    # DECIMAL(38,0) guard: per-transition counts x 1e6 clear int64 only
    # below ~9.2e12 events per src_type — not a given at log scale
    share = F.expr(
        "CAST(div(CAST(n AS DECIMAL(38,0)) * 1000000, "
        "sum(n) over (partition by src_type)) AS BIGINT)"
    ).alias("share_1e6")
    return cnt.select("src_type", "dst_type", "n", share)


@register(
    "event_paths_top10",
    """
    WITH seq AS (
      SELECT event_type AS e0,
             lead(event_type, 1) OVER w AS e1,
             lead(event_type, 2) OVER w AS e2
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT e0 || '>' || e1 || '>' || e2 AS path, COUNT(*) AS n
    FROM seq WHERE e2 IS NOT NULL
    GROUP BY 1 ORDER BY n DESC, path LIMIT 10
    """,
)
def event_paths_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 three-step event paths — the "common user journeys"
    query every product-analytics engine ships. Same single-window
    shape as event_transitions (operators/temporal.event_ngrams, n=3):
    n-1 lead() columns on one user-keyed sort, so path mining costs
    one shuffle however long the paths. The LIMIT sorts only the
    aggregated path histogram (|event_type|³ rows max), never raw
    events; ties break on path text for cross-engine determinism."""
    seq = temporal_ops.event_ngrams(load(spark, sf_dir, "events"), n=3)
    return (
        seq.groupBy(
            F.concat_ws(">", "e0", "e1", "e2").alias("path")
        )
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "path")
        .limit(10)
    )


@register(
    "cube_pricing",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
           COUNT(*) AS n,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR)
                AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus): every aggregate level in
    one pass, gid = SQL-standard grouping bit-vector (leftmost dim =
    MSB, identical encoding both engines) distinguishing real NULLs
    from rolled-up cells.

    Scale: Spark compiles cube to ONE Expand + hash aggregate — rows
    multiply by the 4 grouping sets BUT partial aggregation runs
    map-side per set, so the shuffle carries |groups| x 4 cells per
    mapper, not data. Complements rollup_region_nation (hierarchy)
    with the full lattice."""
    l = load(spark, sf_dir, "lineitem")
    return (
        l.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count("*").alias("n"),
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
        )
        .select("l_returnflag", "l_linestatus", "gid", "n", "sum_qty")
    )


@register(
    "fuzzy_part_pairs",
    """
    SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
    FROM part a JOIN part b
      ON a.p_size = b.p_size AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= 3
    """,
)
def fuzzy_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy self-linkage of part names: pairs within a p_size
    block at edit distance <= 3 (operators/linkage.blocked_fuzzy_pairs).

    The scale story IS the blocking: an all-pairs levenshtein join is
    n²/2 distance evaluations; the block equi-join bounds work by the
    block-size histogram and shuffles each block to one reducer. The
    threshold form levenshtein(a, b, k) stops the DP at band k. The
    reference's exact metadata joins (SURVEY §2.5) have no fuzzy
    counterpart; this is the entity-resolution primitive."""
    from clickhouse_only_importer_prototype_spark.operators.linkage import (
        blocked_fuzzy_pairs,
    )

    # NO footer pre-gate here, deliberately (round-7 measurement): the
    # _collapse_gate heuristic — "below 100k rows the probe job costs
    # more than collapse can save" — is tuned for LINEAR-cost consumers
    # (embedding matmuls, bigram folds). This operator's gated work is
    # the QUADRATIC in-block DP, so collapse pays at ANY scale once the
    # dup ratio clears the probe threshold: forcing collapse off via the
    # gate measured 2.74s vs 0.98s probed at sf0.1 (20k parts, heavily
    # duplicated names). Let the operator's own dup-ratio probe decide.
    out = blocked_fuzzy_pairs(
        load(spark, sf_dir, "part"),
        id_col="p_partkey",
        text_col="p_name",
        block_cols=["p_size"],
        max_dist=3,
        collapse=None,
    )
    return out.select("id_a", "id_b", F.col("dist").cast("long").alias("dist"))


@register(
    "tfidf_top_terms",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split({_SQL_NORM}, ' ')) AS term
      FROM documents
    ),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf
      FROM toks WHERE term != '' GROUP BY doc_id, term
    ),
    dfreq AS (SELECT term, COUNT(*) AS doc_freq FROM tf GROUP BY term),
    scored AS (
      SELECT t.doc_id, t.term, t.tf, d.doc_freq,
             (t.tf * 1000000) // d.doc_freq AS score_1e6
      FROM tf t JOIN dfreq d ON t.term = d.term
    )
    SELECT doc_id, term, tf, doc_freq, score_1e6, rank FROM (
      SELECT *, row_number() OVER (
        PARTITION BY doc_id ORDER BY score_1e6 DESC, term
      ) AS rank
      FROM scored
    ) WHERE rank <= 3
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 distinguishing terms by integer TF-rarity
    score (operators/text.rarity_top_terms) — the keyword-extraction
    pass of a corpus exploration pipeline, log-free so both engines
    produce bit-identical scores (see operator docstring)."""
    return text_ops.rarity_top_terms(_sload(spark, sf_dir, "documents"), k=3)


@register(
    "price_histogram",
    """
    SELECT bucket,
           0.0 + bucket * 25000.0 AS lo_edge,
           COUNT(*) AS n,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR)
                AS DOUBLE) AS total
    FROM (
      SELECT o_totalprice,
             least(greatest(CAST(floor(o_totalprice / 25000.0) AS BIGINT),
                            0), 19) AS bucket
      FROM orders WHERE o_totalprice IS NOT NULL
    )
    GROUP BY bucket
    """,
)
def price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width 20-bucket histogram of order totals
    (operators/profile.fixed_width_histogram): ONE map-side-combinable
    groupBy — the shuffle carries <= 20 cells per mapper whatever the
    table size. Fixed edges, so no quantile pre-pass; the profiling
    companion to customer_spend_deciles (which ranks instead)."""
    from clickhouse_only_importer_prototype_spark.operators.profile import (
        fixed_width_histogram,
    )

    return fixed_width_histogram(
        load(spark, sf_dir, "orders"),
        col="o_totalprice",
        width=25000.0,
        lo=0.0,
        n_buckets=20,
    )


@register(
    "token_budget_sample",
    f"""
    WITH tk AS (
      SELECT doc_id, source,
             CASE WHEN {_SQL_NORM} = '' THEN 0
                  ELSE CAST(len(string_split({_SQL_NORM}, ' ')) AS BIGINT)
             END AS n_tokens,
             md5('budget-v1:' || CAST(doc_id AS VARCHAR)) AS h
      FROM documents
    ),
    c AS (
      SELECT doc_id, source, n_tokens,
             CAST(SUM(n_tokens) OVER (
               PARTITION BY source ORDER BY h, doc_id
               ROWS UNBOUNDED PRECEDING
             ) AS BIGINT) AS cum_tokens
      FROM tk
    )
    SELECT doc_id, source, n_tokens, cum_tokens
    FROM c WHERE cum_tokens <= 20000
    """,
)
def token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source TOKEN-budget capping
    (operators/sampling.token_budget_per_group): keep the greedy
    prefix of each source's salted-hash order while the running token
    total stays within 20k — mixture weights for training corpora are
    token budgets, not document counts. Same one-shuffle window shape
    as source_quota_sample; the stop rule sums tokens instead of
    counting rows."""
    docs = load(spark, sf_dir, "documents")
    with_tokens = docs.select(
        "doc_id", "source", text_ops.token_count(F.col("text")).alias("n_tokens")
    )
    return sampling_ops.token_budget_per_group(
        with_tokens, budget_tokens=20_000, token_col="n_tokens"
    ).select("doc_id", "source", "n_tokens", "cum_tokens")


@register(
    "split_leakage_audit",
    f"""
    WITH toks AS (
      SELECT doc_id, string_split({_SQL_NORM}, ' ') AS t FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id,
             t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
      FROM toks, UNNEST(range(1, greatest(len(t) - 1, 1))) AS u(i)
      WHERE len(t) >= 3
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter_size
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ),
    pairs AS (
      SELECT i.doc_a, i.doc_b
      FROM inter i JOIN sizes sa ON i.doc_a = sa.doc_id
                   JOIN sizes sb ON i.doc_b = sb.doc_id
      WHERE floor(1000.0 * i.inter_size
                  / (sa.set_size + sb.set_size - i.inter_size)) >= 800
    ),
    sp AS (
      SELECT doc_id,
             CASE WHEN {_SQL_HASH_BUCKET.format(salt="split-v1")} < 9000
                    THEN 'train'
                  WHEN {_SQL_HASH_BUCKET.format(salt="split-v1")} < 9500
                    THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    )
    SELECT sa.split AS split_a, sb.split AS split_b,
           COUNT(*) AS n_pairs,
           CAST(SUM(CASE WHEN sa.split != sb.split THEN 1 ELSE 0 END)
                AS BIGINT) AS n_cross
    FROM pairs p JOIN sp sa ON p.doc_a = sa.doc_id
                 JOIN sp sb ON p.doc_b = sb.doc_id
    GROUP BY sa.split, sb.split
    """,
)
def split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test contamination audit: near-dup pairs (the exact
    0.8-Jaccard graph dedup_ngram_jaccard oracles) bucketed by the
    split assignment of each endpoint — a nonzero n_cross on a
    (train, test) row is leakage: the eval set contains near-copies
    of training documents. The standard pre-release check on any
    LLM data pipeline, composed from two already-verified operators
    (operators/dedup.ngram_jaccard_pairs x
    operators/sampling.hash_split).

    Scale: the pair graph is the expensive part and it is the SAME
    banded/prefix-filtered shape as the dedup family (no new shuffle
    beyond two slim split-assignment joins, both broadcastable — the
    split frame is two columns)."""
    docs = load(spark, sf_dir, "documents")
    pairs = dedup_ops.ngram_jaccard_pairs(docs, n=3, threshold=0.8).select(
        "doc_a", "doc_b"
    )
    splits = sampling_ops.hash_split(
        docs.select("doc_id"),
        weights={"train": 0.9, "val": 0.05, "test": 0.05},
    ).select("doc_id", "split")
    j = (
        pairs.join(
            splits.select(
                F.col("doc_id").alias("doc_a"), F.col("split").alias("split_a")
            ),
            "doc_a",
        ).join(
            splits.select(
                F.col("doc_id").alias("doc_b"), F.col("split").alias("split_b")
            ),
            "doc_b",
        )
    )
    return j.groupBy("split_a", "split_b").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum((F.col("split_a") != F.col("split_b")).cast("long")).alias(
            "n_cross"
        ),
    )


@register(
    "incremental_join_delta",
    f"""
    SELECT o.o_orderpriority,
           COUNT(*) AS n,
           CAST(CAST(SUM({_SQL_REV.replace('l_', 'l.l_')}) AS VARCHAR)
                AS DOUBLE) AS revenue
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def incremental_join_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental JOIN maintenance (operators/incremental.join_delta):
    both orders and lineitem are split into a base and an append delta
    (orderkey % 7 == 0); the maintained result = old base⋈base pairs ∪
    join_delta's three terms (base⋈dR, dL⋈base, dL⋈dR), folded to the
    per-priority revenue rollup. The oracle recomputes the FULL join —
    equality proves the delta decomposition is exact, the materialized-
    view contract that lets a 100 TB fact join absorb daily appends
    while only ever joining history against the delta (key-partitioned
    both sides: each delta partition probes one base partition)."""
    is_delta = F.col("o_orderkey") % 7 == 0
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    l = load(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"),
        _revenue().alias("__rev"),
    )
    base_o, delta_o = o.where(~is_delta), o.where(is_delta)
    base_l, delta_l = l.where(~is_delta), l.where(is_delta)
    old = base_o.join(base_l, "o_orderkey")
    new = inc_ops.join_delta(base_o, delta_o, base_l, delta_l, "o_orderkey")
    return (
        old.unionByName(new)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("__rev").cast("double").alias("revenue"),
        )
    )


@register(
    "incremental_dedup_delta",
    f"""
    WITH f AS (
      SELECT doc_id, md5({_SQL_NORM}) AS fp FROM documents
    ),
    hist AS (SELECT DISTINCT fp FROM f WHERE doc_id % 5 != 0),
    delta AS (SELECT doc_id, fp FROM f WHERE doc_id % 5 = 0)
    SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id, fp
    FROM delta d
    WHERE NOT EXISTS (SELECT 1 FROM hist h WHERE h.fp = d.fp)
    GROUP BY fp
    """,
)
def incremental_dedup_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental exact dedup of an append slice against corpus
    history: delta docs (doc_id % 5 == 0) keep one representative per
    fingerprint (min doc_id) and drop any fingerprint history already
    holds — the daily-crawl admission check, batch twin of the
    streaming ingest_dedup.

    Scale: history is touched as a DISTINCT fingerprint projection
    only (at 100 TB that is the maintained dedup index, not a corpus
    rescan), the anti-join is on the md5 key both sides aggregate by
    (skew-free), and the within-delta collapse is a map-side partial
    min. Nothing here scales with |history| except the index probe."""
    from clickhouse_only_importer_prototype_spark.streaming.dedup import (
        with_fingerprint,
    )

    docs = load(spark, sf_dir, "documents")
    fp = with_fingerprint(docs).select("doc_id", F.col("__fp").alias("fp"))
    hist = fp.where(F.col("doc_id") % 5 != 0).select("fp").distinct()
    delta = fp.where(F.col("doc_id") % 5 == 0)
    return (
        delta.join(hist, "fp", "left_anti")
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id", "fp")
    )


@register(
    "events_ohlc_hourly",
    f"""
    WITH b AS (
      SELECT event_type,
             {ORACLE_FLOORDIV('epoch_ns(ts)', 3600000000000)} AS bucket,
             value, epoch_ns(ts) AS tns, event_id
      FROM events
    ),
    r AS (
      SELECT *,
             row_number() OVER (PARTITION BY event_type, bucket
                                ORDER BY tns, event_id) AS rn_a,
             row_number() OVER (PARTITION BY event_type, bucket
                                ORDER BY tns DESC, event_id DESC) AS rn_d
      FROM b
    )
    SELECT event_type, bucket,
           MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
           COUNT(*) AS n_events
    FROM r GROUP BY event_type, bucket
    """,
)
def events_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC candles per event type
    (operators/temporal.ohlc_bars): open/close via min_by/max_by on
    the lexicographic (ts, event_id) struct — ONE map-side-combinable
    aggregate, no ROW_NUMBER shuffle (the oracle's window formulation
    is the semantic spec, not the plan). All four prices SELECT input
    doubles, so values cross engines bit-identically."""
    ev = load(spark, sf_dir, "events").select(
        "event_type", "ts", "event_id", "value"
    )
    return temporal_ops.ohlc_bars(ev, ["event_type"])


@register(
    "events_twap_hourly",
    f"""
    WITH b AS (
      SELECT event_type,
             {ORACLE_FLOORDIV('epoch_ns(ts)', 3600000000000)} AS bucket,
             CAST(value AS DECIMAL(14,2)) AS v,
             epoch_ns(ts) AS tns, event_id
      FROM events
    ),
    d AS (
      SELECT event_type, bucket, v,
             COALESCE(lead(tns) OVER (PARTITION BY event_type, bucket
                                      ORDER BY tns, event_id),
                      (bucket + 1) * 3600000000000) - tns AS dur
      FROM b
    )
    SELECT event_type, bucket,
           CAST(CAST(SUM(v * dur) AS VARCHAR) AS DOUBLE)
             / CAST(CAST(SUM(dur) AS VARCHAR) AS DOUBLE) AS twap,
           CAST(SUM(dur) AS BIGINT) AS dur_ns_total,
           COUNT(*) AS n_events
    FROM d GROUP BY event_type, bucket
    """,
)
def events_twap_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly time-weighted average value per event type
    (operators/temporal.twap): each observation holds until the next
    in its bucket, the last to the bucket end. The weighted sum runs
    in exact DECIMAL x int64-nanos (a double sum would be
    partition-order-dependent), and the final division is
    double-by-double of exact numbers — bit-identical cross-engine."""
    ev = load(spark, sf_dir, "events").select(
        "event_type", "ts", "event_id", "value"
    )
    return temporal_ops.twap(ev, ["event_type"], _dec("value", 14, 2))


@register(
    "fuzzy_part_clusters",
    """
    WITH RECURSIVE fpairs AS (
      SELECT a.p_partkey AS doc_a, b.p_partkey AS doc_b
      FROM part a JOIN part b
        ON a.p_size = b.p_size AND a.p_partkey < b.p_partkey
      WHERE levenshtein(a.p_name, b.p_name) <= 3
    ),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM fpairs
      UNION ALL
      SELECT doc_b AS src, doc_a AS dst FROM fpairs
    ),
    reach(a, b) AS (
      SELECT src, src FROM edges
      UNION
      SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src
    )
    SELECT CAST(a AS BIGINT) AS p_partkey, CAST(MIN(b) AS BIGINT) AS cluster_id
    FROM reach GROUP BY a
    """,
)
def fuzzy_part_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution end game: connected components over the
    blocked fuzzy pair graph
    (operators/linkage.blocked_fuzzy_clusters) — each cluster is one
    resolved catalog entity, cluster_id = min member key. Components
    run over the REPRESENTATIVE graph (one edge per distinct
    (block, text) pair, members inherit) so a replicated catalog with
    100x the member edges costs the same CC; the oracle is the
    transitive closure of the full expanded pair graph, certifying
    the rep-level shortcut exact."""
    from clickhouse_only_importer_prototype_spark.operators.linkage import (
        blocked_fuzzy_clusters,
    )

    return blocked_fuzzy_clusters(
        load(spark, sf_dir, "part"),
        id_col="p_partkey",
        text_col="p_name",
        block_cols=["p_size"],
        max_dist=3,
    ).select(F.col("doc_id").alias("p_partkey"), "cluster_id")


@register(
    "quantile_sketch_audit",
    """
    SELECT o_orderpriority,
           quantile_cont(o_totalprice, 0.50) AS p50_exact,
           COUNT(*) AS n_orders,
           TRUE AS approx_within_5pct
    FROM orders GROUP BY o_orderpriority
    """,
)
def quantile_sketch_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-accuracy certification for approximate percentiles, the
    same in-engine audit pattern as hll_distinct_audit/ann_recall_check:
    the exact per-group median (cross-engine oracled) rides alongside a
    percentile_approx(0.5, accuracy=10000) estimate, and the gate
    asserts the sketch landed within 5% of truth. At 100 TB the
    t-digest/GK sketch (fixed-size mergeable state, no per-group sort)
    is the production path and THIS query is the evidence it is safe
    to switch — rank error at accuracy 10000 is orders of magnitude
    inside the 5%-of-value tolerance."""
    o = load(spark, sf_dir, "orders")
    agg = o.groupBy("o_orderpriority").agg(
        F.percentile("o_totalprice", 0.5).alias("p50_exact"),
        F.count("*").alias("n_orders"),
        F.percentile_approx("o_totalprice", 0.5, 10_000).alias("__approx"),
    )
    within = (
        F.abs(F.col("__approx") - F.col("p50_exact"))
        <= 0.05 * F.abs(F.col("p50_exact"))
    ).alias("approx_within_5pct")
    return agg.select("o_orderpriority", "p50_exact", "n_orders", within)


@register(
    "price_outliers_mad",
    """
    WITH med AS (
      SELECT o_orderpriority,
             quantile_cont(o_totalprice, 0.50) AS median
      FROM orders GROUP BY o_orderpriority
    ),
    dev AS (
      SELECT o.o_orderpriority, m.median,
             abs(o.o_totalprice - m.median) AS adev
      FROM orders o JOIN med m ON o.o_orderpriority = m.o_orderpriority
    ),
    mad AS (
      SELECT o_orderpriority, median,
             quantile_cont(adev, 0.50) AS mad
      FROM dev GROUP BY o_orderpriority, median
    )
    SELECT d.o_orderpriority,
           m.median,
           m.mad,
           COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN d.adev > 3.0 * 1.4826 * m.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM dev d JOIN mad m ON d.o_orderpriority = m.o_orderpriority
    GROUP BY d.o_orderpriority, m.median, m.mad
    """,
)
def price_outliers_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier audit per group
    (operators/profile.mad_outlier_stats): |x - median| > 3 scaled
    MADs (median absolute deviation x 1.4826, the normal-consistency
    constant) — the data-quality screen that, unlike mean/stddev
    z-scores, is not dragged by the outliers it is hunting. The
    uniform-price fixture legitimately reports zero outliers; the
    planted-outlier counting branch is pinned by unit test. All
    comparisons are double arithmetic on identical inputs, so outlier
    memberships agree bit-for-bit cross-engine (percentile
    interpolation parity proven by priority_quantiles)."""
    from clickhouse_only_importer_prototype_spark.operators.profile import (
        mad_outlier_stats,
    )

    return mad_outlier_stats(
        load(spark, sf_dir, "orders"), "o_orderpriority", "o_totalprice"
    )


@register(
    "source_similarity",
    f"""
    WITH sh AS (
      SELECT DISTINCT source, shingle FROM (
        SELECT source, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
        FROM (SELECT source, string_split({_SQL_NORM}, ' ') AS t
              FROM documents),
             UNNEST(range(1, greatest(len(t) - 1, 1))) AS u(i)
        WHERE len(t) >= 3
      )
    ),
    sizes AS (SELECT source, COUNT(*) AS set_size FROM sh GROUP BY source),
    inter AS (
      SELECT a.source AS source_a, b.source AS source_b,
             COUNT(*) AS inter_size
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.source < b.source
      GROUP BY a.source, b.source
    )
    SELECT i.source_a, i.source_b, i.inter_size,
           sa.set_size AS size_a, sb.set_size AS size_b,
           CAST(floor(1000.0 * i.inter_size
                      / (sa.set_size + sb.set_size - i.inter_size))
                AS BIGINT) AS jaccard_per_1000
    FROM inter i JOIN sizes sa ON i.source_a = sa.source
                 JOIN sizes sb ON i.source_b = sb.source
    """,
)
def source_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-composition analytics: pairwise word-3-gram Jaccard
    between SOURCES (domains) — the "how much does crawl A overlap
    crawl B" question that drives mixture design and dedup-order
    decisions. Every source pair appears (no threshold): the full
    similarity matrix is |sources|²/2 rows, metadata-scale.

    Scale shape: one shingle explode reduced to DISTINCT
    (source, shingle) — the per-source vocabulary, the frame that
    matters at 100 TB — then a self-equi-join on shingle whose
    fan-out is bounded by |sources|² per shingle (sources are
    catalog-scale, hundreds not millions), folded by map-side
    combinable counts. No doc-level pairs anywhere."""
    docs = load(spark, sf_dir, "documents").select(
        F.col("source").alias("doc_id"), "text"
    )
    # referenced 3x (set sizes + both self-join sides, which shuffle
    # on DIFFERENT keys so no ReusedExchange applies); the persist
    # runs the explode->distinct once. This per-source vocabulary is
    # the corpus-reduced frame — tiny next to documents at any scale.
    sh = dedup_ops.shingles(docs, "text", 3).select(
        F.col("doc_id").alias("source"), "shingle"
    ).distinct().persist()
    sizes = sh.groupBy("source").agg(F.count("*").alias("set_size"))
    a = sh.select(F.col("source").alias("source_a"), "shingle")
    b = sh.select(F.col("source").alias("source_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").alias("inter_size"))
    )
    return (
        inter.join(
            F.broadcast(
                sizes.select(
                    F.col("source").alias("source_a"),
                    F.col("set_size").alias("size_a"),
                )
            ),
            "source_a",
        )
        .join(
            F.broadcast(
                sizes.select(
                    F.col("source").alias("source_b"),
                    F.col("set_size").alias("size_b"),
                )
            ),
            "source_b",
        )
        .select(
            "source_a",
            "source_b",
            "inter_size",
            "size_a",
            "size_b",
            F.floor(
                1000.0
                * F.col("inter_size")
                / (F.col("size_a") + F.col("size_b") - F.col("inter_size"))
            )
            .cast("long")
            .alias("jaccard_per_1000"),
        )
    )


def _pagerank_oracle_sql(iterations: int = 3) -> str:
    """Unrolled-K DuckDB twin of operators/graph.pagerank_int — exact
    int64 fixed-point, so the CTE chain is bit-identical to the Spark
    join-agg loop (non-negative operands: DuckDB ``//`` == Spark
    ``div``)."""
    parts = [
        """
    WITH edges AS (
      SELECT DISTINCT o.o_custkey * 2 AS src, l.l_suppkey * 2 + 1 AS dst
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ),
    sym AS (
      SELECT src, dst FROM edges
      UNION ALL
      SELECT dst AS src, src AS dst FROM edges
    ),
    deg AS (SELECT src, COUNT(*) AS outdeg FROM sym GROUP BY src),
    nn AS (SELECT COUNT(*) AS n FROM deg),
    r0 AS (
      SELECT d.src AS node, 1000000000000 // nn.n AS rank
      FROM deg d CROSS JOIN nn
    )"""
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f""",
    r{i} AS (
      SELECT s.dst AS node,
             (15 * 1000000000000) // (100 * nn.n)
               + (85 * SUM(r.rank // d.outdeg)) // 100 AS rank
      FROM sym s JOIN r{i - 1} r ON s.src = r.node
                 JOIN deg d ON d.src = s.src
                 CROSS JOIN nn
      GROUP BY s.dst, nn.n
    )"""
        )
    parts.append(
        f"""
    SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
             AS node_type,
           CAST(node // 2 AS BIGINT) AS node_key,
           CAST(rank AS BIGINT) AS rank_1e12
    FROM r{iterations}
    ORDER BY rank_1e12 DESC, node_type, node_key
    LIMIT 20
    """
    )
    return "".join(parts)


def _custsupp_arcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetrized customer<->supplier trade graph shared by both
    PageRank variants: edges = distinct trading pairs via orders x
    lineitem; node ids custkey*2 / suppkey*2+1."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    return graph_ops.symmetrize(edges)


def _pagerank_top20(ranks: DataFrame) -> DataFrame:
    """Shared output contract: decode node ids, top-20 by rank."""
    return (
        ranks.select(
            F.when(F.col("node") % 2 == 0, F.lit("customer"))
            .otherwise(F.lit("supplier"))
            .alias("node_type"),
            F.expr("node div 2").cast("long").alias("node_key"),
            F.col("rank").cast("long").alias("rank_1e12"),
        )
        .orderBy(F.desc("rank_1e12"), "node_type", "node_key")
        .limit(20)
    )


def _ppr_oracle_sql(iterations: int = 3) -> str:
    """Unrolled twin of the PERSONALIZED variant: teleport mass
    restricted to the seed customers (custkey % 19 == 0 among graph
    nodes) — same exact int64 chain, base term gated per node."""
    parts = [
        """
    WITH edges AS (
      SELECT DISTINCT o.o_custkey * 2 AS src, l.l_suppkey * 2 + 1 AS dst
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ),
    sym AS (
      SELECT src, dst FROM edges
      UNION ALL
      SELECT dst AS src, src AS dst FROM edges
    ),
    deg AS (SELECT src, COUNT(*) AS outdeg FROM sym GROUP BY src),
    seeds AS (
      SELECT src AS node FROM deg
      WHERE src % 2 = 0 AND (src // 2) % 19 = 0
    ),
    ns AS (SELECT COUNT(*) AS n FROM seeds),
    r0 AS (
      SELECT d.src AS node,
             CASE WHEN s.node IS NOT NULL
                  THEN 1000000000000 // ns.n
                  ELSE CAST(0 AS BIGINT) END AS rank
      FROM deg d LEFT JOIN seeds s ON s.node = d.src CROSS JOIN ns
    )"""
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f""",
    r{i} AS (
      SELECT t.node,
             CASE WHEN s.node IS NOT NULL
                  THEN (15 * 1000000000000) // (100 * ns.n)
                  ELSE CAST(0 AS BIGINT) END + t.damp AS rank
      FROM (
        SELECT sm.dst AS node,
               (85 * SUM(r.rank // d.outdeg)) // 100 AS damp
        FROM sym sm JOIN r{i - 1} r ON sm.src = r.node
                    JOIN deg d ON d.src = sm.src
        GROUP BY sm.dst
      ) t LEFT JOIN seeds s ON s.node = t.node CROSS JOIN ns
    )"""
        )
    parts.append(
        f"""
    SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
             AS node_type,
           CAST(node // 2 AS BIGINT) AS node_key,
           CAST(rank AS BIGINT) AS rank_1e12
    FROM r{iterations}
    ORDER BY rank_1e12 DESC, node_type, node_key
    LIMIT 20
    """
    )
    return "".join(parts)


@register("pagerank_personalized", _ppr_oracle_sql(3))
def pagerank_personalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank: teleport restricted to seed customers
    (custkey % 19 == 0) — ranks measure proximity to the seed set,
    the 'suppliers my customer segment actually trades near' /
    related-entity recommendation shape, vs pagerank_custsupp's
    global centrality. Same exact int64 fixed-point chain; the seed
    gating adds one broadcast flag join per iteration and nothing
    else changes shape (operators/graph.pagerank_int seeds=...)."""
    arcs = _custsupp_arcs(spark, sf_dir)
    seeds = (
        arcs.select(F.col("src").alias("node"))
        .distinct()
        .where(
            (F.col("node") % 2 == 0) & (F.expr("div(node, 2)") % 19 == 0)
        )
    )
    return _pagerank_top20(
        graph_ops.pagerank_int(arcs, iterations=3, seeds=seeds)
    )


@register("pagerank_custsupp", _pagerank_oracle_sql(3))
def pagerank_custsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 PageRank nodes of the customer<->supplier trade graph
    (edges = distinct trading pairs via orders x lineitem, symmetrized;
    node ids: custkey*2 / suppkey*2+1). 3 iterations of exact int64
    fixed-point PageRank (operators/graph.pagerank_int) — the
    iterative-algorithm class with a HARD oracle (the DuckDB twin
    unrolls the same 3 iterations; integer arithmetic kills
    float-summation-order drift).

    Scale: the textbook distributed PageRank — edges partitioned once
    by src and persisted, each iteration shuffles only the |V|-row rank
    vector + a map-side-combinable groupBy(dst); ranks are
    localCheckpointed per iteration so lineage stays O(1). The final
    top-20 sorts |V| rows, not edges."""
    return _pagerank_top20(
        graph_ops.pagerank_int(
            _custsupp_arcs(spark, sf_dir), iterations=3
        )
    )


@register(
    "copurchase_triangles",
    """
    WITH e AS (
      SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
      FROM lineitem l1 JOIN lineitem l2
        ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
    ),
    tri AS (
      SELECT COUNT(*) AS n_triangles
      FROM e e1 JOIN e e2 ON e2.a = e1.b
                JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    deg AS (
      SELECT v, COUNT(*) AS d FROM (
        SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e
      ) GROUP BY v
    ),
    w AS (
      SELECT CAST(SUM(d) // 2 AS BIGINT) AS n_edges,
             CAST(SUM(d * (d - 1)) // 2 AS BIGINT) AS n_wedges
      FROM deg
    )
    SELECT w.n_edges, w.n_wedges, CAST(tri.n_triangles AS BIGINT)
             AS n_triangles,
           CAST((3 * tri.n_triangles * 1000000)
                // GREATEST(w.n_wedges, 1) AS BIGINT) AS clustering_1e6
    FROM w CROSS JOIN tri
    """,
)
def copurchase_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count + global clustering coefficient of the co-purchase
    part graph (parts sharing an order). The graph-motif class: edges
    oriented low<high so each triangle is generated once and two-path
    expansion is bounded by FORWARD degree — the standard skew guard
    that keeps hub nodes from materializing |in|x|out| pairs
    (operators/graph.triangle_stats).

    Scale: the two-path join shuffles oriented edges twice on single
    part keys; wedge counts come from one degree aggregation. No
    all-pairs stage; output is one row."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    l2 = li.select(
        F.col("l_orderkey").alias("r_orderkey"),
        F.col("l_partkey").alias("r_partkey"),
    )
    pairs = (
        li.join(l2, li["l_orderkey"] == l2["r_orderkey"])
        .where(F.col("l_partkey") < F.col("r_partkey"))
        .select(F.col("l_partkey").alias("a"), F.col("r_partkey").alias("b"))
    )
    edges = graph_ops.oriented_edges(pairs)
    return graph_ops.triangle_stats(edges)


def _kmeans_oracle_sql(k: int = 8, iterations: int = 2) -> str:
    """Unrolled DuckDB twin of similarity.kmeans_assign_int. The
    centroid update must FLOOR (Python ``//``), and DuckDB's integer
    ``//`` truncates, so the update applies the remainder-sign
    correction; costs/assignments use non-negative comparisons only."""
    parts = [
        f"""
    WITH qx AS (
      SELECT vec_id, embedding,
             unnest(generate_series(1, len(embedding))) AS i
      FROM embeddings
    ),
    q AS (
      SELECT vec_id, i AS dim,
             CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT)
               AS v
      FROM qx
    ),
    c0 AS (
      SELECT vec_id AS cluster, dim, v FROM q
      WHERE vec_id IN (SELECT vec_id FROM embeddings
                       ORDER BY vec_id LIMIT {k})
    )"""
    ]
    prev = "c0"
    for i in range(1, iterations + 1):
        parts.append(
            f""",
    d{i} AS (
      SELECT q.vec_id, c.cluster,
             SUM((q.v - c.v) * (q.v - c.v)) AS cost
      FROM q JOIN {prev} c USING (dim)
      GROUP BY q.vec_id, c.cluster
    ),
    a{i} AS (
      SELECT vec_id, cluster FROM (
        SELECT vec_id, cluster,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY cost, cluster) AS rn
        FROM d{i}
      ) WHERE rn = 1
    ),
    c{i} AS (
      SELECT a.cluster, q.dim,
             CAST(SUM(q.v) // COUNT(*)
                  - CASE WHEN SUM(q.v) % COUNT(*) < 0 THEN 1 ELSE 0 END
                  AS BIGINT) AS v
      FROM a{i} a JOIN q ON q.vec_id = a.vec_id
      GROUP BY a.cluster, q.dim
    )"""
        )
        prev = f"c{i}"
    parts.append(
        f""",
    fin AS (
      SELECT q.vec_id, c.cluster,
             SUM((q.v - c.v) * (q.v - c.v)) AS cost
      FROM q JOIN {prev} c USING (dim)
      GROUP BY q.vec_id, c.cluster
    )
    SELECT vec_id, CAST(cluster AS BIGINT) AS cluster FROM (
      SELECT vec_id, cluster,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY cost, cluster) AS rn
      FROM fin
    ) WHERE rn = 1
    """
    )
    return "".join(parts)


@register("kmeans_embeddings", _kmeans_oracle_sql(8, 2))
def kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-integer Lloyd k-means assignments (k=8, 2 updates) over
    the embeddings table — the iterative-ML class with a hard oracle
    (similarity.kmeans_assign_int: int64 quantized dims, argmin ties to
    lowest cluster id, floor-mean updates; the DuckDB twin unrolls the
    same two iterations). The dup-ratio probe is footer-pre-gated
    (_collapse_gate): toy corpora never pay the probe jobs.

    Scale: centroids are driver-side (k x dim cells per iteration),
    assignment is a broadcast arrow matmul over the corpus — data never
    shuffles; the update aggregation is map-side combinable on
    (cluster, dim)."""
    emb = load(spark, sf_dir, "embeddings")
    return sim_ops.kmeans_assign_int(
        emb, k=8, iters=2, collapse=_collapse_gate(sf_dir, "embeddings")
    )


@register(
    "events_cusum",
    """
    WITH e AS (
      SELECT event_type AS key, epoch_ns(ts) AS t, event_id,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    tgt AS (
      SELECT key, CAST(SUM(cents) // COUNT(*) AS BIGINT) AS target_cents
      FROM e GROUP BY key
    ),
    c1 AS (
      SELECT e.key, tgt.target_cents, e.t, e.event_id,
             SUM(e.cents - tgt.target_cents) OVER (
               PARTITION BY e.key ORDER BY e.t, e.event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
      FROM e JOIN tgt USING (key)
    ),
    c2 AS (
      SELECT key, target_cents, c,
             MIN(c) OVER w AS cmin, MAX(c) OVER w AS cmax
      FROM c1
      WINDOW w AS (PARTITION BY key ORDER BY t, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    d AS (
      SELECT key, target_cents,
             c - LEAST(0, cmin) AS pos,
             GREATEST(0, cmax) - c AS neg
      FROM c2
    )
    SELECT key, target_cents, COUNT(*) AS n,
           CAST(MAX(pos) AS BIGINT) AS max_pos_drift,
           CAST(MAX(neg) AS BIGINT) AS max_neg_drift,
           CAST(SUM(CASE WHEN pos > 5000 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_pos_alerts,
           CAST(SUM(CASE WHEN neg > 5000 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_neg_alerts
    FROM d GROUP BY key, target_cents
    """,
)
def events_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided CUSUM drift screen per event_type over integer cents
    (operators/temporal.cusum_drift). The sequential max(0, s+x)
    recurrence is linearized to two prefix windows (c - min-prefix /
    max-prefix - c), so the detector is pure window algebra — exact
    int64, hard-oracled.

    Scale: one tiny per-key mean agg broadcast back + one
    key-partitioned window scan; series parallelize across executors."""
    e = load(spark, sf_dir, "events")
    return temporal_ops.cusum_drift(
        e, key_col="event_type", ts_col="ts", tiebreak_col="event_id",
        threshold_cents=5_000,
    )


@register(
    "doc_chunks",
    """
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    x AS (
      SELECT doc_id, toks,
             unnest(generate_series(0, greatest(len(toks) - 1, 0), 24)) AS i
      FROM t
    ),
    s AS (
      SELECT doc_id, toks,
             CAST(i AS BIGINT) AS start,
             CAST(i // 24 AS BIGINT) AS chunk_idx
      FROM x
    )
    SELECT doc_id, chunk_idx, start,
           CAST(LEAST(32, len(toks) - start) AS BIGINT) AS n_tokens,
           array_to_string(toks[start + 1 : start + 32], ' ') AS chunk_text
    FROM s
    """,
)
def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (32-token chunks, stride 24)
    — the RAG / context-prep step (operators/text.chunk_documents).
    Row-local JVM codegen: split + sequence + posexplode + slice, zero
    shuffles, zero Python; output duplication = chunk/stride."""
    docs = load(spark, sf_dir, "documents")
    return text_ops.chunk_documents(
        docs, text_col="text", id_col="doc_id", chunk_size=32, stride=24
    )


@register(
    "inverted_index",
    """
    WITH x AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token
      FROM documents
    ),
    pairs AS (SELECT DISTINCT doc_id, token FROM x),
    g AS (
      SELECT token, COUNT(*) AS df_docs,
             list(doc_id ORDER BY doc_id) AS postings
      FROM pairs GROUP BY token
    )
    SELECT token, CAST(df_docs AS BIGINT) AS df_docs,
           array_to_string(postings[1:20], ',') AS sample_postings
    FROM g ORDER BY df_docs DESC, token LIMIT 50
    """,
)
def inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build (token -> document-frequency + first-20
    posting list), top-50 tokens by df — the IR-side primitive behind
    decontamination and TF-IDF. Postings are sorted doc_ids truncated
    to a bounded sample so the output row stays O(1) however hot the
    token (no unbounded collect_list shipping a stopword's full
    posting list through the shuffle... the cap applies after
    aggregation; at 100 TB swap collect_list for a bounded
    min-k sketch — documented trade at this SF).

    Scale: explode -> DISTINCT (the per-doc vocabulary fold, map-side
    combinable) -> one groupBy(token); the final top-50 sorts the
    token histogram only."""
    docs = load(spark, sf_dir, "documents")
    pairs = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    ).distinct()
    return (
        pairs.groupBy("token")
        .agg(
            F.count("*").alias("df_docs"),
            F.array_join(
                F.transform(
                    F.slice(F.sort_array(F.collect_list("doc_id")), 1, 20),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("sample_postings"),
        )
        .orderBy(F.desc("df_docs"), "token")
        .limit(50)
    )


@register(
    "attribution_last_touch",
    """
    WITH p AS (
      SELECT user_id, epoch_ns(ts) AS t,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ),
    tch AS (
      SELECT user_id, epoch_ns(ts) AS t, MAX(event_type) AS touch
      FROM events WHERE event_type IN ('click', 'view', 'signup')
      GROUP BY user_id, epoch_ns(ts)
    ),
    j AS (
      SELECT p.user_id, p.t, p.cents, tc.t AS tt, tc.touch
      FROM p ASOF LEFT JOIN tch tc
        ON p.user_id = tc.user_id AND p.t >= tc.t
    )
    SELECT CASE WHEN tt IS NOT NULL AND t - tt <= 604800000000000
                THEN touch ELSE 'direct' END AS touch_type,
           COUNT(*) AS n_purchases,
           CAST(SUM(cents) AS BIGINT) AS revenue_cents
    FROM j GROUP BY 1
    """,
)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: every purchase credits the
    latest preceding touch event (click/view/signup) by the same user
    within a 7-day lookback, else 'direct'. Composes the as-of join
    (operators/temporal.asof_join, backward-inclusive) with a
    revenue-cents rollup — the attribution shape ad-measurement
    pipelines run at petabyte scale.

    Touches are pre-collapsed per (user, ts) (max event_type) because
    as-of carry-forward order is nondeterministic on exact ts ties —
    same collapse in the oracle. Scale: one user-keyed window shuffle
    for the as-of + one tiny groupBy; no range cross-product."""
    e = load(spark, sf_dir, "events")
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
    )
    touches = (
        e.where(F.col("event_type").isin("click", "view", "signup"))
        .groupBy("user_id", "ts")
        .agg(F.max("event_type").alias("touch"))
    )
    j = temporal_ops.asof_join(
        purchases,
        touches,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_cols=["touch"],
        right_prefix="t_",
    )
    lookback_ns = 7 * 86_400_000_000_000
    attributed = F.when(
        F.col("t_ts").isNotNull()
        & (F.col("ts") - F.col("t_ts") <= F.lit(lookback_ns)),
        F.col("t_touch"),
    ).otherwise(F.lit("direct"))
    return (
        j.select(attributed.alias("touch_type"), "cents")
        .groupBy("touch_type")
        .agg(
            F.count("*").alias("n_purchases"),
            F.sum("cents").alias("revenue_cents"),
        )
    )



@register(
    "bigram_lm_scores",
    """
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    b AS (
      SELECT doc_id,
             unnest(toks[1:len(toks) - 1]) AS w1,
             unnest(toks[2:len(toks)]) AS w2
      FROM t
    ),
    c12 AS (SELECT w1, w2, COUNT(*) AS n12 FROM b GROUP BY w1, w2),
    c1 AS (SELECT w1, COUNT(*) AS n1 FROM b GROUP BY w1),
    p AS (
      SELECT c12.w1, c12.w2, (n12 * 1000000) // n1 AS p_1e6
      FROM c12 JOIN c1 USING (w1)
    )
    SELECT b.doc_id, COUNT(*) AS n_bigrams,
           CAST(SUM(p.p_1e6) // COUNT(*) AS BIGINT) AS lm_score_1e6
    FROM b JOIN p ON b.w1 = p.w1 AND b.w2 = p.w2
    GROUP BY b.doc_id
    """,
)
def bigram_lm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-domain bigram language-model score per document — the
    perplexity-proxy quality signal pretraining filters use (docs whose
    token transitions are improbable under the corpus LM are noise).
    Probabilities are integer per-million conditionals
    P(w2|w1) = div(count(w1 w2) * 1e6, count(w1 _)); a doc's score is
    the integer mean over its bigrams — log-free, so exact cross-engine
    (a float log-perplexity would drift by summation order).

    Single-token/empty docs have no bigrams and drop out (inner-join
    semantics, same in the oracle).

    Representative collapse, dup-gated like the dedup family: on a
    duplicate-heavy corpus (the raw-crawl shape; measured via the HLL
    probe) the explode/count/score runs on DISTINCT texts with
    multiplicity-weighted counts — c12/c1 are identical to full-corpus
    counts, scores are per-text constants, and docs join back by text
    fingerprint. Exactly output-equivalent; 10x fixture (dup ratio
    10): 23.4s -> explode shrinks 10x. Dup-free corpora skip the
    collapse (probe is one map-side HLL agg).

    Scale: ONE bigram explode feeds both count tables and the scoring
    join (persisted); the model join keys on (w1, w2) — the prob table
    is observed-bigram-sized and AQE broadcasts it while it fits, with
    a plain shuffle join as the web-scale-vocab fallback. Per-key
    scoring is a map-side-combinable groupBy."""
    docs = _sload(spark, sf_dir, "documents").select("doc_id", "text")
    # footer pre-gate (round-6 verdict #3): below the threshold the HLL
    # probe job costs more than any collapse could save — skip both
    # (both-paths-equal is pinned by tests, so this is cost-only)
    gate = _collapse_gate(sf_dir, "documents", min_rows=20_000)
    if gate is False:
        collapsed = False
    else:
        probe = docs.agg(
            F.count(F.lit(1)).alias("n"),
            F.approx_count_distinct(F.md5("text"), rsd=0.02).alias("d"),
        ).first()
        n_docs, n_distinct = (probe["n"] or 0), (probe["d"] or 0)
        collapsed = n_docs > 0 and (n_docs - n_distinct) >= 0.05 * n_docs
    if collapsed:
        src = (
            docs.groupBy("text")
            .agg(F.count("*").alias("__m"))
            .select(F.md5("text").alias("__key"), "text", "__m")
        )
    else:
        src = docs.select(
            F.col("doc_id").alias("__key"), "text", F.lit(1).alias("__m")
        )
    toks = F.split(F.col("text"), " ")
    big = (
        src.select(
            "__key",
            "__m",
            toks.alias("__t"),
            F.explode(
                F.sequence(F.lit(1), F.greatest(F.size(toks) - 1, F.lit(1)))
            ).alias("i"),
        )
        .where(F.col("i") <= F.size("__t") - 1)
        .select(
            "__key",
            "__m",
            F.element_at("__t", F.col("i")).alias("w1"),
            F.element_at("__t", F.col("i") + 1).alias("w2"),
        )
        .persist()
    )
    c12 = big.groupBy("w1", "w2").agg(F.sum("__m").alias("n12"))
    c1 = big.groupBy("w1").agg(F.sum("__m").alias("n1"))
    probs = c12.join(c1, "w1").select(
        "w1", "w2", F.expr("div(n12 * 1000000, n1)").alias("p_1e6")
    )
    scored = (
        big.join(probs, ["w1", "w2"])
        .groupBy("__key")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.expr("div(sum(p_1e6), count(*))").alias("lm_score_1e6"),
        )
    )
    if collapsed:
        return (
            docs.select("doc_id", F.md5("text").alias("__key"))
            .join(scored, "__key")
            .select("doc_id", "n_bigrams", "lm_score_1e6")
        )
    return scored.select(
        F.col("__key").alias("doc_id"), "n_bigrams", "lm_score_1e6"
    )


@register(
    "copurchase_recs",
    """
    WITH io AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ),
    pairs AS (
      SELECT x.p AS part_a, y.p AS part_b, COUNT(*) AS n_ab
      FROM io x JOIN io y ON x.o = y.o AND x.p <> y.p
      GROUP BY x.p, y.p
    ),
    freq AS (SELECT p, COUNT(*) AS n FROM io GROUP BY p),
    tot AS (SELECT COUNT(DISTINCT o) AS n_orders FROM io),
    lift AS (
      SELECT pr.part_a, pr.part_b, pr.n_ab,
             (pr.n_ab * tot.n_orders * 1000000) // (fa.n * fb.n)
               AS lift_1e6
      FROM pairs pr
      JOIN freq fa ON fa.p = pr.part_a
      JOIN freq fb ON fb.p = pr.part_b
      CROSS JOIN tot
      WHERE pr.n_ab >= 5
    )
    SELECT part_a, part_b, n_ab, CAST(lift_1e6 AS BIGINT) AS lift_1e6,
           CAST(rn AS BIGINT) AS rn
    FROM (
      SELECT *, row_number() OVER (
               PARTITION BY part_a ORDER BY lift_1e6 DESC, part_b) AS rn
      FROM lift
    ) WHERE rn <= 5
    """,
)
def copurchase_recs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 'customers also bought' recommendations per part by
    co-occurrence LIFT (integer per-million:
    n_ab * n_orders * 1e6 div (n_a * n_b), support >= 5) — the
    classic item-item collaborative-filtering batch job.

    Scale: basket pairs come from one order-keyed self-join whose
    fan-out is the square of basket size (bounded, ~4 items), folded
    immediately by a map-side-combinable (a, b) count; item frequencies
    broadcast back; the top-5 window partitions by item over the
    already-aggregated pair table — never raw baskets. The order total
    is a 1-row crossJoin, not a driver scalar."""
    io = (
        load(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
        .persist()
    )
    other = io.select(F.col("o"), F.col("p").alias("p2"))
    pairs = (
        io.join(other, "o")
        .where(F.col("p") != F.col("p2"))
        .groupBy(F.col("p").alias("part_a"), F.col("p2").alias("part_b"))
        .agg(F.count("*").alias("n_ab"))
        .where(F.col("n_ab") >= 5)
    )
    freq = io.groupBy("p").agg(F.count("*").alias("n"))
    tot = io.agg(F.countDistinct("o").alias("n_orders"))
    # freq is part-keyed, so it SCALES — but the frame it would
    # otherwise shuffle against is the quadratic pair table, so a
    # compile-time SMJ pays the pair shuffle WRITE before AQE can
    # convert (measured 2x the query wall at 10x). Gate the hint on
    # the part domain from footer metadata (no scan): |freq| <= |part|,
    # and 4M (long,long) rows ~ the session's 64 MB broadcast policy.
    # Past the gate the join degrades to shuffle instead of OOMing.
    try:
        n_parts = sum(
            n for _, _, n in stats.parquet_rowgroup_stats(
                f"{sf_dir}/part.parquet", "p_partkey"
            )
        )
    except Exception:
        n_parts = None
    bcast_freq = (
        F.broadcast if n_parts is not None and 0 < n_parts <= 4_000_000
        else (lambda df: df)
    )
    lift = (
        pairs.join(
            bcast_freq(
                freq.select(F.col("p").alias("part_a"), F.col("n").alias("__na"))
            ),
            "part_a",
        )
        .join(
            bcast_freq(
                freq.select(F.col("p").alias("part_b"), F.col("n").alias("__nb"))
            ),
            "part_b",
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "part_a",
            "part_b",
            "n_ab",
            # lift multiplies two linearly-scaling counts (pair count x
            # corpus orders) — the product grows QUADRATICALLY with
            # data and clears int64 well before the denominators do:
            # exact DECIMAL(38,0) div, floor==trunc on counts
            F.expr(
                "CAST(div(CAST(n_ab AS DECIMAL(38,0)) * n_orders * "
                "1000000, CAST(__na AS DECIMAL(38,0)) * __nb) AS BIGINT)"
            ).alias("lift_1e6"),
        )
    )
    w = Window.partitionBy("part_a").orderBy(
        F.desc("lift_1e6"), F.col("part_b")
    )
    return (
        lift.withColumn("rn", F.row_number().over(w).cast("long"))
        .where(F.col("rn") <= 5)
        .select("part_a", "part_b", "n_ab", "lift_1e6", "rn")
    )



@register(
    "metric_correlations",
    """
    WITH h AS (
      SELECT event_type,
             epoch_ns(ts) // 3600000000000 AS hour, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ),
    p AS (
      SELECT a.hour, a.event_type AS type_a, b.event_type AS type_b,
             a.n AS x, b.n AS y
      FROM h a JOIN h b
        ON a.hour = b.hour AND a.event_type < b.event_type
    ),
    m AS (
      SELECT type_a, type_b, COUNT(*) AS n,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
      FROM p GROUP BY type_a, type_b
    )
    SELECT type_a, type_b, CAST(n AS BIGINT) AS n_hours,
           CAST(floor(
             1000000.0 * (CAST(n * sxy - sx * sy AS DOUBLE))
             / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
           ) AS BIGINT) AS corr_1e6
    FROM m
    WHERE n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
    """,
)
def metric_correlations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation of hourly event-type volumes —
    the "which metrics move together" co-movement matrix. Moments
    (n, Σx, Σy, Σx², Σy², Σxy) are EXACT int64 over integer counts;
    only the final r = cov/(σσ) runs in double, and identical exact
    inputs through the identically-written expression give identical
    bits both engines (a naive float corr() would drift by summation
    order). Pairs join only on the co-observed hours (inner join),
    constant series are excluded (zero variance).

    Scale: the hourly rollup is one map-side-combinable groupBy; the
    pair join fans each hour cell out by |event_type| (catalog-scale);
    moments fold map-side on the (type_a, type_b) key space —
    |types|²/2 output rows however long the history."""
    e = load(spark, sf_dir, "events")
    h = (
        e.groupBy(
            "event_type",
            F.expr("ts div 3600000000000").alias("hour"),
        ).agg(F.count("*").alias("n"))
    )
    a = h.select(
        "hour", F.col("event_type").alias("type_a"), F.col("n").alias("x")
    )
    b = h.select(
        "hour", F.col("event_type").alias("type_b"), F.col("n").alias("y")
    )
    p = a.join(b, "hour").where(F.col("type_a") < F.col("type_b"))
    m = p.groupBy("type_a", "type_b").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    var_x = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    var_y = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    r = (
        F.lit(1000000.0)
        * cov.cast("double")
        / (F.sqrt(var_x.cast("double")) * F.sqrt(var_y.cast("double")))
    )
    return (
        m.where((var_x > 0) & (var_y > 0))
        .select(
            "type_a",
            "type_b",
            F.col("n").cast("long").alias("n_hours"),
            F.floor(r).cast("long").alias("corr_1e6"),
        )
    )


@register(
    "events_trend_slopes",
    """
    WITH h AS (
      SELECT event_type,
             epoch_ns(ts) // 3600000000000 AS hour, COUNT(*) AS y
      FROM events GROUP BY 1, 2
    ),
    x0 AS (SELECT event_type, MIN(hour) AS h0 FROM h GROUP BY 1),
    m AS (
      SELECT h.event_type, COUNT(*) AS n,
             SUM(h.hour - x0.h0) AS sx, SUM(h.y) AS sy,
             SUM((h.hour - x0.h0) * (h.hour - x0.h0)) AS sxx,
             SUM((h.hour - x0.h0) * h.y) AS sxy
      FROM h JOIN x0 USING (event_type)
      GROUP BY h.event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_hours,
           CAST(floor(
             1000000.0 * CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE)
           ) AS BIGINT) AS slope_1e6_per_hour
    FROM m WHERE n * sxx - sx * sx > 0
    """,
)
def events_trend_slopes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series OLS trend: slope of hourly volume over hour index
    (grouped linear regression — 'is this metric growing?'). Hours are
    re-anchored per series (x = hour - min_hour) so the int64 moment
    sums stay small and exact; the single final division runs in
    double over exact integers — deterministic both engines.

    Scale: one hourly rollup + a broadcast-size per-series anchor join
    + one map-side-combinable moments fold; output is |series| rows."""
    e = load(spark, sf_dir, "events")
    h = (
        e.groupBy(
            "event_type",
            F.expr("ts div 3600000000000").alias("hour"),
        ).agg(F.count("*").alias("y"))
    )
    x0 = h.groupBy("event_type").agg(F.min("hour").alias("h0"))
    j = h.join(F.broadcast(x0), "event_type").select(
        "event_type", (F.col("hour") - F.col("h0")).alias("x"), "y"
    )
    m = j.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    det = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    slope = F.lit(1000000.0) * cov.cast("double") / det.cast("double")
    return m.where(det > 0).select(
        "event_type",
        F.col("n").cast("long").alias("n_hours"),
        F.floor(slope).cast("long").alias("slope_1e6_per_hour"),
    )



def _bfs_oracle_sql(hops: int = 3) -> str:
    """Unrolled-K DuckDB twin of graph_bfs_hops: min-plus frontier
    relaxation, exact integers."""
    parts = [
        """
    WITH edges AS (
      SELECT DISTINCT o.o_custkey * 2 AS src, l.l_suppkey * 2 + 1 AS dst
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ),
    sym AS (
      SELECT src, dst FROM edges
      UNION ALL
      SELECT dst AS src, src AS dst FROM edges
    ),
    d0 AS (
      SELECT MIN(src) AS node, 0 AS d FROM sym
    )"""
    ]
    for i in range(1, hops + 1):
        parts.append(
            f""",
    d{i} AS (
      SELECT node, MIN(d) AS d FROM (
        SELECT node, d FROM d{i - 1}
        UNION ALL
        SELECT s.dst AS node, p.d + 1 AS d
        FROM sym s JOIN d{i - 1} p ON s.src = p.node
      ) GROUP BY node
    )"""
        )
    parts.append(
        f"""
    SELECT CAST(d AS BIGINT) AS hops, CAST(COUNT(*) AS BIGINT) AS n_nodes
    FROM d{hops} GROUP BY d
    """
    )
    return "".join(parts)


@register("graph_bfs_hops", _bfs_oracle_sql(3))
def graph_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Breadth-first hop-distance histogram from the lowest-id node of
    the customer<->supplier trade graph (3 relaxation rounds) — the
    reachability / degrees-of-separation class. Same exact-integer
    iterative machinery as pagerank_custsupp with min-plus in place of
    sum: dist_{t+1}(v) = min(dist_t(v), min over in-arcs dist_t(u)+1),
    unrolled identically in the oracle.

    Scale: the frontier table is |reached| rows — broadcast into the
    once-persisted arc list per round (groupBy MIN is map-side
    combinable); eager localCheckpoint keeps lineage O(1). Output is a
    <=hops+1-row histogram."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    arcs = graph_ops.symmetrize(edges).persist()
    dist = arcs.agg(F.min("src").alias("node")).select(
        "node", F.lit(0).cast("long").alias("d")
    )
    for _ in range(3):
        relaxed = (
            arcs.join(
                F.broadcast(dist.withColumnRenamed("node", "src")), "src"
            )
            .select(F.col("dst").alias("node"), (F.col("d") + 1).alias("d"))
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("d").alias("d"))
            .localCheckpoint(eager=True)
        )
    arcs.unpersist()
    return dist.groupBy(F.col("d").cast("long").alias("hops")).agg(
        F.count("*").alias("n_nodes")
    )


@register(
    "customer_rfm",
    """
    WITH agg AS (
      SELECT o_custkey,
             CAST(MAX(o_orderdate) AS DATE) AS last_order,
             COUNT(*) AS freq,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders GROUP BY o_custkey
    ),
    ref AS (SELECT CAST(MAX(o_orderdate) AS DATE) AS maxd FROM orders),
    r AS (
      SELECT a.o_custkey,
             CAST(date_diff('day', a.last_order, ref.maxd) AS BIGINT)
               AS recency_days,
             a.freq, a.cents
      FROM agg a CROSS JOIN ref
    )
    SELECT o_custkey, recency_days, freq AS n_orders, cents AS spend_cents,
           CAST(ntile(4) OVER (ORDER BY recency_days, o_custkey) AS BIGINT)
             AS r_code,
           CAST(ntile(4) OVER (ORDER BY freq DESC, o_custkey) AS BIGINT)
             AS f_code,
           CAST(ntile(4) OVER (ORDER BY cents DESC, o_custkey) AS BIGINT)
             AS m_code
    FROM r
    """,
)
def customer_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per customer, days-since-last-order (vs the
    corpus max date), order count, lifetime spend in exact cents, and
    quartile codes (ntile(4), code 1 = best, custkey tie-breaks for
    determinism) on each axis — the standard marketing segmentation
    batch job.

    Scale note: ntile over a global ORDER BY is a single-reducer sort
    of the AGGREGATED per-customer table (|customers| rows, not
    orders) — the documented trade; at catalog sizes beyond one
    reducer, swap ntile for percent_rank over range-partitioned sort
    or the zone-map CDF machinery in stats.py."""
    o = load(spark, sf_dir, "orders")
    agg = o.groupBy("o_custkey").agg(
        F.max(F.col("o_orderdate").cast("date")).alias("last_order"),
        F.count("*").alias("freq"),
        F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")).alias(
            "cents"
        ),
    )
    ref = o.agg(F.max(F.col("o_orderdate").cast("date")).alias("maxd"))
    r = agg.crossJoin(F.broadcast(ref)).select(
        "o_custkey",
        F.datediff("maxd", "last_order").cast("long").alias("recency_days"),
        "freq",
        "cents",
    )
    return r.select(
        "o_custkey",
        "recency_days",
        F.col("freq").alias("n_orders"),
        F.col("cents").alias("spend_cents"),
        F.ntile(4)
        .over(Window.orderBy("recency_days", "o_custkey"))
        .cast("long")
        .alias("r_code"),
        F.ntile(4)
        .over(Window.orderBy(F.desc("freq"), "o_custkey"))
        .cast("long")
        .alias("f_code"),
        F.ntile(4)
        .over(Window.orderBy(F.desc("cents"), "o_custkey"))
        .cast("long")
        .alias("m_code"),
    )



@register(
    "events_gap_interpolated",
    f"""
    WITH e AS (
      SELECT event_type,
             {ORACLE_FLOORDIV('epoch_ns(ts)', 3600000000000)} AS bucket,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    c AS (
      SELECT event_type, bucket, SUM(cents) // COUNT(*) AS v
      FROM e GROUP BY event_type, bucket
    ),
    spans AS (
      SELECT event_type, MIN(bucket) AS lo, MAX(bucket) AS hi
      FROM c GROUP BY event_type
    ),
    spine AS (
      SELECT event_type, UNNEST(generate_series(lo, hi)) AS bucket
      FROM spans
    ),
    j AS (
      SELECT s.event_type, s.bucket, c.v
      FROM spine s LEFT JOIN c USING (event_type, bucket)
    ),
    w AS (
      SELECT event_type, bucket, v,
             last_value(CASE WHEN v IS NOT NULL
                             THEN struct_pack(b := bucket, x := v) END
                        IGNORE NULLS)
               OVER (PARTITION BY event_type ORDER BY bucket
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS p,
             first_value(CASE WHEN v IS NOT NULL
                              THEN struct_pack(b := bucket, x := v) END
                         IGNORE NULLS)
               OVER (PARTITION BY event_type ORDER BY bucket
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
               AS nx
      FROM j
    )
    SELECT event_type, bucket,
           CAST(CASE
             WHEN v IS NOT NULL THEN v
             WHEN p IS NOT NULL AND nx IS NOT NULL
               THEN p.x + ((nx.x - p.x) * (bucket - p.b)) // (nx.b - p.b)
             WHEN p IS NOT NULL THEN p.x
             ELSE nx.x END AS BIGINT) AS value_cents,
           CASE WHEN v IS NOT NULL THEN 'obs'
                WHEN p IS NOT NULL AND nx IS NOT NULL THEN 'interp'
                ELSE 'edge' END AS fill_src
    FROM w
    """,
)
def events_gap_interpolated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly mean-value series per event_type with missing hours
    LINEARLY INTERPOLATED between the nearest observed neighbors — the
    numeric complement to events_gap_filled_hourly's zero-fill (sensor
    / price series want a line, not a zero). Exact integer cents:
    v = pv + div((nv-pv)*(b-pb), nb-pb) — both engines truncate
    identically, no float slope anywhere.

    Scale: one rollup + the same per-series spine explode as gap_fill,
    then TWO carry windows (last/first non-null struct) on one
    key-partitioned sort — the as-of machinery's shape, no self-joins.
    'edge' marks one-sided gaps (unreachable on a min/max-bounded
    spine; kept for custom-spine callers, same branch in the oracle)."""
    e = load(spark, sf_dir, "events")
    c = (
        e.groupBy(
            "event_type",
            F.expr(
                "((ts) div 3600000000000) - "
                "(CASE WHEN (ts) % 3600000000000 < 0 THEN 1 ELSE 0 END)"
            ).alias("bucket"),
        )
        .agg(
            F.expr(
                "div(sum(CAST(round(value * 100) AS BIGINT)), count(*))"
            ).alias("v")
        )
    )
    spine = (
        c.groupBy("event_type")
        .agg(F.min("bucket").alias("lo"), F.max("bucket").alias("hi"))
        .select(
            "event_type",
            F.explode(F.sequence("lo", "hi")).alias("bucket"),
        )
    )
    j = spine.join(c, ["event_type", "bucket"], "left")
    obs = F.when(
        F.col("v").isNotNull(), F.struct(F.col("bucket").alias("b"), F.col("v").alias("x"))
    )
    wp = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    w = j.select(
        "event_type",
        "bucket",
        "v",
        F.last(obs, ignorenulls=True).over(wp).alias("p"),
        F.first(obs, ignorenulls=True).over(wn).alias("nx"),
    )
    interp = F.col("p.x") + F.expr(
        "div((nx.x - p.x) * (bucket - p.b), nx.b - p.b)"
    )
    value = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("p").isNotNull() & F.col("nx").isNotNull(), interp)
        .when(F.col("p").isNotNull(), F.col("p.x"))
        .otherwise(F.col("nx.x"))
    )
    src = (
        F.when(F.col("v").isNotNull(), F.lit("obs"))
        .when(
            F.col("p").isNotNull() & F.col("nx").isNotNull(), F.lit("interp")
        )
        .otherwise(F.lit("edge"))
    )
    return w.select(
        "event_type",
        "bucket",
        value.cast("long").alias("value_cents"),
        src.alias("fill_src"),
    )



@register(
    "events_wau",
    f"""
    WITH ud AS (
      SELECT DISTINCT user_id,
             {ORACLE_FLOORDIV('epoch_ns(ts)', 86400000000000)} AS day
      FROM events
    ),
    bounds AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM ud),
    dau AS (SELECT day, COUNT(*) AS dau FROM ud GROUP BY day),
    contrib AS (
      SELECT ud.user_id, ud.day + k.k AS d
      FROM ud CROSS JOIN (
        SELECT UNNEST(generate_series(0, 6)) AS k
      ) k
    ),
    wau AS (
      SELECT d AS day, COUNT(DISTINCT user_id) AS wau
      FROM contrib, bounds
      WHERE d <= bounds.hi
      GROUP BY d
    )
    SELECT w.day, CAST(COALESCE(da.dau, 0) AS BIGINT) AS dau,
           CAST(w.wau AS BIGINT) AS wau,
           CAST((COALESCE(da.dau, 0) * 1000000) // w.wau AS BIGINT)
             AS stickiness_1e6
    FROM wau w LEFT JOIN dau da USING (day)
    """,
)
def events_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / rolling-7-day WAU / stickiness per day — the product
    engagement triple. WAU-by-replication: each (user, active-day)
    row contributes to the 7 window-ends it can serve, then one
    COUNT(DISTINCT) per end-day — the same explicit window-explode as
    events_sliding_counts (replication factor = window/slide = 7),
    never a per-day range self-join. Stickiness is integer per-million
    (both engines truncate).

    Scale: the active-set explode is 7x |distinct (user, day)| — far
    below raw events; the distinct-count shuffle keys on (day, user),
    skew-free. Partial leading windows are reported (real product
    dashboards do); trailing ends past the last day are cut."""
    e = load(spark, sf_dir, "events")
    day = F.expr(
        "((ts) div 86400000000000) - "
        "(CASE WHEN (ts) % 86400000000000 < 0 THEN 1 ELSE 0 END)"
    )
    ud = e.select("user_id", day.alias("day")).distinct().persist()
    hi = ud.agg(F.max("day").alias("hi"))
    dau = ud.groupBy("day").agg(F.count("*").alias("dau"))
    contrib = ud.select(
        "user_id",
        F.explode(
            F.sequence(F.col("day"), F.col("day") + F.lit(6))
        ).alias("d"),
    )
    wau = (
        contrib.crossJoin(F.broadcast(hi))
        .where(F.col("d") <= F.col("hi"))
        .groupBy(F.col("d").alias("day"))
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    return (
        wau.join(dau, "day", "left")
        .select(
            "day",
            F.coalesce("dau", F.lit(0)).cast("long").alias("dau"),
            F.col("wau").cast("long").alias("wau"),
            F.expr(
                "div(coalesce(dau, 0) * 1000000, wau)"
            ).cast("long").alias("stickiness_1e6"),
        )
    )


@register(
    "events_wau_approx",
    f"""
    WITH ud AS (
      SELECT DISTINCT user_id,
             {ORACLE_FLOORDIV('epoch_ns(ts)', 86400000000000)} AS day
      FROM events
    ),
    bounds AS (SELECT MAX(day) AS hi FROM ud),
    contrib AS (
      SELECT ud.user_id, ud.day + k.k AS d
      FROM ud CROSS JOIN (
        SELECT UNNEST(generate_series(0, 6)) AS k
      ) k
    )
    SELECT d AS day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau,
           TRUE AS approx_ok
    FROM contrib, bounds
    WHERE d <= bounds.hi
    GROUP BY d
    """,
)
def events_wau_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL-sketch twin of events_wau, audit-oracled (the
    hll_distinct_audit pattern): per day, the EXACT rolling-7-day WAU
    (oracle-reproducible) plus a boolean pinning the Datasketches HLL
    estimate within 5% of it — ~3 sigma at lg_k=12's ~1.6% standard
    error, so a sketch regression fails the hard gate while the
    estimate's engine-specific bits never enter the hash.

    Why this query exists (round-5 verdict #3): events_wau's exact
    contract replicates the distinct active-set 7-fold and pays a
    corpus-scale COUNT(DISTINCT) shuffle — the one remaining
    first-order scale-killer at the 100M-event tier (88.5s; 700M
    expanded rows). The sketch arm
    (operators/sketches.rolling_distinct_estimate) explodes per-day
    SKETCHES instead of per-(user, day) rows: one groupBy(day) folds
    users into 4 KB HLL digests, the 7-fold replication touches
    n_days x 7 metadata rows, and the rolling union is sketch merges.
    Production runs the sketch arm alone; the exact arm here is the
    accuracy gate at the SF where exact is cheap (same posture as
    hll_distinct_audit / quantile_sketch_audit).

    Scale: the audit's cost is the exact arm by construction; the
    sketch arm is one map-side-combinable shuffle of <= 4 KB per
    (day, mapper) plus a metadata-scale explode. Measured at the
    100M-event tier: sketch arm alone vs events_wau — see
    SURVEY.md round-6 notes."""
    e = load(spark, sf_dir, "events")
    day = F.expr(
        "((ts) div 86400000000000) - "
        "(CASE WHEN (ts) % 86400000000000 < 0 THEN 1 ELSE 0 END)"
    )
    ud = e.select("user_id", day.alias("day")).distinct().persist()
    hi = ud.agg(F.max("day").alias("hi"))
    contrib = ud.select(
        "user_id",
        F.explode(
            F.sequence(F.col("day"), F.col("day") + F.lit(6))
        ).alias("d"),
    )
    exact = (
        contrib.crossJoin(F.broadcast(hi))
        .where(F.col("d") <= F.col("hi"))
        .groupBy(F.col("d").alias("day"))
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    est = sketch_ops.rolling_distinct_estimate(
        ud, "user_id", "day", window=7, lg_k=12
    )
    return (
        exact.join(est, "day")
        .select(
            "day",
            F.col("wau").cast("long").alias("wau"),
            (
                F.abs(F.col("est") - F.col("wau"))
                <= F.lit(0.05) * F.col("wau").cast("double")
            ).alias("approx_ok"),
        )
    )



# ONE conversion definition shared by every experiment readout
# (ab_test_analysis, abn_test_chisq): >= 14 purchase events converts.
# Tune it here and both Spark paths and both oracles move together.
_SQL_USER_CONV_CTE = """
      SELECT user_id,
             CASE WHEN SUM(CASE WHEN event_type = 'purchase'
                                THEN 1 ELSE 0 END) >= 14
                  THEN 1 ELSE 0 END AS conv
      FROM events GROUP BY user_id"""


def _user_conversions(e: DataFrame) -> DataFrame:
    """Per-user conversion flag (the _SQL_USER_CONV_CTE twin): one
    map-side-combinable fold."""
    return e.groupBy("user_id").agg(
        (
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
            >= 14
        )
        .cast("int")
        .alias("conv")
    )


@register(
    "ab_test_analysis",
    f"""
    WITH u AS ({_SQL_USER_CONV_CTE}
    ),
    v AS (
      SELECT CASE WHEN strpos('02468ace',
                              substr(md5(CAST(user_id AS VARCHAR)), 1, 1)) > 0
                  THEN 'A' ELSE 'B' END AS variant,
             conv
      FROM u
    ),
    s AS (
      SELECT SUM(CASE WHEN variant = 'A' THEN 1 ELSE 0 END) AS na,
             SUM(CASE WHEN variant = 'A' THEN conv ELSE 0 END) AS ca,
             SUM(CASE WHEN variant = 'B' THEN 1 ELSE 0 END) AS nb,
             SUM(CASE WHEN variant = 'B' THEN conv ELSE 0 END) AS cb
      FROM v
    )
    SELECT CAST(na AS BIGINT) AS n_a, CAST(ca AS BIGINT) AS conv_a,
           CAST((ca * 1000000) // na AS BIGINT) AS rate_a_1e6,
           CAST(nb AS BIGINT) AS n_b, CAST(cb AS BIGINT) AS conv_b,
           CAST((cb * 1000000) // nb AS BIGINT) AS rate_b_1e6,
           CAST(CASE WHEN ca + cb = 0 OR ca + cb = na + nb THEN 0
             ELSE floor(1000.0 *
               (CAST(ca AS DOUBLE) / CAST(na AS DOUBLE)
                - CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE))
               / sqrt(
                   (CAST(ca + cb AS DOUBLE) / CAST(na + nb AS DOUBLE))
                   * (1.0 - CAST(ca + cb AS DOUBLE)
                            / CAST(na + nb AS DOUBLE))
                   * (1.0 / CAST(na AS DOUBLE) + 1.0 / CAST(nb AS DOUBLE))
                 ))
             END AS BIGINT) AS z_1e3
    FROM s
    """,
)
def ab_test_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion experiment readout: users deterministically
    hash-assigned to variants (md5 hex-digit parity — portable across
    engines, unlike engine-native hashes), per-variant purchase
    conversion in integer per-million, and the pooled two-proportion
    z-score (doubles derived from exact integer counts through an
    identically-written expression — deterministic bits both engines).

    The experimentation-analytics class: the assignment trick is the
    same hash-bucketing the sampling operators use, so a real A/B
    pipeline gets consistent assignment across sessions and retries.

    Scale: one per-user fold (map-side combinable), one 4-cell global
    agg — no shuffle carries more than |users| rows."""
    u = _user_conversions(load(spark, sf_dir, "events"))
    variant = F.when(
        F.expr(
            "instr('02468ace', substr(md5(CAST(user_id AS STRING)), 1, 1)) > 0"
        ),
        F.lit("A"),
    ).otherwise(F.lit("B"))
    s = u.select(variant.alias("variant"), "conv").agg(
        F.sum(F.when(F.col("variant") == "A", 1).otherwise(0)).alias("na"),
        F.sum(F.when(F.col("variant") == "A", F.col("conv")).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("variant") == "B", 1).otherwise(0)).alias("nb"),
        F.sum(F.when(F.col("variant") == "B", F.col("conv")).otherwise(0)).alias("cb"),
    )
    pa = F.col("ca").cast("double") / F.col("na").cast("double")
    pb = F.col("cb").cast("double") / F.col("nb").cast("double")
    pool = (F.col("ca") + F.col("cb")).cast("double") / (
        F.col("na") + F.col("nb")
    ).cast("double")
    z = (
        F.lit(1000.0)
        * (pa - pb)
        / F.sqrt(
            pool
            * (F.lit(1.0) - pool)
            * (
                F.lit(1.0) / F.col("na").cast("double")
                + F.lit(1.0) / F.col("nb").cast("double")
            )
        )
    )
    degenerate = (F.col("ca") + F.col("cb") == 0) | (
        F.col("ca") + F.col("cb") == F.col("na") + F.col("nb")
    )
    return s.select(
        F.col("na").cast("long").alias("n_a"),
        F.col("ca").cast("long").alias("conv_a"),
        F.expr("div(ca * 1000000, na)").cast("long").alias("rate_a_1e6"),
        F.col("nb").cast("long").alias("n_b"),
        F.col("cb").cast("long").alias("conv_b"),
        F.expr("div(cb * 1000000, nb)").cast("long").alias("rate_b_1e6"),
        # all-or-none conversion has zero pooled variance: z undefined,
        # reported as 0 (identical guard in the oracle; Spark's ANSI
        # mode would otherwise raise on the 0/0)
        F.when(degenerate, F.lit(0))
        .otherwise(F.floor(z))
        .cast("long")
        .alias("z_1e3"),
    )


@register(
    "dedup_containment",
    f"""
    WITH toks AS (
      SELECT doc_id, string_split({_SQL_NORM}, ' ') AS t FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id,
             t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
      FROM toks, UNNEST(range(1, greatest(len(t) - 1, 1))) AS u(i)
      WHERE len(t) >= 3
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter_size
      FROM sh a JOIN sh b ON a.shingle = b.shingle
                         AND a.doc_id <> b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT i.doc_a, i.doc_b, i.inter_size,
           sa.set_size AS size_a, sb.set_size AS size_b,
           (1000 * i.inter_size) // sa.set_size AS containment_per_1000
    FROM inter i JOIN sizes sa ON i.doc_a = sa.doc_id
                 JOIN sizes sb ON i.doc_b = sb.doc_id
    WHERE (1000 * i.inter_size) // sa.set_size >= 600
    """,
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed near-containment pairs >= 0.6 on word 3-grams
    (operators/dedup.containment_pairs): doc_a's shingles near-
    contained in doc_b's — the quote/boilerplate/truncated-repost
    dedup shape that symmetric Jaccard misses when |B| >> |A|. The
    oracle is the naive all-pairs inverted index; the engine path is
    asymmetric prefix filtering + size pruning + exact verification
    (the same lossless-pruning contract as dedup_ngram_jaccard)."""
    # Footer pre-gate AUDITED round 7 (after the fuzzy_part_pairs
    # finding): although this consumer is quadratic-class like fuzzy,
    # a controlled same-session A/B at sf0.1 measured gate-off 4.94s /
    # probe 6.09s / collapse-forced 5.25s best-of-2 — the documents
    # fixture's dup ratio does not reward the collapse here, so the
    # probe job is pure overhead at toy scale and the gate stands.
    # (fuzzy_part_pairs went the other way: 0.98s probed vs 2.74s
    # gated-off, because part names repeat heavily at every scale.)
    return dedup_ops.containment_pairs(
        load(spark, sf_dir, "documents"),
        n=3,
        threshold=0.6,
        collapse=_collapse_gate(sf_dir, "documents", min_rows=20_000),
    )


@register(
    "weighted_doc_sample",
    """
    WITH h AS (
      SELECT doc_id, n_chars,
             CAST(('0x' || substr(md5('wsample-v1:' || CAST(doc_id AS VARCHAR)),
                                  1, 15)) AS BIGINT) AS hv
      FROM documents WHERE n_chars > 0
    )
    SELECT doc_id, n_chars
    FROM h
    ORDER BY CAST(2 * hv + 1 AS DOUBLE) / CAST(n_chars AS DOUBLE) ASC,
             doc_id ASC
    LIMIT 500
    """,
)
def weighted_doc_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-proportional 500-doc sample without replacement
    (operators/sampling.priority_sample — Duffield–Lund–Thorup
    priority sampling on the salted-md5 hash). The sort key is a
    single int→double division, an IEEE exactly-rounded primitive, so
    the sampled SET is bit-identical cross-engine (the classic
    exponential A-ES key is not: libm ln differs in the last ulp)."""
    return sampling_ops.priority_sample(
        load(spark, sf_dir, "documents").select("doc_id", "n_chars"),
        k=500,
        weight_col="n_chars",
    )


@register(
    "attribution_linear",
    """
    WITH p AS (
      SELECT event_id AS pid, user_id, epoch_ns(ts) AS t,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ),
    tch AS (
      SELECT user_id, epoch_ns(ts) AS t, MAX(event_type) AS touch
      FROM events WHERE event_type IN ('click', 'view', 'signup')
      GROUP BY user_id, epoch_ns(ts)
    ),
    m AS (
      SELECT p.pid, p.cents, tc.touch
      FROM p JOIN tch tc
        ON p.user_id = tc.user_id
       AND tc.t >= p.t - 604800000000000 AND tc.t <= p.t
    ),
    cnt AS (SELECT pid, COUNT(*) AS n FROM m GROUP BY pid),
    credits AS (
      SELECT m.touch AS touch_type, (m.cents * 1000) // cnt.n AS credit
      FROM m JOIN cnt USING (pid)
      UNION ALL
      SELECT 'direct' AS touch_type, p.cents * 1000 AS credit
      FROM p ANTI JOIN m USING (pid)
    )
    SELECT touch_type, COUNT(*) AS n_credits,
           CAST(SUM(credit) AS BIGINT) AS credit_cents_1e3
    FROM credits GROUP BY touch_type
    """,
)
def attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: every purchase splits its
    revenue EQUALLY across all touches in the 7-day lookback (each
    touch gets floor(cents*1000 / n) — integer credit milli-cents for
    cross-engine hashing); untouched purchases credit 'direct' whole.
    The sibling of attribution_last_touch re-expressed over the
    bucketized interval join (operators/temporal.interval_join) —
    one-to-MANY credit assignment instead of the as-of's one-to-one.
    Scale: equi-join on (user, week-ish bucket) + two purchase-keyed
    groupBys; no range cross-product, no window over all events."""
    e = load(spark, sf_dir, "events")
    lookback = 604_800_000_000_000
    p = e.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        "user_id",
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
        (F.col("ts") - F.lit(lookback)).alias("t0"),
        (F.col("ts") + F.lit(1)).alias("t1"),
    )
    tch = (
        e.where(F.col("event_type").isin("click", "view", "signup"))
        .groupBy("user_id", F.col("ts").alias("tt"))
        .agg(F.max("event_type").alias("touch"))
    )
    # bucket width MUST match the interval length: the bucketized join
    # explodes each interval into every bucket it overlaps, so a 7-day
    # lookback over the default 1-hour buckets is a 169-way explode of
    # the purchase side (measured: OOM'd the 10x gate). Week-wide
    # buckets cap the explode at 2 rows per purchase.
    m = temporal_ops.interval_join(
        tch,
        p,
        on=["user_id"],
        point_ts="tt",
        start_col="t0",
        end_col="t1",
        bucket_width=lookback,
    ).select("pid", "cents", "touch")
    cnt = m.groupBy("pid").agg(F.count("*").alias("n"))
    credits = (
        m.join(cnt, "pid")
        .select(
            F.col("touch").alias("touch_type"),
            F.expr("div(cents * 1000, n)").alias("credit"),
        )
        .unionByName(
            p.join(m.select("pid").distinct(), "pid", "left_anti").select(
                F.lit("direct").alias("touch_type"),
                (F.col("cents") * 1000).alias("credit"),
            )
        )
    )
    return credits.groupBy("touch_type").agg(
        F.count("*").alias("n_credits"),
        F.sum("credit").cast("long").alias("credit_cents_1e3"),
    )


@register(
    "attribution_position",
    """
    WITH p AS (
      SELECT event_id AS pid, user_id, epoch_ns(ts) AS t,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ),
    tch AS (
      SELECT user_id, epoch_ns(ts) AS t, MAX(event_type) AS touch
      FROM events WHERE event_type IN ('click', 'view', 'signup')
      GROUP BY user_id, epoch_ns(ts)
    ),
    m AS (
      SELECT p.pid, p.cents, tc.touch, tc.t,
             row_number() OVER (PARTITION BY p.pid ORDER BY tc.t) AS rn,
             COUNT(*) OVER (PARTITION BY p.pid) AS n
      FROM p JOIN tch tc
        ON p.user_id = tc.user_id
       AND tc.t >= p.t - 604800000000000 AND tc.t <= p.t
    ),
    credits AS (
      SELECT touch AS touch_type,
             CASE WHEN n = 1 THEN cents * 1000
                  WHEN n = 2 THEN cents * 500
                  WHEN rn = 1 OR rn = n THEN cents * 400
                  ELSE (cents * 200) // (n - 2) END AS credit
      FROM m
      UNION ALL
      SELECT 'direct' AS touch_type, p.cents * 1000 AS credit
      FROM p ANTI JOIN m USING (pid)
    )
    SELECT touch_type, COUNT(*) AS n_credits,
           CAST(SUM(credit) AS BIGINT) AS credit_cents_1e3
    FROM credits GROUP BY touch_type
    """,
)
def attribution_position(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U-shaped (position-based) multi-touch attribution: first and
    last touch in the 7-day lookback each take 40% of a purchase's
    revenue, middle touches split the remaining 20% evenly; 1-touch
    paths take 100%, 2-touch paths 50/50, untouched purchases credit
    'direct'. Completes the attribution family (last-touch = as-of
    join, linear = equal split) with the position-weighted scheme most
    marketing stacks default to. Integer milli-cent credits:
    40% of cents*1000 is exactly cents*400, middles floor-divide —
    bit-identical cross-engine, no float shares.

    Scale: same bucketized interval join as attribution_linear (week
    buckets cap the explode at 2 rows/purchase), then ONE window over
    pid — partitions are touches-per-purchase (lookback-bounded),
    never all events."""
    e = load(spark, sf_dir, "events")
    lookback = 604_800_000_000_000
    p = e.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        "user_id",
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
        (F.col("ts") - F.lit(lookback)).alias("t0"),
        (F.col("ts") + F.lit(1)).alias("t1"),
    )
    tch = (
        e.where(F.col("event_type").isin("click", "view", "signup"))
        .groupBy("user_id", F.col("ts").alias("tt"))
        .agg(F.max("event_type").alias("touch"))
    )
    m = temporal_ops.interval_join(
        tch,
        p,
        on=["user_id"],
        point_ts="tt",
        start_col="t0",
        end_col="t1",
        bucket_width=lookback,
    ).select("pid", "cents", "touch", "tt")
    w = Window.partitionBy("pid").orderBy("tt")
    wn = Window.partitionBy("pid")
    ranked = m.select(
        "cents",
        "touch",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )
    credits = ranked.select(
        F.col("touch").alias("touch_type"),
        F.expr(
            "CASE WHEN n = 1 THEN cents * 1000"
            " WHEN n = 2 THEN cents * 500"
            " WHEN rn = 1 OR rn = n THEN cents * 400"
            " ELSE div(cents * 200, n - 2) END"
        ).alias("credit"),
    ).unionByName(
        p.join(m.select("pid").distinct(), "pid", "left_anti").select(
            F.lit("direct").alias("touch_type"),
            (F.col("cents") * 1000).alias("credit"),
        )
    )
    return credits.groupBy("touch_type").agg(
        F.count("*").alias("n_credits"),
        F.sum("credit").cast("long").alias("credit_cents_1e3"),
    )


@register(
    "attribution_decay",
    """
    WITH p AS (
      SELECT event_id AS pid, user_id, epoch_ns(ts) AS t,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ),
    tch AS (
      SELECT user_id, epoch_ns(ts) AS t, MAX(event_type) AS touch
      FROM events WHERE event_type IN ('click', 'view', 'signup')
      GROUP BY user_id, epoch_ns(ts)
    ),
    m AS (
      SELECT p.pid, p.cents, tc.touch,
             CASE (p.t - tc.t) // 86400000000000
                  WHEN 0 THEN 64 WHEN 1 THEN 32 WHEN 2 THEN 16
                  WHEN 3 THEN 8 WHEN 4 THEN 4 WHEN 5 THEN 2
                  ELSE 1 END AS w
      FROM p JOIN tch tc
        ON p.user_id = tc.user_id
       AND tc.t >= p.t - 604800000000000 AND tc.t <= p.t
    ),
    tot AS (SELECT pid, SUM(w) AS sw FROM m GROUP BY pid),
    credits AS (
      SELECT m.touch AS touch_type,
             (m.cents * 1000 * m.w) // tot.sw AS credit
      FROM m JOIN tot USING (pid)
      UNION ALL
      SELECT 'direct' AS touch_type, p.cents * 1000 AS credit
      FROM p ANTI JOIN m USING (pid)
    )
    SELECT touch_type, COUNT(*) AS n_credits,
           CAST(SUM(credit) AS BIGINT) AS credit_cents_1e3
    FROM credits GROUP BY touch_type
    """,
)
def attribution_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decay multi-touch attribution with a 1-day half-life over
    the 7-day lookback — the fourth standard model, closing the family
    (last-touch as-of, linear equal-split, U-shaped position). Decay
    weights are POWER-OF-TWO discretized by age day: 64,32,...,1 —
    exact integers, no exp()/float half-life math to drift across
    engines — and each touch's credit is div(cents*1000*w, sum w)
    milli-cents. The boundary-exact 7-day-old touch falls into the
    ELSE weight 1 (same as day 6), keeping the closed interval total.

    Scale: identical shape to attribution_linear — week-bucketized
    interval join (2-row explode per purchase), one purchase-keyed
    weight-sum fold, no windows over all events. Overflow headroom:
    cents*1000*64 stays ~16x under int64 for any plausible order."""
    e = load(spark, sf_dir, "events")
    lookback = 604_800_000_000_000
    day_ns = 86_400_000_000_000
    p = e.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        "user_id",
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
        (F.col("ts") - F.lit(lookback)).alias("t0"),
        (F.col("ts") + F.lit(1)).alias("t1"),
    )
    tch = (
        e.where(F.col("event_type").isin("click", "view", "signup"))
        .groupBy("user_id", F.col("ts").alias("tt"))
        .agg(F.max("event_type").alias("touch"))
    )
    m = temporal_ops.interval_join(
        tch,
        p,
        on=["user_id"],
        point_ts="tt",
        start_col="t0",
        end_col="t1",
        bucket_width=lookback,
    ).select(
        "pid",
        "cents",
        "touch",
        F.expr(
            f"CASE (t1 - 1 - tt) div {day_ns}"
            " WHEN 0 THEN 64 WHEN 1 THEN 32 WHEN 2 THEN 16"
            " WHEN 3 THEN 8 WHEN 4 THEN 4 WHEN 5 THEN 2"
            " ELSE 1 END"
        ).alias("w"),
    )
    tot = m.groupBy("pid").agg(F.sum("w").alias("sw"))
    credits = (
        m.join(tot, "pid")
        .select(
            F.col("touch").alias("touch_type"),
            F.expr("div(cents * 1000 * w, sw)").alias("credit"),
        )
        .unionByName(
            p.join(m.select("pid").distinct(), "pid", "left_anti").select(
                F.lit("direct").alias("touch_type"),
                (F.col("cents") * 1000).alias("credit"),
            )
        )
    )
    return credits.groupBy("touch_type").agg(
        F.count("*").alias("n_credits"),
        F.sum("credit").cast("long").alias("credit_cents_1e3"),
    )


@register(
    "grouping_sets_pricing",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
           CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls,
           CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                            (l_returnflag), (l_linestatus), ())
    """,
)
def grouping_sets_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with GROUPING() markers — completes the
    multi-level-aggregate family next to rollup_region_nation and
    cube_pricing. The grouping flags disambiguate a grouped-out NULL
    from a data NULL, the contract BI layers depend on. One shuffle:
    Spark expands the four sets map-side then aggregates once."""
    tag = abs(hash(sf_dir)) % 100000
    load(spark, sf_dir, "lineitem").createOrReplaceTempView(
        f"lineitem_gs{tag}"
    )
    return spark.sql(
        f"""
        SELECT l_returnflag, l_linestatus,
               CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
               CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls,
               CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
               COUNT(*) AS n_rows
        FROM lineitem_gs{tag}
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), (l_linestatus), ())
        """
    )


@register(
    "schema_evolution_union",
    """
    SELECT o_orderkey, o_custkey, o_totalprice,
           CAST(NULL AS VARCHAR) AS o_orderpriority, 1 AS src_version
    FROM orders WHERE o_orderkey % 2 = 0
    UNION ALL BY NAME
    SELECT o_orderkey, o_orderpriority, CAST(NULL AS BIGINT) AS o_custkey,
           CAST(NULL AS DOUBLE) AS o_totalprice, 2 AS src_version
    FROM orders WHERE o_orderkey % 2 = 1
    """,
)
def schema_evolution_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution read: two slices of the same logical table
    written under DIFFERENT schema versions (v1 carries custkey+price,
    v2 dropped those and added orderpriority) union into one frame
    with missing columns as NULL — ``unionByName(allowMissingColumns
    =True)``, the Spark-native mergeSchema contract a 100 TB lake
    needs when producers roll schemas forward mid-partition. Pure
    row-local projection; no shuffle."""
    o = load(spark, sf_dir, "orders")
    v1 = o.where(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.lit(1).alias("src_version"),
    )
    v2 = o.where(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey",
        "o_orderpriority",
        F.lit(2).alias("src_version"),
    )
    return v1.unionByName(v2, allowMissingColumns=True)


@register(
    "funnel_time_to_convert",
    """
    WITH v AS (
      SELECT user_id, MIN(epoch_ns(ts)) AS t_view
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(epoch_ns(e.ts)) AS t_conv
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'purchase' AND epoch_ns(e.ts) >= v.t_view
      GROUP BY e.user_id
    ),
    d AS (
      SELECT (c.t_conv - v.t_view) // 1000000 AS delta_ms
      FROM v JOIN c ON v.user_id = c.user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
           quantile_cont(delta_ms, 0.50) AS p50_ms,
           quantile_cont(delta_ms, 0.90) AS p90_ms,
           CAST(MAX(delta_ms) AS BIGINT) AS max_ms
    FROM d
    """,
)
def funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: per user, first 'view' to first
    subsequent 'purchase'; reports exact interpolated p50/p90 of the
    millisecond deltas (Spark percentile() and DuckDB quantile_cont
    share the (n-1)*q interpolation — same contract as
    priority_quantiles). The latency companion to events_funnel's
    conversion counts. Scale: two user-keyed folds + one tiny global
    percentile over per-user scalars (one row per converted user, not
    per event)."""
    e = load(spark, sf_dir, "events")
    v = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        e.where(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .where(F.col("ts") >= F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_conv"))
    )
    d = v.join(c, "user_id").select(
        F.expr("div(t_conv - t_view, 1000000)").alias("delta_ms")
    )
    return d.agg(
        F.count("*").cast("long").alias("n_converted"),
        F.expr("percentile(delta_ms, 0.50)").alias("p50_ms"),
        F.expr("percentile(delta_ms, 0.90)").alias("p90_ms"),
        F.max("delta_ms").cast("long").alias("max_ms"),
    )


@register(
    "vocab_top_tokens",
    f"""
    WITH toks AS (
      SELECT unnest(string_split({_SQL_NORM}, ' ')) AS token
      FROM documents
    ),
    c AS (
      SELECT token, COUNT(*) AS n FROM toks
      WHERE token <> '' GROUP BY token
    )
    SELECT token,
           CAST(row_number() OVER (ORDER BY n DESC, token) AS BIGINT)
             AS token_id,
           n AS n_occurrences
    FROM c
    ORDER BY token_id
    LIMIT 4096
    """,
)
def vocab_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer vocabulary build: top-4096 whitespace tokens by
    frequency, assigned dense ids by (count desc, token) — the
    deterministic vocab-construction step of a training pipeline.
    Scale: one map-side-combinable token count; the ranking window
    runs over DISTINCT tokens (vocab-scale, ~10^5-10^6 rows at any
    corpus size — token frequency follows Zipf, not corpus size), and
    TakeOrdered caps the sort at the vocab limit."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(F.split(text_ops._norm(F.col("text")), " ")).alias("token")
    ).where(F.col("token") != "")
    c = toks.groupBy("token").agg(F.count("*").alias("n"))
    w = Window.orderBy(F.col("n").desc(), F.col("token"))
    return (
        c.select(
            "token",
            F.row_number().over(w).cast("long").alias("token_id"),
            F.col("n").alias("n_occurrences"),
        )
        .orderBy("token_id")
        .limit(4096)
    )


@register(
    "class_weights",
    """
    WITH c AS (SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang),
    t AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS total,
                 CAST(COUNT(*) AS BIGINT) AS k FROM c)
    SELECT c.lang, c.n_docs,
           (t.total * 1000000) // (t.k * c.n_docs) AS weight_1e6
    FROM c, t
    """,
)
def class_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-frequency class weights (sklearn's 'balanced' formula,
    integer fixed-point): w_c = total / (k * n_c). The loss-reweighting
    companion to domain_mixture for imbalanced training corpora.
    Scale: one groupBy + a 1-row cross join (broadcast literal)."""
    c = (
        load(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count("*").alias("n_docs"))
    )
    t = c.agg(
        F.sum("n_docs").cast("long").alias("total"),
        F.count("*").cast("long").alias("k"),
    )
    return c.crossJoin(F.broadcast(t)).select(
        "lang",
        "n_docs",
        F.expr("div(total * 1000000, k * n_docs)").alias("weight_1e6"),
    )


@register(
    "feature_hashing",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split({_SQL_NORM}, ' ')) AS token
      FROM documents WHERE doc_id < 1000
    ),
    h AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5('feat-v1:' || token), 1, 15))
                  AS BIGINT) AS hv
      FROM toks WHERE token <> ''
    )
    SELECT doc_id, hv % 1024 AS feature_idx,
           CAST(SUM(CASE WHEN (hv // 1024) % 2 = 0 THEN 1 ELSE -1 END)
                AS BIGINT) AS val
    FROM h
    GROUP BY doc_id, hv % 1024
    HAVING SUM(CASE WHEN (hv // 1024) % 2 = 0 THEN 1 ELSE -1 END) <> 0
    """,
)
def feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick sparse features (Weinberger et al. '09): token →
    bucket md5(token) % 1024 with a signed contribution from the next
    hash bit (sign cancellation keeps the estimator unbiased), summed
    per (doc, bucket); zero-sum cells drop out, matching a sparse
    vector's storage contract. Doc slice < 1000 bounds gate output;
    the operator itself is corpus-wide. Scale: pure row-local hashing
    + ONE map-side-combinable groupBy — no vocabulary state, the
    reason the hashing trick exists at 100 TB."""
    d = load(spark, sf_dir, "documents").where(F.col("doc_id") < 1000)
    toks = d.select(
        "doc_id",
        F.explode(F.split(text_ops._norm(F.col("text")), " ")).alias("token"),
    ).where(F.col("token") != "")
    hv = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("feat-v1:"), F.col("token"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    sign = F.when(
        F.expr("pmod(div(hv, 1024), 2)") == 0, F.lit(1)
    ).otherwise(F.lit(-1))
    return (
        toks.withColumn("hv", hv)
        .select(
            "doc_id",
            F.pmod(F.col("hv"), F.lit(1024)).alias("feature_idx"),
            sign.alias("s"),
        )
        .groupBy("doc_id", "feature_idx")
        .agg(F.sum("s").cast("long").alias("val"))
        .where(F.col("val") != 0)
    )


@register(
    "priority_quantile_disc",
    """
    WITH r AS (
      SELECT o_orderpriority, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice, o_orderkey) AS rn,
             COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
      FROM orders
    )
    SELECT o_orderpriority,
           CAST(MAX(CASE WHEN rn = (500 * n + 999) // 1000
                         THEN o_totalprice END) AS DOUBLE) AS p50_disc,
           CAST(MAX(CASE WHEN rn = (900 * n + 999) // 1000
                         THEN o_totalprice END) AS DOUBLE) AS p90_disc,
           CAST(MAX(n) AS BIGINT) AS n_orders
    FROM r GROUP BY o_orderpriority
    """,
)
def priority_quantile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISCRETE quantiles per priority class (the value at rank
    ceil(q*n), ties broken by order key) — the no-interpolation twin
    of priority_quantiles, defined by explicit integer rank math so
    both engines pick the IDENTICAL row (quantile_disc/percentile
    implementations differ in rounding conventions across engines;
    rank arithmetic does not). Scale: one priority-keyed window
    shuffle + a tiny groupBy — no global sort."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    wn = Window.partitionBy("o_orderpriority")
    r = o.select(
        "o_orderpriority",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )
    pick = lambda q: F.max(  # noqa: E731
        F.when(
            F.col("rn") == F.expr(f"div({q} * n + 999, 1000)"),
            F.col("o_totalprice"),
        )
    )
    return r.groupBy("o_orderpriority").agg(
        pick(500).cast("double").alias("p50_disc"),
        pick(900).cast("double").alias("p90_disc"),
        F.max("n").cast("long").alias("n_orders"),
    )


_SEMANTIC_DEDUP_SQL = f"""
    WITH asg AS ({_kmeans_oracle_sql(8, 2)}),
    v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
    SELECT ca.vec_id AS doc_a, cb.vec_id AS doc_b,
           CAST(ca.cluster AS BIGINT) AS cluster,
           CAST(floor(1000000.0 * list_inner_product(a.e, b.e)
                      / (sqrt(list_inner_product(a.e, a.e))
                         * sqrt(list_inner_product(b.e, b.e)))) AS BIGINT)
             AS cos_1e6
    FROM asg ca JOIN asg cb
      ON ca.cluster = cb.cluster AND ca.vec_id < cb.vec_id
    JOIN v a ON a.vec_id = ca.vec_id
    JOIN v b ON b.vec_id = cb.vec_id
    WHERE floor(1000000.0 * list_inner_product(a.e, b.e)
                / (sqrt(list_inner_product(a.e, a.e))
                   * sqrt(list_inner_product(b.e, b.e)))) >= 420000
    """


@register("semantic_dedup", _SEMANTIC_DEDUP_SQL)
def semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-shape semantic deduplication (Abbas et al. '23):
    k-means the embedding space (exact-int Lloyd, k=8, 2 iters —
    similarity.kmeans_assign_int), then search near-duplicate cosine
    pairs ONLY within each cluster. Clustering bounds the quadratic
    pair search to 1/k of the corpus per cluster — the property that
    makes embedding dedup tractable at billions of documents (the
    cross-cluster pairs it skips are the method's documented recall
    trade). In-cluster pairs run the two-stage contract of
    similarity.grouped_neardup_pairs: one numpy panel matmul per
    cluster prefilters with a rounding margin (9x faster at 10x scale
    than an interpreted per-pair HOF fold — 90s -> 10s measured), then
    the deterministic left-to-right JVM dot product rescores the few
    candidates, so the oracle (the unrolled kmeans twin + an
    in-cluster pair join) still matches hash-exactly.

    Scale: assignment is a broadcast-centroid matmul (no shuffle);
    the pair stage shuffles once on cluster id into per-cluster panel
    tasks; clusters beyond panel RAM sub-block with
    embedding_neardup_pairs' hash scheme. Both stages' dup-ratio
    probes are footer-pre-gated (_collapse_gate): the r5 probe jobs
    cost 2.2s at sf0.1 where the collapse can never pay."""
    emb = load(spark, sf_dir, "embeddings")
    collapse = _collapse_gate(sf_dir, "embeddings")
    asg = sim_ops.kmeans_assign_int(emb, k=8, iters=2, collapse=collapse)
    j = asg.join(emb.select("vec_id", "embedding"), "vec_id")
    return sim_ops.grouped_neardup_pairs(
        j, "cluster", threshold_1e6=420000, collapse=collapse
    ).select(
        "doc_a",
        "doc_b",
        F.col("grp").alias("cluster"),
        "cos_1e6",
    )


@register(
    "shard_assignment_audit",
    """
    SELECT CAST(('0x' || substr(md5('shard-v1:' || CAST(doc_id AS VARCHAR)),
                                1, 15)) AS BIGINT) % 16 AS shard,
           COUNT(*) AS n_docs
    FROM documents GROUP BY shard
    """,
)
def shard_assignment_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Planned training-shard layout audit (sinks/shards
    .shard_assignment, n=16): per-shard doc counts of the md5-stable
    doc→shard map, proving balance before paying the write shuffle.
    The same hash drives write_training_shards, so this oracle row is
    the correctness evidence for the shard sink's assignment."""
    from clickhouse_only_importer_prototype_spark.sinks.shards import (
        shard_assignment,
    )

    return (
        shard_assignment(load(spark, sf_dir, "documents"), n_shards=16)
        .groupBy(F.col("shard").cast("long").alias("shard"))
        .agg(F.count("*").alias("n_docs"))
    )


@register(
    "stream_sliding_counts",
    """
    WITH e AS (
      SELECT epoch_ns(ts) // 1800000000000 AS b, event_type FROM events
    )
    SELECT CAST((b - u.k) * 1800000000000 AS BIGINT) AS w_start_ns,
           event_type, COUNT(*) AS n_events
    FROM e, UNNEST([0, 1]) AS u(k)
    GROUP BY 1, 2
    """,
)
def stream_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming SLIDING-window per-type counts (streaming/events.
    sliding_type_counts, 1h window / 30m slide) driven as a batch
    twin: every event lands in exactly two overlapping windows, the
    watermarked aggregation streams through an availableNow source in
    UPDATE mode, and the sink must equal the batch sliding rollup
    (events_sliding_counts' oracle) — pinning that overlapping-window
    state produces the same multiset a batch window-explode does.
    State scale: open windows per key = window/slide (2), bounded by
    the watermark horizon."""
    from clickhouse_only_importer_prototype_spark.streaming import (
        events as streaming_events,
    )

    sink = _stream_twin(
        spark,
        sf_dir,
        "events",
        "stream_sliding_",
        lambda src: streaming_events.sliding_type_counts(
            streaming_events.read_events_stream(spark, src)
        ),
        output_mode="update",
    )
    return sink.select(
        (F.col("window_start").cast("long") * F.lit(1_000_000_000))
        .cast("long")
        .alias("w_start_ns"),
        "event_type",
        "n_events",
    )


_FK_EDGES = [
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation.n_regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"),
]


def _fk_audit_sql() -> str:
    parts = []
    for edge, child, ck, parent, pk in _FK_EDGES:
        parts.append(
            f"""
    SELECT '{edge}' AS fk_edge,
           (SELECT COUNT(*) FROM {child}) AS n_rows,
           (SELECT COUNT(*) FROM {child} WHERE {ck} IS NULL) AS n_null_keys,
           (SELECT COUNT(*) FROM {child} c ANTI JOIN {parent} p
              ON c.{ck} = p.{pk}) AS n_orphans"""
        )
    return "\n    UNION ALL\n".join(parts)


@register("fk_integrity_audit", _fk_audit_sql())
def fk_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit over the catalog's seven FK edges:
    per edge, child row count, NULL keys, and orphans (child keys with
    no parent) — the DQ check every warehouse load gate runs, as data
    rather than constraint DDL. A clean catalog reports all-zero
    orphan columns; the query is the detector, not an assertion.

    Scale: each edge is one left-anti join. Only the two FIXED-SIZE
    dimensions (nation, region) are force-broadcast; every other
    parent (orders, customer, part, supplier) GROWS with the corpus,
    so its strategy is left to AQE — broadcast while its single key
    column fits the threshold, shuffle anti-join co-partitioned on the
    key beyond it (forcing a broadcast of a scale-variable parent is
    exactly the plan that dies first at 100 TB — measured: the forced
    variant OOM'd the 10x stress gate). NULL FK keys never match in
    an anti-join probe (they'd count as orphans); they are measured
    separately and excluded from the orphan probe, matching the SQL
    ANTI JOIN's NULL semantics."""
    fixed_dims = {"nation", "region"}
    out = None
    for edge, child, ck, parent, pk in _FK_EDGES:
        c = load(spark, sf_dir, child).select(F.col(ck).alias("k"))
        p = load(spark, sf_dir, parent).select(F.col(pk).alias("k"))
        if parent in fixed_dims:
            p = F.broadcast(p)
        orphans = (
            c.where(F.col("k").isNotNull())
            .join(p, "k", "left_anti")
            .agg(F.count("*").alias("n_orphans"))
        )
        row = (
            c.agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(
                    F.when(F.col("k").isNull(), 1).otherwise(0)
                ).cast("long").alias("n_null_keys"),
            )
            .crossJoin(orphans)
            .select(
                F.lit(edge).alias("fk_edge"),
                "n_rows",
                "n_null_keys",
                F.col("n_orphans").cast("long").alias("n_orphans"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


@register(
    "priority_winsorized_spend",
    """
    WITH c AS (
      SELECT o_orderpriority,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             o_orderkey
      FROM orders
    ),
    r AS (
      SELECT o_orderpriority, cents,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY cents, o_orderkey) AS rn,
             COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
      FROM c
    ),
    th AS (
      SELECT o_orderpriority,
             MAX(CASE WHEN rn = (50 * n + 999) // 1000
                      THEN cents END) AS lo,
             MAX(CASE WHEN rn = (950 * n + 999) // 1000
                      THEN cents END) AS hi,
             MAX(n) AS n
      FROM r GROUP BY o_orderpriority
    )
    SELECT c.o_orderpriority,
           CAST(th.n AS BIGINT) AS n_orders,
           CAST(MAX(th.lo) AS BIGINT) AS p05_cents,
           CAST(MAX(th.hi) AS BIGINT) AS p95_cents,
           CAST(SUM(least(greatest(c.cents, th.lo), th.hi)) // th.n
                AS BIGINT) AS winsorized_mean_cents,
           CAST(SUM(c.cents) // th.n AS BIGINT) AS raw_mean_cents
    FROM c JOIN th USING (o_orderpriority)
    GROUP BY c.o_orderpriority, th.n
    """,
)
def priority_winsorized_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized robust mean per priority class: spend clamped at the
    DISCRETE p05/p95 ranks (ceil(q·n), ties by order key — the
    engine-convention-free rank math of priority_quantile_disc), then
    an exact integer cents mean — outlier-resistant spend without
    float summation-order drift. Scale: one priority-keyed window for
    ranks, a 5-row threshold broadcast back into the fold; no global
    sort."""
    o = load(spark, sf_dir, "orders")
    c = o.select(
        "o_orderpriority",
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
        "o_orderkey",
    )
    w = Window.partitionBy("o_orderpriority").orderBy("cents", "o_orderkey")
    wn = Window.partitionBy("o_orderpriority")
    r = c.select(
        "o_orderpriority",
        "cents",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )
    th = r.groupBy("o_orderpriority").agg(
        F.max(
            F.when(
                F.col("rn") == F.expr("div(50 * n + 999, 1000)"),
                F.col("cents"),
            )
        ).alias("lo"),
        F.max(
            F.when(
                F.col("rn") == F.expr("div(950 * n + 999, 1000)"),
                F.col("cents"),
            )
        ).alias("hi"),
        F.max("n").alias("n"),
    )
    return (
        c.join(F.broadcast(th), "o_orderpriority")
        .groupBy("o_orderpriority", "n")
        .agg(
            F.max("lo").cast("long").alias("p05_cents"),
            F.max("hi").cast("long").alias("p95_cents"),
            F.sum(
                F.least(F.greatest(F.col("cents"), F.col("lo")), F.col("hi"))
            ).alias("wsum"),
            F.sum("cents").alias("rsum"),
        )
        .select(
            "o_orderpriority",
            F.col("n").cast("long").alias("n_orders"),
            "p05_cents",
            "p95_cents",
            F.expr("div(wsum, n)").cast("long").alias("winsorized_mean_cents"),
            F.expr("div(rsum, n)").cast("long").alias("raw_mean_cents"),
        )
    )


@register(
    "nation_revenue_share",
    """
    WITH rev AS (
      SELECT n.n_name AS nation, r.r_name AS region,
             CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY n.n_name, r.r_name
    )
    SELECT nation, region, cents,
           CAST((cents * 1000000) // SUM(cents) OVER (PARTITION BY region)
                AS BIGINT) AS share_of_region_1e6
    FROM rev
    """,
)
def nation_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-parent: each nation's exact-cents revenue share of its
    region (integer parts-per-million) — the classic BI percent-of-
    total, computed as one fact aggregation plus a region-keyed window
    over the 25-row nation rollup (window cost is dimension-scale, not
    fact-scale). nation/region (fixed-size dims) broadcast explicitly;
    customer scales with the corpus so its join strategy is AQE's call
    (broadcast under the threshold, shuffle join beyond — never force-
    broadcast a scale-variable table). The fact shuffles once for the
    groupBy."""
    o = load(spark, sf_dir, "orders").select(
        "o_custkey",
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    r = load(spark, sf_dir, "region").select("r_regionkey", "r_name")
    rev = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), F.col("c_nationkey") == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy(F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
        .agg(F.sum("cents").cast("long").alias("cents"))
    )
    w = Window.partitionBy("region")
    return rev.select(
        "nation",
        "region",
        "cents",
        # cents*1e6 through DECIMAL(38,0): region-scale cent sums pass
        # int64 around 9.2e12 cents (~$92B — hit at the 100x stress
        # gate, ARITHMETIC_OVERFLOW under ANSI). Spark's div on
        # decimals is exact integral division returning LONG, and
        # truncation == floor on non-negative revenue, so the DuckDB
        # HUGEINT oracle still matches bit-for-bit.
        F.expr(
            "CAST(div(CAST(cents AS DECIMAL(38,0)) * 1000000, "
            "sum(cents) OVER (PARTITION BY region)) AS BIGINT)"
        ).alias("share_of_region_1e6"),
    )


@register(
    "customer_concentration",
    """
    WITH spend AS (
      SELECT c.c_mktsegment AS segment, c.c_custkey,
             CAST(COALESCE(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)),
                           0) AS BIGINT) AS cents
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_mktsegment, c.c_custkey
    ),
    r AS (
      SELECT segment, cents,
             row_number() OVER (PARTITION BY segment
                                ORDER BY cents DESC, c_custkey) AS rn,
             COUNT(*) OVER (PARTITION BY segment) AS n
      FROM spend
    )
    SELECT segment,
           CAST(MAX(n) AS BIGINT) AS n_customers,
           CAST(SUM(cents) AS BIGINT) AS total_cents,
           CAST(SUM(CASE WHEN rn <= (100 * n + 999) // 1000
                         THEN cents ELSE 0 END) AS BIGINT)
             AS top10pct_cents,
           CAST((SUM(CASE WHEN rn <= (100 * n + 999) // 1000
                          THEN cents ELSE 0 END) * 1000000)
                // greatest(SUM(cents), 1) AS BIGINT) AS share_1e6
    FROM r GROUP BY segment
    """,
)
def customer_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration per market segment: exact-cents share
    held by the top decile of customers (ceil(0.1·n) by spend, ties by
    custkey) — the Lorenz/Pareto 'whale curve' point product teams
    track, in pure int64 (no float shares until the final ppm
    division). Scale: one fact groupBy to per-customer spend, one
    segment-keyed window for ranks, one fold — never a global sort."""
    c = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    o = load(spark, sf_dir, "orders").select(
        "o_custkey",
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    spend = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy(
            F.col("c_mktsegment").alias("segment"), F.col("c_custkey")
        )
        .agg(F.coalesce(F.sum("cents"), F.lit(0)).cast("long").alias("cents"))
    )
    w = Window.partitionBy("segment").orderBy(
        F.col("cents").desc(), F.col("c_custkey")
    )
    wn = Window.partitionBy("segment")
    r = spend.select(
        "segment",
        "cents",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )
    top = F.col("rn") <= F.expr("div(100 * n + 999, 1000)")
    return r.groupBy("segment").agg(
        F.max("n").cast("long").alias("n_customers"),
        F.sum("cents").cast("long").alias("total_cents"),
        F.sum(F.when(top, F.col("cents")).otherwise(0))
        .cast("long")
        .alias("top10pct_cents"),
        # segment-scale cent sums x 1e6 overflow int64 past ~$92B —
        # same DECIMAL(38,0) exact-div shape as nation_revenue_share
        F.expr(
            "CAST(div(CAST(sum(CASE WHEN rn <= div(100 * n + 999, 1000) "
            "THEN cents ELSE 0 END) AS DECIMAL(38,0)) * 1000000, "
            "greatest(sum(cents), 1)) AS BIGINT)"
        ).alias("share_1e6"),
    )


@register(
    "heavy_hitter_bigrams",
    f"""
    WITH toks AS (
      SELECT string_split({_SQL_NORM}, ' ') AS ts FROM documents
    ),
    bg AS (
      SELECT ts[g.i] || ' ' || ts[g.i+1] AS tok
      FROM toks CROSS JOIN LATERAL
        (SELECT unnest(range(1, len(ts))) AS i) g
      WHERE ts[g.i] <> '' AND ts[g.i+1] <> ''
    ),
    c AS (SELECT tok, COUNT(*) AS n FROM bg GROUP BY tok),
    t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM c)
    SELECT tok AS token, n AS n_occurrences,
           (n * 1000000) // total AS share_1e6
    FROM c, t WHERE n * 850 >= total
    """,
)
def heavy_hitter_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact corpus bigrams above 1/850 frequency share, found by
    Misra-Gries candidate nomination + exact rescore
    (operators/sketches.heavy_hitters). The "which phrases dominate
    this crawl slice?" profiling pass — and the bounded-memory shape
    for DATA-scale key spaces (URLs, long shingles) where a plain
    groupBy's partial aggregation degenerates into shuffling the whole
    input: the MG pass keeps O(sketch) state per partition and nothing
    downstream shuffles more than the nominated candidate set. The
    final set is exact (sketch module docstring has the superset
    proof), which is what lets DuckDB hash-match it."""
    from clickhouse_only_importer_prototype_spark.operators import sketches

    d = load(spark, sf_dir, "documents")
    # min-parallelism guard: the toy fixture is ONE parquet split, which
    # would serialize the Python MG stage; at real corpus scale the scan
    # has >> cores splits and this is a no-op (no shuffle inserted)
    cores = spark.sparkContext.defaultParallelism
    if d.rdd.getNumPartitions() < cores:
        d = d.repartition(cores)
    toks = d.select(
        F.explode(
            sketches.bigram_tokens(text_ops._norm(F.col("text")))
        ).alias("tok")
    )
    return sketches.heavy_hitters(toks, "tok", den=850)


@register(
    "source_token_drift",
    f"""
    WITH toks AS (
      SELECT source AS g, unnest(string_split({_SQL_NORM}, ' ')) AS tok
      FROM documents
    ),
    c AS (
      SELECT g, tok, COUNT(*) AS c FROM toks
      WHERE tok <> '' GROUP BY g, tok
    ),
    n AS (SELECT g, CAST(SUM(c) AS BIGINT) AS n FROM c GROUP BY g),
    sh AS (
      SELECT c.g, c.tok, (c.c * 1000000) // n.n AS s
      FROM c JOIN n ON c.g = n.g
    ),
    z AS (SELECT g, SUM(s) AS z FROM sh GROUP BY g),
    m AS (
      SELECT a.g AS ga, b.g AS gb,
             SUM(abs(a.s - b.s)) AS m, SUM(a.s) AS s1, SUM(b.s) AS s2
      FROM sh a JOIN sh b ON a.tok = b.tok AND a.g < b.g
      GROUP BY a.g, b.g
    )
    SELECT za.g AS group_a, zb.g AS group_b,
           CAST((COALESCE(m.m, 0) + (za.z - COALESCE(m.s1, 0))
                 + (zb.z - COALESCE(m.s2, 0))) // 2 AS BIGINT) AS tv_1e6
    FROM z za JOIN z zb ON za.g < zb.g
    LEFT JOIN m ON m.ga = za.g AND m.gb = zb.g
    """,
)
def source_token_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise total-variation distance between per-source token
    distributions (operators/profile.group_tv_distance) — the corpus
    drift / domain-shift audit that tells a data-mixing pipeline which
    sources are interchangeable and which add genuinely different
    text. Integer per-million shares keep both engines exact in int64
    at any corpus size (no log(), no cross-multiplied count products);
    the G^2 pair fan-out is slice-scale, never data-scale."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "source",
        F.explode(F.split(text_ops._norm(F.col("text")), " ")).alias("tok"),
    ).where(F.col("tok") != "")
    from clickhouse_only_importer_prototype_spark.operators.profile import (
        group_tv_distance,
    )

    return group_tv_distance(toks, "source", "tok")


@register(
    "corpus_datacard",
    f"""
    WITH {_SQL_QSCORE_CTES},
    qd AS (
      SELECT doc_id, n_tokens, quality_score AS score FROM q
    ),
    b AS (
      SELECT d.doc_id, d.source, md5({_SQL_NORM}) AS fp,
             qd.n_tokens, qd.score
      FROM documents d JOIN qd ON d.doc_id = qd.doc_id
    ),
    s AS (
      SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
             CAST(COUNT(DISTINCT fp) AS BIGINT) AS n_distinct_docs,
             CAST(SUM(score) AS BIGINT) AS qsum,
             CAST(SUM(CASE WHEN score >= 2000 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_high_quality
      FROM b GROUP BY source
    ),
    lc AS (
      SELECT source, lang, COUNT(*) AS n FROM documents
      GROUP BY source, lang
    ),
    tl AS (
      SELECT source, lang AS top_lang FROM (
        SELECT source, lang,
               row_number() OVER (PARTITION BY source
                                  ORDER BY n DESC, lang) AS rn
        FROM lc
      ) WHERE rn = 1
    )
    SELECT s.source, n_docs, n_tokens, n_distinct_docs,
           ((n_docs - n_distinct_docs) * 1000) // n_docs AS dup_per_1000,
           qsum // n_docs AS mean_quality,
           n_high_quality, tl.top_lang
    FROM s JOIN tl ON s.source = tl.source
    """,
)
def corpus_datacard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus data card — the summary table a dataset
    release ships with: document/token volume, exact-dup rate
    (md5-fingerprint distinct), mean and high-rate of the integer
    quality score, and majority language (ties broken on lang code).
    One composition over three already-oracled primitives
    (text.quality_score, text.fingerprint's md5 key, hash-group
    dedup), so the card's numbers are consistent BY CONSTRUCTION with
    what the curation operators will actually do to the corpus.

    Scale: ONE text pass — the fingerprint and source key ride through
    the scorer's projection (quality_score's ``keep``/``keep_features``
    fusion), so there is no doc_id self-join and the corpus is scanned
    once for the stats fold; then a window over the source x lang
    count table (slice-scale). Mean quality divides truncation-style
    (Spark div == DuckDB // on negatives)."""
    d = load(spark, sf_dir, "documents")
    q = text_ops.quality_score(
        d.withColumn("fp", F.md5(text_ops._norm(F.col("text")))),
        keep=("source", "fp"),
        keep_features=("n_tokens",),
    )
    s = (
        q.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.count_distinct("fp").alias("n_distinct_docs"),
            F.sum("quality_score").cast("long").alias("__qsum"),
            F.count_if(F.col("quality_score") >= 2000).alias(
                "n_high_quality"
            ),
        )
    )
    lc = d.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("__n"))
    wl = Window.partitionBy("source").orderBy(
        F.col("__n").desc(), F.col("lang")
    )
    tl = (
        lc.select(
            "source", "lang", F.row_number().over(wl).alias("__rn")
        )
        .where(F.col("__rn") == 1)
        .select("source", F.col("lang").alias("top_lang"))
    )
    return s.join(tl, "source").select(
        "source",
        "n_docs",
        "n_tokens",
        "n_distinct_docs",
        F.expr("div((n_docs - n_distinct_docs) * 1000, n_docs)").alias(
            "dup_per_1000"
        ),
        F.expr("div(__qsum, n_docs)").alias("mean_quality"),
        "n_high_quality",
        "top_lang",
    )


@register(
    "contrastive_negatives",
    """
    WITH t AS (SELECT COUNT(*) AS n FROM documents),
    j AS (SELECT unnest(range(0, 3)) AS j),
    h AS (
      SELECT d.doc_id AS anchor_id, j.j,
             CAST(('0x' || substr(md5('cneg-v1:'
                    || CAST(d.doc_id AS VARCHAR) || ':'
                    || CAST(j.j AS VARCHAR)), 1, 15)) AS BIGINT) AS hv,
             t.n
      FROM documents d CROSS JOIN j CROSS JOIN t
    )
    SELECT anchor_id, CAST(j AS BIGINT) AS j,
           CAST((anchor_id + 1 + hv % (n - 1)) % n AS BIGINT)
             AS negative_id
    FROM h
    """,
)
def contrastive_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic contrastive negative sampling
    (operators/sampling.contrastive_negatives): 3 uniform whole-corpus
    negatives per document over the dense doc_id space — reproducible
    (md5 draw), anchor-free by construction (+1 offset shift), and a
    pure row-local k-wide explode: no corpus join until the payload
    fetch, which is a downstream co-partitioned id equi-join."""
    return sampling_ops.contrastive_negatives(
        load(spark, sf_dir, "documents"), k=3
    )


@register(
    "kfold_balance",
    f"""
    WITH a AS (
      SELECT CAST(('0x' || substr(md5('kfold-v1:'
                || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 5
               AS fold,
             CASE WHEN {_SQL_NORM} = '' THEN 0
                  ELSE CAST(len(string_split({_SQL_NORM}, ' ')) AS BIGINT)
             END AS n_toks
      FROM documents
    ),
    t AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM a)
    SELECT fold, COUNT(*) AS n_docs,
           CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
           (COUNT(*) * 1000) // total AS share_per_1000
    FROM a, t GROUP BY fold, total
    """,
)
def kfold_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-fold cross-validation assignment + balance audit
    (operators/sampling.kfold): per-fold document/token volume and
    per-mille share. Folds are disjoint/exhaustive by construction
    (hash mod k), stable across reruns AND corpus growth (existing
    ids never migrate folds). One row-local projection + one <= k-cell
    map-side fold; the 1-row total broadcasts."""
    d = sampling_ops.kfold(load(spark, sf_dir, "documents"), k=5)
    a = d.select(
        "fold", text_ops.token_count(F.col("text")).alias("n_toks")
    )
    s = a.groupBy("fold").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").cast("long").alias("n_tokens"),
    )
    t = a.agg(F.count(F.lit(1)).alias("total"))
    return s.crossJoin(F.broadcast(t)).select(
        "fold",
        "n_docs",
        "n_tokens",
        F.expr("div(n_docs * 1000, total)").alias("share_per_1000"),
    )


@register(
    "split_novelty_rate",
    f"""
    WITH sp AS (
      SELECT doc_id, lang,
             CASE WHEN {_SQL_HASH_BUCKET.format(salt="split-v1")} < 9000
                    THEN 'train'
                  WHEN {_SQL_HASH_BUCKET.format(salt="split-v1")} < 9500
                    THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    ),
    toks AS (
      SELECT doc_id, string_split({_SQL_NORM}, ' ') AS t FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id,
             t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
      FROM toks, UNNEST(range(1, greatest(len(t) - 1, 1))) AS u(i)
      WHERE len(t) >= 3
    ),
    tr AS (
      SELECT DISTINCT shingle FROM sh JOIN sp USING (doc_id)
      WHERE split = 'train'
    ),
    te AS (
      SELECT DISTINCT sp.lang, shingle FROM sh JOIN sp USING (doc_id)
      WHERE split = 'test'
    ),
    nv AS (
      SELECT lang, COUNT(*) AS n_novel
      FROM te ANTI JOIN tr USING (shingle) GROUP BY lang
    ),
    tt AS (SELECT lang, COUNT(*) AS n_test FROM te GROUP BY lang)
    SELECT tt.lang, n_test,
           CAST(COALESCE(n_novel, 0) AS BIGINT) AS n_novel,
           (COALESCE(n_novel, 0) * 1000) // n_test AS novelty_per_1000
    FROM tt LEFT JOIN nv USING (lang)
    """,
)
def split_novelty_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shingle novelty of the test split vs train, per language: what
    fraction of the eval set's distinct trigrams never occur in
    training data. The complement of split_leakage_audit — leakage
    counts near-copied DOCUMENTS, novelty measures how much of the
    eval set's raw n-gram material is genuinely unseen (a 0-novelty
    eval measures memorization, not generalization).

    Same oracled primitives end to end: hash_split's split-v1
    assignment and the dedup family's trigram shingle builder, so the
    metric is consistent by construction with the engine's own
    dedup/decontamination behavior. Scale: hash_split is a pure column
    expression, so the split label attaches BEFORE shingling — each
    side shingles only its own documents (test = 5% of the corpus)
    instead of exploding everything and filtering the shingle stream
    (measured at the 100x stress scale: 92.6s → see survey). The
    shingle frames then shuffle by shingle for the anti-join (the
    decontamination shape); everything after is distinct-shingle-scale.
    The test-side distinct set feeds both the anti-join and the
    denominator, so it persists (bounded by distinct trigram count;
    caller-owns-unpersist — the gate/bench clearCache() between
    queries, long-lived sessions do the same after their action)."""
    d = sampling_ops.hash_split(
        load(spark, sf_dir, "documents").select("doc_id", "lang", "text"),
        weights={"train": 0.9, "val": 0.05, "test": 0.05},
    )
    tr = (
        text_ops.shingles(d.where(F.col("split") == "train"), n=3)
        .select("shingle")
        .distinct()
    )
    te_docs = d.where(F.col("split") == "test")
    te = (
        text_ops.shingles(te_docs, n=3)
        .join(te_docs.select("doc_id", "lang"), "doc_id")
        .select("lang", "shingle")
        .distinct()
        .persist()
    )
    nv = (
        te.join(tr, "shingle", "left_anti")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_novel"))
    )
    tt = te.groupBy("lang").agg(F.count(F.lit(1)).alias("n_test"))
    return tt.join(nv, "lang", "left").select(
        "lang",
        "n_test",
        F.coalesce(F.col("n_novel"), F.lit(0)).cast("long").alias(
            "n_novel"
        ),
        F.expr(
            "div(coalesce(n_novel, 0) * 1000, n_test)"
        ).alias("novelty_per_1000"),
    )


@register(
    "stream_throttle_audit",
    f"""
    SELECT user_id,
           {ORACLE_FLOORDIV('epoch_ns(ts)', 86400000000000)} AS day_bucket,
           COUNT(*) AS n_events,
           CAST(greatest(COUNT(*) - 3, 0) AS BIGINT) AS n_throttled
    FROM events
    GROUP BY user_id, day_bucket
    """,
)
def stream_throttle_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user daily rate-limit audit as a custom stateful streaming
    operator (streaming/throttle.throttle_audit) driven as an
    availableNow batch twin. Runs the Spark 4 StatefulProcessor
    wiring (transformWithStateInPandas + MapState per day bucket)
    when the runtime supports it, else the applyInPandasWithState
    wiring with identical semantics — this container lacks protobuf,
    so the gate selects the latter here (module docstring documents
    the env gate). Update-mode emissions re-state a (user, day)'s
    running count each batch it is touched, so the batch-side rollup
    takes the max per key. The twin FORCES the multi-batch regime —
    the fixture is split into two source files and maxFilesPerTrigger
    is 1, so the same (user, day) genuinely crosses micro-batches and
    the oracle equality proves the state merge, not the single-batch
    degenerate. Oracle = the plain per-user-day count with the
    over-limit excess."""
    import os
    import uuid

    from clickhouse_only_importer_prototype_spark.streaming import (
        events as streaming_events,
        throttle as streaming_throttle,
    )

    def setup(src: str) -> None:
        # replace the single-file symlink with two half files so the
        # 1-file-per-trigger stream runs TWO batches over shared keys
        import glob
        import shutil
        import tempfile

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # normalize_ts folds timestamp[us] fixtures through
        # timestamp_ltz, which reads the session timezone; an
        # externally built non-UTC session would write shifted batch
        # files BEFORE read_events_stream's own UTC pin runs in
        # build() — pin it here too (round-8 review finding)
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        fixture = os.path.join(src, "events.parquet")
        ev = spark.read.parquet(fixture)
        # write both halves BEFORE unlinking: the half writes read the
        # fixture lazily, job-time
        for half in (0, 1):
            scratch = tempfile.mkdtemp(prefix="throttle_half_")
            ev.where(
                F.pmod(F.col("event_id"), F.lit(2)) == half
            ).coalesce(1).write.mode("overwrite").parquet(scratch)
            (part,) = glob.glob(os.path.join(scratch, "part-*.parquet"))
            shutil.move(
                part,
                os.path.join(
                    src, f"half{half}_{uuid.uuid4().hex[:8]}.parquet"
                ),
            )
            shutil.rmtree(scratch, ignore_errors=True)
        os.remove(fixture)

    def build(src: str) -> DataFrame:
        return streaming_throttle.throttle_audit(
            streaming_events.read_events_stream(
                spark, src, max_files_per_trigger=1
            ),
            limit=3,
        )

    sink = _stream_twin(
        spark,
        sf_dir,
        "events",
        "stream_throttle_",
        build,
        output_mode="update",
        setup=setup,
    )
    return sink.groupBy("user_id", "day_bucket").agg(
        F.max("n_events").cast("long").alias("n_events"),
        F.max("n_throttled").cast("long").alias("n_throttled"),
    )


@register(
    "stream_late_drop",
    f"""
    WITH m AS (SELECT MAX(epoch_ns(ts)) AS tmax FROM events),
    c AS (
      SELECT ((tmax - 3600000000000) // 3600000000000) * 3600000000000
             - 3600000000000 AS cut
      FROM m
    )
    SELECT {ORACLE_FLOORDIV('epoch_ns(e.ts)', 3600000000000)}
             AS hour_bucket,
           e.event_type,
           COUNT(*) AS n_events
    FROM events e, c
    WHERE NOT (e.event_id % 7 = 0 AND epoch_ns(e.ts) < c.cut)
    GROUP BY hour_bucket, event_type
    """,
)
def stream_late_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark DROP semantics, exercised for real (streaming/
    lateness.windowed_counts_append) — the one streaming contract the
    other eight twins structurally cannot test: they run availableNow
    single-batch or update mode, where late-data eviction never fires.

    Harness: the fixture is rewritten into THREE mtime-ordered source
    files and streamed with maxFilesPerTrigger=1, forcing three
    micro-batches in file order:

      batch 0 (primer)  — every row EXCEPT the late cohort; contains
                          the fixture max event time, so the watermark
                          advances to tmax - 1h at the next planning;
      batch 1 (flush)   — one sentinel row at tmax + 3h. Two jobs:
                          it pushes the EVICTION watermark for batch 2
                          past every real window end (append emits all
                          surviving windows), and it burns a batch so
                          the tmax - 1h watermark becomes the
                          LATE-EVENT filter value for batch 2 — since
                          SPARK-40925, stateful operators filter late
                          input with the PREVIOUS batch's planning
                          watermark while evicting with the current
                          one (measured here: a late batch arriving
                          directly after the primer is filtered with
                          the epoch watermark and merges instead of
                          dropping). The sentinel's own window stays
                          above the final watermark and self-excludes
                          (belt: the rollup also filters its
                          event_type);
      batch 2 (late)    — the cohort ``event_id % 7 == 0 AND ts <
                          cut`` where cut = hour_floor(tmax - 1h) - 1h
                          (streaming/lateness.late_cutoff_ns). Every
                          such row's window ends >= one full window
                          below the batch's late-event watermark, so
                          the append-mode aggregation DROPS all of
                          them — no gray boundary window by
                          construction, and the drop is invariant to
                          whether the filter keys on the row event
                          time or the window end.

    The proof is two-sided: the harness asserts the query progress
    reports numRowsDroppedByWatermark > 0 (the MECHANISM — rows were
    dropped by the watermark, not lost by the harness; the twin raises
    if no drop fired), and the oracle equality proves the EXTENT (the
    emitted counts equal the batch rollup MINUS exactly the late
    cohort). File order is pinned by explicit utimes 60s apart —
    FileStreamSource consumes oldest-modified first."""
    import os

    from clickhouse_only_importer_prototype_spark.streaming import (
        events as streaming_events,
        lateness as streaming_lateness,
    )

    HOUR_NS = streaming_lateness.HOUR_NS

    def setup(src: str) -> None:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # normalize_ts folds timestamp[us] fixtures through
        # timestamp_ltz, which reads the session timezone; an
        # externally built non-UTC session would write shifted batch
        # files BEFORE read_events_stream's own UTC pin runs in
        # build() — pin it here too (round-8 review finding)
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        fixture = os.path.join(src, "events.parquet")
        # normalize to the long-nanos contract BEFORE writing: the
        # stream schema is pinned from the rewritten files' footer, so
        # all three batches must share one ts type whatever shape the
        # driver fixture ships (nanos-long or timestamp[us])
        ev = streaming_events.normalize_ts(spark.read.parquet(fixture))
        tmin, tmax = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
        cut = streaming_lateness.late_cutoff_ns(tmax, HOUR_NS)
        if tmin >= cut:
            # loud, specific failure instead of the generic no-drop
            # RuntimeError in on_finish: a regenerated fixture whose
            # span is under ~2h has no possible late cohort
            raise RuntimeError(
                "events fixture span too short for a late cohort "
                f"(tmin={tmin} >= cut={cut})"
            )
        is_late = (F.pmod(F.col("event_id"), F.lit(7)) == 0) & (
            F.col("ts") < F.lit(cut)
        )
        sentinel = (
            ev.limit(1)
            .withColumn("event_id", F.lit(-1).cast("long"))
            .withColumn("ts", F.lit(tmax + 3 * HOUR_NS).cast("long"))
            .withColumn("event_type", F.lit("__sentinel__"))
        )
        parts = [
            ("b0_primer", ev.where(~is_late)),
            ("b1_flush", sentinel),
            ("b2_late", ev.where(is_late)),
        ]
        _write_ordered_source_files(src, parts)
        os.remove(fixture)

    def build(src: str) -> DataFrame:
        return streaming_lateness.windowed_counts_append(
            streaming_events.read_events_stream(
                spark, src, max_files_per_trigger=1
            ),
            window="1 hour",
            delay="1 hour",
        )

    def on_finish(handle) -> None:
        dropped = streaming_lateness.dropped_by_watermark(
            handle.recentProgress
        )
        if dropped <= 0:
            raise RuntimeError(
                "lateness twin ran without any watermark drop — the "
                "late micro-batch was not dropped by the watermark "
                f"(numRowsDroppedByWatermark total = {dropped})"
            )

    sink = _stream_twin(
        spark,
        sf_dir,
        "events",
        "stream_late_drop_",
        build,
        output_mode="append",
        setup=setup,
        on_finish=on_finish,
    )
    return sink.where(F.col("event_type") != "__sentinel__").select(
        (F.col("window_start").cast("long") / 3600)
        .cast("long")
        .alias("hour_bucket"),
        "event_type",
        F.col("n_events").cast("long").alias("n_events"),
    )


@register(
    "stream_dedup_eviction",
    """
    SELECT DISTINCT user_id,
           CAST(CASE WHEN user_id % 2 = 0 THEN 2 ELSE 1 END AS BIGINT)
             AS n_emissions
    FROM events
    """,
)
def stream_dedup_eviction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """State EVICTION in watermark-bounded streaming dedup
    (streaming/dedup.dedup_keys_within_watermark) — the dedup-side
    complement of stream_late_drop: that twin proves late INPUT is
    dropped; this one proves expired STATE is evicted and the same key
    then re-emits, the contract that bounds dedup state to O(horizon)
    on an unbounded stream.

    Harness (three mtime-ordered files, maxFilesPerTrigger=1):

      batch 0 — one record per distinct user: EVEN users ("early"
                cohort) at the fixture min event time, ODD users
                ("retained") at tmax - 15min; plus a primer row
                (user -1) at tmax so the watermark advances to
                tmax - 1h at the next planning;
      batch 1 — a spacer row (user -2) at tmax. No watermark advance;
                it exists so the early cohort's state (expiry =
                tmin + 1h, far below the tmax - 1h watermark) is
                evicted in a batch BEFORE the probes arrive —
                independent of whether the store evicts at batch start
                or batch end;
      batch 2 — one probe per user (both cohorts) at tmax, on time
                under the batch's late-event watermark. Early probes
                find no state (evicted) and RE-EMIT; retained probes
                are 15min from their first occurrence — inside the
                1h horizon, state alive — and are suppressed.

    Guarded: setup raises unless tmin < tmax - 2h (the fixture must
    genuinely separate the cohorts), and on_finish raises unless the
    state operator reported numRowsRemoved > 0 (eviction actually
    fired; without it early probes would be suppressed and the oracle
    would mismatch anyway — both sides of the proof). Oracle: even
    users emit twice, odd users once."""
    import os

    from clickhouse_only_importer_prototype_spark.streaming import (
        dedup as streaming_dedup,
        events as streaming_events,
        lateness as streaming_lateness,
    )

    HOUR_NS = 3_600_000_000_000

    def setup(src: str) -> None:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # normalize_ts folds timestamp[us] fixtures through
        # timestamp_ltz, which reads the session timezone; an
        # externally built non-UTC session would write shifted batch
        # files BEFORE read_events_stream's own UTC pin runs in
        # build() — pin it here too (round-8 review finding)
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        fixture = os.path.join(src, "events.parquet")
        ev = streaming_events.normalize_ts(spark.read.parquet(fixture))
        # one scan for every scalar the harness needs: ts bounds for
        # the cohort split, min user for the sentinel-collision guard
        tmin, tmax, umin = ev.agg(
            F.min("ts"), F.max("ts"), F.min("user_id")
        ).collect()[0]
        if tmin >= tmax - 2 * HOUR_NS:
            raise RuntimeError(
                "events fixture spans < 2h — cannot separate evicted "
                f"and retained cohorts (tmin={tmin}, tmax={tmax})"
            )
        if umin < 0:
            # the harness reserves negative ids for primer/spacer rows
            # and the oracle's % parity assumes non-negative keys —
            # fail loud if a regenerated fixture ever changes that
            raise RuntimeError(
                f"events fixture has negative user_ids (min {umin}) — "
                "harness sentinel ids would collide"
            )
        # both written cohort files derive from the distinct-user set;
        # persist so the shuffle runs once, not per output file
        users = ev.select("user_id").distinct().persist()
        first_seen = users.select(
            "user_id",
            F.when(
                F.pmod(F.col("user_id"), F.lit(2)) == 0, F.lit(tmin)
            )
            .otherwise(F.lit(tmax - HOUR_NS // 4))
            .cast("long")
            .alias("ts"),
        )
        # range(1)+lit, NOT createDataFrame: the Python local-relation
        # path costs ~5s per write on this runtime (measured; a JVM
        # range is 0.2s) — two sentinel rows were half the twin's cost
        def _one_row(uid: int):
            return spark.range(1).select(
                F.lit(uid).cast("long").alias("user_id"),
                F.lit(tmax).cast("long").alias("ts"),
            )

        primer = _one_row(-1)
        spacer = _one_row(-2)
        probes = users.select(
            "user_id", F.lit(tmax).cast("long").alias("ts")
        )
        parts = [
            ("b0_first", first_seen.unionByName(primer)),
            ("b1_spacer", spacer),
            ("b2_probes", probes),
        ]
        _write_ordered_source_files(src, parts)
        users.unpersist()
        os.remove(fixture)

    def build(src: str) -> DataFrame:
        stream = (
            spark.readStream.schema("user_id long, ts long")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .withColumn(
                "event_time", F.timestamp_micros(F.expr("ts div 1000"))
            )
        )
        return streaming_dedup.dedup_keys_within_watermark(
            stream, "user_id", "event_time", "1 hour"
        )

    def on_finish(handle) -> None:
        removed = streaming_lateness.removed_rows(handle.recentProgress)
        if removed <= 0:
            raise RuntimeError(
                "dedup-eviction twin ran without any state eviction "
                f"(numRowsRemoved total = {removed})"
            )

    sink = _stream_twin(
        spark,
        sf_dir,
        "events",
        "stream_dedup_evict_",
        build,
        output_mode="append",
        setup=setup,
        on_finish=on_finish,
    )
    return sink.where(F.col("user_id") >= 0).groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_emissions")
    )


@register(
    "stream_join_late_probe",
    """
    WITH e AS (SELECT user_id, event_type, event_id,
                      epoch_ns(ts) // 1000 * 1000 AS ns
               FROM events),
    m AS (SELECT MAX(ns) AS tmax FROM e),
    v AS (SELECT user_id, ns FROM e WHERE event_type = 'view'),
    c AS (SELECT e.user_id, e.ns
          FROM e CROSS JOIN m
          WHERE e.event_type = 'click'
            AND NOT (e.event_id % 5 = 0
                     AND e.ns < m.tmax - 8 * 3600000000000))
    SELECT v.user_id,
           COUNT(*) AS n_attributed,
           CAST(MIN(c.ns - v.ns) AS BIGINT) AS min_lag_ns,
           CAST(MAX(c.ns - v.ns) AS BIGINT) AS max_lag_ns
    FROM v JOIN c ON v.user_id = c.user_id
      AND c.ns > v.ns
      AND c.ns <= v.ns + CAST(21600 AS BIGINT) * 1000000000
    GROUP BY v.user_id
    """,
)
def stream_join_late_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-PROBE drop in the stream-stream interval join — the join
    family's lateness semantic, completing the set: stream_late_drop
    covers aggregation drops, stream_dedup_eviction covers dedup state
    eviction, stream_stream_outer_join covers eviction EMISSION; this
    twin proves a probe row arriving after the watermark passed its
    join window is dropped and its pairs never form.

    Same view->click-within-6h attribution as stream_stream_join, but
    a deterministic click cohort (event_id % 5 == 0 AND ts <
    tmax - 8h) is routed to a third micro-batch (mtime-ordered files,
    maxFilesPerTrigger=1; a sentinel batch carries the tmax - 1h
    watermark forward per the SPARK-40925 previous-batch late-filter
    rule documented on stream_late_drop). The 8h cutoff leaves margin
    on BOTH mechanisms: the click's own event time sits far below the
    watermark (input drop), and every candidate view (at most 6h
    older than its click) has been evicted from state (no pair could
    form even if the input survived) — the output equality is
    invariant to which mechanism the engine applies, and on_finish
    still requires numRowsDroppedByWatermark > 0 so a green row
    proves the watermark did the work (measured at sf0.001: all 42
    late clicks dropped; 20 of 25 pairs survive = exactly the oracle's
    non-late join). Oracle = the static self-join excluding the late
    cohort's clicks."""
    import os

    from clickhouse_only_importer_prototype_spark.streaming import (
        events as streaming_events,
        lateness as streaming_lateness,
    )

    HOUR_NS = streaming_lateness.HOUR_NS

    def setup(src: str) -> None:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # normalize_ts folds timestamp[us] fixtures through
        # timestamp_ltz, which reads the session timezone; an
        # externally built non-UTC session would write shifted batch
        # files BEFORE read_events_stream's own UTC pin runs in
        # build() — pin it here too (round-8 review finding)
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        fixture = os.path.join(src, "events.parquet")
        ev = streaming_events.normalize_ts(
            spark.read.parquet(fixture)
        ).withColumn("ts", F.expr("ts div 1000") * 1000)
        tmin, tmax = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
        cut = tmax - 8 * HOUR_NS
        if tmin >= cut:
            raise RuntimeError(
                "events fixture span too short for a late click "
                f"cohort (tmin={tmin} >= cut={cut})"
            )
        is_late = (
            (F.col("event_type") == "click")
            & (F.pmod(F.col("event_id"), F.lit(5)) == 0)
            & (F.col("ts") < F.lit(cut))
        )
        sentinel = (
            ev.limit(1)
            .withColumn("event_id", F.lit(-1).cast("long"))
            .withColumn("ts", F.lit(tmax + 3 * HOUR_NS).cast("long"))
            .withColumn("event_type", F.lit("__sentinel__"))
        )
        _write_ordered_source_files(
            src,
            [
                ("b0_ontime", ev.where(~is_late)),
                ("b1_carrier", sentinel),
                ("b2_late_clicks", ev.where(is_late)),
            ],
        )
        os.remove(fixture)

    def build(src: str) -> DataFrame:
        stream = streaming_events.read_events_stream(
            spark, src, max_files_per_trigger=1
        ).withColumn("ts", F.expr("ts div 1000") * 1000)
        v = (
            stream.where(F.col("event_type") == "view")
            .select(
                F.col("user_id").alias("v_user"),
                F.col("ts").alias("v_ns"),
                F.col("event_time").alias("v_time"),
            )
            .withWatermark("v_time", "1 hour")
        )
        c = (
            stream.where(F.col("event_type") == "click")
            .select(
                F.col("user_id").alias("c_user"),
                F.col("ts").alias("c_ns"),
                F.col("event_time").alias("c_time"),
            )
            .withWatermark("c_time", "1 hour")
        )
        return v.join(
            c,
            (F.col("v_user") == F.col("c_user"))
            & (F.col("c_time") > F.col("v_time"))
            & (
                F.col("c_time")
                <= F.col("v_time") + F.expr("INTERVAL 6 HOURS")
            ),
        )

    def on_finish(handle) -> None:
        dropped = streaming_lateness.dropped_by_watermark(
            handle.recentProgress
        )
        if dropped <= 0:
            raise RuntimeError(
                "join late-probe twin ran without any watermark drop "
                f"(numRowsDroppedByWatermark total = {dropped})"
            )

    sink = _stream_twin(
        spark,
        sf_dir,
        "events",
        "stream_join_late_",
        build,
        setup=setup,
        on_finish=on_finish,
    )
    return sink.groupBy(F.col("v_user").alias("user_id")).agg(
        F.count(F.lit(1)).alias("n_attributed"),
        F.min(F.col("c_ns") - F.col("v_ns")).alias("min_lag_ns"),
        F.max(F.col("c_ns") - F.col("v_ns")).alias("max_lag_ns"),
    )


@register(
    "stream_session_native",
    """
    WITH x AS (SELECT user_id, epoch_ns(ts) AS t FROM events),
    y AS (
      SELECT user_id, t,
             CASE WHEN lag(t) OVER w IS NULL
                    OR t - lag(t) OVER w >= 1800000000000
                  THEN 1 ELSE 0 END AS new_s
      FROM x WINDOW w AS (PARTITION BY user_id ORDER BY t)
    ),
    z AS (
      SELECT user_id, t,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY t
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM y
    )
    SELECT user_id, MIN(t) AS session_start,
           MAX(t) + 1800000000000 AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM z GROUP BY user_id, sid
    """,
)
def stream_session_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's NATIVE session_window aggregation driven as a batch
    twin — the built-in counterpart of the custom
    applyInPandasWithState sessionizer (stream_sessionize), exercising
    the session-window state store operator class the custom path
    never touches. Where the built-in expresses the semantics, the
    engine uses it; the custom operator exists only for the
    incremental-emission contract session_window cannot provide
    (events.py docstring).

    Two deliberate contract differences from the custom twin, both
    pinned by the oracle: (a) native session windows are END-EXCLUSIVE
    — an event exactly gap-after the previous one starts a NEW session
    (oracle splits on lag >= gap; the custom twin splits on > gap),
    and (b) a flush sentinel at tmax + 3h (its own user_id = -1,
    filtered in the rollup) pushes the final watermark past every real
    session end + gap, so ALL sessions emit including each user's open
    tail (the custom twin's oracle must EXCLUDE tails). session_end =
    last event + gap (the window end), recomputed closed-form by the
    oracle. on_finish requires numRowsRemoved > 0 — append-mode
    session emission IS state eviction, so a green row proves the
    session state machine ran, not a batch fallback."""
    import os

    from clickhouse_only_importer_prototype_spark.streaming import (
        events as streaming_events,
        lateness as streaming_lateness,
    )

    HOUR_NS = streaming_lateness.HOUR_NS

    def setup(src: str) -> None:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # normalize_ts folds timestamp[us] fixtures through
        # timestamp_ltz, which reads the session timezone; an
        # externally built non-UTC session would write shifted batch
        # files BEFORE read_events_stream's own UTC pin runs in
        # build() — pin it here too (round-8 review finding)
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        fixture = os.path.join(src, "events.parquet")
        ev = streaming_events.normalize_ts(spark.read.parquet(fixture))
        tmax = ev.agg(F.max("ts")).collect()[0][0]
        sentinel = (
            ev.limit(1)
            .withColumn("event_id", F.lit(-1).cast("long"))
            .withColumn("user_id", F.lit(-1).cast("long"))
            .withColumn("ts", F.lit(tmax + 3 * HOUR_NS).cast("long"))
        )
        _write_ordered_source_files(
            src, [("b0_main", ev), ("b1_flush", sentinel)]
        )
        os.remove(fixture)

    def build(src: str) -> DataFrame:
        # maxFilesPerTrigger=1 makes the mtime-ordered flush file a
        # genuine SECOND micro-batch (without it availableNow folds
        # both files into one batch and only the post-batch no-data
        # batch flushes — round-8 review finding)
        stream = streaming_events.read_events_stream(
            spark, src, max_files_per_trigger=1
        ).withColumn("ts", F.expr("ts div 1000") * 1000)
        return (
            stream.withWatermark("event_time", "1 hour")
            .groupBy(
                F.session_window(F.col("event_time"), "30 minutes"),
                F.col("user_id"),
            )
            .agg(F.count("*").cast("long").alias("n_events"))
            .select(
                "user_id",
                (F.unix_micros(F.col("session_window.start")) * 1000)
                .cast("long")
                .alias("session_start"),
                (F.unix_micros(F.col("session_window.end")) * 1000)
                .cast("long")
                .alias("session_end"),
                "n_events",
            )
        )

    def on_finish(handle) -> None:
        removed = streaming_lateness.removed_rows(handle.recentProgress)
        if removed <= 0:
            raise RuntimeError(
                "native session twin emitted without evicting session "
                f"state (numRowsRemoved total = {removed})"
            )

    sink = _stream_twin(
        spark,
        sf_dir,
        "events",
        "stream_session_native_",
        build,
        setup=setup,
        on_finish=on_finish,
    )
    return sink.where(F.col("user_id") >= 0).select(
        "user_id", "session_start", "session_end", "n_events"
    )


@register(
    "events_interarrival_stats",
    """
    WITH g AS (
      SELECT event_type,
             epoch_ns(ts) - lag(epoch_ns(ts)) OVER (
               PARTITION BY event_type
               ORDER BY epoch_ns(ts), event_id) AS gap_ns
      FROM events
    ),
    r AS (
      SELECT event_type, gap_ns,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY gap_ns) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM g WHERE gap_ns IS NOT NULL
    )
    SELECT event_type,
           CAST(MAX(n) AS BIGINT) AS n_gaps,
           CAST(SUM(gap_ns) // MAX(n) AS BIGINT) AS mean_gap_ns,
           CAST(MAX(CASE WHEN rn = (500 * n + 999) // 1000
                         THEN gap_ns END) AS BIGINT) AS p50_gap_ns,
           CAST(MAX(CASE WHEN rn = (990 * n + 999) // 1000
                         THEN gap_ns END) AS BIGINT) AS p99_gap_ns
    FROM r GROUP BY event_type
    """,
)
def events_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival gap distribution per event type (mean / discrete
    p50 / p99 of consecutive-event gaps) — the burstiness profile
    behind capacity planning and the sessionizer's gap threshold.
    Gaps via ONE keyed lag window (ties broken by event_id, so the
    lag order is total); quantiles by the explicit ceil(q·n) rank
    convention (priority_quantile_disc); mean as integer division.

    Scale: two windows on the SAME (event_type) key — one partition
    shuffle total; the gap quantile rank runs per type, never a
    global sort. Gap ordering is unique (gap values may tie but rank
    picks by gap only after a deterministic lag pass, and equal gap
    values are interchangeable for a quantile)."""
    e = load(spark, sf_dir, "events")
    lagw = Window.partitionBy("event_type").orderBy("ts", "event_id")
    g = e.select(
        "event_type",
        (F.col("ts") - F.lag("ts").over(lagw)).alias("gap_ns"),
    ).where(F.col("gap_ns").isNotNull())
    rw = Window.partitionBy("event_type").orderBy("gap_ns")
    nw = Window.partitionBy("event_type")
    r = g.select(
        "event_type",
        "gap_ns",
        F.row_number().over(rw).alias("rn"),
        F.count("*").over(nw).alias("n"),
    )
    return r.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n_gaps"),
        F.expr("div(sum(gap_ns), max(n))").cast("long").alias("mean_gap_ns"),
        F.max(
            F.when(
                F.col("rn") == F.expr("div(500 * n + 999, 1000)"),
                F.col("gap_ns"),
            )
        )
        .cast("long")
        .alias("p50_gap_ns"),
        F.max(
            F.when(
                F.col("rn") == F.expr("div(990 * n + 999, 1000)"),
                F.col("gap_ns"),
            )
        )
        .cast("long")
        .alias("p99_gap_ns"),
    )


@register(
    "trending_parts",
    """
    WITH mx AS (SELECT CAST(MAX(o_orderdate) AS DATE) AS maxd FROM orders),
    recent AS (
      SELECT o_orderkey, age FROM (
        SELECT o_orderkey,
               date_diff('day', CAST(o_orderdate AS DATE), mx.maxd) AS age
        FROM orders, mx
      ) WHERE age BETWEEN 0 AND 6
    )
    SELECT l.l_partkey,
           CAST(SUM(CAST(l.l_quantity AS BIGINT) * (64 >> r.age))
                AS BIGINT) AS trend_score,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l JOIN recent r ON l.l_orderkey = r.o_orderkey
    GROUP BY l.l_partkey
    ORDER BY trend_score DESC, l.l_partkey
    LIMIT 10
    """,
)
def trending_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending items: top-10 parts by exponentially-decayed demand
    over the last 7 order days — weight 2^(6−age) (1-day half-life as
    integer bit-shifts, the attribution_decay ladder), quantity-mass
    weighted. The freshness-ranked leaderboard every marketplace /
    feed surface runs; fully deterministic (anchor = max order date,
    shift weights exact).

    Scale: the 1-row anchor broadcasts into the orders scan, the
    recent-orders frame (7 days) joins lineitem on the order key, and
    the part rollup is map-side combinable; TakeOrdered caps the sort
    at k. At true scale the anchor is a literal ('today') and the
    age filter pushes to the date partition."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    mx = o.agg(F.max(F.col("o_orderdate").cast("date")).alias("maxd"))
    recent = (
        o.crossJoin(F.broadcast(mx))
        .select(
            "o_orderkey",
            F.datediff(F.col("maxd"), F.col("o_orderdate").cast("date"))
            .alias("age"),
        )
        .where((F.col("age") >= 0) & (F.col("age") <= 6))
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    j = li.join(recent, li["l_orderkey"] == recent["o_orderkey"])
    return (
        j.groupBy("l_partkey")
        .agg(
            F.sum(
                F.col("l_quantity").cast("long")
                * F.expr("shiftright(64, CAST(age AS INT))")
            )
            .cast("long")
            .alias("trend_score"),
            F.count("*").cast("long").alias("n_lines"),
        )
        .orderBy(F.desc("trend_score"), "l_partkey")
        .limit(10)
    )


@register(
    "orders_open_timeline",
    """
    WITH closes AS (
      SELECT l_orderkey AS okey, CAST(MAX(l_shipdate) AS DATE) AS closed
      FROM lineitem GROUP BY l_orderkey
    ),
    deltas AS (
      SELECT CAST(o_orderdate AS DATE) AS day, CAST(1 AS BIGINT) AS delta
      FROM orders
      UNION ALL
      SELECT c.closed + INTERVAL 1 DAY AS day, CAST(-1 AS BIGINT) AS delta
      FROM orders o JOIN closes c ON c.okey = o.o_orderkey
    ),
    byday AS (
      SELECT day, CAST(SUM(delta) AS BIGINT) AS delta
      FROM deltas GROUP BY day
    )
    SELECT strftime(CAST(day AS DATE), '%Y-%m-%d') AS day,
           delta AS net_change,
           CAST(SUM(delta) OVER (ORDER BY day
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS n_open
    FROM byday
    """,
)
def orders_open_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-concurrency timeline: how many orders are open (placed
    but not yet fully shipped) on each day — the +1/−1 boundary-delta
    sweep that turns interval overlap counting into a prefix sum, the
    same trick behind concurrent-sessions / active-loans / bed-census
    analytics. An order opens at o_orderdate and closes after its
    LAST lineitem shipment.

    Scale: two map-side-combinable rollups to the DAY domain, then one
    running sum over that domain (~thousands of rows however large
    the fact tables — the window is over distinct days, partitioned
    by a calendar-range key at true scale if ever needed). No
    interval self-join, no per-order fan-out."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    closes = li.groupBy(F.col("l_orderkey").alias("okey")).agg(
        F.max("l_shipdate").cast("date").alias("closed")
    )
    opens = o.select(
        F.col("o_orderdate").cast("date").alias("day"),
        F.lit(1).cast("long").alias("delta"),
    )
    closed = o.join(closes, o["o_orderkey"] == closes["okey"]).select(
        F.date_add("closed", 1).alias("day"),
        F.lit(-1).cast("long").alias("delta"),
    )
    byday = (
        opens.unionByName(closed)
        .groupBy("day")
        .agg(F.sum("delta").cast("long").alias("delta"))
    )
    win = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return byday.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("delta").alias("net_change"),
        F.sum("delta").over(win).cast("long").alias("n_open"),
    )


_CHISQ_TERMS = " + ".join(
    f"(CAST((c{v} * nn - n{v} * cc) AS DOUBLE)"
    f" * CAST((c{v} * nn - n{v} * cc) AS DOUBLE)"
    f" / CAST(n{v} AS DOUBLE))"
    for v in range(4)
)
# one shared expression string: identical text -> identical IEEE ops
# -> identical bits on both engines (the ab_test z-stat discipline,
# with the 4-term sum written in FIXED order — an aggregate SUM of
# doubles would be summation-order nondeterministic).
# chi2 = sum_v (c_v*N - n_v*C)^2 / n_v, divided by C*(N-C):
# each cell's (O-E)^2/E pair collapses to that closed form (the
# conv/non-conv numerators are negatives of each other).
_CHISQ_EXPR = (
    "CASE WHEN cc = 0 OR cc = nn THEN 0 ELSE "
    "CAST(floor(1000.0 * ({terms}) "
    "/ (CAST(cc AS DOUBLE) * CAST(nn - cc AS DOUBLE))) AS BIGINT) END"
).format(terms=_CHISQ_TERMS)


@register(
    "abn_test_chisq",
    f"""
    WITH u0 AS ({_SQL_USER_CONV_CTE}
    ),
    u AS (
      SELECT CAST(('0x' || substr(md5('abn-v1:' || CAST(user_id AS VARCHAR)),
                                  1, 15)) AS BIGINT) % 4 AS variant,
             conv
      FROM u0
    ),
    s AS (
      SELECT
        {", ".join(
            f"CAST(SUM(CASE WHEN variant = {v} THEN 1 ELSE 0 END) AS BIGINT)"
            f" AS n{v}, "
            f"CAST(SUM(CASE WHEN variant = {v} THEN conv ELSE 0 END)"
            f" AS BIGINT) AS c{v}"
            for v in range(4)
        )}
      FROM u
    ),
    t AS (
      SELECT *, n0 + n1 + n2 + n3 AS nn, c0 + c1 + c2 + c3 AS cc FROM s
    )
    SELECT {", ".join(
        f"n{v} AS n_v{v}, c{v} AS conv_v{v}, "
        f"(c{v} * 1000000) // n{v} AS rate_v{v}_1e6"
        for v in range(4)
    )},
           CAST(3 AS BIGINT) AS df,
           {_CHISQ_EXPR} AS chi2_1e3
    FROM t
    """,
)
def abn_test_chisq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B/n experiment readout: 4 md5-assigned variants, per-variant
    conversion (the ab_test_analysis conversion definition), and the
    2×k chi-squared statistic — cells and cross-multiplied residuals
    (c_v·N − n_v·C)² stay exact int64; the single final double
    expression is written in FIXED 4-term order so both engines
    produce identical bits (an aggregated double SUM would not).
    df = k−1 = 3; chi2_1e3 ≳ 7815 rejects uniformity at 5%.

    Scale: one user fold + one 1-row conditional-sum aggregate —
    the same two-shuffle shape as ab_test_analysis regardless of
    corpus size. Residual squares hold in int64 while users < ~3e9
    per variant; DECIMAL(38,0) past that."""
    u = _user_conversions(load(spark, sf_dir, "events")).select(
        # _hash_bucket mods by 10000 first; 4 | 10000, so the
        # composed mod equals the oracle's direct % 4
        (sampling_ops._hash_bucket(F.col("user_id"), "abn-v1") % 4)
        .alias("variant"),
        "conv",
    )
    aggs = []
    for v in range(4):
        aggs.append(
            F.sum(F.when(F.col("variant") == v, 1).otherwise(0))
            .cast("long")
            .alias(f"n{v}")
        )
        aggs.append(
            F.sum(F.when(F.col("variant") == v, F.col("conv")).otherwise(0))
            .cast("long")
            .alias(f"c{v}")
        )
    s = u.agg(*aggs).withColumn(
        "nn", F.expr("n0 + n1 + n2 + n3")
    ).withColumn("cc", F.expr("c0 + c1 + c2 + c3"))
    out_cols = []
    for v in range(4):
        out_cols += [
            F.col(f"n{v}").alias(f"n_v{v}"),
            F.col(f"c{v}").alias(f"conv_v{v}"),
            F.expr(f"div(c{v} * 1000000, n{v})").alias(f"rate_v{v}_1e6"),
        ]
    out_cols += [
        F.lit(3).cast("long").alias("df"),
        F.expr(_CHISQ_EXPR).alias("chi2_1e3"),
    ]
    return s.select(*out_cols)


# Poisson(1) CDF cutpoints in millionths — the bootstrap multiplicity
# ladder (k copies with prob e^-1/k!; tail mass 1e-6 tops out at 9)
_POISSON1_CUM = [367879, 735759, 919699, 981012, 996340, 999406,
                 999917, 999990, 999999]


def _poisson_mult_sql(bucket_expr: str) -> str:
    whens = "".join(
        f" WHEN {bucket_expr} < {c} THEN {k}"
        for k, c in enumerate(_POISSON1_CUM)
    )
    return f"CASE{whens} ELSE 9 END"


@register(
    "bootstrap_chars_ci",
    f"""
    WITH reps AS (
      SELECT d.doc_id, d.n_chars, r.r AS replicate,
             {_poisson_mult_sql(
                 "CAST(('0x' || substr(md5('boot' || CAST(r.r AS VARCHAR)"
                 " || ':' || CAST(d.doc_id AS VARCHAR)), 1, 15)) AS BIGINT)"
                 " % 1000000")} AS m
      FROM documents d, UNNEST(generate_series(0, 7)) AS r(r)
    )
    SELECT CAST(replicate AS BIGINT) AS replicate,
           CAST(SUM(m) AS BIGINT) AS n_resampled,
           CAST(SUM(m * n_chars) AS BIGINT) AS sum_chars,
           CAST(SUM(m * n_chars) // SUM(m) AS BIGINT) AS mean_chars
    FROM reps GROUP BY replicate
    """,
)
def bootstrap_chars_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Poisson bootstrap: 8 resampling replicates of the
    corpus where each doc's multiplicity in replicate r is drawn from
    Poisson(1) via the salted md5 bucket against fixed CDF cutpoints —
    the spread of the replicate means IS the bootstrap CI of mean doc
    length, fully reproducible (rerun/retry/engine-independent),
    unlike rand()-based resampling. The statistical-resampling class:
    the same ladder bootstraps any integer metric.

    Scale: one explode by R replicates (row-local) + one
    map-side-combinable groupBy — no shuffle of the corpus per
    replicate, no driver-side sampling state."""
    d = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    reps = d.select(
        "doc_id",
        "n_chars",
        F.posexplode(F.sequence(F.lit(0), F.lit(7))).alias("__i", "replicate"),
    )
    bucket = (
        "pmod(CAST(conv(substring(md5(concat('boot', "
        "CAST(replicate AS STRING), ':', CAST(doc_id AS STRING))), "
        "1, 15), 16, 10) AS BIGINT), 1000000)"
    )
    reps = reps.select(
        "replicate",
        "n_chars",
        F.expr(_poisson_mult_sql(bucket)).cast("long").alias("m"),
    )
    return reps.groupBy("replicate").agg(
        F.sum("m").cast("long").alias("n_resampled"),
        F.sum(F.col("m") * F.col("n_chars")).cast("long").alias("sum_chars"),
        F.expr("div(sum(m * n_chars), sum(m))").alias("mean_chars"),
    ).select(
        F.col("replicate").cast("long").alias("replicate"),
        "n_resampled",
        "sum_chars",
        "mean_chars",
    )


@register(
    "embedding_centroid_shift",
    """
    WITH q AS (
      SELECT label, vec_id % 2 AS half, i - 1 AS dim,
             CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT)
               AS v
      FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS t(i)
    ),
    c AS (
      SELECT label, dim,
             CAST(SUM(CASE WHEN half = 0 THEN v END) AS BIGINT) AS s0,
             CAST(COUNT(CASE WHEN half = 0 THEN v END) AS BIGINT) AS c0,
             CAST(SUM(CASE WHEN half = 1 THEN v END) AS BIGINT) AS s1,
             CAST(COUNT(CASE WHEN half = 1 THEN v END) AS BIGINT) AS c1
      FROM q GROUP BY label, dim
    ),
    d AS (
      SELECT label, (s0 // c0 - s1 // c1) AS delta
      FROM c WHERE c0 > 0 AND c1 > 0
    )
    SELECT label, CAST(COUNT(*) AS BIGINT) AS n_dims,
           CAST(SUM(delta * delta) AS BIGINT) AS l2_sq_1e12
    FROM d GROUP BY label
    """,
)
def embedding_centroid_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding drift monitor: per-label centroid L2² distance
    between two corpus halves (vec_id parity stands in for 'model v1
    vs v2' / 'last month vs this month' snapshots) — the check a
    retrieval pipeline runs before trusting a re-embedded corpus
    against an old ANN index. Dims quantize to integer 1e-6 units
    BEFORE averaging (floor), means are integer div — the whole
    statistic is exact int64, no float mean drift.

    Scale: posexplode fans N×dim rows into ONE map-side-combinable
    (label, dim) aggregation with both halves folded via conditional
    sums (no self-join); output is labels × dims then labels."""
    e = load(spark, sf_dir, "embeddings")
    q = e.select(
        "label",
        (F.col("vec_id") % 2).alias("half"),
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "dim", "val"
        ),
    ).select(
        "label",
        "half",
        "dim",
        F.floor(F.col("val") * 1000000).cast("long").alias("v"),
    )
    c = q.groupBy("label", "dim").agg(
        F.sum(F.when(F.col("half") == 0, F.col("v"))).cast("long").alias("s0"),
        F.count(F.when(F.col("half") == 0, F.col("v")))
        .cast("long")
        .alias("c0"),
        F.sum(F.when(F.col("half") == 1, F.col("v"))).cast("long").alias("s1"),
        F.count(F.when(F.col("half") == 1, F.col("v")))
        .cast("long")
        .alias("c1"),
    )
    d = c.where((F.col("c0") > 0) & (F.col("c1") > 0)).select(
        "label",
        (F.expr("div(s0, c0)") - F.expr("div(s1, c1)")).alias("delta"),
    )
    return d.groupBy("label").agg(
        F.count("*").cast("long").alias("n_dims"),
        F.sum(F.col("delta") * F.col("delta"))
        .cast("long")
        .alias("l2_sq_1e12"),
    )


@register(
    "corpus_diversity",
    f"""
    WITH c AS (
      SELECT source, token, CAST(COUNT(*) AS BIGINT) AS n FROM (
        SELECT source, unnest(string_split({_SQL_NORM}, ' ')) AS token
        FROM documents
      ) WHERE token <> '' GROUP BY source, token
    ),
    d AS (
      SELECT source, CAST(SUM(n) AS BIGINT) AS n_tokens,
             CAST(COUNT(*) AS BIGINT) AS vocab_size,
             CAST(SUM(n * n) AS BIGINT) AS sum_sq
      FROM c GROUP BY source
    )
    SELECT source, n_tokens, vocab_size,
           ((n_tokens * n_tokens - sum_sq) * 1000000)
             // (n_tokens * n_tokens) AS simpson_1e6,
           (n_tokens * n_tokens) // sum_sq AS effective_vocab
    FROM d
    """,
)
def corpus_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source lexical diversity: Gini–Simpson index (probability
    two sampled tokens differ) and inverse-Simpson 'effective vocab'
    (the number of equally-common types that would give the same
    concentration) — both EXACT rationals over integer token counts
    (1 − Σn²/N², N²/Σn²), unlike Shannon entropy whose log() bits
    drift across libm implementations. The token-level diversity
    audit next to source_token_drift (pairwise) and corpus_datacard
    (per-source volume/quality).

    Scale: one (source, token) rollup (map-side combinable, Zipf-
    bounded per source) + one per-source fold; Σn² and N decompose
    over shards, so web-scale corpora partial-aggregate. int64 bound:
    the ×1e6 share scaling needs N²·1e6 < 2^63, i.e. per-source
    N < ~3.0e6 tokens AT THE FINAL FOLD — past that, compute the two
    final ratios from the (decomposable) partials in DECIMAL(38,0)
    (effective_vocab alone holds to N < 3e9)."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "source",
        F.explode(F.split(text_ops._norm(F.col("text")), " ")).alias("token"),
    ).where(F.col("token") != "")
    c = toks.groupBy("source", "token").agg(
        F.count("*").cast("long").alias("n")
    )
    agg = c.groupBy("source").agg(
        F.sum("n").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("vocab_size"),
        F.sum(F.col("n") * F.col("n")).cast("long").alias("sum_sq"),
    )
    return agg.select(
        "source",
        "n_tokens",
        "vocab_size",
        F.expr(
            "div((n_tokens * n_tokens - sum_sq) * 1000000, "
            "n_tokens * n_tokens)"
        ).alias("simpson_1e6"),
        F.expr("div(n_tokens * n_tokens, sum_sq)").alias("effective_vocab"),
    )


@register(
    "events_seasonality_profile",
    """
    WITH h AS (
      SELECT event_type,
             (epoch_ns(ts) // 3600000000000) % 24 AS hour_of_day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    t AS (
      SELECT event_type, CAST(SUM(n) AS BIGINT) AS total
      FROM h GROUP BY event_type
    )
    SELECT h.event_type, h.hour_of_day, h.n,
           (h.n * 1000000) // t.total AS share_1e6,
           h.n * 24 > t.total * 2 AS is_peak
    FROM h JOIN t USING (event_type)
    """,
)
def events_seasonality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonality profile per event type: each hour
    cell's share of the type's traffic, with a peak flag where the
    cell carries more than twice the uniform 1/24 share (n·24 >
    total·2 — exact integer cross-multiplication, no float shares).
    The baseline every seasonality-aware alerting rule (and the
    z-score/CUSUM screens' residualization step) starts from.

    Scale: one map-side-combinable rollup to the (type × 24) grid,
    then a broadcast-size totals join — output is catalog-scale."""
    e = load(spark, sf_dir, "events")
    # truncating % on both sides (Spark % == DuckDB %), NOT pmod:
    # pmod/% disagree on pre-epoch (negative-hour) timestamps and the
    # repo's floordiv tests pin the truncation convention as in-domain
    h = e.groupBy(
        "event_type",
        F.expr("(ts div 3600000000000) % 24").alias("hour_of_day"),
    ).agg(F.count("*").cast("long").alias("n"))
    t = h.groupBy("event_type").agg(F.sum("n").cast("long").alias("total"))
    return h.join(F.broadcast(t), "event_type").select(
        "event_type",
        "hour_of_day",
        "n",
        F.expr("div(n * 1000000, total)").alias("share_1e6"),
        (F.col("n") * 24 > F.col("total") * 2).alias("is_peak"),
    )


@register(
    "weighted_median_price",
    """
    WITH g AS (
      SELECT l_returnflag,
             CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS price_cents,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
      FROM lineitem GROUP BY 1, 2
    ),
    c AS (
      SELECT l_returnflag, price_cents, w,
             SUM(w) OVER (PARTITION BY l_returnflag ORDER BY price_cents
                          ROWS UNBOUNDED PRECEDING) AS cw,
             SUM(w) OVER (PARTITION BY l_returnflag) AS tw
      FROM g
    )
    SELECT l_returnflag,
           CAST(MIN(tw) AS BIGINT) AS total_weight,
           CAST(MIN(price_cents) AS BIGINT) AS weighted_median_cents
    FROM c WHERE 2 * cw >= tw
    GROUP BY l_returnflag
    """,
)
def weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact weighted (lower) median: smallest price whose inclusive
    cumulative quantity-weight clears half the flag's total — the
    quantity-weighted complement of the unweighted quantile family
    (priority_quantiles / priority_quantile_disc). Explicit rank math
    (2·cumw >= W on integer cents/weights) — engine-convention-free,
    no interpolation mode to disagree on.

    Scale: collapse to DISTINCT (flag, price) first — the cumsum
    window then runs over the price DOMAIN per flag, not the fact
    table, with map-side partial sums doing the heavy lifting."""
    li = load(spark, sf_dir, "lineitem")
    g = li.groupBy(
        "l_returnflag",
        F.expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
        .alias("price_cents"),
    ).agg(F.sum(F.col("l_quantity").cast("long")).cast("long").alias("w"))
    cum = (
        Window.partitionBy("l_returnflag")
        .orderBy("price_cents")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tot = Window.partitionBy("l_returnflag")
    c = g.select(
        "l_returnflag",
        "price_cents",
        F.sum("w").over(cum).alias("cw"),
        F.sum("w").over(tot).alias("tw"),
    )
    return (
        c.where(2 * F.col("cw") >= F.col("tw"))
        .groupBy("l_returnflag")
        .agg(
            F.min("tw").cast("long").alias("total_weight"),
            F.min("price_cents").cast("long").alias("weighted_median_cents"),
        )
    )


@register(
    "ann_ranking_quality",
    """
    WITH t AS (SELECT COUNT(*) AS nq FROM embeddings WHERE vec_id < 10)
    SELECT v.variant, CAST(t.nq AS BIGINT) AS n_queries,
           TRUE AS meets_mrr_floor, TRUE AS meets_ndcg_floor
    FROM (SELECT 'ivf' AS variant UNION ALL SELECT 'lsh'
          UNION ALL SELECT 'pq' UNION ALL SELECT 'ivfpq') v, t
    """,
)
def ann_ranking_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-aware quality audit of both ANN variants vs the exact
    brute-force top-5 (operators/similarity.topk_ranking_quality):
    MRR (where the first true neighbor lands) and binary NDCG@5 (how
    well the whole list is ordered) as pinned floor booleans —
    same gate pattern as ann_recall_check, but sensitive to ORDERING
    regressions recall can't see (an ANN that returns the right set
    reversed passes recall and fails NDCG). Floors hold with margin:
    measured mrr/ndcg 0.90/0.65 (ivf), 1.00/0.93+ (lsh),
    1.00/0.93+ (pq), 1.00/0.66+ (ivfpq) at sf0.01-sf0.1 vs floors
    0.60/0.40 (ivf, ivfpq — the coarse prune bounds list ordering)
    and 0.80/0.70 (lsh, pq)."""
    emb = load(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 10)
    truth = sim_ops.cosine_topk_bruteforce(emb, q, k=5).persist()
    # shared seeded coarse k-means for ivf + ivfpq (identical training
    # params -> identical centroids; r12, guide §2.4 — see
    # ann_recall_check), footer-exact counts for the trainer sizing
    nrows = _footer_rows(sf_dir, "embeddings")
    cents = sim_ops.ivf_train_centroids(
        emb, dim=64, n_centroids=16, iters=2, n_rows=nrows
    )
    ivf = sim_ops.cosine_topk_ivf(
        emb, q, dim=64, k=5, n_centroids=16, nprobe=4, cents=cents
    )
    lsh = sim_ops.cosine_topk_lsh(
        emb, q, dim=64, k=5, n_planes=4, n_tables=16
    )
    pq = sim_ops.cosine_topk_pq(
        emb, q, dim=64, k=5, m=8, n_codes=32, shortlist=200,
        corpus_rows=nrows,
    )
    ivfpq = sim_ops.cosine_topk_ivfpq(
        emb, q, dim=64, k=5, cents=cents, corpus_rows=nrows
    )
    return (
        sim_ops.topk_ranking_quality(
            truth, ivf, "ivf", k=5,
            mrr_floor_per_1000=600, ndcg_floor_per_1000=400,
        )
        .unionByName(
            sim_ops.topk_ranking_quality(
                truth, lsh, "lsh", k=5,
                mrr_floor_per_1000=800, ndcg_floor_per_1000=700,
            )
        )
        .unionByName(
            sim_ops.topk_ranking_quality(
                truth, pq, "pq", k=5,
                mrr_floor_per_1000=800, ndcg_floor_per_1000=700,
            )
        )
        .unionByName(
            sim_ops.topk_ranking_quality(
                truth, ivfpq, "ivfpq", k=5,
                mrr_floor_per_1000=600, ndcg_floor_per_1000=400,
            )
        )
    )


@register(
    "events_anomaly_zscore",
    """
    WITH h AS (
      SELECT event_type,
             epoch_ns(ts) // 3600000000000 AS hour,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    w AS (
      SELECT event_type, hour, x,
             COUNT(x) OVER win AS n,
             COALESCE(SUM(x) OVER win, 0) AS s,
             COALESCE(SUM(x * x) OVER win, 0) AS q
      FROM h
      WINDOW win AS (PARTITION BY event_type ORDER BY hour
                     ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
    ),
    scored AS (
      SELECT event_type, hour,
             CASE WHEN (x * n - s) * (x * n - s) > 9 * (n * q - s * s)
                  THEN 1 ELSE 0 END AS is_anomaly
      FROM w WHERE n >= 12
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_scored,
           CAST(SUM(is_anomaly) AS BIGINT) AS n_anomalies,
           CAST(MIN(CASE WHEN is_anomaly = 1 THEN hour END) AS BIGINT)
             AS first_anomaly_hour
    FROM scored GROUP BY event_type
    """,
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score volume-anomaly screen: per event type, flag
    hours whose count deviates > 3σ from the trailing 24-observed-hour
    window (warm-up: >= 12 prior hours). The flag is EXACT integer
    algebra — (x·n − S)² > z²·(n·Q − S²) is (x−μ)² > z²σ² cleared of
    divisions — so no float mean/stddev drift can flip a flag
    cross-engine; the per-mille cousin of the CUSUM screen (level
    shifts) for point spikes.

    Scale: one map-side-combinable hourly rollup, then ONE
    key-partitioned window over the type×hour frame (catalog × history
    scale, not event scale). Counts keep the quadratics well inside
    int64 (x·n ≲ 2^31 at any realistic hourly volume); a cents-valued
    series would cast the three moment terms to DECIMAL(38,0), same
    shape."""
    e = load(spark, sf_dir, "events")
    h = e.groupBy(
        "event_type", F.expr("ts div 3600000000000").alias("hour")
    ).agg(F.count("*").cast("long").alias("x"))
    scored = temporal_ops.rolling_zscore_flags(
        h, "event_type", "hour", "x", lookback=24, min_n=12, z=3
    ).select(
        F.col("key").alias("event_type"),
        F.col("order").alias("hour"),
        "is_anomaly",
    )
    return scored.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_scored"),
        F.sum("is_anomaly").cast("long").alias("n_anomalies"),
        F.min(F.when(F.col("is_anomaly") == 1, F.col("hour")))
        .cast("long")
        .alias("first_anomaly_hour"),
    )


# table-qualified variant for oracles whose FROM has >1 doc_id source
_SQL_HASH_BUCKET_D = _SQL_HASH_BUCKET.replace("doc_id", "d.doc_id")


@register(
    "leakage_safe_split",
    f"""
    WITH RECURSIVE toks AS (
      SELECT doc_id, string_split({_SQL_NORM}, ' ') AS t FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id,
             t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
      FROM toks, UNNEST(range(1, greatest(len(t) - 1, 1))) AS u(i)
      WHERE len(t) >= 3
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter_size
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ),
    pairs AS (
      SELECT i.doc_a, i.doc_b
      FROM inter i JOIN sizes sa ON i.doc_a = sa.doc_id
                   JOIN sizes sb ON i.doc_b = sb.doc_id
      WHERE floor(1000.0 * i.inter_size
                  / (sa.set_size + sb.set_size - i.inter_size)) >= 800
    ),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL
      SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    reach(a, b) AS (
      SELECT src, src FROM edges
      UNION
      SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src
    ),
    clusters AS (
      SELECT CAST(a AS BIGINT) AS doc_id, CAST(MIN(b) AS BIGINT) AS cluster_id
      FROM reach GROUP BY a
    ),
    g AS (
      SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS group_id,
             CASE WHEN {_SQL_HASH_BUCKET_D.format(salt="split-v1")} < 9000
                    THEN 'train'
                  WHEN {_SQL_HASH_BUCKET_D.format(salt="split-v1")} < 9500
                    THEN 'val'
                  ELSE 'test' END AS naive_split
      FROM documents d LEFT JOIN clusters c ON d.doc_id = c.doc_id
    ),
    ga AS (
      SELECT group_id, COUNT(*) AS n_members,
             COUNT(DISTINCT naive_split) AS n_naive
      FROM g GROUP BY group_id
    ),
    gs AS (
      SELECT CASE WHEN gb < 9000 THEN 'train'
                  WHEN gb < 9500 THEN 'val'
                  ELSE 'test' END AS split,
             n_members, n_naive
      FROM (
        SELECT n_members, n_naive,
               CAST(('0x' || substr(md5('safesplit-v1:'
                 || CAST(group_id AS VARCHAR)), 1, 15)) AS BIGINT)
                 % 10000 AS gb
        FROM ga
      )
    )
    SELECT split,
           CAST(SUM(n_members) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(CASE WHEN n_members >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_multi_groups,
           CAST(SUM(CASE WHEN n_naive >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS naive_leaky_groups
    FROM gs GROUP BY split
    """,
)
def leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-FREE train/val/test split — the fix-side counterpart of
    ``split_leakage_audit``: split by the hash of the near-dup CLUSTER
    (min-doc_id component of the exact 0.8-Jaccard graph, singletons =
    their own group) instead of the doc hash, so a cluster can never
    straddle splits and eval can never contain near-copies of training
    docs. Output per split: docs, groups, multi-member groups (where
    group-level assignment mattered), and how many of this split's
    groups the NAIVE doc-hash split would have torn across splits —
    the leakage this operator eliminates by construction.

    Scale: the cluster graph is the dedup-family banded shape (no new
    expensive stage); everything after is key-partitioned aggs over
    the slim (doc_id, group_id, split) frame. Group-hash assignment
    keeps the property that docs never migrate splits as the corpus
    grows — only whole groups do when new edges merge clusters."""
    docs = load(spark, sf_dir, "documents")
    clusters = dedup_ops.minhash_dedup_clusters(
        docs,
        num_hashes=32,
        bands=16,
        threshold=0.8,
        collapse=_collapse_gate(sf_dir, "documents", min_rows=20_000),
    )
    naive = sampling_ops.hash_split(
        docs.select("doc_id"),
        weights={"train": 0.9, "val": 0.05, "test": 0.05},
        salt="split-v1",
    ).withColumnRenamed("split", "naive_split")
    g = naive.join(clusters, "doc_id", "left").select(
        "doc_id",
        F.coalesce("cluster_id", "doc_id").alias("group_id"),
        "naive_split",
    )
    ga = g.groupBy("group_id").agg(
        F.count("*").alias("n_members"),
        F.countDistinct("naive_split").alias("n_naive"),
    )
    gs = sampling_ops.hash_split(
        ga,
        id_col="group_id",
        weights={"train": 0.9, "val": 0.05, "test": 0.05},
        salt="safesplit-v1",
    )
    return gs.groupBy("split").agg(
        F.sum("n_members").cast("long").alias("n_docs"),
        F.count("*").cast("long").alias("n_groups"),
        F.sum((F.col("n_members") >= 2).cast("long"))
        .cast("long")
        .alias("n_multi_groups"),
        F.sum((F.col("n_naive") >= 2).cast("long"))
        .cast("long")
        .alias("naive_leaky_groups"),
    )


def _bpe_oracle(n_merges: int, emit: str = "merges") -> str:
    """Unrolled DuckDB twin of ``text_ops.bpe_train`` / ``bpe_encode``:
    K chained (pair-count -> argmax rule -> list_reduce merge fold)
    CTE blocks. The fold lambda is character-identical in semantics to
    the Spark ``aggregate`` fold (both engines fold left with a string
    acc and the '/'-anchored suffix test), so merge states — and
    therefore every subsequent rule — are bit-identical cross-engine.
    ``emit='merges'`` returns the rule table; ``emit='compression'``
    applies all K rules and aggregates per-language chars/tokens."""
    ctes = [
        f"""toks AS (
      SELECT unnest(string_split({_SQL_NORM}, ' ')) AS w FROM documents
    ),
    wc AS (
      SELECT w, COUNT(*) AS n FROM toks
      WHERE w <> '' AND w NOT LIKE '%/%' AND w NOT LIKE '%|%'
      GROUP BY w
    ),
    s0 AS (
      SELECT w,
             '/' || array_to_string(string_split(w, ''), '/') || '/' AS st, n
      FROM wc
    )"""
    ]
    last_state = n_merges if emit == "compression" else n_merges - 1
    for k in range(1, n_merges + 1):
        prev = f"s{k - 1}"
        ctes.append(
            f"""p{k} AS (
      SELECT pr AS pair, CAST(SUM(n) AS BIGINT) AS pair_count FROM (
        SELECT unnest(CASE WHEN len(l) >= 2
          THEN list_transform(generate_series(1, len(l) - 1),
                              i -> l[i] || '|' || l[i + 1])
          ELSE [] END) AS pr, n
        FROM (SELECT string_split(trim(st, '/'), '/') AS l, n FROM {prev})
      ) GROUP BY pr
    ),
    b{k} AS (
      SELECT string_split(pair, '|')[1] AS a,
             string_split(pair, '|')[2] AS b, pair_count
      FROM p{k} ORDER BY pair_count DESC, pair LIMIT 1
    )"""
        )
        if k <= last_state:
            ctes.append(
                f"""s{k} AS (
      SELECT w, list_reduce(list_prepend('/', string_split(trim(st, '/'), '/')),
        (acc, x) -> CASE
          WHEN right(acc, length(b{k}.a) + 2) = '/' || b{k}.a || '/'
               AND x = b{k}.b
          THEN left(acc, length(acc) - length(b{k}.a) - 1)
               || b{k}.a || b{k}.b || '/'
          ELSE acc || x || '/' END) AS st, n
      FROM {prev}, b{k}
    )"""
            )
    if emit == "merges":
        selects = " UNION ALL ".join(
            f"SELECT CAST({k} AS BIGINT) AS step, a AS left_sym, "
            f"b AS right_sym, pair_count FROM b{k}"
            for k in range(1, n_merges + 1)
        )
        tail = selects + " ORDER BY step"
    else:
        ctes.append(
            f"""wl AS (
      SELECT lang, w, COUNT(*) AS n_lang FROM (
        SELECT lang, unnest(string_split({_SQL_NORM}, ' ')) AS w
        FROM documents
      ) WHERE w <> '' GROUP BY lang, w
    )"""
        )
        tail = f"""SELECT lang,
           CAST(SUM(n_lang) AS BIGINT) AS n_words,
           CAST(SUM(n_lang * length(s.w)) AS BIGINT) AS n_chars,
           CAST(SUM(n_lang * (length(st) - length(replace(st, '/', ''))
                              - 1)) AS BIGINT) AS n_tokens,
           CAST((SUM(n_lang * length(s.w)) * 1000000)
                // SUM(n_lang * (length(st) - length(replace(st, '/', ''))
                                 - 1)) AS BIGINT) AS chars_per_token_1e6
    FROM wl JOIN s{n_merges} s ON wl.w = s.w
    GROUP BY lang"""
    return "WITH " + ",\n    ".join(ctes) + "\n    " + tail


@register("bpe_merges", _bpe_oracle(3))
def bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer merge training (3 unrolled iterations): word
    frequencies -> per-iteration adjacent-pair argmax -> canonical
    greedy-leftmost fuse — emits the ordered merge table, the
    ``merges.txt`` artifact of tokenizer training and the companion
    to ``vocab_top_tokens``. Exact integer counts + (count desc, pair
    asc) tie-breaks make the whole iteration chain bit-deterministic,
    so even an ITERATIVE trainer hash-matches the DuckDB twin.
    Scale: the corpus is touched once (word count, map-side
    combinable); every iteration runs on the Zipf-bounded distinct
    -word frame (persisted), pair argmax is a 1-row TakeOrdered
    broadcast, and the merge fold is row-local JVM codegen."""
    d = load(spark, sf_dir, "documents")
    words = (
        d.select(
            F.explode(F.split(text_ops._norm(F.col("text")), " ")).alias("word")
        )
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )
    return text_ops.bpe_train(words, n_merges=3)


@register("bpe_compression", _bpe_oracle(3, emit="compression"))
def bpe_compression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ENCODE side of BPE — tokenizer fertility / compression per
    language: train 3 merges on the global corpus (same chain
    bpe_merges oracles), apply them to every word, and aggregate
    chars vs post-merge tokens per lang. chars_per_token is the
    compression a tokenizer buys each language — THE fairness metric
    for multilingual vocab design (a language with low
    chars-per-token pays more tokens for the same text).

    Scale: one extra (lang, word) rollup and one vocab-scale join
    beyond the training chain; per-lang output is catalog-scale."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "lang",
        F.explode(F.split(text_ops._norm(F.col("text")), " ")).alias("word"),
    ).where(F.col("word") != "")
    wl = toks.groupBy("lang", "word").agg(F.count("*").alias("n_lang"))
    words = wl.groupBy("word").agg(F.sum("n_lang").alias("n"))
    enc = text_ops.bpe_encode(words, n_merges=3)
    j = wl.join(enc.select("word", "n_tokens"), "word")
    chars = F.sum(F.col("n_lang") * F.length("word"))
    tokens = F.sum(F.col("n_lang") * F.col("n_tokens"))
    return j.groupBy("lang").agg(
        F.sum("n_lang").cast("long").alias("n_words"),
        chars.cast("long").alias("n_chars"),
        tokens.cast("long").alias("n_tokens"),
        F.expr(
            "div(sum(n_lang * length(word)) * 1000000, "
            "sum(n_lang * n_tokens))"
        ).alias("chars_per_token_1e6"),
    )


@register(
    "token_freq_of_freqs",
    f"""
    WITH toks AS (
      SELECT unnest(string_split({_SQL_NORM}, ' ')) AS token
      FROM documents
    ),
    c AS (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS n FROM toks
      WHERE token <> '' GROUP BY token
    )
    SELECT n AS freq,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST(SUM(n) AS BIGINT) AS n_occurrences
    FROM c
    GROUP BY n
    """,
)
def token_freq_of_freqs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good–Turing frequency-of-frequencies: how many vocabulary types
    occur exactly r times and the token mass each r holds. N1/N (the
    singleton share) IS the Good–Turing estimate of unseen-type
    probability — the standard smoothing input for the bigram LM
    scorer (bigram_lm_scores) and a direct read on corpus
    contamination (duplicated corpora crater N1).

    Scale: both folds are map-side combinable; the second runs over
    DISTINCT tokens (vocab-scale, Zipf-bounded) and its output key
    space is the distinct count values — O(sqrt(total occurrences))
    by the partition bound, metadata-scale at any corpus size. No
    windows, no joins."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(F.split(text_ops._norm(F.col("text")), " ")).alias("token")
    ).where(F.col("token") != "")
    c = toks.groupBy("token").agg(F.count("*").cast("long").alias("n"))
    return c.groupBy(F.col("n").alias("freq")).agg(
        F.count("*").cast("long").alias("n_types"),
        F.sum("n").cast("long").alias("n_occurrences"),
    )


@register(
    "mixture_temperature",
    f"""
    WITH tk AS (
      SELECT source,
             CASE WHEN {_SQL_NORM} = '' THEN 0
                  ELSE CAST(len(string_split({_SQL_NORM}, ' ')) AS BIGINT)
             END AS n_tokens
      FROM documents
    ),
    avail AS (
      SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS n_avail
      FROM tk GROUP BY source
      HAVING SUM(n_tokens) > 0
    ),
    w AS (
      SELECT source, n_avail,
             CAST(floor(sqrt(CAST(n_avail AS DOUBLE))) AS BIGINT) AS wgt
      FROM avail
    ),
    t AS (
      SELECT source, n_avail, wgt,
             CAST(SUM(wgt) OVER () AS BIGINT) AS wsum,
             CAST(SUM(n_avail) OVER () AS BIGINT) AS total
      FROM w
    )
    SELECT source, n_avail,
           (wgt * 1000000) // wsum AS share_1e6,
           (2 * total * wgt) // wsum AS target_tokens,
           ((2 * total * wgt) // wsum * 1000) // n_avail
             AS epochs_milli,
           ((2 * total * wgt) // wsum * 1000) // n_avail > 1000
             AS oversampled
    FROM t
    """,
)
def mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-rebalanced source mixture (the multilingual
    alpha=0.5 sampling rule): per-source target share proportional to
    sqrt(available tokens), flattening the natural Zipf of source
    sizes so small sources aren't drowned. Against a 2x-total token
    budget this yields per-source target tokens and epochs_milli —
    the repeat factor the data-constrained-scaling literature needs
    (>1000 = the source is epoched / oversampled). Complements
    domain_mixture (observed composition) and token_budget_sample
    (greedy doc selection under the resulting caps).

    Determinism: sqrt over an exact int64 (< 2^53) is IEEE
    correctly-rounded, so floor(sqrt(n)) is bit-identical cross-
    engine; everything after is integer div. Scale: one map-side
    token-count fold to catalog-scale rows; the OVER () totals fold
    a handful of sources on one task — metadata-scale. int64 bound:
    2·total·wgt with wgt ≤ √total needs total < ~1.7e12 tokens
    (multi-TB text); past that compute the target in DECIMAL(38,0)
    over the same integer partials. Zero-token sources are excluded
    (no epochs of nothing; also keeps the div exact)."""
    d = load(spark, sf_dir, "documents")
    tk = d.select(
        "source", text_ops.token_count(F.col("text")).alias("n_tokens")
    )
    avail = (
        tk.groupBy("source")
        .agg(F.sum("n_tokens").cast("long").alias("n_avail"))
        .where(F.col("n_avail") > 0)
    )
    w = avail.select(
        "source",
        "n_avail",
        F.floor(F.sqrt(F.col("n_avail").cast("double")))
        .cast("long")
        .alias("wgt"),
    )
    tot = Window.partitionBy()
    t = w.select(
        "source",
        "n_avail",
        "wgt",
        F.sum("wgt").over(tot).cast("long").alias("wsum"),
        F.sum("n_avail").over(tot).cast("long").alias("total"),
    )
    target = F.expr("div(2 * total * wgt, wsum)")
    return t.select(
        "source",
        "n_avail",
        F.expr("div(wgt * 1000000, wsum)").alias("share_1e6"),
        target.alias("target_tokens"),
        F.expr("div(div(2 * total * wgt, wsum) * 1000, n_avail)").alias(
            "epochs_milli"
        ),
        (
            F.expr("div(div(2 * total * wgt, wsum) * 1000, n_avail)")
            > F.lit(1000)
        ).alias("oversampled"),
    )


@register(
    "lang_chi2_tokens",
    f"""
    WITH toks AS (
      SELECT lang, unnest(string_split({_SQL_NORM}, ' ')) AS token
      FROM documents
    ),
    c AS (
      SELECT lang, token, CAST(COUNT(*) AS BIGINT) AS a
      FROM toks WHERE token <> '' GROUP BY lang, token
    ),
    t AS (
      SELECT lang, token, a,
             CAST(SUM(a) OVER (PARTITION BY token) AS BIGINT) AS row_t,
             CAST(SUM(a) OVER (PARTITION BY lang) AS BIGINT) AS col_l,
             CAST(SUM(a) OVER () AS BIGINT) AS nn
      FROM c
    ),
    x AS (
      SELECT lang, token, a,
             CAST(floor(
               (CAST(nn AS DOUBLE)
                * (CAST(a AS DOUBLE) * CAST(nn - row_t - col_l + a AS DOUBLE)
                   - CAST(row_t - a AS DOUBLE) * CAST(col_l - a AS DOUBLE))
                * (CAST(a AS DOUBLE) * CAST(nn - row_t - col_l + a AS DOUBLE)
                   - CAST(row_t - a AS DOUBLE) * CAST(col_l - a AS DOUBLE)))
               / (CAST(row_t AS DOUBLE) * CAST(nn - row_t AS DOUBLE)
                  * CAST(col_l AS DOUBLE) * CAST(nn - col_l AS DOUBLE))
               * 1000) AS BIGINT) AS chi2_milli
      FROM t
      WHERE a >= 5 AND nn - row_t > 0 AND nn - col_l > 0
            AND CAST(a AS DOUBLE) * CAST(nn AS DOUBLE)
                > CAST(row_t AS DOUBLE) * CAST(col_l AS DOUBLE)
    )
    SELECT lang, token, a AS n_in_lang, chi2_milli
    FROM (
      SELECT lang, token, a, chi2_milli,
             row_number() OVER (
               PARTITION BY lang ORDER BY chi2_milli DESC, token
             ) AS rk
      FROM x
    ) WHERE rk <= 3
    """,
)
def lang_chi2_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supervised feature selection: per-language top-3 tokens by
    chi-squared association with the language label — the classic
    discriminative-vocabulary pick for routing / lang-ID feature
    lists, complementing tfidf_top_terms (unsupervised rarity).
    Over-represented tokens only (observed > expected), support
    floor a >= 5.

    Determinism: the 2x2 chi-squared is a ROW-LOCAL closed form over
    already-aggregated integer cells — both engines evaluate the
    identical IEEE expression tree (exact int64→double conversions,
    same op order, no float aggregation), so the doubles are
    bit-identical and floor(x*1000) hashes exactly; the ranking
    tie-breaks on token. Scale: one (lang, token) map-side rollup;
    per-token totals are a token-partitioned window on the vocab-
    scale frame (Zipf-bounded, never the corpus), while the lang and
    grand totals fold to broadcast-joined catalog-scale frames — no
    SinglePartition window anywhere on the data path; output is 3
    rows per language. Bounds: the over-representation guard
    multiplies in DOUBLE (int64 a*nn would wrap past ~3e9 total
    tokens); the 'bit-identical' claim needs every cell count below
    2^53 — past ~9e15 tokens the int->double conversions themselves
    round (identically on both engines, so the oracle still matches,
    but the statistic is then approximate)."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "lang",
        F.explode(F.split(text_ops._norm(F.col("text")), " ")).alias("token"),
    ).where(F.col("token") != "")
    c = toks.groupBy("lang", "token").agg(
        F.count("*").cast("long").alias("a")
    )
    langs = c.groupBy("lang").agg(F.sum("a").cast("long").alias("col_l"))
    nn_df = c.agg(F.sum("a").cast("long").alias("nn"))
    t = (
        c.withColumn(
            "row_t",
            F.sum("a").over(Window.partitionBy("token")).cast("long"),
        )
        .join(F.broadcast(langs), "lang")
        .crossJoin(F.broadcast(nn_df))
    )
    det = _dbl(F.col("a")) * _dbl(
        F.col("nn") - F.col("row_t") - F.col("col_l") + F.col("a")
    ) - _dbl(F.col("row_t") - F.col("a")) * _dbl(F.col("col_l") - F.col("a"))
    chi2 = (_dbl(F.col("nn")) * det * det) / (
        _dbl(F.col("row_t"))
        * _dbl(F.col("nn") - F.col("row_t"))
        * _dbl(F.col("col_l"))
        * _dbl(F.col("nn") - F.col("col_l"))
    )
    x = t.where(
        (F.col("a") >= 5)
        & (F.col("nn") - F.col("row_t") > 0)
        & (F.col("nn") - F.col("col_l") > 0)
        & (
            _dbl(F.col("a")) * _dbl(F.col("nn"))
            > _dbl(F.col("row_t")) * _dbl(F.col("col_l"))
        )
    ).select(
        "lang",
        "token",
        F.col("a").alias("n_in_lang"),
        F.floor(chi2 * F.lit(1000)).cast("long").alias("chi2_milli"),
    )
    w = Window.partitionBy("lang").orderBy(
        F.col("chi2_milli").desc(), F.col("token")
    )
    return (
        x.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .drop("rk")
    )


# Shared SQL twin of the curriculum ranking chain (quality features ->
# integer quality score -> packed shuffle key -> gapless order), used
# by the curriculum_order oracle and the shuffle-decorrelation audit.
_SQL_CURRICULUM_CTES = f"""{_SQL_QSCORE_CTES},
    k AS (
      SELECT doc_id, quality_score,
             (1048576 - greatest(least(quality_score, 1048576), -1048576))
               * 4294967296
             + CAST(('0x' || substr(md5('curr-v1:' ||
                 CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS ord_key
      FROM q
    ),
    ranked AS (
      SELECT doc_id, quality_score,
             CAST(row_number() OVER (ORDER BY ord_key, doc_id) - 1
               AS BIGINT) AS train_order
      FROM k
    )"""


@register(
    "curriculum_order",
    f"""
    WITH {_SQL_CURRICULUM_CTES}
    SELECT doc_id, quality_score, train_order FROM ranked
    """,
)
def curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum data ordering: a gapless global training order that
    presents highest-quality documents first while shuffling uniformly
    WITHIN each quality level (salted md5 in the low 32 bits breaks up
    source/crawl locality — adjacent training batches must not be
    correlated). The composite int64 key packs clamped quality into
    the high bits ((2^20 - q) * 2^32 + h32), so ORDER BY key IS the
    curriculum.

    Scale: the global rank reuses operators/ids.rank_gapless — range-
    bucketed two-pass prefix-sum rank, NO single-task global window;
    the hash low bits smear ties across bucket boundaries evenly.
    Production layouts would write sorted by the same key
    (sinks/ranges) so readers stream the curriculum in file order."""
    q = text_ops.quality_score(load(spark, sf_dir, "documents"))
    h32 = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("curr-v1:"), F.col("doc_id").cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    qcap = F.lit(1 << 20)
    clamped = F.greatest(F.least(F.col("quality_score"), qcap), -qcap)
    keyed = q.select(
        "doc_id",
        "quality_score",
        ((qcap - clamped) * F.lit(1 << 32) + h32).alias("ord_key"),
    ).persist()
    # rank_gapless makes three passes over its input (key min/max,
    # bucket counts, the rank itself); without the persist each pass
    # re-runs the full tokenize->feature->score text pipeline (~3x the
    # query wall). The persisted frame is 3 narrow columns — at 100 TB
    # the natural checkpoint before a global ordering anyway. Analytic
    # bounds are deliberately NOT passed: the ord_key domain is 2^53
    # but real quality scores occupy a tiny band, so uniform splits of
    # the analytic domain would collapse every row into one bucket —
    # the measured min/max keeps the range buckets even.
    ranked = ids_ops.rank_gapless(
        keyed, ["ord_key", "doc_id"], id_col="train_order"
    )
    return ranked.select("doc_id", "quality_score", "train_order")


@register(
    "bm25_topdocs",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split({_SQL_NORM}, ' ')) AS token
      FROM documents
    ),
    tk AS (SELECT doc_id, token FROM toks WHERE token <> ''),
    dl AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM tk GROUP BY doc_id
    ),
    g AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(dl) AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS avgdl
      FROM dl
    ),
    dfreq AS (
      SELECT token, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
      FROM tk GROUP BY token
    ),
    terms AS (
      SELECT token, df FROM dfreq, g
      WHERE 2 * df <= n_docs
      ORDER BY df DESC, token LIMIT 3
    ),
    tf AS (
      SELECT t.doc_id, t.token, CAST(COUNT(*) AS BIGINT) AS tf
      FROM tk t JOIN terms q ON t.token = q.token
      GROUP BY t.doc_id, t.token
    ),
    scored AS (
      SELECT tf.doc_id,
             CAST(floor(
               ((CAST(n_docs - df AS DOUBLE) + 0.5)
                / (CAST(df AS DOUBLE) + 0.5))
               * ((CAST(tf AS DOUBLE) * 2.2)
                  / (CAST(tf AS DOUBLE)
                     + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE)
                                             / CAST(avgdl AS DOUBLE)))))
               * 1000000.0) AS BIGINT) AS term_micro
      FROM tf
      JOIN terms USING (token)
      JOIN dl ON tf.doc_id = dl.doc_id
      CROSS JOIN g
    )
    SELECT doc_id, CAST(SUM(term_micro) AS BIGINT) AS bm25_micro
    FROM scored GROUP BY doc_id
    ORDER BY bm25_micro DESC, doc_id LIMIT 10
    """,
)
def bm25_topdocs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 retrieval over the corpus: top-10 documents for a
    data-derived 3-term query (the highest-df tokens appearing in at
    most half the corpus — mid-frequency, informative). LOG-FREE
    rational idf (N - df + 0.5)/(df + 0.5): libm log() is not
    IEEE-correctly-rounded and drifts across engines, but +,-,*,/
    are exactly rounded, so the per-term double is bit-identical
    cross-engine; each term's contribution floors to integer
    micro-points BEFORE the per-doc sum, so the final score is an
    order-independent int64. k1=1.2, b=0.75 (the standard Robertson
    constants), avgdl floored to integer.

    Scale: token stats fold map-side on the vocab-scale frame; the
    3-row query-term set and the 1-row corpus stats broadcast; the
    only doc-keyed join (tf x dl) co-partitions on doc_id; TakeOrdered
    caps the output sort at 10. The IR scoring complement to
    inverted_index (postings) and tfidf_top_terms (term extraction)."""
    d = load(spark, sf_dir, "documents")
    tk = d.select(
        "doc_id",
        F.explode(F.split(text_ops._norm(F.col("text")), " ")).alias("token"),
    ).where(F.col("token") != "")
    dl = tk.groupBy("doc_id").agg(F.count("*").cast("long").alias("dl"))
    g = dl.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.expr("div(sum(dl), count(*))").alias("avgdl"),
    )
    dfreq = tk.groupBy("token").agg(
        F.countDistinct("doc_id").cast("long").alias("df")
    )
    terms = (
        dfreq.crossJoin(F.broadcast(g.select("n_docs")))
        .where(2 * F.col("df") <= F.col("n_docs"))
        .orderBy(F.col("df").desc(), F.col("token"))
        .limit(3)
        .select("token", "df")
    )
    tf = (
        tk.join(F.broadcast(terms.select("token")), "token")
        .groupBy("doc_id", "token")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    joined = (
        tf.join(F.broadcast(terms), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(g))
    )
    idf = (_dbl(F.col("n_docs") - F.col("df")) + F.lit(0.5)) / (
        _dbl(F.col("df")) + F.lit(0.5)
    )
    sat = (_dbl(F.col("tf")) * F.lit(2.2)) / (
        _dbl(F.col("tf"))
        + F.lit(1.2)
        * (
            F.lit(0.25)
            + F.lit(0.75) * (_dbl(F.col("dl")) / _dbl(F.col("avgdl")))
        )
    )
    scored = joined.select(
        "doc_id",
        F.floor(idf * sat * F.lit(1000000.0)).cast("long").alias(
            "term_micro"
        ),
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.sum("term_micro").cast("long").alias("bm25_micro"))
        .orderBy(F.col("bm25_micro").desc(), "doc_id")
        .limit(10)
    )


@register(
    "events_sma_decomposition",
    f"""
    WITH b AS (
      SELECT event_type,
             {ORACLE_FLOORDIV('epoch_ns(ts)', 3600000000000)} AS bucket
      FROM events
    ),
    c AS (
      SELECT event_type, bucket, COUNT(*) AS n FROM b GROUP BY 1, 2
    ),
    spans AS (
      SELECT event_type, MIN(bucket) AS lo, MAX(bucket) AS hi
      FROM b GROUP BY 1
    ),
    spine AS (
      SELECT event_type, UNNEST(generate_series(lo, hi)) AS bucket
      FROM spans
    ),
    dense AS (
      SELECT s.event_type, s.bucket,
             CAST(COALESCE(c.n, 0) AS BIGINT) AS n_events
      FROM spine s LEFT JOIN c USING (event_type, bucket)
    ),
    tr AS (
      SELECT event_type, bucket, n_events,
             CASE WHEN COUNT(*) OVER w = 25
                  THEN CAST((SUM(n_events) OVER w * 1000) // 25 AS BIGINT)
             END AS trend_milli
      FROM dense
      WINDOW w AS (PARTITION BY event_type ORDER BY bucket
                   ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)
    ),
    det AS (
      SELECT event_type, bucket, n_events, trend_milli,
             n_events * 1000 - trend_milli AS det_milli
      FROM tr WHERE trend_milli IS NOT NULL
    )
    SELECT event_type, bucket, n_events, trend_milli,
           CAST(SUM(det_milli) OVER s // COUNT(*) OVER s AS BIGINT)
             AS seasonal_milli,
           CAST(det_milli - SUM(det_milli) OVER s // COUNT(*) OVER s
                AS BIGINT) AS residual_milli
    FROM det
    WINDOW s AS (PARTITION BY event_type, bucket % 24)
    """,
)
def events_sma_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical seasonal-trend decomposition per event type: trend =
    centered 25-hour moving average over the GAP-FILLED hourly series
    (full windows only — edges drop, the textbook convention),
    seasonal = hour-of-day mean of the detrended series, residual =
    what's left. The residual is what seasonality-aware alerting
    thresholds on (a raw spike at 9am is normal; the same spike at
    3am pages). All integer milli-counts: truncating div matches
    across engines (Spark div == DuckDB //), buckets are post-epoch
    so bucket % 24 agrees too.

    Scale: builds on temporal_ops.gap_fill (per-key dense spine);
    both windows partition BY event_type (and hour-of-day) over the
    hourly DOMAIN — thousands of rows per type-year regardless of
    event volume, never the raw corpus. No global window, no
    self-join."""
    ev = load(spark, sf_dir, "events").select("event_type", "ts")
    dense = temporal_ops.gap_fill(ev, ["event_type"])
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(-12, 12)
    )
    tr = (
        dense.withColumn("__tsum", F.sum("n_events").over(w))
        .withColumn("__tcnt", F.count("*").over(w))
        .select(
            "event_type",
            "bucket",
            "n_events",
            F.when(
                F.col("__tcnt") == 25, F.expr("div(__tsum * 1000, 25)")
            ).alias("trend_milli"),
        )
    )
    det = tr.where(F.col("trend_milli").isNotNull()).withColumn(
        "det_milli", F.col("n_events") * 1000 - F.col("trend_milli")
    )
    s = Window.partitionBy("event_type", F.col("bucket") % 24)
    seasonal = F.expr("div(__ssum, __scnt)")
    return (
        det.withColumn("__ssum", F.sum("det_milli").over(s))
        .withColumn("__scnt", F.count("*").over(s))
        .select(
            "event_type",
            "bucket",
            "n_events",
            "trend_milli",
            seasonal.alias("seasonal_milli"),
            (F.col("det_milli") - seasonal).alias("residual_milli"),
        )
    )


_FD_CANDIDATES = [
    # (table, determinant, dependent) — a deliberate mix so both
    # verdicts appear in the output: key FDs that must hold and
    # low-cardinality pairs that must not.
    ("lineitem", "l_returnflag", "l_linestatus"),
    ("orders", "o_orderkey", "o_orderdate"),
    ("customer", "c_name", "c_nationkey"),
    ("orders", "o_orderstatus", "o_orderpriority"),
    ("lineitem", "l_orderkey", "l_shipdate"),
]


@register(
    "fd_audit",
    "\nUNION ALL\n".join(
        f"""SELECT '{t}' AS table_name, '{l}' AS determinant,
           '{r}' AS dependent,
           CAST(COUNT(DISTINCT {l}) AS BIGINT) AS n_lhs,
           CAST(COUNT(DISTINCT ({l}, {r})) AS BIGINT) AS n_pairs,
           CAST(COUNT(DISTINCT ({l}, {r})) - COUNT(DISTINCT {l}) AS BIGINT)
             AS extra_rhs,
           COUNT(DISTINCT ({l}, {r})) = COUNT(DISTINCT {l}) AS holds
    FROM {t}"""
        for t, l, r in _FD_CANDIDATES
    ),
)
def fd_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency discovery over a candidate list: A -> B
    holds iff |distinct A| == |distinct (A,B)|; extra_rhs counts the
    determinant values bound to more than one dependent value (the
    violation mass). Schema-inference / normalization profiling —
    the FD complement to dq_audit (row constraints) and
    orders_profile (column stats); holds-verdicts here certify
    dimension collapses (c_name -> c_nationkey) before a modeler
    denormalizes on them.

    Scale: candidates on the same table fold in ONE agg over one scan
    (Catalyst Expand fans the pruned rows out per distinct aggregate
    — one pass, map-side partials), then the 1-row frame explodes to
    per-candidate rows. At 100 TB swap COUNT(DISTINCT) for approx HLL
    partials (profile.hll_distinct_audit's machinery) and confirm
    only near-ties exactly."""
    by_table: dict[str, list[tuple[str, str]]] = {}
    for t, l, r in _FD_CANDIDATES:
        by_table.setdefault(t, []).append((l, r))
    out = None
    for t, cands in by_table.items():
        d = load(spark, sf_dir, t)
        aggs = []
        for i, (l, r) in enumerate(cands):
            aggs.append(F.countDistinct(l).cast("long").alias(f"__a{i}"))
            aggs.append(
                F.countDistinct(l, r).cast("long").alias(f"__p{i}")
            )
        entries = F.array(
            *[
                F.struct(
                    F.lit(l).alias("determinant"),
                    F.lit(r).alias("dependent"),
                    F.col(f"__a{i}").alias("n_lhs"),
                    F.col(f"__p{i}").alias("n_pairs"),
                )
                for i, (l, r) in enumerate(cands)
            ]
        )
        one = (
            d.agg(*aggs)
            .select(F.lit(t).alias("table_name"), F.explode(entries).alias("e"))
            .select(
                "table_name",
                "e.determinant",
                "e.dependent",
                "e.n_lhs",
                "e.n_pairs",
            )
            .select(
                "*",
                (F.col("n_pairs") - F.col("n_lhs")).alias("extra_rhs"),
                (F.col("n_pairs") == F.col("n_lhs")).alias("holds"),
            )
        )
        out = one if out is None else out.unionByName(one)
    return out


@register(
    "mannwhitney_quality",
    """
    WITH d AS (
      SELECT source, n_chars FROM documents WHERE n_chars IS NOT NULL
    ),
    vals AS (
      SELECT n_chars, CAST(COUNT(*) AS BIGINT) AS m
      FROM d GROUP BY n_chars
    ),
    cum AS (
      SELECT n_chars, m,
             CAST(COALESCE(SUM(m) OVER (ORDER BY n_chars
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS c_prev
      FROM vals
    ),
    sv AS (
      SELECT source, n_chars, CAST(COUNT(*) AS BIGINT) AS k
      FROM d GROUP BY source, n_chars
    ),
    r AS (
      SELECT sv.source,
             CAST(SUM(sv.k) AS BIGINT) AS n_s,
             CAST(SUM(sv.k * (2 * cum.c_prev + cum.m + 1)) AS BIGINT)
               AS r2_s
      FROM sv JOIN cum USING (n_chars)
      GROUP BY sv.source
    ),
    g AS (
      SELECT CAST(SUM(m) AS BIGINT) AS nn,
             CAST(SUM(m * m * m - m) AS BIGINT) AS tie3
      FROM vals
    )
    SELECT source, n_s,
           r2_s - n_s * (n_s + 1) AS u2_s,
           CAST(floor(
             (CAST(r2_s - n_s * (n_s + 1) AS DOUBLE)
              - CAST(n_s * (nn - n_s) AS DOUBLE))
             / sqrt(
                 (CAST(n_s AS DOUBLE) * CAST(nn - n_s AS DOUBLE) / 3.0)
                 * (CAST(nn + 1 AS DOUBLE)
                    - CAST(tie3 AS DOUBLE)
                      / (CAST(nn AS DOUBLE) * CAST(nn - 1 AS DOUBLE))))
             * 1000.0) AS BIGINT) AS z_milli
    FROM r, g
    """,
)
def mannwhitney_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U per source vs the rest of the corpus on doc
    length: does a source's n_chars distribution sit above/below
    everyone else's? Nonparametric — no normality assumption, robust
    to the heavy tails that break mean-based comparisons
    (priority_winsorized_spend's rank-test sibling). Tie-corrected:
    2x-scaled average ranks (2*c_prev + m + 1 per value run) keep the
    rank sum an exact int64; U2 = 2U and its null mean n_s(N-n_s)
    stay integers. The z-score is one ROW-LOCAL closed form over
    those integers (IEEE +,-,*,/ and correctly-rounded sqrt — same
    bits both engines; note 2x scaling doubles both numerator and
    the sigma inside sqrt, so z needs the /3 variance form:
    var(U2) = 4*var(U)). |z_milli| > 1960 rejects at 5%.

    Scale: ranks come from the collapsed VALUE DOMAIN (weighted-
    median pattern) — the cumsum window runs over distinct n_chars,
    not the corpus; per-(source, value) counts fold map-side; the
    final z is per-source arithmetic against one broadcast 1-row
    global frame. NULL n_chars rows are excluded up front (rankless;
    also pins the ordering contract — Spark sorts NULLS FIRST, DuckDB
    NULLS LAST). int64 bounds: r2_s <= 2*n_s*N needs N < ~2e9 docs;
    tie3 needs every tie run m < ~2.1e6 — past either, fold the same
    partials in DECIMAL(38,0)."""
    d = (
        load(spark, sf_dir, "documents")
        .select("source", "n_chars")
        .where(F.col("n_chars").isNotNull())
    )
    vals = d.groupBy("n_chars").agg(F.count("*").cast("long").alias("m"))
    wc = (
        Window.orderBy("n_chars")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = vals.withColumn(
        "c_prev", F.coalesce(F.sum("m").over(wc), F.lit(0)).cast("long")
    )
    sv = d.groupBy("source", "n_chars").agg(
        F.count("*").cast("long").alias("k")
    )
    r = (
        sv.join(cum, "n_chars")
        .groupBy("source")
        .agg(
            F.sum("k").cast("long").alias("n_s"),
            F.sum(
                F.col("k") * (2 * F.col("c_prev") + F.col("m") + 1)
            )
            .cast("long")
            .alias("r2_s"),
        )
    )
    g = vals.agg(
        F.sum("m").cast("long").alias("nn"),
        F.sum(F.col("m") * F.col("m") * F.col("m") - F.col("m"))
        .cast("long")
        .alias("tie3"),
    )
    j = r.crossJoin(F.broadcast(g))
    u2 = F.col("r2_s") - F.col("n_s") * (F.col("n_s") + 1)
    z = (
        _dbl(u2) - _dbl(F.col("n_s") * (F.col("nn") - F.col("n_s")))
    ) / F.sqrt(
        (_dbl(F.col("n_s")) * _dbl(F.col("nn") - F.col("n_s")) / F.lit(3.0))
        * (
            _dbl(F.col("nn") + 1)
            - _dbl(F.col("tie3"))
            / (_dbl(F.col("nn")) * _dbl(F.col("nn") - 1))
        )
    )
    return j.select(
        "source",
        "n_s",
        u2.alias("u2_s"),
        F.floor(z * F.lit(1000.0)).cast("long").alias("z_milli"),
    )


@register(
    "curriculum_shuffle_audit",
    f"""
    WITH {_SQL_CURRICULUM_CTES},
    cur AS (
      SELECT r.train_order, d.source
      FROM ranked r JOIN documents d USING (doc_id)
    ),
    adj AS (
      SELECT a.source AS src_a, b.source AS src_b
      FROM cur a JOIN cur b ON b.train_order = a.train_order + 1
    ),
    obs AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
             CAST(SUM(CASE WHEN src_a = src_b THEN 1 ELSE 0 END)
               AS BIGINT) AS same_pairs
      FROM adj
    ),
    expc AS (
      SELECT CAST(SUM(ns * (ns - 1)) AS BIGINT) AS sum_nn1,
             CAST(SUM(ns) AS BIGINT) AS n_docs
      FROM (SELECT COUNT(*) AS ns FROM documents GROUP BY source)
    )
    SELECT n_docs, n_pairs, same_pairs,
           (same_pairs * 1000000) // n_pairs AS observed_1e6,
           (sum_nn1 * 1000000) // (n_docs * (n_docs - 1)) AS expected_1e6,
           (same_pairs * 1000000) // n_pairs
             <= 2 * ((sum_nn1 * 1000000) // (n_docs * (n_docs - 1)))
             AS decorrelated
    FROM obs, expc
    """,
)
def curriculum_shuffle_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does the curriculum's within-level shuffle actually decorrelate
    adjacent training examples? Measures the same-source rate of
    CONSECUTIVE pairs in curriculum_order against the random-
    permutation expectation sum(n_s(n_s-1))/(N(N-1)) — a crawl-ordered
    (or badly salted) layout shows observed >> expected, which turns
    into correlated gradient batches. Flag trips at 2x expectation.

    Scale: adjacency is an EQUI-join on train_order = train_order+1
    (co-partitioned, no global ordered window over the corpus); both
    rates are integer per-million. int64 bound: N^2 * 1e6 needs
    N < ~3e6 docs; past that compute the two shares in DECIMAL(38,0)
    from the same integer partials."""
    cur = _REGISTRY["curriculum_order"](spark, sf_dir)
    src = load(spark, sf_dir, "documents").select("doc_id", "source")
    # both sides of the adjacency join consume the ranked frame; persist
    # the slim (order, source) projection so the two-pass rank chain
    # (and its bucket-count job) runs once, not twice
    c = cur.join(src, "doc_id").select("train_order", "source").persist()
    a = c.select(F.col("train_order").alias("i"), F.col("source").alias("src_a"))
    b = c.select(
        (F.col("train_order") - 1).alias("i"), F.col("source").alias("src_b")
    )
    obs = (
        a.join(b, "i")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.sum((F.col("src_a") == F.col("src_b")).cast("long"))
            .cast("long")
            .alias("same_pairs"),
        )
    )
    expc = (
        src.groupBy("source")
        .agg(F.count("*").alias("ns"))
        .agg(
            F.sum(F.col("ns") * (F.col("ns") - 1)).cast("long").alias(
                "sum_nn1"
            ),
            F.sum("ns").cast("long").alias("n_docs"),
        )
    )
    j = obs.crossJoin(F.broadcast(expc))
    observed = F.expr("div(same_pairs * 1000000, n_pairs)")
    expected = F.expr("div(sum_nn1 * 1000000, n_docs * (n_docs - 1))")
    return j.select(
        "n_docs",
        "n_pairs",
        "same_pairs",
        observed.alias("observed_1e6"),
        expected.alias("expected_1e6"),
        (observed <= 2 * expected).alias("decorrelated"),
    )


@register(
    "order_reconciliation",
    """
    WITH li AS (
      SELECT l_orderkey,
             CAST(SUM(
               CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
               * (1000 - CAST(floor(l_discount * 1000 + 0.5) AS BIGINT))
               * (1000 + CAST(floor(l_tax * 1000 + 0.5) AS BIGINT))
             ) AS BIGINT) AS charge_micro
      FROM lineitem GROUP BY l_orderkey
    ),
    o AS (
      SELECT o_orderkey,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS total_cents
      FROM orders
    ),
    j AS (
      SELECT o.o_orderkey, o.total_cents, li.charge_micro,
             abs(li.charge_micro - o.total_cents * 1000000) AS diff_micro
      FROM o LEFT JOIN li ON o.o_orderkey = li.l_orderkey
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CASE WHEN charge_micro IS NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS n_childless,
           CAST(SUM(CASE WHEN diff_micro * 100 > total_cents * 1000000
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatch_1pct,
           CAST(MAX(CASE WHEN charge_micro IS NOT NULL
                    THEN diff_micro // total_cents END) AS BIGINT)
             AS max_rel_diff_1e6
    FROM j
    """,
)
def order_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table financial reconciliation: does each order's header
    total match the sum of its line charges ext*(1-disc)*(1+tax)?
    Emits childless headers, >1%-off counts, and the worst relative
    gap — the parent/child consistency audit dq_audit (single-table
    rows) and fk_integrity_audit (key existence) don't cover: keys
    can all resolve while the MONEY disagrees. Exact integer micro-
    cents (cents x per-mille x per-mille), no float summation.

    Scale: one map-side-combinable child rollup + ONE key-co-
    partitioned left join, then a single global fold. diff//total is
    exact integer (both engines truncate toward zero; diff >= 0)."""
    li = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.sum(
                F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast(
                    "long"
                )
                * (
                    1000
                    - F.floor(F.col("l_discount") * 1000 + F.lit(0.5)).cast(
                        "long"
                    )
                )
                * (
                    1000
                    + F.floor(F.col("l_tax") * 1000 + F.lit(0.5)).cast(
                        "long"
                    )
                )
            )
            .cast("long")
            .alias("charge_micro")
        )
    )
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("total_cents"),
    )
    j = o.join(li, o.o_orderkey == li.l_orderkey, "left").select(
        "total_cents",
        "charge_micro",
        F.abs(
            F.col("charge_micro") - F.col("total_cents") * F.lit(1000000)
        ).alias("diff_micro"),
    )
    return j.agg(
        F.count("*").cast("long").alias("n_orders"),
        F.sum(F.col("charge_micro").isNull().cast("long"))
        .cast("long")
        .alias("n_childless"),
        F.sum(
            (
                F.col("diff_micro") * 100
                > F.col("total_cents") * F.lit(1000000)
            ).cast("long")
        )
        .cast("long")
        .alias("n_mismatch_1pct"),
        F.max(
            F.when(
                F.col("charge_micro").isNotNull(),
                F.expr("div(diff_micro, total_cents)"),
            )
        )
        .cast("long")
        .alias("max_rel_diff_1e6"),
    )


@register(
    "join_cardinality_estimate",
    """
    WITH true_n AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_true
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    est AS (
      SELECT CAST(COUNT(*) AS BIGINT) * 10 AS n_est
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE CAST(('0x' || substr(md5('jce-v1:' ||
            CAST(o.o_custkey AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 10
    )
    SELECT n_true, n_est,
           (abs(n_est - n_true) * 10000) // n_true AS err_1e4
    FROM true_n, est
    """,
)
def join_cardinality_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-based join-cardinality estimation, audited against the
    true count: hash-sample 10% of the JOIN-KEY domain (md5 on the
    key, so BOTH relations keep every row of a sampled key — the
    correlated-sampling trick that makes |sample join| / p unbiased,
    unlike independent row sampling whose match rate collapses at
    p^2), scale up, and report the relative error. The optimizer-
    statistics primitive behind join reordering and skew planning;
    the estimator-calibration sibling of quantile_sketch_audit and
    ann_recall_check.

    Scale: the sample predicate is a PURE function of the key, so it
    applies as a row-local filter at the scan — no key-domain
    distinct, no extra join; the sampled probe side is 10% of rows
    before the shuffle. Deterministic: the md5 key sample is retry-
    and engine-stable, so the 'estimate' is reproducible — this
    audits estimator ERROR, not sampling luck."""
    o = load(spark, sf_dir, "orders").select("o_custkey")
    c = load(spark, sf_dir, "customer").select("c_custkey")
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(F.lit("jce-v1:"), F.col("o_custkey").cast("string"))
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    true_n = (
        o.join(c, o.o_custkey == c.c_custkey)
        .agg(F.count("*").cast("long").alias("n_true"))
    )
    est = (
        o.where(F.pmod(h, F.lit(100)) < 10)
        .join(c, F.col("o_custkey") == c.c_custkey)
        .agg((F.count("*") * 10).cast("long").alias("n_est"))
    )
    return (
        true_n.crossJoin(F.broadcast(est))
        .select(
            "n_true",
            "n_est",
            F.expr("div(abs(n_est - n_true) * 10000, n_true)").alias(
                "err_1e4"
            ),
        )
    )


# log10(1 + 1/d) per-million, d = 1..9 — Benford's law expected
# first-digit shares as fixed integer constants (no per-row log()).
_BENFORD_1E6 = [
    301030, 176091, 124939, 96910, 79181, 66947, 57992, 51153, 45757,
]


@register(
    "benford_price_audit",
    f"""
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice * 100 + 0.5)
               AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
      FROM orders
      WHERE o_totalprice > 0
    ),
    obs AS (
      SELECT digit, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS total
      FROM digits GROUP BY digit
    ),
    exp_t AS (
      SELECT * FROM (VALUES
        {", ".join(f"({d + 1}, {v})" for d, v in enumerate(_BENFORD_1E6))}
      ) AS t(digit, benford_1e6)
    )
    SELECT o.digit, o.n,
           (o.n * 1000000) // o.total AS observed_1e6,
           e.benford_1e6,
           abs((o.n * 1000000) // o.total - e.benford_1e6)
             AS abs_gap_1e6
    FROM obs o JOIN exp_t e USING (digit)
    """,
)
def benford_price_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals: observed
    leading-digit shares against log10(1+1/d), the forensic screen
    for fabricated, truncated, or unit-mixed monetary data (natural
    multi-magnitude amounts follow Benford; capped or invented ones
    don't). The expected shares are FIXED integer per-million
    constants — no per-row log(), no libm drift; the leading digit
    comes from substring of the integer-cents decimal rendering, a
    pure string op identical on both engines.

    Scale: one map-side fold to <= 9 cells; the share window runs on
    the 9-row aggregate. (TPC-H uniform prices won't fit Benford —
    the audit reports the gaps; the fixture assertion pins the
    mechanics, not conformance.)"""
    o = load(spark, sf_dir, "orders").where(F.col("o_totalprice") > 0)
    digit = F.substring(
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .cast("string"),
        1,
        1,
    ).cast("long")
    obs = (
        o.select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count("*").cast("long").alias("n"))
        .withColumn(
            "total", F.sum("n").over(Window.partitionBy()).cast("long")
        )
    )
    exp_t = arrow_local_df(
        spark,
        [(d + 1, v) for d, v in enumerate(_BENFORD_1E6)],
        "digit long, benford_1e6 long",
    )
    share = F.expr("div(n * 1000000, total)")
    return obs.join(F.broadcast(exp_t), "digit").select(
        "digit",
        "n",
        share.alias("observed_1e6"),
        "benford_1e6",
        F.abs(share - F.col("benford_1e6")).alias("abs_gap_1e6"),
    )


# The driver records correctness for a bounded prefix of ``queries()``
# (observed cap: 50 entries in every recorded round). With ~200 oracled
# queries registered, WHICH ones get hard-gate rows is a curated
# decision, not registration order.
#
# ROUND-11 ROTATION (round-10 verdict #1: clickhouse_http_roundtrip
# first, then drain the round-6 evidence tail, then round-7 rows):
#   * slot 1: clickhouse_http_roundtrip — the S9 write-path gate,
#     oracled since round 10 but deferred past that window's curation,
#     so it is the single oracled query with zero driver evidence;
#   * slots 2-21: ALL 20 queries whose newest green driver row is
#     round 6 (computed from the aggregated CORRECTNESS_r01-r10
#     newest-green distribution {r6:20, r7:42, r8:50, r9:50, r10:50});
#   * slots 22-50: 29 of the 42 round-7-newest rows, picked for plan
#     complexity/risk: the full streaming-twin family (8), the
#     CDC/as-of/interval join trio, the dedup family (exact,
#     containment, n-gram Jaccard, SimHash pairs+signatures, MinHash-
#     LSH, clusters, ingest/streaming, fingerprint), the duplicate-
#     span trio, decontamination (2), leakage-safe split, corpus
#     curation, embedding quantize, and q18's grouped-having scan.
# After this window runs green, no oracled query's newest green row is
# older than round 7 (13 round-7 rows remain: simpler single-shuffle
# plans — anti-join, rollup, hourly agg, n-gram counts — next in line
# for round 12). Rows-only entries never take window slots (their
# driver check is weaker by construction; see _ordered_names).
_WINDOW_PRIORITY = [
    # -- never driver-green: the S9 write-path gate (1) --
    "clickhouse_http_roundtrip",
    # -- stalest evidence: every round-6-newest row (20) --
    "ann_ranking_quality", "attribution_position",
    "contrastive_negatives", "corpus_datacard", "corpus_diversity",
    "curriculum_shuffle_audit", "embedding_centroid_shift",
    "events_anomaly_zscore", "events_interarrival_stats",
    "events_seasonality_profile", "events_wau_approx",
    "join_cardinality_estimate", "kfold_balance",
    "mixture_temperature", "order_reconciliation",
    "orders_open_timeline", "split_novelty_rate",
    "token_freq_of_freqs", "trending_parts", "weighted_median_price",
    # -- round-7 tier fill: 29 highest-complexity plans (29) --
    "stream_hourly", "stream_ohlc", "stream_sessionize",
    "stream_sliding_counts", "stream_stream_join",
    "stream_stream_outer_join", "stream_throttle_audit",
    "stream_dim_join",
    "cdc_merge_orders", "events_asof_join", "events_interval_join",
    "dedup_exact", "dedup_containment", "dedup_ngram_jaccard",
    "dedup_simhash_pairs", "simhash_signatures",
    "minhash_lsh_candidates", "dedup_clusters", "ingest_dedup",
    "doc_fingerprint",
    "dup_span_detect", "dup_span_coverage", "dup_span_strip",
    "decontaminate_corpus", "decontamination_hits",
    "leakage_safe_split", "corpus_curation", "embedding_quantize",
    "q18_large_orders",
]
# Queries registered AFTER a window is pinned queue here for the next
# rotation (the window itself stays frozen once curated so re-proof
# slots keep their meaning). grouped_salvage_gate landed after the
# round-11 window was curated and pre-validated (same pattern as
# clickhouse_http_roundtrip in round 10).
_DEFERRED_TO_NEXT_WINDOW: list[str] = ["grouped_salvage_gate"]
# Queries rotated OUT this round all hold green rows from rounds 1-5
# (that was the rotation criterion), so no ordering among them affects
# evidence coverage — they follow the window in registration order.
_REDUNDANT_EVIDENCE_TAIL: list[str] = []


def _ordered_names() -> list[str]:
    """Registry names in gate-priority order: the curated window first,
    then the remaining oracled queries (registration order), then the
    redundant-evidence twins, then rows-only entries. Oracled entries
    must never sit behind rows-only ones or their oracles silently
    never run in the hard gate."""
    head = [n for n in _WINDOW_PRIORITY if n in _REGISTRY]
    placed = set(head) | set(_REDUNDANT_EVIDENCE_TAIL)
    oracled = [n for n in _REGISTRY if n in _ORACLES and n not in placed]
    oracled += [n for n in _REDUNDANT_EVIDENCE_TAIL if n in _REGISTRY]
    rows_only = [n for n in _REGISTRY if n not in _ORACLES]
    return head + oracled + rows_only


def queries() -> dict[str, QueryFn]:
    return {n: _REGISTRY[n] for n in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    return {n: _ORACLES[n] for n in _ordered_names() if n in _ORACLES}
