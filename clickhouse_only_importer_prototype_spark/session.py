"""SparkSession factory tuned for the engine.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32); the same
conf block is what we would ship to a multi-executor cluster — AQE on,
Arrow on, sane shuffle-partition default, nanos-as-long for parquet
TIMESTAMP(NANOS) inputs (the driver's ``events`` table).

Scale notes (100 TB design intent):
  * ``spark.sql.adaptive.enabled`` + coalesce + skew-join: runtime
    re-planning replaces hand-tuned partition counts.
  * ``spark.sql.files.maxPartitionBytes`` left at 128 MiB default —
    right-sized scan tasks at any input size.
  * Arrow execution for every pandas-UDF boundary.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

#: AQE picks the post-shuffle partition count by measured size, but
#: only DOWN from the initial number — with the initial pinned at 32,
#: a 100x-scale shuffle (e.g. a 120M-row adjacency join) is forced
#: into 32 oversized partitions whose join/sort buffers blow the
#: heap. Giving AQE a high ceiling costs nothing at small scale
#: (coalesce folds tiny data back to a few partitions) and bounds
#: per-task volume at large scale — the documented
#: "set initialPartitionNum high, let AQE coalesce" pattern.
_AQE_INITIAL_PARTITIONS = "512"


def _default_driver_mem() -> str:
    """Size the local JVM to the box when the env doesn't say:
    a local[32] 'cluster' on an 8 GiB heap gives each concurrent task
    ~250 MB — undersized for stress-scale joins (measured: 100x
    triangle count OOMs). Default to 1/4 of physical RAM clamped to
    [8g, 48g]; on a real cluster this conf comes from the deployment,
    not this factory."""
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemTotal:"):
                    gib = int(line.split()[1]) // (1024 * 1024)
                    return f"{min(48, max(8, gib // 4))}g"
    except OSError:
        pass
    return "8g"


def get_spark(
    app_name: str = "clickhouse-only-importer-prototype-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's standard conf.

    If a session already exists, its runtime-settable confs are updated
    rather than rebuilt (Spark reuses one JVM per process).
    """
    active = SparkSession.getActiveSession()
    if active is not None:
        _apply_runtime_conf(active)
        return active

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
            os.environ.get(
                "SPARK_GRAFT_INITIAL_PARTITIONS", _AQE_INITIAL_PARTITIONS
            ),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Broadcast policy: explicit F.broadcast() hints are reserved
        # for provably BOUNDED frames (region=5 rows, nation=25,
        # 1-row scalar aggregates, sketch-sized state). Everything that
        # scales with data volume — customer, supplier, part, any
        # fact-derived frame — is left to SIZE-BASED selection: these
        # thresholds (compile-time from parquet footers, runtime via
        # AQE's measured shuffle sizes) pick broadcast while the build
        # side actually fits and degrade to shuffle join past that,
        # instead of collecting an unbounded frame onto the driver.
        # 64 MB is sized to the per-task memory of this class of
        # executor; measured at the 100x stress scale it keeps every
        # dimension broadcast the old hints forced, while removing the
        # force-broadcast of fact-derived frames (q3's orders⨝customer
        # build was 3M rows there: hinted 52.2s, size-based 9.9s).
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "64m")
        # Runtime bloom-filter join pruning, re-thresholded for the
        # fact/dim shapes this engine runs: the defaults (creation side
        # <= 10 MB, application side >= 10 GB) almost never fire —
        # q19's selective part filter at the 600M-row tier planned a
        # sort-merge whose 600M-row shuffle write AQE could not undo
        # (142.5s). With the creation ceiling at 256 MB and the
        # application floor at 1 GB, the optimizer builds a bloom of
        # the filtered dim keys and prunes the fact at the SCAN:
        # measured 142.5s -> 7.8-16s warm. Scans under 1 GB (the whole
        # 1x/10x bench) never pay a bloom build, so toy-scale plans are
        # unchanged.
        .config(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "256MB",
        )
        .config(
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold",
            "1GB",
        )
        # persist()ed plans keep their compile-time partitioning unless
        # this is on — without it the high initial partition count
        # above leaks 512-task shuffles into every cached frame at
        # small scale (AQE can otherwise coalesce cached plans too;
        # cache hits only re-read, so the trade is pure win here)
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            "true",
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.sql.session.timeZone", "UTC")
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", _default_driver_mem()),
        )
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
    )
    if master is None:
        master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    builder = builder.master(master)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _apply_runtime_conf(spark: SparkSession) -> None:
    for k, v in (
        ("spark.sql.adaptive.enabled", "true"),
        ("spark.sql.execution.arrow.pyspark.enabled", "true"),
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.session.timeZone", "UTC"),
        # the broadcast policy (hints = bounded frames only) relies on
        # size-based selection being generous enough to pick up the
        # scaling dims while they fit — apply it to reused sessions too
        ("spark.sql.autoBroadcastJoinThreshold", "64m"),
        ("spark.sql.adaptive.autoBroadcastJoinThreshold", "64m"),
    ):
        try:
            spark.conf.set(k, v)
        except Exception:  # pragma: no cover - static confs on shared sessions
            pass
