"""ClickHouse JDBC sink (S9 — the BASELINE.json north star).

The reference writes ClickHouse-shaped parquet for out-of-band loading;
the Spark-native path writes straight to ClickHouse over JDBC. The JDBC
driver jar isn't baked into this container, so the writer validates its
availability and raises a clear error otherwise — the option plumbing
(batchsize, per-partition inserts, retries off) is real and tested via
``jdbc_writer_options``.

Scale notes: each Spark task opens one connection and inserts its
partition with ``batchsize`` rows per round-trip; ``repartition(n)``
bounds concurrent connections. ClickHouse prefers few large inserts —
default batchsize 100_000. Use ``spark.clickhouse.*`` official
connector when available; JDBC is the lowest-common-denominator path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

DEFAULT_BATCH_SIZE = 100_000
CLICKHOUSE_DRIVER = "com.clickhouse.jdbc.ClickHouseDriver"


def jdbc_writer_options(
    url: str,
    table: str,
    batch_size: int = DEFAULT_BATCH_SIZE,
    user: str | None = None,
    password: str | None = None,
    max_connections: int = 8,
) -> dict[str, str]:
    """Build the JDBC option map for a ClickHouse bulk insert."""
    opts = {
        "url": url,
        "dbtable": table,
        "driver": CLICKHOUSE_DRIVER,
        "batchsize": str(batch_size),
        "isolationLevel": "NONE",  # ClickHouse has no transactions
        "numPartitions": str(max_connections),
    }
    if user is not None:
        opts["user"] = user
    if password is not None:
        opts["password"] = password
    return opts


def _write_jdbc(
    df: DataFrame, opts: dict[str, str], mode: str, max_connections: int
) -> None:
    """Execute the JDBC bulk insert: bound connection fan-out with an
    explicit repartition (each task = one connection inserting its
    partition in ``batchsize`` chunks), then save.

    Driver-agnostic on purpose: ``write_clickhouse`` routes here after
    validating the ClickHouse driver, and the test suite drives the
    identical path against Spark's bundled embedded Derby — so the
    repartition+options+save machinery executes for real in CI even
    though no ClickHouse server exists in the container.
    """
    (
        df.repartition(max_connections)
        .write.format("jdbc")
        .options(**opts)
        .mode(mode)
        .save()
    )


def write_clickhouse(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batch_size: int = DEFAULT_BATCH_SIZE,
    max_connections: int = 8,
    **credentials: str,
) -> None:
    """Bulk-insert ``df`` into ClickHouse via JDBC.

    Raises RuntimeError if the ClickHouse JDBC driver is not on the
    Spark classpath (it is not shipped in this container).
    """
    spark = df.sparkSession
    try:
        spark._jvm.java.lang.Class.forName(CLICKHOUSE_DRIVER)  # noqa: SLF001
    except Exception as exc:
        raise RuntimeError(
            "ClickHouse JDBC driver not on classpath; add "
            "com.clickhouse:clickhouse-jdbc via spark.jars.packages"
        ) from exc
    opts = jdbc_writer_options(
        url, table, batch_size, max_connections=max_connections, **credentials
    )
    _write_jdbc(df, opts, mode, max_connections)
