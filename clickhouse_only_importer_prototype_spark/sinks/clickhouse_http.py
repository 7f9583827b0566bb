"""ClickHouse HTTP-interface sink — the jar-free half of S9.

ClickHouse exposes two first-class bulk-ingest paths: the native/JDBC
protocol (``sinks/clickhouse.py`` — gated on a driver jar this
container has never had) and the HTTP interface (public docs:
``POST /?query=INSERT INTO t FORMAT CSV`` with the rows as the request
body), which every language client without a native driver uses. The
HTTP path needs only the Python stdlib, so unlike the JDBC writer the
DISTRIBUTED mechanics here are exercised end-to-end by test against a
local capturing HTTP server: every executor task serializes its
partition to CSV in Arrow-batched chunks (``mapInPandas``, never
row-at-a-time) and POSTs ~``batch_rows``-row bodies — ClickHouse's
preferred few-large-inserts shape.

Semantics and scale posture:

  * **At-least-once.** A failed POST raises, the task fails, Spark
    retries the whole task — rows already posted by the failed attempt
    are duplicated. On MergeTree targets ClickHouse's insert-block
    deduplication absorbs byte-identical replays of the same block;
    exactly-once needs either that or an idempotent target (e.g.
    ReplacingMergeTree keyed on the row identity) — documented here,
    not hidden.
  * **Connection fan-out** = one in-flight request per running task;
    bound it with ``df.repartition(n)`` exactly like the JDBC writer.
  * **NULLs** travel as unquoted ``\\N`` (ClickHouse CSV convention);
    empty string stays a quoted/plain empty field, preserving the
    engine's no-NULL '' contract for the catalog tables.
  * The INSERT names its columns explicitly, so server-side column
    order or defaulted extra columns don't silently misalign.

Reference: N/A — S9 is the BASELINE.json north star, not a reference
operator (README.md:5-8 stops at ClickHouse-shaped parquet).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

DEFAULT_BATCH_ROWS = 100_000


def _insert_url(url: str, table: str, columns: list[str]) -> str:
    from urllib.parse import urlencode

    cols = ", ".join(f"`{c}`" for c in columns)
    query = f"INSERT INTO {table} ({cols}) FORMAT CSV"
    return url.rstrip("/") + "/?" + urlencode({"query": query})


def execute_clickhouse_http(
    url: str,
    sql: str,
    user: str | None = None,
    password: str | None = None,
    timeout: float = 60.0,
) -> str:
    """Driver-side statement execution over the HTTP interface (DDL,
    maintenance): the SQL travels as the POST body. Returns the
    server's response text; non-2xx raises. Used by the CLI's
    ``load-clickhouse`` mode to create the catalog tables before the
    distributed insert jobs run."""
    import urllib.request

    headers = {"Content-Type": "text/plain"}
    if user is not None:
        headers["X-ClickHouse-User"] = user
    if password is not None:
        headers["X-ClickHouse-Key"] = password
    req = urllib.request.Request(
        url.rstrip("/") + "/",
        data=sql.encode("utf-8"),
        headers=headers,
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return resp.read().decode("utf-8", errors="replace")


def write_clickhouse_http(
    df: DataFrame,
    url: str,
    table: str,
    user: str | None = None,
    password: str | None = None,
    batch_rows: int = DEFAULT_BATCH_ROWS,
    timeout: float = 60.0,
) -> int:
    """POST ``df`` into ``table`` via the ClickHouse HTTP interface.

    Runs as one distributed job: each task accumulates its Arrow
    batches to ~``batch_rows`` rows and POSTs each accumulation as one
    ``INSERT ... FORMAT CSV`` body. Returns the total row count sent
    (the job's action is the count aggregation, so the write is forced
    exactly once). Raises on the first non-2xx response (fail loud;
    see module docstring for the retry semantics that implies).

    ``user``/``password`` travel as the documented
    ``X-ClickHouse-User``/``X-ClickHouse-Key`` headers.
    """
    import pandas as pd  # noqa: F401 — imported for the workers

    columns = list(df.columns)
    target = _insert_url(url, table, columns)
    headers = {"Content-Type": "text/csv"}
    if user is not None:
        headers["X-ClickHouse-User"] = user
    if password is not None:
        headers["X-ClickHouse-Key"] = password

    def send(batches):
        import csv as _csv
        import io
        import urllib.request

        import pandas as pd

        pending: list[pd.DataFrame] = []
        pending_rows = 0
        sent = 0

        def flush():
            nonlocal pending, pending_rows, sent
            if not pending_rows:
                return
            buf = io.StringIO()
            pd.concat(pending, ignore_index=True).to_csv(
                buf,
                index=False,
                header=False,
                na_rep="\\N",
                quoting=_csv.QUOTE_MINIMAL,
                lineterminator="\n",
            )
            req = urllib.request.Request(
                target,
                data=buf.getvalue().encode("utf-8"),
                headers=headers,
                method="POST",
            )
            # non-2xx raises HTTPError -> task failure -> Spark retry
            with urllib.request.urlopen(req, timeout=timeout) as resp:
                resp.read()
            sent += pending_rows
            pending, pending_rows = [], 0

        for pdf in batches:
            pdf = pdf[columns]
            # slice oversized Arrow batches so batch_rows is a real
            # body-size bound, not just a flush trigger — one Arrow
            # batch can exceed it (maxRecordsPerBatch default 10k)
            for start in range(0, len(pdf), batch_rows):
                piece = pdf.iloc[start : start + batch_rows]
                pending.append(piece)
                pending_rows += len(piece)
                if pending_rows >= batch_rows:
                    flush()
        flush()
        yield pd.DataFrame({"rows_sent": [sent]})

    from pyspark.sql import functions as F

    row = (
        df.mapInPandas(send, "rows_sent long")
        .agg(F.sum("rows_sent").alias("total"))
        .first()
    )
    return int(row["total"] or 0)
