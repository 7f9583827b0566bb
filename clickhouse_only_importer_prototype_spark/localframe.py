"""Driver-local rows -> DataFrame without the Python-RDD scan.

``spark.createDataFrame(list_of_rows)`` plans a PICKLED-PYTHON-RDD
local relation sliced ``defaultParallelism`` ways: every action over
it launches one Python worker round-trip PER SLICE, serialized inside
whichever task consumes them. On syscall-expensive sandboxes each
round-trip is ~0.1-0.2s, so a 2-row frame costs seconds to write
(measured on local[32]: 2-row parquet write 4.0-5.6s via the pickle
path vs 0.23s via Arrow — round-11 optimization, guide §4: eliminate
the JVM<->Python boundary).

``arrow_local_df`` builds the same frame through a ``pyarrow.Table``
with types pinned from the Spark schema: a pure-JVM local relation,
zero Python workers at execution time, exact types (no pandas
float64-widening of NULL-bearing int64 columns — the trap
queries._stream_twin documents), and no 32-slice scatter of a 5-row
dimension frame. Falls back to the classic path for types the Arrow
converter does not cover, so callers can use it unconditionally.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_WARNED_FALLBACK = False


def arrow_local_df(spark: SparkSession, rows, schema) -> DataFrame:
    """Local ``rows`` (tuples/Rows) + ``schema`` (StructType or DDL
    string) -> DataFrame via an Arrow local relation.

    Intended for BOUNDED driver-side frames (offsets, sentinels,
    sketch rescores, metadata) — the same classes that were previously
    built with ``spark.createDataFrame(rows, schema)``; this is a
    plan-shape change only, results are identical.

    Caller contract: pass values already of the schema's Python types
    (int for integral, datetime for timestamps, ...). ``pa.array``
    coerces some mistyped inputs (e.g. ISO strings into timestamp
    columns) that the classic verifier would reject with a TypeError —
    this helper does not re-validate, it only pins the declared types.
    """
    data = list(rows)
    try:
        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_schema

        st = (
            StructType.fromDDL(schema) if isinstance(schema, str) else schema
        )
        pa_schema = to_arrow_schema(st)
        cols = [
            pa.array([r[i] for r in data], type=f.type)
            for i, f in enumerate(pa_schema)
        ]
        tbl = pa.Table.from_arrays(cols, schema=pa_schema)
        # pass the Spark schema too: a bare tz-naive Arrow timestamp
        # would otherwise come back as TIMESTAMP_LTZ, not NTZ
        out = spark.createDataFrame(tbl, schema=st)
        if out.schema != st:
            raise ValueError("arrow round-trip changed the schema")
        return out
    except Exception as exc:
        # honest fallback: exotic element types (or a session whose
        # Arrow conversion path rejects the table) keep working through
        # the classic code path at the old cost. Warn ONCE per process
        # so a permanently-degraded environment (e.g. missing pyarrow)
        # is visible instead of silently eating the pickle-path cost.
        global _WARNED_FALLBACK
        if not _WARNED_FALLBACK:
            _WARNED_FALLBACK = True
            warnings.warn(
                f"arrow_local_df fell back to the classic (pickled-RDD) "
                f"path: {type(exc).__name__}: {exc}",
                RuntimeWarning,
                stacklevel=2,
            )
        return spark.createDataFrame(data, schema)
