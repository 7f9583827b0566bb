"""Scalar helper expressions (SURVEY §2.7 F1-F7).

All JVM-side built-ins — nothing here leaves whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def ns(col: Column | str) -> Column:
    """Null-safe string: coalesce to "" — the reference's no-null
    contract (mutation/transformer.go:324)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c.cast("string"), F.lit(""))


def underscore_join(*parts: Column | str) -> Column:
    """``a + "_" + b`` composition used for sample/profile ids
    (mutation/transformer.go:378-379; cna/transformer.go:492-500)."""
    cols = [p if isinstance(p, Column) else F.lit(p) for p in parts]
    return F.concat_ws("_", *cols)


def comma_join(*cols: Column) -> Column:
    """Comma-joined value list (cna/transformer.go:503,525)."""
    return F.concat_ws(",", *cols)
