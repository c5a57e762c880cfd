"""Vector primitives over ArrayType(Float) embedding columns.

All math is forced to DOUBLE before any product: float*float would round
to float32 in Spark while DuckDB's DOUBLE[] list ops compute in float64 —
casting first makes both engines produce bit-compatible results (to well
inside the 6-dp rounding every similarity query applies).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def _as_double(col: Column) -> Column:
    return col.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (index order, like DuckDB's list ops)."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def unit(a: Column) -> Column:
    """L2-normalized copy (double). Normalizing ONCE per vector turns
    every downstream cosine into a plain dot product — at all-pairs scale
    that removes 2 norm folds per candidate pair."""
    d = _as_double(a)
    return F.transform(d, lambda x: x / F.sqrt(
        F.aggregate(d, F.lit(0.0), lambda acc, v: acc + v * v)))
