"""Vector column functions over ``array<float|double>`` embeddings.

All JVM-side (``zip_with`` / ``aggregate`` / higher-order functions) — no
Python boundary crossing, so they run inside whole-stage codegen and scale
linearly with executor count. Accumulation is sequential in array order in
double precision, which makes results deterministic (and comparable against
external oracles that fold in the same order).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array columns (double accumulation, array order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL if either vector has zero norm."""
    d = dot(a, b)
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom != 0, d / denom)
