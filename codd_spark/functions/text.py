"""Text column functions (JVM-side; no Python UDFs in the hot path)."""

from __future__ import annotations

from pyspark.sql import Column, functions as F

_WS = r"\s+"


def normalize_ws(c: Column) -> Column:
    """Lowercase + collapse whitespace runs to single spaces + trim."""
    return F.trim(F.regexp_replace(F.lower(c), _WS, " "))


def tokens(c: Column) -> Column:
    """Whitespace tokenization of trimmed text -> array<string>."""
    return F.split(F.trim(c), _WS)


def token_count(c: Column) -> Column:
    return F.size(tokens(c))


def punct_ratio(c: Column) -> Column:
    """Fraction of characters that are not word chars or whitespace."""
    clen = F.length(c)
    stripped = F.length(F.regexp_replace(c, r"[\w\s]", ""))
    return F.when(clen > 0, stripped.cast("double") / clen.cast("double")).otherwise(0.0)


def fingerprint_md5(c: Column) -> Column:
    """Document fingerprint: md5 of the whitespace-normalized lowercase text
    — the exact-dup key for content-level dedup."""
    return F.md5(normalize_ws(c))
