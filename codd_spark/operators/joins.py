"""Join operators Spark lacks as built-ins: as-of (event-time nearest)
join, range (point-in-interval) join, and salted (skew-resistant) join.

The reference has only inner equi-join + cross product
(core/src/expression/join.rs:42-148; SURVEY.md §2.2) — these are engine
extensions shaped for the 100 TB regime.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Backward as-of join: for each left row, attach the single latest
    right row with ``right_ts <= left_ts`` within the same key group
    (inclusive, like DuckDB/kdb ASOF). Left rows with no prior right row
    keep NULLs.

    Implementation is the union-and-carry-forward pattern, NOT a range
    join: tag both sides, sort each key group by (ts, side) with right
    rows first at ties, and carry the last right payload forward with a
    running window. The payload is carried as ONE struct of all right
    columns, so the attached values always come from a single right row —
    a per-column ``last(ignorenulls)`` would backfill a NULL field from an
    older right row, silently mixing rows. One shuffle on the key — no
    per-row range probe, no quadratic blowup on dense keys — this is the
    formulation that survives billions of rows per key-day at 100 TB.
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in on and c != right_ts]
    out_names = {c: (c + suffix if c in left.columns else c) for c in right_cols + [right_ts]}
    rdt = dict(right.dtypes)

    # the right payload travels as one struct: NULL for left rows, a
    # non-null struct (possibly with null fields) for right rows, so
    # last(ignorenulls) picks whole rows, never mixes columns across rows
    payload_fields = [c for c in right_cols + [right_ts]]
    null_payload = F.when(
        F.lit(False),
        F.struct(
            *[F.lit(None).cast(rdt[c]).alias(out_names[c]) for c in payload_fields]
        ),
    )
    lhs = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in left.columns if c not in on and c != left_ts],
        F.col(left_ts),
        null_payload.alias("__rpay"),
    )
    rhs = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in left.columns if c not in on and c != left_ts],
        F.lit(None).cast(dict(left.dtypes)[left_ts]).alias(left_ts),
        F.struct(
            *[F.col(c).alias(out_names[c]) for c in payload_fields]
        ).alias("__rpay"),
    )
    unioned = lhs.unionByName(rhs)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *on,
        "__side",
        *[c for c in left.columns if c not in on and c != left_ts],
        left_ts,
        F.last("__rpay", ignorenulls=True).over(w).alias("__rpay"),
    )
    return (
        carried.filter(F.col("__side") == 1)
        .select(
            *on,
            *[c for c in left.columns if c not in on and c != left_ts],
            left_ts,
            *[F.col(f"__rpay.{out_names[c]}").alias(out_names[c]) for c in payload_fields],
        )
    )


def _numeric(c: Column, dtype: str) -> Column:
    """Timestamps → epoch seconds (microsecond precision) so interval
    arithmetic and bucketing work uniformly; numerics pass through.
    TIMESTAMP_NTZ goes through a cast (session-tz; consistent across both
    sides, so interval comparisons are unaffected)."""
    if dtype.startswith("timestamp"):
        if dtype == "timestamp_ntz":
            c = c.cast("timestamp")
        return F.unix_micros(c).cast("double") / F.lit(1e6)
    return c.cast("double")


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_start: str,
    right_end: str,
    on: list[str] | None = None,
    bucket_width: float | None = None,
    how: str = "inner",
) -> DataFrame:
    """Point-in-interval join: each left row pairs with every right row
    whose ``[right_start, right_end]`` interval (inclusive both ends, like
    SQL BETWEEN) contains ``left_point``. Timestamps and numerics both
    work. The reference can only express this as cross-product + filter
    (core/src/expression/product.rs:27-120) — quadratic; these are the two
    shapes that scale:

    - **Keyed** (``on`` given): equi-join on the keys, then the range
      filter. One hash/sort-merge shuffle on the keys; right for
      per-entity intervals (sessions, validity windows) where each key
      holds few intervals.
    - **Global bucketed** (``on`` empty, ``bucket_width`` required): the
      IP-geolocation shape. Left rows hash to bucket
      ``floor(point/width)``; right intervals EXPLODE to every bucket they
      overlap; equi-join on bucket, filter, and drop duplicate pairs that
      arise when an interval spans many buckets. Pick ``bucket_width``
      near the median interval length: too small multiplies the right
      side's explode factor, too large degenerates toward cross-product
      per bucket. Cost is O(points + intervals·spans) shuffled once —
      never the cross product Catalyst would otherwise plan for a pure
      inequality join (BroadcastNestedLoopJoin only survives when one
      side broadcasts).

    At scale the points side is the big one: pass the intervals as
    ``F.broadcast(intervals)`` when they fit (the hint survives the
    internal explode), otherwise the bucket join shuffles both sides —
    which is the correct plan when both are large.
    """
    if how != "inner":
        raise ValueError("range_join supports how='inner' only")
    on = on or []
    ldt, rdt = dict(left.dtypes), dict(right.dtypes)
    p = _numeric(F.col(left_point), ldt[left_point])
    s = _numeric(F.col(right_start), rdt[right_start])
    e = _numeric(F.col(right_end), rdt[right_end])
    if on:
        return left.join(right, on=on, how="inner").where(p.between(s, e))
    if bucket_width is None:
        raise ValueError("global range_join needs bucket_width (no `on` keys)")
    w = float(bucket_width)
    lb = left.withColumn("__bk", F.floor(p / F.lit(w)))
    rb = right.withColumn(
        "__bk", F.explode(F.sequence(F.floor(s / F.lit(w)), F.floor(e / F.lit(w))))
    )
    return (
        lb.join(rb, on="__bk", how="inner")
        .where(p.between(s, e))
        .drop("__bk")
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: the (large, skewed) left side gets a
    deterministic salt in [0, n_salts); the (smaller) right side is
    replicated n_salts times; the join key becomes (key, salt), spreading
    a hot key across n_salts tasks.

    Result is identical to ``left.join(right, on, how)`` for inner/left
    joins. AQE's skew-join split handles moderate skew automatically;
    explicit salting is for the pathological keys AQE can't split (e.g. a
    single key holding >half the data). Deterministic: the salt is a hash
    of the whole left row, not rand().
    """
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    salted_l = left.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(n_salts))
    )
    salted_r = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted_l.join(salted_r, on=on + ["__salt"], how=how).drop("__salt")


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    on: list[str] | None = None,
    bucket_width: float | None = None,
) -> DataFrame:
    """Interval-OVERLAP join: pairs where ``[left_start, left_end]`` and
    ``[right_start, right_end]`` intersect (inclusive ends:
    ``ls <= re AND rs <= le``). The interval×interval counterpart of
    range_join's point-in-interval.

    - **Keyed** (``on`` given): equi-join on the keys then the overlap
      filter — one shuffle; right for per-entity intervals.
    - **Global bucketed** (``bucket_width`` required): BOTH sides explode
      to every bucket their interval covers; any overlapping pair shares
      the bucket containing an overlap point, so an equi-join on the
      bucket finds all candidates; the exact filter + distinct removes
      multi-bucket duplicates. Cost O(intervals·spans) shuffled once —
      never the cross product a pure inequality join would plan.
    """
    on = on or []
    ldt, rdt = dict(left.dtypes), dict(right.dtypes)
    ls = _numeric(F.col(left_start), ldt[left_start])
    le = _numeric(F.col(left_end), ldt[left_end])
    rs = _numeric(F.col(right_start), rdt[right_start])
    re = _numeric(F.col(right_end), rdt[right_end])
    overlap = (ls <= re) & (rs <= le)
    if on:
        return left.join(right, on=on, how="inner").where(overlap)
    if bucket_width is None:
        raise ValueError("global interval_join needs bucket_width (no `on` keys)")
    w = float(bucket_width)
    lb = left.withColumn(
        "__bk", F.explode(F.sequence(F.floor(ls / F.lit(w)), F.floor(le / F.lit(w))))
    )
    rb = right.withColumn(
        "__bk", F.explode(F.sequence(F.floor(rs / F.lit(w)), F.floor(re / F.lit(w))))
    )
    return (
        lb.join(rb.hint("shuffle_merge"), on="__bk", how="inner")
        .where(overlap)
        .drop("__bk")
        .distinct()
    )
