"""Time-series regularization: resample an event stream onto a fixed
time grid with gap filling.

Feature pipelines and monitoring consume REGULAR series (one row per
entity per bucket), but event streams are irregular — a user silent for
six hours has no rows, and a naive groupBy(hour) silently drops those
buckets, which breaks rolling windows, lag features, and any model that
assumes fixed-step input. ``resample`` densifies each key's series from
its first to its last observed bucket and forward-fills values across
the gaps (the last-observation-carried-forward discipline).

No reference counterpart (the reference has no temporal operators,
SURVEY.md §2.2) — this extension follows the shape of the other
event-time operators (operators/aggregates.py sessionize,
operators/joins.py as-of join).

Scale shape: one groupBy (key, bucket) aggregate with map-side combine;
the grid is generated per key with ``sequence`` + ``explode`` (rows
produced = key's own span / step — corpus-parallel, no driver loop, no
global calendar table); the fill is one window per key, so the whole
operator is two shuffles on the key. Forward-fill uses the non-null
running count trick (count(v) OVER → group id → max(v) per group)
rather than last(ignorenulls) so the exact same expression replays in
any SQL oracle dialect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_UNITS = {"minute", "hour", "day", "week"}


def resample(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    *,
    key_col: str | None = None,
    unit: str = "hour",
) -> DataFrame:
    """Densify an event stream to one row per (key, bucket).

    Output: (key?, bucket, n_events, value, is_gap) — ``value`` is the
    LAST observation in the bucket (ties on ts broken by the larger
    value, so the pick is deterministic), forward-filled across empty
    buckets; ``n_events`` is 0 and ``is_gap`` true for filled rows.
    The grid spans each key's own [first, last] observed bucket.
    """
    if unit not in _UNITS:
        raise ValueError(f"unit must be one of {sorted(_UNITS)}, got {unit!r}")
    key = [key_col] if key_col else []
    bucket = F.date_trunc(unit, F.col(ts_col)).alias("bucket")

    # last-in-bucket via max_by over (ts, value): deterministic even when
    # two events share a timestamp inside the bucket
    agg = (
        df.select(*key, bucket, F.col(ts_col).alias("__ts"), F.col(value_col).alias("__v"))
        .groupBy(*key, "bucket")
        .agg(
            F.count("*").alias("n_events"),
            F.max_by("__v", F.struct(F.col("__ts"), F.col("__v"))).alias("__last"),
        )
    )

    # per-key grid: sequence() emits that key's own buckets only, so the
    # explode fan-out is span/step per key — independent of corpus size
    span = agg.groupBy(*key).agg(
        F.min("bucket").alias("__lo"), F.max("bucket").alias("__hi")
    )
    grid = span.select(
        *key,
        F.explode(
            F.sequence(F.col("__lo"), F.col("__hi"), F.expr(f"interval 1 {unit}"))
        ).alias("bucket"),
    )

    dense = grid.join(agg, on=key + ["bucket"], how="left")

    # forward fill, oracle-replayable: running non-null count partitions
    # the series into fill groups; each group holds exactly one
    # observation (its first row), so max over the group IS the carry
    w = Window.partitionBy(*key).orderBy("bucket")
    grp = F.count("__last").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = dense.withColumn("__grp", grp)
    wg = Window.partitionBy(*(key + ["__grp"]))
    return (
        filled.withColumn("value", F.max("__last").over(wg))
        .select(
            *key,
            "bucket",
            F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
            "value",
            F.col("n_events").isNull().alias("is_gap"),
        )
    )


def cohort_retention(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    *,
    unit: str = "week",
) -> DataFrame:
    """Cohort retention matrix: users are cohorted by their FIRST active
    bucket; for each (cohort, periods-since-cohort) cell, the number of
    distinct cohort members active in that bucket. Output:
    (cohort_epoch BIGINT, period BIGINT, n_users) — the classic
    retention triangle, period 0 = the cohort's own bucket.

    Restricted to hour/day/week so the period index is closed-form — no
    calendar join. Two aggregates and one key-partitioned join: distinct
    (user, bucket) activity, per-user min bucket (one agg), join back on
    the user (shuffle-pinned — both sides grow with users), then the
    cell count.

    DST-safe: day/week periods use calendar arithmetic (``datediff`` on
    the truncated dates, divided by 7 for weeks), so a 23/25-hour DST
    day cannot shift the index off-by-one the way truncating
    epoch-second division would. Hour periods divide epoch seconds by
    3600, which is exact in any session timezone whose DST transitions
    are whole-hour (i.e. everywhere but the handful of half-hour-DST
    zones — run those under UTC/TIMESTAMP_NTZ)."""
    if unit not in ("hour", "day", "week"):
        raise ValueError("unit must be hour/day/week (fixed-width)")
    act = (
        df.select(
            F.col(user_col).alias("u"),
            F.date_trunc(unit, F.col(ts_col)).alias("bt"),
        )
        .distinct()
    )
    cohorts = act.groupBy("u").agg(F.min("bt").alias("ct"))
    if unit == "hour":
        period = (
            (F.unix_timestamp("bt") - F.unix_timestamp("ct")) / 3600
        ).cast("bigint")
    else:
        days = F.datediff(F.to_date("bt"), F.to_date("ct"))
        period = (days / (7 if unit == "week" else 1)).cast("bigint")
    return (
        act.hint("shuffle_merge")
        .join(cohorts, "u")
        .groupBy(
            F.unix_timestamp("ct").alias("cohort_epoch"),
            period.alias("period"),
        )
        .agg(F.count_distinct("u").alias("n_users"))
    )
