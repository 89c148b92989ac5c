"""Aggregation / ordering operators the reference lacks (SURVEY.md §2.2).

Everything is built-in DataFrame API so Catalyst keeps partial aggregation
(map-side combine), TakeOrderedAndProject for top-k, and window-function
codegen."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window


def top_k(df: DataFrame, order_by: list[Column | str], k: int) -> DataFrame:
    """Global top-k. Compiles to TakeOrderedAndProject: each partition keeps
    a k-heap, the driver merges — no global sort materialization, safe at
    any scale for small k. ``order_by`` should end with a unique tiebreak
    column for determinism."""
    return df.orderBy(*order_by).limit(k)


def grouped_top_k(
    df: DataFrame, partition_by: list[str], order_by: list[Column | str], k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Top-k per group via row_number window — one shuffle on the group key.
    Skewed groups are handled by AQE; for pathological skew pre-aggregate or
    salt the partition key."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)


def approx_distinct(df: DataFrame, cols: list[str], rsd: float = 0.05) -> DataFrame:
    """HyperLogLog++ distinct counts — the scale path when exact distinct
    (a full shuffle) isn't required."""
    return df.agg(
        *[F.approx_count_distinct(c, rsd).alias(f"approx_distinct_{c}") for c in cols]
    )


def tumbling_window_agg(
    df: DataFrame, ts_col: str, duration: str, keys: list[str], aggs: list[Column]
) -> DataFrame:
    """Event-time tumbling window aggregation (works identically on batch
    and streaming DataFrames)."""
    return df.groupBy(F.window(ts_col, duration).alias("window"), *keys).agg(*aggs)


def sessionize(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    gap_seconds: float,
    tiebreak: str | None = None,
    session_col: str = "session_id",
) -> DataFrame:
    """Gaps-and-islands sessionization: number each row's session per key,
    where a new session starts when the time since the key's previous event
    exceeds ``gap_seconds``. The batch analogue of
    ``F.session_window`` that keeps every row (with its session id) instead
    of collapsing to one row per session.

    Scale shape: both window passes (the lag probe and the running sum)
    share one partitioning and ordering, so the plan has exactly ONE
    exchange on the key and one sort — the same cost as any per-key window
    function. Skewed keys (one user = half the events) are the usual
    window-function hazard; mitigate upstream by splitting bot traffic.

    Pass a unique ``tiebreak`` column (e.g. the event id) so equal
    timestamps order deterministically."""
    order = [F.col(ts_col)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(*key_cols).orderBy(*order)
    us = F.unix_micros(F.col(ts_col))
    prev = F.lag(us).over(w)
    is_new = F.when(
        prev.isNull() | ((us - prev) > int(gap_seconds * 1_000_000)), F.lit(1)
    ).otherwise(F.lit(0))
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(session_col, F.sum(is_new).over(run))


def histogram(
    df: DataFrame,
    col: str,
    *,
    lo: float,
    hi: float,
    nbins: int,
    dense: bool = True,
) -> DataFrame:
    """Fixed-width histogram of a numeric column over [lo, hi):
    (bin, bin_lo, bin_hi, n) — below-range values clamp into bin 0,
    above-range into the last bin, NULLs are dropped.

    One partial-aggregated groupBy on a closed-form bin expression —
    the single-shuffle distribution probe for quality-score/length/
    loss columns at corpus scale. ``dense=True`` left-joins the full
    bin spine so empty bins appear with n=0 (plot-ready, and the output
    size is nbins regardless of data size).
    """
    if not (hi > lo) or nbins < 1:
        raise ValueError("need hi > lo and nbins >= 1")
    width = (hi - lo) / nbins
    bin_expr = F.least(
        F.lit(nbins - 1),
        F.greatest(F.lit(0), F.floor((F.col(col) - F.lit(lo)) / F.lit(width))),
    ).cast("long")
    counts = (
        df.filter(F.col(col).isNotNull())
        .groupBy(bin_expr.alias("bin"))
        .agg(F.count("*").alias("n"))
    )
    if not dense:
        return counts
    spark = df.sparkSession
    spine = spark.range(nbins).select(F.col("id").alias("bin"))
    return (
        spine.join(counts, on="bin", how="left")
        .select(
            "bin",
            (F.lit(lo) + F.col("bin") * F.lit(width)).alias("bin_lo"),
            (F.lit(lo) + (F.col("bin") + 1) * F.lit(width)).alias("bin_hi"),
            F.coalesce(F.col("n"), F.lit(0)).alias("n"),
        )
    )


def heavy_hitters(df: DataFrame, col: str, *, k: int = 100) -> DataFrame:
    """EXACT frequent items: every value of ``col`` occurring more than
    n/k times (the Misra-Gries support level), with its count and
    fraction — (item, cnt, frac), frac rounded to 6 places.

    100-TB design — two passes, neither shuffles the vocabulary:

    1. Candidate pruning by pigeonhole: count per (input partition,
       item). If a value's GLOBAL count exceeds n/k = sum(n_p)/k, then
       in at least one partition its local count exceeds n_p/k — so the
       per-partition filter ``cnt_p * k > n_p`` yields a COMPLETE
       candidate set (no false negatives, same guarantee Misra-Gries
       summaries give), and each partition contributes < k candidates,
       so the set is <= k * n_partitions rows — broadcastable no matter
       how large the vocabulary is. Crucially, n_p is a window sum over
       the SAME rows that carry cnt_p (one evaluation of the (pid, item)
       aggregate), so the guarantee is self-consistent by construction —
       spark_partition_id is documented non-deterministic across
       re-evaluations (AQE replans, round-robin repartition, sample), so
       cnt_p and n_p from two independent evaluations of the lineage
       could disagree and silently drop a true heavy hitter. The
       (pid, item) groupBy does still shuffle ~one row per distinct item
       per partition (map-side combined); what the plan avoids is
       shuffling raw rows and running a vocabulary-wide global
       aggregate — only candidates reach pass 2.
    2. Exact verification: broadcast-semi-join the corpus to the
       candidates, one partial-aggregated count, filter against the
       1-row global total (broadcast nested-loop of a scalar, no
       collect).

    A plain groupBy(col).count() shuffles every distinct value; at
    web-corpus vocabulary sizes (billions of distinct terms) that is the
    dominant cost, and this plan replaces it with a shuffle of
    <= k * n_partitions rows."""
    if k < 2:
        raise ValueError("k must be >= 2")
    from pyspark.sql import Window

    items = df.select(F.spark_partition_id().alias("__pid"), F.col(col).alias("item"))
    per_part = items.groupBy("__pid", "item").agg(F.count("*").alias("__c"))
    # n_p from the same evaluation as cnt_p (window over the aggregate
    # rows themselves) — never a second evaluation of the items lineage
    cands = (
        per_part.withColumn(
            "__n", F.sum("__c").over(Window.partitionBy("__pid"))
        )
        .filter(F.col("__c") * k > F.col("__n"))
        .select("item")
        .distinct()
    )
    total = items.select(F.count("*").alias("__total"))
    return (
        items.join(F.broadcast(cands), "item", "leftsemi")
        .groupBy("item")
        .agg(F.count("*").alias("cnt"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * k > F.col("__total"))
        .select(
            "item",
            "cnt",
            F.round(F.col("cnt").cast("double") / F.col("__total"), 6).alias("frac"),
        )
    )


def sketch_rollup(
    df: DataFrame,
    key_cols: list[str],
    distinct_col: str,
    *,
    ts_col: str | None = None,
    unit: str = "day",
    lg_k: int = 12,
) -> DataFrame:
    """Pre-aggregated MERGEABLE distinct-count rollup: one HLL sketch per
    (key..., bucket) — (key..., bucket?, sketch BINARY, n_rows). The
    100-TB pattern behind "distinct users for ANY date range without
    rescanning": materialize this once per ingestion window, then answer
    range queries by unioning sketches (``sketch_union``), never
    re-reading the fact table. Sketch union is lossless at equal lg_k —
    unioned daily sketches give the IDENTICAL estimate a single global
    sketch would (pinned by tests), ~1.6%/sqrt(2^lg_k / 1.04) relative
    error vs exact.

    One partial-aggregated shuffle; sketches merge map-side like any
    monoid, which is the entire point."""
    bucket = (
        [F.date_trunc(unit, F.col(ts_col)).alias("bucket")] if ts_col else []
    )
    return (
        df.groupBy(*[F.col(c) for c in key_cols], *bucket)
        .agg(
            F.hll_sketch_agg(F.col(distinct_col), F.lit(lg_k)).alias("sketch"),
            F.count("*").alias("n_rows"),
        )
    )


def sketch_union(
    rollup: DataFrame,
    group_cols: list[str],
    *,
    estimate_col: str = "n_distinct_est",
) -> DataFrame:
    """Re-aggregate a ``sketch_rollup`` to coarser groups (drop the
    bucket, keep a key subset, or group by nothing for a grand total):
    unions the HLL sketches and reports the estimate — an
    O(output-groups) aggregate over pre-reduced state, no fact-table
    rescan. Also keeps the summed row counts."""
    gb = rollup.groupBy(*[F.col(c) for c in group_cols])
    return gb.agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col("sketch"))).alias(estimate_col),
        F.sum("n_rows").alias("n_rows"),
    )
