"""Data-quality probes: distribution drift and column profiling.

Training-data pipelines run these continuously — a feature column whose
distribution drifts between ingestion windows, or a schema whose null
fraction jumps, is caught here before it poisons a training run. Both
operators are pure DataFrame aggregates/windows (no Python in the plan),
so they ride partial aggregation and whole-stage codegen and their output
is small (one row per group / per column) regardless of input size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def ks_statistic(
    df: DataFrame,
    value_col: str,
    sample_col: str,
    *,
    group_col: str | list[str] | None = None,
) -> DataFrame:
    """EXACT two-sample Kolmogorov-Smirnov statistic per group (pass a
    list to group by several columns, e.g. (feature, day)):
    ``sup_x |F_a(x) - F_b(x)|`` between the rows where ``sample_col`` is
    false (sample a / baseline) and true (sample b / current).

    Output: (group?, n_a, n_b, ks) with ks rounded to 6 places.

    Plan shape: one (group, value) pre-aggregate counting each sample's
    ties — the empirical CDFs only step at observed values, and
    evaluating AFTER absorbing all ties at a value is exactly where the
    sup is attained — then one cumulative window per group and a final
    max aggregate. Two shuffles on the group key, output one row per
    group; nothing about the plan grows with row count, and the window
    partitions by group (no global ordering bottleneck — groups
    parallelize across the cluster).

    NULL values are dropped (a CDF has no place for them); a group
    missing one sample entirely yields ks = 1.0 once the other sample
    has any mass (sup of a CDF against the zero function), degenerating
    to 0.0 only if both are empty — callers should treat n_a = 0 or
    n_b = 0 as "not comparable" rather than "maximally drifted".
    """
    if group_col is None:
        grp = []
    elif isinstance(group_col, str):
        grp = [group_col]
    else:
        grp = list(group_col)
    base = df.filter(F.col(value_col).isNotNull()).select(
        *grp,
        F.col(value_col).alias("v"),
        F.col(sample_col).cast("boolean").alias("is_b"),
    )
    per_value = base.groupBy(*grp, "v").agg(
        F.sum(F.when(~F.col("is_b"), 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("is_b"), 1).otherwise(0)).alias("cb"),
    )
    # no group_col → a single global window (one task); pass a group for
    # cluster-parallel drift checks over many features/segments
    w = Window.partitionBy(*[F.col(g) for g in grp])
    wcum = w.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wall = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    stepped = per_value.select(
        *grp,
        F.sum("ca").over(wcum).alias("cum_a"),
        F.sum("cb").over(wcum).alias("cum_b"),
        F.sum("ca").over(wall).alias("n_a"),
        F.sum("cb").over(wall).alias("n_b"),
    )
    diff = F.abs(
        F.when(F.col("n_a") > 0, F.col("cum_a") / F.col("n_a")).otherwise(F.lit(0.0))
        - F.when(F.col("n_b") > 0, F.col("cum_b") / F.col("n_b")).otherwise(F.lit(0.0))
    )
    return (
        stepped.select(*grp, "n_a", "n_b", diff.alias("d"))
        .groupBy(*grp, "n_a", "n_b")
        .agg(F.round(F.max("d"), 6).alias("ks"))
    )


def data_profile(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """One-pass column profile: for each column, (column, n_rows, n_null,
    n_distinct, min_str, max_str) — min/max computed on the NATIVE type
    (numeric min, not lexicographic) and stringified only for the
    uniform output schema. n_distinct is EXACT and excludes NULL.

    The whole profile is ONE aggregate node: Catalyst plans the mixed
    count-distinct/min/max set via a single expand + partial aggregation,
    so the scan happens once no matter how many columns are profiled;
    the per-column layout is then a zero-shuffle ``stack`` unpivot of the
    1-row result. At 100 TB this is scan-bound by construction (no
    per-column jobs, no driver loop over columns)."""
    cols = list(cols) if cols is not None else [f.name for f in df.schema.fields]
    if not cols:
        raise ValueError("no columns to profile")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        aggs += [
            F.count(F.col(c)).alias(f"__nn{i}"),
            F.countDistinct(F.col(c)).alias(f"__nd{i}"),
            F.min(F.col(c)).cast("string").alias(f"__mn{i}"),
            F.max(F.col(c)).cast("string").alias(f"__mx{i}"),
        ]
    row = df.agg(*aggs)
    stack_args = []
    for i, c in enumerate(cols):
        stack_args += [
            f"'{c}'",
            f"__nn{i}",
            f"__nd{i}",
            f"__mn{i}",
            f"__mx{i}",
        ]
    stacked = row.selectExpr(
        "__n",
        f"stack({len(cols)}, {', '.join(stack_args)}) "
        "AS (column, __nn, n_distinct, min_str, max_str)",
    )
    return stacked.select(
        F.col("column"),
        F.col("__n").alias("n_rows"),
        (F.col("__n") - F.col("__nn")).alias("n_null"),
        "n_distinct",
        "min_str",
        "max_str",
    )


def cusum_changepoint(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    *,
    key_col: str | None = None,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Offline CUSUM mean-shift detection per key: the point maximizing
    ``|S_i - (i/n) * S_n|`` over the series ordered by (ts, tiebreak),
    where ``S_i`` is the running value sum — the classic single-
    changepoint statistic (large when the mean before i differs from the
    mean after). Output: (key?, change_ts epoch-seconds BIGINT, n,
    cusum_stat rounded 6) — one row per key.

    Plan: one cumulative window + one full-partition window per key,
    then an argmax via rank-1 filter — two window passes and a final
    shuffle-free filter; output is one row per key regardless of series
    length, and keys parallelize across the cluster. The running FP sum
    is evaluated in the same left-to-right order by both this plan and
    any SQL oracle (same ORDER BY, same window frame), so results are
    bit-stable cross-engine. Pass ``tiebreak_col`` (an event id) when
    timestamps can collide, making the argmax deterministic."""
    grp = [key_col] if key_col else []
    tie = [F.col(tiebreak_col).alias("__tb")] if tiebreak_col else []
    base = df.filter(F.col(value_col).isNotNull()).select(
        *grp, F.col(ts_col).alias("__ts"), F.col(value_col).alias("__v"), *tie
    )
    order = [F.col("__ts")] + ([F.col("__tb")] if tiebreak_col else []) + [F.col("__v")]
    w = Window.partitionBy(*[F.col(g) for g in grp])
    wcum = w.orderBy(*order).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wall = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    stepped = base.select(
        *grp,
        "__ts",
        F.sum("__v").over(wcum).alias("s_i"),
        F.row_number().over(w.orderBy(*order)).alias("i"),
        F.sum("__v").over(wall).alias("s_n"),
        F.count("*").over(wall).alias("n"),
    )
    d = F.abs(F.col("s_i") - F.col("i").cast("double") / F.col("n") * F.col("s_n"))
    ranked = stepped.select(
        *grp,
        "__ts",
        "n",
        d.alias("d"),
        F.row_number()
        .over(w.orderBy(F.desc(d), *[F.col(c) for c in ("__ts", "i")]))
        .alias("__r"),
        "i",
    )
    return ranked.filter(F.col("__r") == 1).select(
        *grp,
        F.unix_timestamp("__ts").alias("change_ts"),
        "n",
        F.round(F.col("d"), 6).alias("cusum_stat"),
    )


def drift_series(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    *,
    key_col: str,
    unit: str = "day",
) -> DataFrame:
    """Windowed drift monitoring: for every (key, time bucket), the exact
    two-sample KS statistic between the bucket's values and the PREVIOUS
    bucket's — the continuous form of ``ks_statistic`` a pipeline runs
    per ingestion window. Output: (key, bucket_epoch BIGINT, n_prev,
    n_cur, ks), only for buckets where both sides have mass.

    Plan: the bucketed values participate twice (as themselves and
    shifted one bucket forward as the "previous" sample) via a tagged
    union — no self-join — then the ks machinery runs grouped by
    (key, bucket): one pre-aggregate + one cumulative window. Everything
    shuffles on (key, bucket); windows parallelize across keys*buckets.
    """
    bucket = F.date_trunc(unit, F.col(ts_col))
    base = df.filter(F.col(value_col).isNotNull()).select(
        F.col(key_col).alias("k"),
        bucket.alias("b"),
        F.col(value_col).alias("v"),
    )
    cur = base.select("k", "b", "v", F.lit(True).alias("is_b"))
    prev = base.select(
        "k",
        (F.col("b") + F.expr(f"INTERVAL 1 {unit}")).alias("b"),
        "v",
        F.lit(False).alias("is_b"),
    )
    tagged = cur.unionByName(prev)
    out = ks_statistic(tagged, "v", "is_b", group_col=["k", "b"])
    return (
        out.filter((F.col("n_a") > 0) & (F.col("n_b") > 0))
        .select(
            F.col("k").alias(key_col),
            F.unix_timestamp("b").alias("bucket_epoch"),
            F.col("n_a").alias("n_prev"),
            F.col("n_b").alias("n_cur"),
            "ks",
        )
    )


def key_skew(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Join-key skew probe — run this BEFORE choosing a join strategy at
    scale: one row with (n_rows, n_keys, top1_share, top10_share, gini)
    for the distribution of rows over the key. ``gini`` near 0 = uniform
    (shuffle joins fine), near 1 = concentrated (salt the hot keys or
    let AQE split); ``top1_share`` is the single-straggler bound — the
    fraction of the join one task would own.

    Plan: one count-per-key aggregate, a scalable global rank of the
    counts (range partitions + broadcast offsets — no single-task
    window), and one final 1-row aggregate computing
    gini = 2*sum(rank*cnt)/(n_keys*n_rows) - (n_keys+1)/n_keys
    (the closed form over counts sorted ascending)."""
    from codd_spark.operators.linkage import global_rank

    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    counts = df.groupBy(*key_cols).agg(F.count("*").alias("cnt"))
    ranked = global_rank(counts, ["cnt", *key_cols])
    agg = ranked.agg(
        F.sum("cnt").alias("nr"),
        F.count("*").alias("nk"),
        F.sum(F.col("rank") * F.col("cnt")).alias("sic"),
        F.max_by(F.col("cnt"), F.col("rank")).alias("top1"),
    )
    # top-10 share: keys ranked in the last 10 positions (rank ascends)
    top10 = (
        ranked.crossJoin(F.broadcast(ranked.agg(F.count("*").alias("nk2"))))
        .filter(F.col("rank") > F.col("nk2") - 10)
        .agg(F.sum("cnt").alias("top10"))
    )
    n_keys = F.col("nk")
    gini = (
        F.lit(2.0) * F.col("sic") / (n_keys.cast("double") * F.col("nr"))
        - (n_keys + 1).cast("double") / n_keys
    )
    return (
        agg.crossJoin(F.broadcast(top10))
        .select(
            F.col("nr").alias("n_rows"),
            F.col("nk").alias("n_keys"),
            F.round(F.col("top1").cast("double") / F.col("nr"), 6).alias("top1_share"),
            F.round(F.col("top10").cast("double") / F.col("nr"), 6).alias("top10_share"),
            F.round(gini, 6).alias("gini"),
        )
    )


def quantile_bins(
    df: DataFrame,
    col: str,
    tiebreak_col: str,
    *,
    n_bins: int = 10,
) -> DataFrame:
    """Equi-depth (quantile) binning: rank rows by (col, tiebreak)
    globally — the scalable rank, no single-task window — and split into
    ``n_bins`` equal-count bins. Output per bin: (bin, lo, hi, n).
    The tiebreak must make the order total, which also makes bin
    boundaries deterministic through runs and engines."""
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    from codd_spark.operators.linkage import global_rank

    base = df.filter(F.col(col).isNotNull()).select(
        F.col(col).alias("v"), F.col(tiebreak_col).alias("tb")
    )
    ranked = global_rank(base, ["v", "tb"])
    total = ranked.agg(F.count("*").alias("n_total"))
    binned = ranked.crossJoin(F.broadcast(total)).withColumn(
        "bin",
        (
            (F.col("rank") - 1).cast("double")
            * n_bins
            / F.col("n_total")
        ).cast("bigint"),
    )
    return binned.groupBy("bin").agg(
        F.min("v").alias("lo"), F.max("v").alias("hi"), F.count("*").alias("n")
    )


def join_cardinality(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
) -> DataFrame:
    """EXACT pre-join output-size diagnosis — run this before a join you
    suspect will explode: one row with (n_left, n_right, n_matching_keys,
    n_out, max_key_out), where ``n_out`` is exactly the row count the
    inner equi-join would produce (sum over keys of count_l * count_r)
    and ``max_key_out`` is the largest single key's contribution — the
    task that will own that key's entire cross product if you go ahead.

    Cost: two per-key count aggregates + a join of the (small) count
    tables — a tiny fraction of running the join itself, because no
    per-pair row ever materializes. Pair with ``key_skew`` to decide
    salting; a max_key_out in the billions is the plan-killer this
    probe exists to catch."""
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    lc = left.groupBy(*key_cols).agg(F.count("*").alias("__cl"))
    rc = right.groupBy(*key_cols).agg(F.count("*").alias("__cr"))
    both = lc.hint("shuffle_merge").join(rc, key_cols)
    totals_l = left.select(F.count("*").alias("n_left"))
    totals_r = right.select(F.count("*").alias("n_right"))
    per_key = both.select((F.col("__cl") * F.col("__cr")).alias("__o"))
    stats = per_key.agg(
        F.count("*").alias("n_matching_keys"),
        F.coalesce(F.sum("__o"), F.lit(0)).alias("n_out"),
        F.coalesce(F.max("__o"), F.lit(0)).alias("max_key_out"),
    )
    return (
        totals_l.crossJoin(F.broadcast(totals_r))
        .crossJoin(F.broadcast(stats))
        .select("n_left", "n_right", "n_matching_keys", "n_out", "max_key_out")
    )


def validate_rules(df: DataFrame, rules: dict[str, str]) -> DataFrame:
    """Declarative row-level data-quality rules: ``rules`` maps a rule
    name to a BOOLEAN SQL expression that must hold; output one row per
    rule — (rule, n_rows, n_violations, violation_frac) — where a NULL
    predicate result counts as a violation (unknown is not a pass).

    All rules evaluate in ONE scan (a single aggregate of conditional
    counts — no per-rule jobs); the expressions are Catalyst-compiled,
    so pushable work stays in codegen."""
    if not rules:
        raise ValueError("rules must be non-empty")
    names = list(rules)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, name in enumerate(names):
        ok = F.expr(rules[name])
        aggs.append(
            F.sum(F.when(ok.isNull() | ~ok, 1).otherwise(0)).alias(f"__v{i}")
        )
    row = df.agg(*aggs)
    stack_args = []
    for i, name in enumerate(names):
        stack_args += [f"'{name}'", f"__v{i}"]
    return (
        row.selectExpr(
            "__n", f"stack({len(names)}, {', '.join(stack_args)}) AS (rule, __v)"
        )
        .select(
            "rule",
            F.col("__n").alias("n_rows"),
            F.col("__v").alias("n_violations"),
            F.round(F.col("__v").cast("double") / F.col("__n"), 6).alias(
                "violation_frac"
            ),
        )
    )
