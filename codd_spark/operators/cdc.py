"""Change-data-capture operators: key-based upsert merge and slowly-
changing-dimension (type 2) history construction.

Training-data pipelines are fed by snapshots + change streams: document
re-crawls supersede earlier versions, label fixes overwrite rows, and
dimension attributes (source quality tier, license status) change over
time and must be joinable AS OF a training cutoff. The reference engine
covers the static-relation algebra; these operators add the mutation
side as plain dataflow — no storage-format magic, so they run on any
DataFrame source (the Delta/Iceberg MERGE INTO shape, expressed as
joins Catalyst can plan).

Scale shape: ``merge_upsert`` is one left-anti join on the key (the
only shuffle; both sides grow, so the join is pinned shuffle) plus a
union — never a full outer join, never a row-wise UDF. ``scd2_history``
is two windows over the same (key, order) partitioning, which AQE plans
as a single exchange; collapse-then-interval is the gaps-and-islands
discipline, corpus-linear.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    key_cols: list[str],
    *,
    delete_col: str | None = None,
) -> DataFrame:
    """MERGE semantics on plain DataFrames: source rows replace matching
    target rows (matched-update), non-matching source rows append
    (not-matched-insert), and — when ``delete_col`` names a boolean
    column in ``source`` — flagged keys are removed instead.

    Both inputs must share the target schema (``delete_col`` aside).
    Equivalent to Delta's ``MERGE INTO t USING s ON keys WHEN MATCHED
    UPDATE * WHEN NOT MATCHED INSERT *``, as one anti join + union.
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    missing = [c for c in key_cols if c not in source.columns or c not in target.columns]
    if missing:
        raise ValueError(f"key columns missing from target/source: {missing}")

    if delete_col is not None:
        deletes = source.filter(F.col(delete_col)).select(*key_cols)
        source = source.filter(
            ~F.coalesce(F.col(delete_col), F.lit(False))
        ).drop(delete_col)
    else:
        deletes = None

    # target rows whose key does not appear in the source survive
    # unchanged; every surviving source row wins its key outright
    keep = target.join(
        source.select(*key_cols).hint("shuffle_merge"), on=key_cols, how="left_anti"
    )
    merged = keep.unionByName(source.select(*target.columns))
    if deletes is not None:
        merged = merged.join(
            deletes.hint("shuffle_merge"), on=key_cols, how="left_anti"
        )
    return merged


def scd2_history(
    changes: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
    ts_col: str,
    *,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Change stream -> type-2 dimension history: one row per distinct
    attribute STATE per key, with ``valid_from`` / ``valid_to`` /
    ``version`` / ``is_current``.

    Consecutive rows whose tracked attributes did not change are
    collapsed (re-crawls that found nothing new do not open a new
    version); ``valid_to`` is the next version's ``valid_from`` (NULL on
    the open, current version). Rows are ordered per key by
    (``ts_col``, *tiebreak_cols*) — pass a unique tiebreak (an event id)
    when timestamps can collide, so the history is deterministic.
    """
    if not key_cols or not attr_cols:
        raise ValueError("key_cols and attr_cols must be non-empty")
    order = [F.col(ts_col)] + [F.col(c) for c in (tiebreak_cols or [])]
    w = Window.partitionBy(*key_cols).orderBy(*order)

    # a row opens a new version when its tracked-attribute struct differs
    # from the previous row's; eqNullSafe keeps NULL attribute values
    # comparable, and lag(first row) = NULL struct compares not-equal, so
    # the first observation always opens version 1
    state = F.struct(*[F.col(c) for c in attr_cols])
    changed = ~F.lag(state).over(w).eqNullSafe(state)

    versions = changes.withColumn("__chg", changed).filter(F.col("__chg"))
    w2 = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        versions.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead("valid_from").over(w2))
        .withColumn("version", F.row_number().over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
        .select(
            *key_cols, *attr_cols, "valid_from", "valid_to", "version", "is_current"
        )
    )


def snapshot_at(history: DataFrame, at, ts_cols=("valid_from", "valid_to")):
    """Reconstruct the dimension AS OF a point in time from a type-2
    history: rows whose interval covers ``at`` (``valid_from <= at <
    valid_to``, open current versions included). The training-cutoff
    join: build features against the dimension exactly as it stood at
    the cutoff, no leakage from later attribute changes.

    A pure filter — partition-prunable when the history is written
    partitioned/clustered by ``valid_from``, so the scan narrows with
    the cutoff instead of reading the full history.
    """
    lo, hi = ts_cols
    at = F.lit(at)
    return history.filter(
        (F.col(lo) <= at) & (F.col(hi).isNull() | (F.col(hi) > at))
    ).drop("is_current")


def dataset_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    *,
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Snapshot diff between two versions of a keyed dataset: one row per
    key present in either side, with ``status`` in {'added', 'removed',
    'changed', 'unchanged'} — the run-over-run regression probe a
    pipeline runs before promoting an output (a rewrite that silently
    drops or mutates rows is caught here, not in production).

    ``compare_cols`` defaults to all shared non-key columns. Comparison
    is null-safe per column (NULL == NULL holds). One full-outer
    shuffle join on the key — both sides grow with the data, so the
    join is pinned to a shuffle strategy."""
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in set(key_cols)]
    o = old.select(
        *key_cols,
        F.lit(True).alias("__in_old"),
        F.struct(*[F.col(c) for c in compare_cols]).alias("__ov"),
    )
    nw = new.select(
        *key_cols,
        F.lit(True).alias("__in_new"),
        F.struct(*[F.col(c) for c in compare_cols]).alias("__nv"),
    )
    joined = o.hint("shuffle_merge").join(nw, key_cols, "full_outer")
    status = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(F.col("__ov").eqNullSafe(F.col("__nv")), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(*key_cols, status.alias("status"))
