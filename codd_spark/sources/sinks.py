"""Sinks. Parquet is the default interchange format; partitioning knobs are
exposed because at 100 TB the layout (partition columns + target file size)
decides downstream scan cost."""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = None,
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: list[str],
    n_buckets: int = 32,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table.

    Two tables bucketed by the same key with the same bucket count join
    WITHOUT a shuffle (and without even a sort, if sorted) — this is how
    repeated large-fact joins amortize their shuffle at 100 TB: pay the
    clustering once at write time, join shuffle-free forever after.
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(table)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", **options) -> None:
    df.write.mode(mode).options(header="true", **options).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_by: list[str],
    mode: str = "overwrite",
    n_files: int | None = None,
    max_records_per_file: int | None = None,
) -> None:
    """Linear-clustered parquet layout: range-repartition on the cluster
    columns, sort within each partition, write.

    At 100 TB the parquet row-group min/max statistics ARE the index: a
    filter on a cluster column prunes whole row groups (and whole files,
    via footer stats) only if values are physically clustered. Unsorted
    data has every row group spanning ~the full value range, so stats
    prune nothing. Linear clustering is optimal for one leading column;
    for multi-column box queries use ``write_zordered``.
    """
    n = n_files or df.sparkSession.sparkContext.defaultParallelism
    from pyspark.sql import functions as F

    out = df.repartitionByRange(n, *[F.col(c) for c in cluster_by]).sortWithinPartitions(
        *cluster_by
    )
    write_parquet(out, path, mode=mode, max_records_per_file=max_records_per_file)


def zorder_value(df: DataFrame, cols: list[str], bits: int = 16, method: str = "minmax"):
    """Z-order (Morton) key as a pure Column expression: each column is
    normalized to ``2^bits`` integer levels, then the bit strings are
    interleaved. Returns (df_with_level_cols, zcol expression).

    ``method="minmax"`` (default, the scale path): one aggregate computes
    each column's (min, max); levels come from ``width_bucket`` — a pure
    expression over two constants, no shuffle, no global sort.
    ``method="rank"`` uses a global ``ntile`` window — exact equi-depth
    levels even under heavy skew, but a global window is a single-task
    sort: use only on bounded data or pre-sampled boundaries.

    Interleaving is a fold over bit positions — a closed-form expression,
    JVM-side, no UDF: bit b of column j lands at position b·n_cols + j.
    """
    from pyspark.sql import Window, functions as F

    n_levels = 1 << bits
    ranked = df
    rank_cols = []
    if method == "minmax":
        stats = df.agg(
            *[F.min(c).alias(f"_lo{j}") for j, c in enumerate(cols)],
            *[F.max(c).alias(f"_hi{j}") for j, c in enumerate(cols)],
        ).collect()[0]
        for j, c in enumerate(cols):
            rc = f"__zr{j}"
            if stats[f"_lo{j}"] is None or stats[f"_hi{j}"] is None:
                raise ValueError(
                    f"zorder: column {c!r} has no non-null values "
                    "(empty input or all-NULL column) — cannot rank"
                )
            lo, hi = float(stats[f"_lo{j}"]), float(stats[f"_hi{j}"])
            if hi == lo:
                level = F.lit(0).cast("long")
            else:
                # width_bucket returns 1..n+1 over [lo, hi]; clamp to 0..n-1
                level = (
                    F.least(
                        F.width_bucket(
                            F.col(c).cast("double"), F.lit(lo), F.lit(hi), F.lit(n_levels)
                        ),
                        F.lit(n_levels),
                    )
                    - 1
                ).cast("long")
            ranked = ranked.withColumn(rc, level)
            rank_cols.append(rc)
    elif method == "rank":
        for j, c in enumerate(cols):
            rc = f"__zr{j}"
            ranked = ranked.withColumn(
                rc, (F.ntile(n_levels).over(Window.orderBy(F.col(c))) - 1).cast("long")
            )
            rank_cols.append(rc)
    else:
        raise ValueError(f"unknown method {method!r} (use 'minmax' or 'rank')")
    z = F.lit(0).cast("long")
    for b in range(bits):
        for j, rc in enumerate(rank_cols):
            bit = F.shiftright(F.col(rc), b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * len(cols) + j))
    return ranked, z.alias("__z")


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_by: list[str],
    mode: str = "overwrite",
    n_files: int | None = None,
    bits: int = 16,
    max_records_per_file: int | None = None,
) -> None:
    """Z-order-clustered parquet layout for multi-column box queries.

    Linear clustering makes row-group stats selective for ONE column;
    Z-ordering interleaves the bit representations of several columns so
    rows close in the multi-dimensional value space are close in the
    file order — a filter box on ANY subset of the z columns then prunes
    most row groups. This is the layout move behind Delta/Iceberg
    OPTIMIZE ZORDER, reproduced here as plain repartitionByRange + sort
    on a Morton-key expression (no table format needed).

    Pricing: one stats aggregate + one range shuffle + per-partition
    sort — the same cost class as any clustered write; this is how
    OPTIMIZE ZORDER is priced in the systems that ship it.
    """
    from pyspark.sql import functions as F

    n = n_files or df.sparkSession.sparkContext.defaultParallelism
    ranked, z = zorder_value(df, zorder_by, bits=bits)
    out = (
        ranked.withColumn("__z", z)
        .repartitionByRange(n, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z", *[f"__zr{j}" for j in range(len(zorder_by))])
    )
    write_parquet(out, path, mode=mode, max_records_per_file=max_records_per_file)


def compact_dataset(
    spark,
    path: str,
    *,
    target_rows_per_file: int,
    partition_by: list[str] | None = None,
) -> dict:
    """Small-files compaction: rewrite a parquet dataset so every file
    holds ~``target_rows_per_file`` rows — the operational fix for the
    100-TB killer where streaming/incremental writers leave thousands of
    KB-sized files and every downstream scan pays per-file open cost +
    a task per file.

    Safe rewrite discipline: the compacted copy is written NEXT TO the
    source (``<path>.__compact__``), row counts are verified EQUAL, and
    only then is the original swapped out (rename, original moved to
    ``<path>.__old__`` for the caller to delete). A failure of the
    second rename rolls the original back into place; a hard crash
    inside the rename window leaves the complete original at
    ``<path>.__old__`` (restore by renaming it back) — never a partial
    dataset at either name. With ``partition_by`` the layout keeps (or
    introduces) hive-style partition directories, sized per partition by
    an explicit repartition on the partition columns.

    Constraints (by design, documented per ADVICE): the swap uses
    POSIX ``os.rename``, so ``path`` must be a LOCAL filesystem
    directory and tmp/old must land on the same filesystem (cross-device
    rename raises and the rollback restores the original). There is a
    brief window during the swap when no dataset exists at ``path`` —
    do not run concurrent readers against a dataset being compacted; on
    an object store / HDFS, route the swap through the Hadoop FileSystem
    API or use a manifest-pointer layout (see streaming/store.py for the
    manifest-based variant this engine uses for its own state).

    Returns {"files_before", "files_after", "rows"}."""
    import glob
    import os
    import shutil

    df = spark.read.parquet(path)
    rows = df.count()

    def count_files(p):
        return sum(
            1
            for f in glob.glob(os.path.join(p, "**", "*"), recursive=True)
            if os.path.isfile(f) and f.endswith(".parquet")
        )

    files_before = count_files(path)
    n_files = max(1, -(-rows // target_rows_per_file))  # ceil
    tmp = path.rstrip("/") + ".__compact__"
    writer_df = (
        df.repartition(n_files)
        if not partition_by
        else df.repartition(*partition_by)
    )
    w = writer_df.write.mode("overwrite").option(
        "maxRecordsPerFile", str(target_rows_per_file)
    )
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(tmp)

    new_rows = spark.read.parquet(tmp).count()
    if new_rows != rows:
        shutil.rmtree(tmp, ignore_errors=True)
        raise RuntimeError(
            f"compaction row mismatch: {rows} -> {new_rows}; original untouched"
        )
    old = path.rstrip("/") + ".__old__"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(path, old)
    try:
        os.rename(tmp, path)
    except OSError:
        os.rename(old, path)  # roll back: the original is intact
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    files_after = count_files(path)
    return {"files_before": files_before, "files_after": files_after, "rows": rows}
