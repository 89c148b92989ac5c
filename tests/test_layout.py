"""Data-layout writer tests: clustered and Z-ordered parquet.

At 100 TB the physical layout decides scan cost: row-group min/max
statistics only prune when values are clustered. These tests check the
layout property itself (footer statistics via pyarrow), not timing — a
deterministic signal that survives any hardware.
"""

import glob
import shutil
import tempfile

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from codd_spark.sources.sinks import write_clustered, write_parquet, write_zordered, zorder_value


def _row_group_ranges(path_glob: str, col: str):
    """[(min, max)] over every row group of every file under the path."""
    out = []
    for f in glob.glob(path_glob):
        meta = pq.ParquetFile(f).metadata
        for rg in range(meta.num_row_groups):
            for ci in range(meta.num_columns):
                c = meta.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    out.append((c.statistics.min, c.statistics.max))
    return out


def test_write_clustered_narrows_row_group_ranges(spark):
    df = spark.range(0, 20000).select(
        (F.col("id") * 7919 % 20000).alias("k"),  # arrive unclustered
        F.col("id").alias("payload"),
    )
    d = tempfile.mkdtemp(prefix="codd_cluster_")
    try:
        write_parquet(df.repartition(8), f"{d}/plain", max_records_per_file=2500)
        write_clustered(df, f"{d}/clustered", ["k"], n_files=8,
                        max_records_per_file=2500)

        def span(ranges):
            return sum(hi - lo for lo, hi in ranges) / len(ranges)

        plain = _row_group_ranges(f"{d}/plain/*.parquet", "k")
        clus = _row_group_ranges(f"{d}/clustered/*.parquet", "k")
        # unclustered row groups each span ~the whole domain; clustered
        # ones must be at least 4x narrower on average
        assert span(clus) < span(plain) / 4

        # a point filter must touch (i.e. intersect) almost every plain
        # row group but only a couple of clustered ones
        probe = 12345
        hits = lambda rs: sum(1 for lo, hi in rs if lo <= probe <= hi)
        assert hits(plain) >= len(plain) * 0.8
        assert hits(clus) <= max(2, len(clus) // 4)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_zorder_value_morton_interleave(spark):
    """Closed-form check: with bits=2 and two columns whose values are
    already the integers 0..3, the z key is the textbook Morton code."""
    df = spark.createDataFrame(
        [(x, y) for x in range(4) for y in range(4)], "x LONG, y LONG"
    )
    ranked, z = zorder_value(df, ["x", "y"], bits=2)
    got = {(r.x, r.y): r.z for r in ranked.withColumn("z", z).collect()}

    def morton(x, y):
        out = 0
        for b in range(2):
            out |= ((x >> b) & 1) << (2 * b)
            out |= ((y >> b) & 1) << (2 * b + 1)
        return out

    # minmax leveling maps 0..3 onto the 4 buckets in order, so codes
    # must match the exact Morton interleave
    assert got == {(x, y): morton(x, y) for x in range(4) for y in range(4)}
    # an all-NULL column gives a clear error, not TypeError on float(None)
    import pytest

    nulls = spark.createDataFrame([(1, None), (2, None)], "x LONG, y LONG")
    with pytest.raises(ValueError, match="no non-null values"):
        zorder_value(nulls, ["x", "y"], bits=2)


def test_write_zordered_prunes_box_queries(spark):
    """On a 2-d grid, a Z-ordered layout must make BOTH dimensions
    selective at the row-group level; a linear layout on x leaves y
    filters unprunable."""
    n = 128
    df = spark.createDataFrame(
        [(x, y, x * n + y) for x in range(n) for y in range(n)],
        "x LONG, y LONG, v LONG",
    )
    d = tempfile.mkdtemp(prefix="codd_zorder_")
    try:
        write_clustered(df, f"{d}/linear", ["x"], n_files=4,
                        max_records_per_file=1024)
        write_zordered(df, f"{d}/zorder", ["x", "y"], n_files=4, bits=7,
                       max_records_per_file=1024)

        def intersecting(path, col, lo_q, hi_q):
            rs = _row_group_ranges(f"{path}/*.parquet", col)
            return sum(1 for lo, hi in rs if not (hi < lo_q or lo > hi_q)), len(rs)

        # y-filter: linear-on-x layout can't prune y at all
        lin_hit, lin_total = intersecting(f"{d}/linear", "y", 10, 20)
        z_hit, z_total = intersecting(f"{d}/zorder", "y", 10, 20)
        assert lin_hit == lin_total
        assert z_hit / z_total <= 0.5

        # x-filter: z layout stays selective on x too
        zx_hit, zx_total = intersecting(f"{d}/zorder", "x", 10, 20)
        assert zx_hit / zx_total <= 0.5

        # correctness: both layouts return identical box-query results
        a = spark.read.parquet(f"{d}/linear").filter("x BETWEEN 10 AND 20 AND y BETWEEN 10 AND 20")
        b = spark.read.parquet(f"{d}/zorder").filter("x BETWEEN 10 AND 20 AND y BETWEEN 10 AND 20")
        assert sorted(r.v for r in a.collect()) == sorted(r.v for r in b.collect())
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_compact_dataset_small_files(spark, tmp_path):
    import os

    from codd_spark.sources.sinks import compact_dataset

    path = str(tmp_path / "frag")
    # simulate an incremental writer: 40 tiny appends
    for i in range(40):
        spark.range(i * 25, (i + 1) * 25).selectExpr(
            "id", "id % 7 AS k", "CAST(id AS DOUBLE) AS v"
        ).coalesce(1).write.mode("append").parquet(path)
    before = spark.read.parquet(path)
    want = sorted((r.id, r.k, r.v) for r in before.collect())

    stats = compact_dataset(spark, path, target_rows_per_file=500)
    assert stats["rows"] == 1000
    assert stats["files_before"] >= 40
    assert stats["files_after"] <= 3
    after = spark.read.parquet(path)
    assert sorted((r.id, r.k, r.v) for r in after.collect()) == want
    assert os.path.isdir(path + ".__old__")  # original preserved for deletion


def test_compact_dataset_partitioned(spark, tmp_path):
    from codd_spark.sources.sinks import compact_dataset

    path = str(tmp_path / "part")
    for i in range(10):
        spark.range(i * 100, (i + 1) * 100).selectExpr(
            "id", "id % 3 AS k"
        ).coalesce(1).write.mode("append").parquet(path)
    want = sorted((r.id, r.k) for r in spark.read.parquet(path).collect())
    stats = compact_dataset(spark, path, target_rows_per_file=400, partition_by=["k"])
    assert stats["rows"] == 1000
    after = spark.read.parquet(path)
    assert sorted((r.id, int(r.k)) for r in after.collect()) == want
    import glob
    # hive layout present
    assert glob.glob(path + "/k=*")
