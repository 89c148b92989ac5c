"""Sources/sinks tests: partitioned writes and partition pruning — at
100 TB the partition layout IS the index; a filtered read must only touch
matching partition directories."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from codd_spark.sources.readers import read_csv, read_table
from codd_spark.sources.sinks import write_csv, write_parquet


def test_partitioned_write_and_pruning(spark):
    d = tempfile.mkdtemp(prefix="codd_part_")
    try:
        events = read_table(spark, "/root/testdata/sf0.001", "events")
        write_parquet(events, d, partition_by=["event_type"])

        back = spark.read.parquet(d)
        filtered = back.filter("event_type = 'click'")
        plan = filtered._jdf.queryExecution().executedPlan().toString()
        # the filter must land in PartitionFilters (directory pruning),
        # not in PushedFilters (row-group filtering)
        assert "PartitionFilters: [isnotnull(event_type" in plan
        want = events.filter("event_type = 'click'").count()
        assert filtered.count() == want
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_csv_roundtrip(spark):
    d = tempfile.mkdtemp(prefix="codd_csv_")
    try:
        nation = read_table(spark, "/root/testdata/sf0.001", "nation")
        write_csv(nation, d)
        back = read_csv(spark, d)
        assert sorted(tuple(r) for r in back.collect()) == sorted(
            tuple(r) for r in nation.collect()
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_max_records_per_file(spark):
    import glob

    d = tempfile.mkdtemp(prefix="codd_split_")
    try:
        nation = read_table(spark, "/root/testdata/sf0.001", "nation")
        write_parquet(nation.coalesce(1), d, max_records_per_file=10)
        files = glob.glob(f"{d}/*.parquet")
        assert len(files) >= 3  # 25 rows / 10 per file
    finally:
        shutil.rmtree(d, ignore_errors=True)
