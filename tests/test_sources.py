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


def test_orc_roundtrip_with_pushdown(spark):
    from codd_spark.sources.readers import read_orc
    from codd_spark.sources.sinks import write_orc

    d = tempfile.mkdtemp()
    try:
        df = read_table(spark, "/root/testdata/sf0.001", "nation")
        write_orc(df, f"{d}/nation.orc")
        back = read_orc(spark, f"{d}/nation.orc").filter("n_nationkey < 5")
        assert back.count() == df.filter("n_nationkey < 5").count()
        plan = back._jdf.queryExecution().executedPlan().toString()
        assert "orc" in plan.lower() and "n_nationkey" in plan
    finally:
        shutil.rmtree(d)


def test_text_reader_line_and_wholefile(spark):
    from codd_spark.sources.readers import read_text

    d = tempfile.mkdtemp()
    try:
        with open(f"{d}/a.txt", "w") as f:
            f.write("first line\nsecond line\n")
        with open(f"{d}/b.txt", "w") as f:
            f.write("solo doc\n")
        lines = read_text(spark, d)
        assert lines.count() == 3
        docs = read_text(spark, d, whole_file=True).withColumn(
            "fname", F.element_at(F.split(F.input_file_name(), "/"), -1)
        )
        rows = {r["fname"]: r["value"] for r in docs.collect()}
        assert rows["a.txt"].startswith("first line\nsecond")
        assert rows["b.txt"].rstrip("\n") == "solo doc"
    finally:
        shutil.rmtree(d)


def test_events_ts_dtype_matrix(spark):
    """read_table must normalize events.ts to a session-zoned TIMESTAMP for
    every physical shape the testdata generator has produced: nanos
    (timestamp[ns] -> legacy bigint read), tz-naive micros (Spark 4 reads
    as TIMESTAMP_NTZ), and tz-aware micros (already TIMESTAMP). Epoch
    values must be identical across all three so a testdata regeneration
    can never silently flip query results."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    micros = [1_700_000_000_000_000, 1_700_000_123_456_789]
    ids = [1, 2]
    flavors = {
        "ns": pa.array([m * 1000 for m in micros], type=pa.timestamp("ns")),
        "ntz": pa.array(micros, type=pa.timestamp("us")),
        "utc": pa.array(micros, type=pa.timestamp("us", tz="UTC")),
    }
    got = {}
    for flavor, ts_arr in flavors.items():
        d = tempfile.mkdtemp(prefix=f"codd_ts_{flavor}_")
        try:
            tbl = pa.table({"event_id": pa.array(ids, type=pa.int64()), "ts": ts_arr})
            os.mkdir(f"{d}/events.parquet")
            pq.write_table(tbl, f"{d}/events.parquet/part-0.parquet")
            df = read_table(spark, d, "events")
            assert dict(df.dtypes)["ts"] == "timestamp", (
                f"{flavor}: expected TIMESTAMP, got {dict(df.dtypes)['ts']}"
            )
            got[flavor] = {
                r["event_id"]: r["us"]
                for r in df.select(
                    "event_id", F.unix_micros("ts").alias("us")
                ).collect()
            }
        finally:
            shutil.rmtree(d, ignore_errors=True)
    assert got["ns"] == got["ntz"] == got["utc"] == dict(zip(ids, micros))
