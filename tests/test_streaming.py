"""Structured Streaming tests: file-source micro-batches through windowed
aggregation, dedup, session windows and the custom stateful operator,
validated against batch recomputation."""

import shutil
import tempfile
import time

import pytest
from pyspark.sql import functions as F

from codd_spark.streaming.structured import (
    running_user_totals,
    run_to_memory,
    session_windows,
    stream_from_directory,
    streaming_dedup,
    windowed_counts,
)

SCHEMA = "event_id LONG, ts TIMESTAMP, user_id LONG, value DOUBLE"


def _write_batch(spark, path, rows, n):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)


def _drain(query, timeout=60):
    query.processAllAvailable()
    query.stop()
    query.awaitTermination(timeout)


@pytest.fixture()
def events_dir(spark):
    d = tempfile.mkdtemp(prefix="codd_stream_")
    rows1 = [
        (1, "2024-01-01 10:00:05", 1, 1.5),
        (2, "2024-01-01 10:00:30", 1, 2.0),
        (3, "2024-01-01 10:01:10", 2, 3.0),
    ]
    rows2 = [
        (4, "2024-01-01 10:01:40", 1, 0.5),
        (5, "2024-01-01 10:02:05", 2, 1.0),
        (2, "2024-01-01 10:00:30", 1, 2.0),  # duplicate event
    ]
    to_rows = lambda rs: [(i, __import__("datetime").datetime.fromisoformat(t), u, v) for i, t, u, v in rs]
    _write_batch(spark, d, to_rows(rows1), 1)
    _write_batch(spark, d, to_rows(rows2), 2)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_windowed_counts_matches_batch(spark, events_dir):
    sdf = stream_from_directory(spark, events_dir, SCHEMA)
    q = run_to_memory(
        windowed_counts(sdf, "ts", "1 minute", watermark="10 minutes"),
        "win_counts", output_mode="update",
    )
    _drain(q)
    got = {
        (r.window.start.isoformat(), r.cnt)
        for r in spark.table("win_counts")
        .groupBy("window").agg(F.max("cnt").alias("cnt")).collect()
    }
    batch = spark.read.schema(SCHEMA).parquet(events_dir)
    want = {
        (r.window.start.isoformat(), r.cnt)
        for r in batch.groupBy(F.window("ts", "1 minute").alias("window"))
        .agg(F.count("*").alias("cnt")).collect()
    }
    assert got == want


def test_streaming_dedup(spark, events_dir):
    sdf = stream_from_directory(spark, events_dir, SCHEMA)
    q = run_to_memory(
        streaming_dedup(sdf, ["event_id"], ts_col="ts"), "dedup_out", output_mode="append"
    )
    _drain(q)
    ids = [r.event_id for r in spark.table("dedup_out").collect()]
    assert sorted(ids) == [1, 2, 3, 4, 5]  # duplicate event 2 dropped


def test_session_windows(spark, events_dir):
    sdf = stream_from_directory(spark, events_dir, SCHEMA)
    # session-window aggregations only support append/complete output
    q = run_to_memory(
        session_windows(sdf, "ts", gap="45 seconds", keys=["user_id"]),
        "sessions", output_mode="complete",
    )
    _drain(q)
    rows = spark.table("sessions").collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, 0)
        by_user[r.user_id] = max(by_user[r.user_id], r.cnt)
    # user 1: events at 10:00:05, 10:00:30, 10:00:30(dup) merge into one
    # 3-event session (25s gaps); 10:01:40 is a separate 1-event session
    assert by_user[1] == 3
    # user 2: 10:01:10 and 10:02:05 are 55s apart -> separate sessions
    assert by_user[2] == 1


def test_streaming_view_of_algebra_expression(spark, events_dir):
    from codd_spark import Relation, UnsupportedExpressionError
    from codd_spark.streaming.view_stream import streaming_view
    import pytest as _pytest

    sdf = stream_from_directory(spark, events_dir, SCHEMA)
    expr = (
        Relation("events")
        .select("value >= 1.0")
        .project("event_id", "user_id", "value * 2 AS v2")
    )
    q = run_to_memory(streaming_view(expr, {"events": sdf}), "view_stream", "append")
    _drain(q)
    got = sorted(tuple(r) for r in spark.table("view_stream").collect())
    batch = spark.read.schema(SCHEMA).parquet(events_dir)
    want = sorted(
        tuple(r)
        for r in batch.filter("value >= 1.0")
        .selectExpr("event_id", "user_id", "value * 2 AS v2")
        .collect()
    )
    assert got == want

    # non-monotone/stateful shapes are rejected up front
    with _pytest.raises(UnsupportedExpressionError):
        streaming_view(
            Relation("events").difference(Relation("events")), {"events": sdf}
        )


def test_stream_stream_join(spark, events_dir):
    from codd_spark.streaming.structured import stream_stream_join

    sdf = stream_from_directory(spark, events_dir, SCHEMA)
    clicks = sdf.filter("value >= 2.0").select(
        F.col("event_id").alias("l_id"), F.col("ts").alias("l_ts"), "user_id"
    )
    others = sdf.filter("value < 2.0").select(
        F.col("event_id").alias("r_id"), F.col("ts").alias("r_ts"), "user_id"
    )
    joined = stream_stream_join(
        clicks, others, on="user_id", left_ts="l_ts", right_ts="r_ts",
        max_delay="2 minutes", watermark="10 minutes",
    )
    q = run_to_memory(joined.select("user_id", "l_id", "r_id"), "ssj", "append")
    _drain(q)
    got = sorted((r.user_id, r.l_id, r.r_id) for r in spark.table("ssj").collect())

    batch = spark.read.schema(SCHEMA).parquet(events_dir)
    bl = batch.filter("value >= 2.0").select(
        F.col("event_id").alias("l_id"), F.col("ts").alias("l_ts"), "user_id"
    )
    br = batch.filter("value < 2.0").select(
        F.col("event_id").alias("r_id"), F.col("ts").alias("r_ts"), "user_id"
    )
    want = sorted(
        (r.user_id, r.l_id, r.r_id)
        for r in bl.join(
            br,
            (bl.user_id == br.user_id)
            & (br.r_ts >= bl.l_ts - F.expr("INTERVAL 2 minutes"))
            & (br.r_ts <= bl.l_ts),
        ).select(bl.user_id, "l_id", "r_id").collect()
    )
    assert got == want and len(got) > 0


def test_running_user_totals_stateful(spark, events_dir):
    sdf = stream_from_directory(spark, events_dir, SCHEMA)
    q = run_to_memory(running_user_totals(sdf), "running", output_mode="update")
    _drain(q)
    rows = spark.table("running").collect()
    # last emitted state per user must equal the batch totals
    last = {}
    for r in rows:
        last[r.user_id] = (r.n_events, r.total_value)
    # user 1: events 1,2,4 + duplicate of 2 -> 4 events, 1.5+2.0+0.5+2.0 = 6.0
    assert last[1] == (4, "6.000000")
    # user 2: events 3,5 -> 4.0
    assert last[2] == (2, "4.000000")
