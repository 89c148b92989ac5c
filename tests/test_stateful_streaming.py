"""Chunked-replay equivalence for the custom stateful streaming operators:
feeding the same events through N micro-batches must reproduce the batch
operator's output for every CLOSED unit (trailing open bucket / current
version stays in state — see streaming/stateful.py emission discipline)."""

import datetime
import random
import shutil
import tempfile

import pytest

from codd_spark.operators.cdc import scd2_history
from codd_spark.operators.timeseries import resample
from codd_spark.streaming.stateful import streaming_resample, streaming_scd2
from codd_spark.streaming.structured import run_to_memory, stream_from_directory

TS_SCHEMA = "event_id LONG, ts TIMESTAMP_NTZ, user_id LONG, value DOUBLE"
CDC_SCHEMA = "change_id LONG, ts TIMESTAMP_NTZ, cust_id LONG, segment STRING, tier STRING"


def _drain(query, timeout=60):
    query.processAllAvailable()
    query.stop()
    query.awaitTermination(timeout)


def _stream_chunks(spark, rows, schema, n_chunks):
    """Write chronologically-ordered rows into n_chunks parquet files (per-key
    order preserved: the split points are global-time cuts)."""
    d = tempfile.mkdtemp(prefix="codd_stateful_")
    rows = sorted(rows, key=lambda r: r[1])
    size = (len(rows) + n_chunks - 1) // n_chunks
    for i in range(n_chunks):
        chunk = rows[i * size : (i + 1) * size]
        if chunk:
            spark.createDataFrame(chunk, schema).coalesce(1).write.mode(
                "append"
            ).parquet(d)
    return d


@pytest.fixture()
def ts_events():
    rng = random.Random(13)
    base = datetime.datetime(2024, 3, 1, 0, 0, 0)
    rows, eid = [], 0
    for user in (1, 2, 3):
        t = base
        for _ in range(40):
            # irregular gaps 10min..7h so hourly buckets both repeat and skip
            t = t + datetime.timedelta(minutes=rng.randint(10, 420))
            rows.append((eid, t, user, round(rng.uniform(0, 100), 3)))
            eid += 1
    return rows


def test_streaming_resample_matches_batch(spark, ts_events):
    d = _stream_chunks(spark, ts_events, TS_SCHEMA, n_chunks=4)
    try:
        sdf = stream_from_directory(spark, d, TS_SCHEMA)
        q = run_to_memory(
            streaming_resample(sdf, "ts", "value", key_col="user_id", unit="hour"),
            "resampled_stream",
            output_mode="append",
        )
        _drain(q)
        got = {
            (r.user_id, r.bucket, r.n_events, r.value, r.is_gap)
            for r in spark.table("resampled_stream").collect()
        }

        batch_df = resample(
            spark.createDataFrame(ts_events, TS_SCHEMA),
            "ts",
            "value",
            key_col="user_id",
            unit="hour",
        )
        batch = sorted(
            ((r.user_id, r.bucket, r.n_events, float(r.value), r.is_gap) for r in batch_df.collect()),
        )
        # streaming never emits each key's trailing (still-open) bucket
        last_bucket = {}
        for u, b, *_ in batch:
            last_bucket[u] = max(last_bucket.get(u, b), b)
        want = {row for row in batch if row[1] != last_bucket[row[0]]}
        assert got == want
        assert any(r[4] for r in got)  # regime includes forward-filled gaps
    finally:
        shutil.rmtree(d, ignore_errors=True)


@pytest.fixture()
def cdc_changes():
    rng = random.Random(29)
    segments = ["consumer", "smb", "enterprise"]
    tiers = ["bronze", "silver", "gold"]
    base = datetime.datetime(2024, 3, 1)
    rows, cid = [], 0
    for cust in (10, 11, 12):
        t = base
        seg, tier = rng.choice(segments), rng.choice(tiers)
        for _ in range(15):
            t = t + datetime.timedelta(hours=rng.randint(1, 48))
            roll = rng.random()
            if roll < 0.4:
                seg = rng.choice(segments)
            elif roll < 0.6:
                tier = rng.choice(tiers)
            # else: re-crawl with unchanged attributes (must collapse)
            rows.append((cid, t, cust, seg, tier))
            cid += 1
    return rows


def test_streaming_scd2_matches_batch_closed_versions(spark, cdc_changes):
    d = _stream_chunks(spark, cdc_changes, CDC_SCHEMA, n_chunks=3)
    try:
        sdf = stream_from_directory(spark, d, CDC_SCHEMA)
        q = run_to_memory(
            streaming_scd2(
                sdf, "cust_id", ["segment", "tier"], "ts", tiebreak_cols=["change_id"]
            ),
            "scd2_stream",
            output_mode="append",
        )
        _drain(q)
        got = {
            (r.cust_id, r.segment, r.tier, r.valid_from, r.valid_to, r.version)
            for r in spark.table("scd2_stream").collect()
        }

        hist = scd2_history(
            spark.createDataFrame(cdc_changes, CDC_SCHEMA),
            ["cust_id"],
            ["segment", "tier"],
            "ts",
            tiebreak_cols=["change_id"],
        )
        want = {
            (r.cust_id, r.segment, r.tier, r.valid_from, r.valid_to, r.version)
            for r in hist.filter("valid_to IS NOT NULL").collect()
        }
        assert got == want
        assert len(got) >= 10
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_resample_rejects_bad_unit(spark):
    sdf = spark.readStream.schema(TS_SCHEMA).parquet(tempfile.mkdtemp())
    with pytest.raises(ValueError, match="unit"):
        streaming_resample(sdf, "ts", "value", key_col="user_id", unit="month")


def test_streaming_drift_matches_batch(spark, ts_events):
    from codd_spark.operators.profile import drift_series
    from codd_spark.streaming.stateful import streaming_drift

    d = _stream_chunks(spark, ts_events, TS_SCHEMA, n_chunks=4)
    try:
        sdf = stream_from_directory(spark, d, TS_SCHEMA)
        q = run_to_memory(
            streaming_drift(sdf, "ts", "value", key_col="user_id", unit="day"),
            "drift_stream",
            output_mode="append",
        )
        _drain(q)
        got = {
            (r.user_id, r.bucket_epoch, r.n_prev, r.n_cur, r.ks)
            for r in spark.table("drift_stream").collect()
        }

        batch = [
            (r.user_id, r.bucket_epoch, r.n_prev, r.n_cur, r.ks)
            for r in drift_series(
                spark.createDataFrame(ts_events, TS_SCHEMA),
                "ts",
                "value",
                key_col="user_id",
                unit="day",
            ).collect()
        ]
        # streaming never emits a comparison whose CURRENT bucket is the
        # key's final (still-open) bucket
        import datetime

        last_bucket = {}
        for eid, ts, user, _ in ts_events:
            b = int(
                datetime.datetime(ts.year, ts.month, ts.day, tzinfo=datetime.timezone.utc).timestamp()
            )
            last_bucket[user] = max(last_bucket.get(user, b), b)
        want = {row for row in batch if row[1] != last_bucket[row[0]]}
        assert got == want
        assert len(got) >= 5
    finally:
        shutil.rmtree(d, ignore_errors=True)


def _run_to_parquet(sdf, out_dir, ckpt_dir):
    """availableNow run into a parquet file sink with a durable
    checkpoint — the production shape (memory sinks don't survive a
    restart)."""
    q = (
        sdf.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_streaming_resample_survives_checkpoint_restart(spark, ts_events):
    """Kill-and-restart through Spark's state store: process the first
    half of the input, STOP the query, start a NEW query on the same
    checkpoint, feed the second half — the union of emitted rows must
    equal the uninterrupted run (per-key ffill carry, open-bucket state
    and source offsets all recovered from the checkpoint)."""
    rows = sorted(ts_events, key=lambda r: r[1])
    cut = len(rows) // 2
    d = tempfile.mkdtemp(prefix="codd_restart_src_")
    out = tempfile.mkdtemp(prefix="codd_restart_out_")
    ckpt = tempfile.mkdtemp(prefix="codd_restart_ckpt_")
    try:
        def op():
            sdf = stream_from_directory(spark, d, TS_SCHEMA,
                                        max_files_per_trigger=None)
            return streaming_resample(sdf, "ts", "value",
                                      key_col="user_id", unit="hour")

        spark.createDataFrame(rows[:cut], TS_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(d)
        _run_to_parquet(op(), out, ckpt)  # run 1: first half, then stops

        spark.createDataFrame(rows[cut:], TS_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(d)
        _run_to_parquet(op(), out, ckpt)  # run 2: NEW query, same ckpt

        got = {
            (r.user_id, r.bucket, r.n_events, r.value, r.is_gap)
            for r in spark.read.parquet(out).collect()
        }

        # uninterrupted reference: one query over the full input
        d2 = _stream_chunks(spark, rows, TS_SCHEMA, n_chunks=1)
        try:
            sdf = stream_from_directory(spark, d2, TS_SCHEMA)
            q = run_to_memory(
                streaming_resample(sdf, "ts", "value", key_col="user_id",
                                   unit="hour"),
                "resample_restart_ref",
                output_mode="append",
            )
            _drain(q)
            want = {
                (r.user_id, r.bucket, r.n_events, r.value, r.is_gap)
                for r in spark.table("resample_restart_ref").collect()
            }
        finally:
            shutil.rmtree(d2, ignore_errors=True)
        assert got == want and len(got) > 20
    finally:
        for p in (d, out, ckpt):
            shutil.rmtree(p, ignore_errors=True)


def test_streaming_scd2_survives_checkpoint_restart(spark, cdc_changes):
    """Same kill-and-restart protocol for SCD2: the open version lives in
    state across the restart, so a change arriving AFTER the restart must
    close a version opened BEFORE it with the original valid_from."""
    rows = sorted(cdc_changes, key=lambda r: r[1])
    cut = len(rows) // 2
    d = tempfile.mkdtemp(prefix="codd_restart2_src_")
    out = tempfile.mkdtemp(prefix="codd_restart2_out_")
    ckpt = tempfile.mkdtemp(prefix="codd_restart2_ckpt_")
    try:
        def op():
            sdf = stream_from_directory(spark, d, CDC_SCHEMA,
                                        max_files_per_trigger=None)
            return streaming_scd2(sdf, "cust_id", ["segment", "tier"], "ts",
                                  tiebreak_cols=["change_id"])

        spark.createDataFrame(rows[:cut], CDC_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(d)
        _run_to_parquet(op(), out, ckpt)
        n_first = spark.read.parquet(out).count()

        spark.createDataFrame(rows[cut:], CDC_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(d)
        _run_to_parquet(op(), out, ckpt)

        got = {
            (r.cust_id, r.segment, r.tier, r.valid_from, r.valid_to, r.version)
            for r in spark.read.parquet(out).collect()
        }
        hist = scd2_history(
            spark.createDataFrame(rows, CDC_SCHEMA),
            ["cust_id"], ["segment", "tier"], "ts",
            tiebreak_cols=["change_id"],
        )
        want = {
            (r.cust_id, r.segment, r.tier, r.valid_from, r.valid_to, r.version)
            for r in hist.filter("valid_to IS NOT NULL").collect()
        }
        assert got == want
        # the restart actually split the work (some versions closed after)
        assert 0 < n_first < len(got)
    finally:
        for p in (d, out, ckpt):
            shutil.rmtree(p, ignore_errors=True)
