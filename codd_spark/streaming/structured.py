"""Structured Streaming operators: the stream-shaped counterpart of the
engine (the reference's insert-only monotone regime is exactly Spark's
streaming-friendly case — SURVEY.md §7 step 6).

Everything is the standard readStream -> transform -> writeStream shape:
- event-time tumbling/sliding windows with watermarks (late-data bound)
- session windows
- streaming dedup (state-bounded via watermark)
- a custom stateful operator via applyInPandasWithState (running per-key
  aggregation with explicit GroupState), for semantics the built-in
  stateful ops can't express
"""

from __future__ import annotations

import contextlib
import os
from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)


def stream_from_directory(
    spark: SparkSession,
    path: str,
    schema,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = 1,
    glob_filter: str | None = None,
) -> DataFrame:
    """File-source stream: each new file in ``path`` becomes (part of) a
    micro-batch — the streaming analogue of the reference's insert batches.
    ``path`` must be a directory (file-source contract); use
    ``glob_filter`` to stream a subset of its files."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    if glob_filter:
        reader = reader.option("pathGlobFilter", glob_filter)
    return reader.format(fmt).load(path)


def local_input_bytes(*paths: str) -> int | None:
    """Total on-disk byte size of local file/directory inputs, or ``None``
    when any path is not a local filesystem path (size unknown — callers
    fall back to the session's shuffle-partition setting)."""
    total = 0
    for p in paths:
        p = str(p)
        if "://" in p and not p.startswith("file:"):
            return None
        if p.startswith("file:"):
            p = p[len("file:"):]
        if os.path.isdir(p):
            for root, _dirs, files in os.walk(p):
                for f in files:
                    try:
                        total += os.path.getsize(os.path.join(root, f))
                    except OSError:
                        pass
        elif os.path.isfile(p):
            total += os.path.getsize(p)
        else:
            return None
    return total


@contextlib.contextmanager
def stateful_stream_partitions(
    spark: SparkSession,
    input_bytes: int | None,
    target_bytes: int = 64 << 20,
):
    """Size the shuffle-partition count a STATEFUL streaming query will
    freeze into its checkpoint from the INPUT size, the way AQE would if
    it could: stateful streaming exchanges are exempt from AQE partition
    coalescing, and every state partition costs a fixed per-microbatch
    overhead (HDFS-backed store provider init + delta-file commit +
    maintenance, measured ~0.6 s/partition/batch on local disk), so a
    small stream inheriting a cluster-sized ``spark.sql.shuffle.
    partitions`` pays seconds of pure state-store overhead for kilobytes
    of state. ``ceil(input_bytes / target_bytes)`` clamped to
    [1, session setting]: at cluster scale the clamp returns the session
    setting unchanged (the knob stays scale-parameterised — this is a
    derive-from-input-size rule, not a local-mode constant), and when the
    input size is unknown (``input_bytes=None``) the session setting is
    left untouched. The conf is restored on exit; start AND terminate the
    stream inside the ``with`` block."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    if input_bytes is None:
        yield int(old)
        return
    n = max(1, min(int(old), (int(input_bytes) + target_bytes - 1) // target_bytes))
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield n
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def windowed_counts(
    sdf: DataFrame,
    ts_col: str,
    window: str,
    slide: str | None = None,
    watermark: str = "10 minutes",
    keys: Iterable[str] = (),
    aggs: list | None = None,
) -> DataFrame:
    """Tumbling (or sliding) event-time aggregation with a watermark: state
    for windows older than the watermark is dropped, which is what bounds
    memory on an unbounded stream."""
    win = F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    aggs = aggs or [F.count("*").alias("cnt")]
    return (
        sdf.withWatermark(ts_col, watermark)
        .groupBy(win.alias("window"), *keys)
        .agg(*aggs)
    )


def session_windows(
    sdf: DataFrame,
    ts_col: str,
    gap: str,
    keys: Iterable[str],
    watermark: str = "10 minutes",
    aggs: list | None = None,
) -> DataFrame:
    """Session windows: events within ``gap`` of each other merge into one
    session per key."""
    aggs = aggs or [F.count("*").alias("cnt")]
    return (
        sdf.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("session"), *keys)
        .agg(*aggs)
    )


def streaming_bloom_decontaminate(
    sdf: DataFrame,
    bloom,
    *,
    text_col: str = "text",
    min_hits: int = 1,
    hits_col: str | None = None,
) -> DataFrame:
    """Decontaminate a document STREAM against a prebuilt ``GramBloom``
    sketch (operators/dedup.py): drop every document whose count of
    distinct word-n-grams present in the sketch reaches ``min_hits``.

    The probe is the same map-only Arrow kernel as the batch operator
    (``bloom_probe``) — stateless and shuffle-free, so it is append-mode
    safe with no watermark and no state store; and because the decision
    is per-document, chunked streaming replay produces EXACTLY the batch
    pass's survivor set (tested in tests/test_streaming_bloom.py).

    Sketch-only semantics: no false negatives (every doc the exact
    containment rule flags is flagged here), false positives at the
    sketch's fp rate (~0.04% at the 16-bits/item default). For EXACT
    streaming removal, run the verifying batch operator per micro-batch
    via ``bloom_decontaminate_batch_fn`` (foreachBatch) instead.

    This is the 100-TB arrival shape: build sketches once per benchmark,
    OR-union them (GramBloom.union), and every newly crawled shard is
    cleaned in-flight with zero corpus-side shuffle."""
    from codd_spark.operators.dedup import bloom_probe

    probe_col = hits_col or "__bloom_hits"
    out = bloom_probe(sdf, bloom, text_col=text_col, hits_col=probe_col).filter(
        F.col(probe_col) < min_hits
    )
    return out if hits_col else out.drop(probe_col)


def bloom_decontaminate_batch_fn(
    contaminants: DataFrame,
    bloom,
    sink,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_hits: int = 1,
):
    """foreachBatch callable for EXACT streaming decontamination: each
    micro-batch runs the verifying batch operator
    (``bloom_decontaminate(..., prebuilt=bloom, exact_verify=True)``) and
    hands the cleaned batch to ``sink(clean_df, epoch_id)``. Per-batch
    application equals the whole-corpus pass because the containment
    decision is per-document — no cross-document interaction exists to
    lose at batch boundaries. Use as
    ``sdf.writeStream.foreachBatch(bloom_decontaminate_batch_fn(...))``."""
    from codd_spark.operators.dedup import bloom_decontaminate

    def _fn(batch_df: DataFrame, epoch_id: int) -> None:
        clean = bloom_decontaminate(
            batch_df,
            contaminants,
            id_col,
            text_col,
            n=bloom.ngram_n,
            min_hits=min_hits,
            prebuilt=bloom,
        )
        sink(clean, epoch_id)

    return _fn


def incremental_dedup_batch_fn(dedup, sink):
    """foreachBatch callable that drives ANY of the arrival
    deduplicators — ``dedup.IncrementalDeduplicator`` (fuzzy text),
    ``dedup.IncrementalExactDeduplicator`` (exact URL/content keys), or
    ``multimodal.IncrementalImageDeduplicator`` (perceptual) — from a
    stream: each micro-batch is deduplicated within itself and against
    everything previously kept, then the surviving novel rows go to
    ``sink(kept_df, epoch_id)`` and their key state is appended for
    future batches. The streaming form of the continuous-crawl arrival
    pipeline:

        dd = IncrementalDeduplicator(spark)   # or the exact/image twin
        q = (docs_stream.writeStream
             .foreachBatch(incremental_dedup_batch_fn(dd, sink))
             .start())

    Semantics are exactly ``add_batch`` per micro-batch (greedy
    earlier-kept-wins across batches, within-batch keeper election);
    for the fuzzy/image members, batch boundaries only affect near-dup
    CHAINS that span them — see the class docstrings. Exact-key dedup
    is chain-free, so its kept KEY set is batching-independent."""

    def _fn(batch_df: DataFrame, epoch_id: int) -> None:
        sink(dedup.add_batch(batch_df), epoch_id)

    return _fn


def streaming_dedup(
    sdf: DataFrame, keys: list[str], ts_col: str | None = None, watermark: str = "10 minutes"
) -> DataFrame:
    """Exactly-once keys on a stream. With a watermark the dedup state is
    bounded (keys older than the watermark are forgotten) — without one,
    state grows without bound; always pass ts_col in production."""
    if ts_col:
        return sdf.withWatermark(ts_col, watermark).dropDuplicates(keys + [ts_col])
    return sdf.dropDuplicates(keys)


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    max_delay: str = "1 hour",
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream equi-join with a time-bound: right rows
    match left rows within [left_ts - max_delay, left_ts]. The watermark +
    the time-bound are what let Spark evict join state — an unbounded
    stream-stream join without them grows state forever."""
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{on}") == F.col(f"r.{on}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}") - F.expr(f"INTERVAL {max_delay}"))
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}"))
    )
    return l.join(r, on=cond, how=how).drop(F.col(f"r.{on}"))


# ---------------------------------------------------------------------------
# custom stateful operator: applyInPandasWithState
# ---------------------------------------------------------------------------

_RUNNING_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", StringType()),  # decimal-as-string (exact)
    ]
)
_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("total_micros", LongType())]
)


def running_user_totals(sdf: DataFrame, timeout: str = "NoTimeout") -> DataFrame:
    """Per-user running (count, exact total) maintained across micro-batches
    with explicit GroupState — the canonical custom stateful operator shape
    for semantics the built-ins can't express (exact incremental totals in
    integer micros, emitted once per batch per active key)."""

    def update(key, pdfs, state: GroupState):
        n, total_micros = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            total_micros += int(round(pdf["value"].sum() * 1_000_000))
        state.update((n, total_micros))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [f"{total_micros / 1_000_000:.6f}"],
            }
        )

    return sdf.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=_RUNNING_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# test/debug sinks
# ---------------------------------------------------------------------------

def run_to_memory(sdf: DataFrame, name: str, output_mode: str = "update"):
    """Start the stream into an in-memory table (tests/debug only — memory
    sink collects to the driver; production sinks are files/Kafka)."""
    return (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .start()
    )
