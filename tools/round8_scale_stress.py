"""Round-8 scale stress: the skew-join A/B and the stateful-streaming
contracts at 1x/10x events — the numbers behind BASELINE.md's round-8
scaling section.

(a) salted_skew_join shape (50% of fact rows on ONE key) run through
    `salted_join` vs the PLAIN shuffle_merge join, same aggregate, noop
    sink, at the file scale (events 1x/10x) AND a synthetic 80M-row
    shape where one task's wall dominates. Both produce identical
    results (the driver oracle pins that); this measures the wall-clock
    gap. Findings recorded in BASELINE.md round 8: at <=1M rows the
    join is fixed-cost-bound and the plans tie; at 80M rows with 40M on
    one key and SMJ pinned, plain takes ~18-19 s (one straggler task)
    while salted takes ~6.5-6.8 s — 2.8x — and AQE's skew split does
    NOT rescue the plain plan on this single-key shape. Harness gotcha
    worth keeping: `.hint(...)` BEFORE `.localCheckpoint()` is lost
    with the lineage (the checkpoint returns a fresh plan), silently
    turning the A/B into broadcast-vs-broadcast; hint AFTER.

(b) streaming_scd2 / streaming_drift as availableNow streams over the
    events source — wall clock per 1x/10x so per-row cost is visible.

The 10x events replica shifts event_id only (user_id kept), so the 10x
run has 10x rows per key — the harder direction for both stresses.

Usage: python tools/round8_scale_stress.py [sf_dir] [events10x_dir]
"""

from __future__ import annotations

import sys
import time
import uuid

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from codd_spark.operators.joins import salted_join
from codd_spark.session import get_spark


def read_events(spark, d):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(f"{d}/events.parquet")
    dtype = dict(ev.dtypes).get("ts")
    if dtype == "bigint":
        ev = ev.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif dtype == "timestamp_ntz":
        ev = ev.withColumn("ts", F.col("ts").cast("timestamp"))
    return ev


def skew_ab(spark, ev, label):
    k = (
        F.when(F.col("event_id") % 2 == 0, F.lit(0))
        .otherwise(F.col("user_id"))
        .alias("k")
    )
    facts = ev.select(k, "value")
    dims = (
        ev.select(k)
        .distinct()
        .withColumn("seg", F.pmod(F.col("k") * 7, F.lit(101)))
        .localCheckpoint(eager=True)  # A/B measures the JOIN, not dim prep
    ).hint("shuffle_merge")  # AFTER the checkpoint or the hint is lost
    n = facts.count()

    def run(j):
        out = j.groupBy("seg").agg(
            F.count("*").alias("n"),
            F.sum(F.floor(F.col("value") * 100).cast("long")).alias("sum_cents"),
        )
        t0 = time.monotonic()
        out.write.format("noop").mode("overwrite").save()
        return time.monotonic() - t0

    for name, jf in (
        ("plain", lambda: facts.join(dims, on=["k"])),
        ("salted", lambda: salted_join(facts, dims, on=["k"], n_salts=16)),
    ):
        jf()  # warm codegen
        wall = min(run(jf()) for _ in range(2))
        print(f"| {label} | {n:,} | {name} | {wall:.2f} s |", flush=True)
    dims.unpersist()


def skew_synthetic(spark, n=80_000_000):
    """The shape where skew actually bites locally: one straggler task
    holding n/2 rows. SMJ pinned; plan kind printed so a silent
    broadcast can't fake parity."""
    facts = spark.range(n).select(
        F.when(F.col("id") % 2 == 0, F.lit(0))
        .otherwise(F.col("id") % 3000)
        .alias("k"),
        (F.col("id") % 997).cast("double").alias("value"),
    )
    dims = (
        spark.range(3000)
        .select(F.col("id").alias("k"))
        .withColumn("seg", F.pmod(F.col("k") * 7, F.lit(101)))
        .localCheckpoint(eager=True)
    ).hint("shuffle_merge")

    def run(j):
        out = j.groupBy("seg").agg(
            F.count("*").alias("n"),
            F.sum(F.floor(F.col("value") * 100).cast("long")).alias("s"),
        )
        t0 = time.monotonic()
        out.write.format("noop").mode("overwrite").save()
        return time.monotonic() - t0

    for name, jf in (
        ("plain", lambda: facts.join(dims, on=["k"])),
        ("salted", lambda: salted_join(facts, dims, on=["k"], n_salts=16)),
    ):
        plan = jf()._jdf.queryExecution().executedPlan().toString()
        kind = "SMJ" if "SortMergeJoin" in plan else (
            "BHJ" if "BroadcastHashJoin" in plan else "?"
        )
        run(jf())  # warm
        wall = min(run(jf()) for _ in range(2))
        print(
            f"| synthetic {n:,} ({n // 2:,} on one key) | {name} [{kind}] "
            f"| {wall:.2f} s |",
            flush=True,
        )


def stream_wall(spark, ev_dir, op, label):
    from codd_spark.streaming.stateful import streaming_drift, streaming_scd2
    from codd_spark.streaming.structured import stream_from_directory

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = spark.read.parquet(f"{ev_dir}/events.parquet").schema
    import os

    path = f"{ev_dir}/events.parquet"
    if os.path.isdir(path):
        s = stream_from_directory(spark, path, raw_schema, fmt="parquet",
                                  max_files_per_trigger=None)
    else:
        s = stream_from_directory(spark, ev_dir, raw_schema, fmt="parquet",
                                  max_files_per_trigger=None,
                                  glob_filter="events.parquet")
    dtype = dict(s.dtypes).get("ts")
    if dtype == "bigint":
        s = s.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif dtype == "timestamp_ntz":
        s = s.withColumn("ts", F.col("ts").cast("timestamp"))
    n = spark.read.parquet(path).count()
    if op == "scd2":
        out = streaming_scd2(s, "user_id", ["event_type"], "ts",
                             tiebreak_cols=["event_id"])
    else:
        out = streaming_drift(s, "ts", "value", key_col="user_id", unit="day")
    name = f"r8stress_{op}_{uuid.uuid4().hex[:8]}"
    t0 = time.monotonic()
    q = (
        out.writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    wall = time.monotonic() - t0
    rows = spark.table(name).count()
    print(f"| {label} | {op} | {n:,} | {wall:.2f} s | {rows:,} out "
          f"| {1000 * wall / n:.4f} ms/row |", flush=True)


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    big = sys.argv[2] if len(sys.argv) > 2 else "/tmp/events_x10"

    spark = get_spark(app_name="r8-scale-stress", cpus="32")
    spark.sparkContext.setLogLevel("ERROR")

    print("| scale | fact rows | plan | wall |")
    skew_ab(spark, read_events(spark, sf), "1x")
    skew_ab(spark, read_events(spark, big), "10x")
    skew_synthetic(spark)

    print("| scale | op | rows | wall | out rows | ms/row |")
    for d, label in ((sf, "1x"), (big, "10x")):
        for op in ("scd2", "drift"):
            stream_wall(spark, d, op, label)


if __name__ == "__main__":
    main()
