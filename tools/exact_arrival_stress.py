"""Exact-key arrival-dedup stress (round 10) — per-arrival cost of
``IncrementalExactDeduplicator`` as the kept-key state grows.

Feeds N sequential URL batches (``batch_urls`` rows each, ~25%% of each
batch duplicating keys kept in EARLIER batches, ~25%% duplicating
within the batch) through a persistent state dir, compacting every
``compact_every`` arrivals. Flat per-arrival wall clock shows the probe
is O(batch) against the bucketed state regardless of how many million
keys are kept; the parquet file count shows compaction retiring the
per-arrival file accumulation.

Usage: python tools/exact_arrival_stress.py [n_arrivals] [batch_urls]
       [compact_every]
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from codd_spark.operators.dedup import IncrementalExactDeduplicator
from codd_spark.session import get_spark


def n_files(d):
    return sum(
        1
        for f in glob.glob(os.path.join(d, "**", "*"), recursive=True)
        if os.path.isfile(f) and f.endswith(".parquet")
    )


def main():
    n_arrivals = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    batch_urls = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    compact_every = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    spark = get_spark(app_name="exact-arrival-stress", cpus="32")
    spark.sparkContext.setLogLevel("ERROR")
    state_dir = tempfile.mkdtemp(prefix="codd_exact_arrival_")
    shutil.rmtree(state_dir)

    d = IncrementalExactDeduplicator(spark, key_col="url", state_dir=state_dir)
    print("arrival,wall_s,kept_batch,n_kept_total,parquet_files")
    half = batch_urls // 2
    for a in range(n_arrivals):
        lo = a * batch_urls
        # first half: novel keys; third quarter: keys from ARBITRARY
        # earlier batches (cross-arrival dups); last quarter: dups of
        # this batch's own first half (within-batch dups)
        batch = spark.range(lo, lo + batch_urls).select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.lit("https://crawl.example.com/p/"),
                F.when(
                    F.col("id") < lo + half, F.col("id")
                )
                .when(
                    F.col("id") < lo + half + half // 2,
                    F.pmod(F.col("id") * 2654435761, F.lit(max(lo, 1))),
                )
                .otherwise(F.col("id") - half)
                .cast("string"),
            ).alias("url"),
        )
        t0 = time.time()
        kept = d.add_batch(batch).count()
        w = time.time() - t0
        if compact_every and (a + 1) % compact_every == 0:
            d.compact()
        print(
            f"{a + 1},{w:.2f},{kept},{d.n_kept},{n_files(state_dir)}",
            flush=True,
        )
    spark.stop()
    shutil.rmtree(state_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
