"""Persistent incremental-dedup arrival stress — the numbers behind
BASELINE.md's "50-arrival" table (VERDICT r6 item 9).

Seeds a persistent IncrementalDeduplicator with a corpus slice, then
feeds N sequential arrivals, compacting every ``compact_every``
arrivals. Records per-arrival wall clock and the on-disk parquet file
count of the state dir — the two growth vectors of a long-lived crawl.
Flat per-arrival cost shows probe work is O(batch) regardless of state
size; bounded file counts show compaction retires the
n_buckets-files-per-arrival accumulation.

Usage: python tools/state_arrival_stress.py [docs_dir] [n_arrivals]
       [batch_docs] [compact_every]
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from codd_spark.operators.dedup import IncrementalDeduplicator
from codd_spark.session import get_spark

PARAMS = dict(num_hashes=120, bands=20, shingle_k=5, threshold=0.5)


def n_files(d):
    return sum(
        1
        for f in glob.glob(os.path.join(d, "**", "*"), recursive=True)
        if os.path.isfile(f) and f.endswith(".parquet")
    )


def main():
    docs_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/docs_rot_x10"
    n_arrivals = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    batch_docs = int(sys.argv[3]) if len(sys.argv) > 3 else 800
    compact_every = int(sys.argv[4]) if len(sys.argv) > 4 else 10

    spark = get_spark(app_name="state-arrival-stress", cpus="32")
    spark.sparkContext.setLogLevel("ERROR")
    docs = (
        spark.read.parquet(f"{docs_dir}/documents.parquet")
        .select("doc_id", "text")
        .localCheckpoint(eager=True)
    )
    ids = sorted(r.doc_id for r in docs.select("doc_id").collect())
    seed_n = min(10_000, len(ids) // 2)
    need = seed_n + n_arrivals * batch_docs
    if len(ids) < need:
        raise SystemExit(f"corpus too small: {len(ids)} docs, need {need}")

    state_dir = "/tmp/arrival_stress_state"
    shutil.rmtree(state_dir, ignore_errors=True)
    dd = IncrementalDeduplicator(spark, state_dir=state_dir, **PARAMS)

    seed_hi = ids[seed_n - 1]
    t0 = time.monotonic()
    dd.add_batch(docs.filter(F.col("doc_id") <= seed_hi)).count()
    print(f"seed: {seed_n} docs in {time.monotonic() - t0:.1f} s, "
          f"{n_files(state_dir)} files", flush=True)

    print("| arrival | batch | wall | kept so far | state files |")
    times = []
    for i in range(n_arrivals):
        lo = ids[seed_n + i * batch_docs]
        hi = ids[seed_n + (i + 1) * batch_docs - 1]
        batch = docs.filter(F.col("doc_id").between(lo, hi))
        t0 = time.monotonic()
        dd.add_batch(batch).count()
        if (i + 1) % compact_every == 0:
            dd.compact()
        dt = time.monotonic() - t0
        times.append(dt)
        if (i + 1) % 5 == 0 or i == 0:
            tag = " (+compact)" if (i + 1) % compact_every == 0 else ""
            print(
                f"| {i + 1}{tag} | {batch_docs} | {dt:.2f} s | {dd.n_kept:,} "
                f"| {n_files(state_dir)} |",
                flush=True,
            )
    half = n_arrivals // 2
    print(
        f"mean wall: first half {sum(times[:half]) / half:.2f} s, "
        f"second half {sum(times[half:]) / (n_arrivals - half):.2f} s "
        f"(flat if ~equal); final files {n_files(state_dir)}",
        flush=True,
    )
    shutil.rmtree(state_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
