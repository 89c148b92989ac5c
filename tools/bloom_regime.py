"""Measure bloom vs containment decontamination in an emulated
DISK-BOUND-shuffle regime (BASELINE.md "Bloom vs containment").

On local[32] shuffles run at RAM speed, so the containment equi-join
wins (r5 table). The bloom route's claimed regime is shuffles bound by
network/disk. This runner emulates that honestly with cgroup v1:

- a memory cgroup caps RSS+page cache, so shuffle files are evicted
  and re-reads hit the device;
- a blkio cgroup throttles vda read+write bps, so those hits cost what
  a saturated network/disk would.

One method per invocation (fresh JVM, fresh spark.local.dir on the
throttled device). The orchestration (cgroup setup + both methods ×
both regimes) lives in the shell snippet in BASELINE.md.

Usage:
  python tools/bloom_regime.py <replica_dir> <bloom|containment>
      [--cgroup NAME] [--localdir DIR]

Prints one JSON line: {"method":..., "secs":..., "clean_count":...,
"clean_hash":...} — clean_hash is an order-insensitive digest of the
surviving doc_ids, so the orchestrator can assert both methods and
both regimes produce IDENTICAL output.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")


def enter_cgroup(name: str) -> None:
    pid = str(os.getpid())
    for ctrl in ("memory", "blkio"):
        path = f"/sys/fs/cgroup/{ctrl}/{name}/tasks"
        with open(path, "w") as f:
            f.write(pid)


def main() -> None:
    replica_dir = sys.argv[1]
    method = sys.argv[2]
    cg = None
    localdir = "/tmp/bloom_regime_local"
    argv = sys.argv[3:]
    while argv:
        a = argv.pop(0)
        if a == "--cgroup":
            cg = argv.pop(0)
        elif a == "--localdir":
            localdir = argv.pop(0)
    if cg:
        enter_cgroup(cg)  # BEFORE the JVM starts, so it inherits the cgroup

    shutil.rmtree(localdir, ignore_errors=True)
    os.makedirs(localdir, exist_ok=True)

    from pyspark.sql import functions as F

    from codd_spark.operators.dedup import bloom_decontaminate, decontaminate
    from codd_spark.session import get_spark

    spark = get_spark(
        app_name=f"bloom-regime-{method}",
        cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"),
        shuffle_partitions=32,
        extra_conf={
            "spark.local.dir": localdir,
            # keep the JVM + Arrow python workers inside the memory
            # cgroup with room left over ONLY for a small page cache —
            # the cap's job is evicting shuffle files between write and
            # read so the blkio throttle actually prices the re-read
            "spark.driver.memory": os.environ.get("BLOOM_REGIME_HEAP", "2g"),
        },
    )
    corpus = spark.read.parquet(f"{replica_dir}/documents.parquet")
    # contaminants = the same 100-doc copy-0 benchmark slice as the r5
    # table (min doc_ids belong to copy 0 in the suffix replica)
    contaminants = corpus.orderBy("doc_id").limit(100)

    t0 = time.time()
    if method == "bloom":
        clean = bloom_decontaminate(
            corpus, contaminants, n=3, min_hits=2, exact_verify=True
        )
    elif method == "containment":
        clean = decontaminate(
            corpus, contaminants, method="containment", n=3, min_hits=2
        )
    else:
        raise SystemExit(f"unknown method {method!r}")
    agg = clean.agg(
        F.count("*").alias("c"),
        # bit_xor: order-insensitive digest with no ANSI sum overflow
        F.expr("bit_xor(xxhash64(cast(doc_id AS string)))").alias("h"),
    ).collect()[0]
    secs = time.time() - t0
    print(
        json.dumps(
            {
                "method": method,
                "cgroup": cg,
                "secs": round(secs, 1),
                "clean_count": int(agg["c"]),
                "clean_hash": int(agg["h"]),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
