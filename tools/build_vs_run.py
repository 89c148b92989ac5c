"""Split a query's warm wall time into (a) Python-side DataFrame
construction — py4j expression building plus any eager build-time
actions — and (b) the timed noop action. Guide §7.3: when executor task
time is a fraction of wall time, the driver is the bottleneck; this
tells you which half of the driver.

Usage: python tools/build_vs_run.py [--sf DIR] q1 [q2 ...]
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod  # noqa: E402
from codd_spark.session import get_spark  # noqa: E402


def run_noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--n", type=int, default=2)
    args = ap.parse_args()

    spark = get_spark(app_name="build-vs-run",
                      cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    from codd_spark.sources.readers import read_table
    for t in ("nation", "region", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        try:
            read_table(spark, args.sf, t).count()
        except Exception:  # noqa: BLE001
            pass

    for name in args.queries:
        if name not in qs:
            print(f"SKIP {name}")
            continue
        run_noop(qs[name](spark, args.sf))  # warm pass
        gc.collect()
        spark.catalog.clearCache()
        out = []
        for _ in range(args.n):
            t0 = time.time()
            df = qs[name](spark, args.sf)
            t1 = time.time()
            run_noop(df)
            t2 = time.time()
            out.append({"build": round(t1 - t0, 3), "run": round(t2 - t1, 3)})
            gc.collect()
            spark.catalog.clearCache()
        print(json.dumps({name: out}))
    spark.stop()


if __name__ == "__main__":
    main()
