"""Isolated per-query A/B harness for the optimization rounds.

Runs the named __spark_entry__.queries() rows alone in a fresh session
with the SAME methodology as bench.py (noop sink, cold pass + N warm
samples, gc+clearCache between runs), prints per-query cold/warm/min,
and optionally writes .explain("formatted") to plans/r14/<q>_<tag>.txt.

Usage:
  python tools/isolate_query.py [--sf DIR] [--n N] [--explain TAG] q1 [q2 ...]
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
    ap.add_argument("--n", type=int, default=3, help="warm samples")
    ap.add_argument("--explain", default=None,
                    help="write plans/r14/<q>_<TAG>.txt explain files")
    args = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="isolate-query", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()

    # same table + codegen warmup as bench.py so cold numbers mean the same
    from codd_spark.sources.readers import read_table
    for t in ("nation", "region", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        try:
            read_table(spark, args.sf, t).count()
        except Exception:  # noqa: BLE001
            pass
    from pyspark.sql import Window as _W
    from pyspark.sql import functions as _F
    _a = spark.range(1_000_000).withColumn("g", _F.col("id") % 1000)
    _b = spark.range(1000).withColumnRenamed("id", "g")
    run_noop(
        _a.join(_b, "g").groupBy("g").agg(_F.sum("id").alias("s"))
        .withColumn("r", _F.row_number().over(_W.orderBy(_F.desc("s"))))
        .filter(_F.col("r") <= 10)
    )

    out = {}
    for name in args.queries:
        if name not in qs:
            print(f"SKIP {name}: not in registry")
            continue
        spark.sparkContext.setJobDescription(f"isolate:{name}")
        if args.explain:
            os.makedirs("/root/repo/plans/r14", exist_ok=True)
            try:
                plan = qs[name](spark, args.sf)._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
                )
                with open(f"/root/repo/plans/r14/{name}_{args.explain}.txt", "w") as f:
                    f.write(plan)
            except Exception as e:  # noqa: BLE001
                print(f"explain failed for {name}: {e}")
        samples = []
        for i in range(args.n + 1):
            t0 = time.time()
            run_noop(qs[name](spark, args.sf))
            samples.append(round(time.time() - t0, 3))
            gc.collect()
            try:
                spark.catalog.clearCache()
            except Exception:  # noqa: BLE001
                pass
        out[name] = {"cold": samples[0], "warm": samples[1:],
                     "min_warm": min(samples[1:]) if samples[1:] else None}
        print(json.dumps({name: out[name]}))
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
