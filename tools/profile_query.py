"""Stage-level profiler for single queries (r13 optimization round).

Same session/warmup/noop methodology as tools/isolate_query.py, but with
the Spark UI enabled so the REST API can attribute wall time to stages:
for each named query it runs one warm pass wrapped in a job group, then
prints every stage of that group with task time, executor CPU, shuffle
read/write bytes and input bytes — the guide-§1 empirical loop without a
browser.

Usage:
  python tools/profile_query.py [--sf DIR] q1 [q2 ...]
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod  # noqa: E402
from codd_spark.session import get_spark  # noqa: E402


def run_noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def fetch(url: str):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read().decode())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="profile-query", cpus=cpus,
        extra_conf={"spark.ui.enabled": "true",
                    "spark.ui.retainedStages": "5000",
                    "spark.ui.retainedJobs": "5000"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    qs = entry_mod.queries()

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

    for name in args.queries:
        if name not in qs:
            print(f"SKIP {name}: not in registry")
            continue
        # one unprofiled pass so the profiled pass is warm
        run_noop(qs[name](spark, args.sf))
        gc.collect()
        try:
            spark.catalog.clearCache()
        except Exception:  # noqa: BLE001
            pass
        group = f"prof_{name}"
        spark.sparkContext.setJobGroup(group, name)
        t0 = time.time()
        run_noop(qs[name](spark, args.sf))
        wall = time.time() - t0
        spark.sparkContext.setJobGroup(None, None)

        jobs = fetch(f"{ui}/api/v1/applications/{app_id}/jobs?status=succeeded")
        job_ids = {j["jobId"]: j for j in jobs if j.get("jobGroup") == group}
        stage_to_job = {}
        for jid, j in job_ids.items():
            for sid in j.get("stageIds", []):
                stage_to_job[sid] = jid
        stages = fetch(f"{ui}/api/v1/applications/{app_id}/stages?status=complete")
        rows = []
        for s in stages:
            if s["stageId"] not in stage_to_job:
                continue
            rows.append({
                "stage": s["stageId"],
                "job": stage_to_job[s["stageId"]],
                "tasks": s["numCompleteTasks"],
                "task_time_ms": s.get("executorRunTime", 0),
                "cpu_ms": int(s.get("executorCpuTime", 0) / 1e6),
                "input_mb": round(s.get("inputBytes", 0) / 2**20, 1),
                "sh_read_mb": round(s.get("shuffleReadBytes", 0) / 2**20, 2),
                "sh_write_mb": round(s.get("shuffleWriteBytes", 0) / 2**20, 2),
                "name": s.get("name", "")[:90],
            })
        rows.sort(key=lambda r: -r["task_time_ms"])
        print(f"\n=== {name}: wall {wall:.2f}s, {len(job_ids)} jobs, "
              f"{len(rows)} stages ===")
        # job timeline: per-job wall (submission -> completion) plus the
        # DRIVER GAP since the previous job's completion — orchestration-
        # bound rows (arrival paths) spend their time in these gaps
        # (planning/analysis/collect) and in many small jobs, which stage
        # task_time cannot show (r14 optimization round).
        from datetime import datetime

        def ts(x):
            return datetime.strptime(x[:23], "%Y-%m-%dT%H:%M:%S.%f")

        tl = sorted(
            (
                (ts(j["submissionTime"]), ts(j["completionTime"]), jid,
                 j.get("name", "")[:70])
                for jid, j in job_ids.items()
                if j.get("submissionTime") and j.get("completionTime")
            ),
        )
        if tl:
            prev_end = None
            gap_total = 0.0
            run_total = 0.0
            for sub, end, jid, jname in tl:
                gap = (sub - prev_end).total_seconds() if prev_end else 0.0
                gap_total += max(gap, 0.0)
                dur = (end - sub).total_seconds()
                run_total += dur
                print(f"  job{jid:>4} gap{gap*1000:>7.0f}ms "
                      f"run{dur*1000:>7.0f}ms  {jname}")
                prev_end = max(end, prev_end) if prev_end else end
            print(f"  job-timeline: run {run_total:.2f}s + inter-job gaps "
                  f"{gap_total:.2f}s over {len(tl)} jobs (wall {wall:.2f}s)")
        total_task_ms = sum(r["task_time_ms"] for r in rows)
        print(f"sum task_time {total_task_ms/1000:.2f}s  "
              f"sum cpu {sum(r['cpu_ms'] for r in rows)/1000:.2f}s")
        for r in rows[:20]:
            print(f"  st{r['stage']:>4} j{r['job']:>3} {r['tasks']:>3}t "
                  f"run{r['task_time_ms']:>7}ms cpu{r['cpu_ms']:>7}ms "
                  f"in{r['input_mb']:>7}M sr{r['sh_read_mb']:>8}M "
                  f"sw{r['sh_write_mb']:>8}M  {r['name']}")
    spark.stop()


if __name__ == "__main__":
    main()
