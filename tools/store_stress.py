"""1k-stabilize stress for the persistent view store's compaction.

Verifies the geometric-merge analogue (streaming/store.py promote() +
compact(), mirroring core/src/database/instance.rs:174-188): across
1,000 insert+stabilize cycles the parquet file count per instance stays
bounded by _COMPACT_FILE_LIMIT + append slack (never grows linearly
with stabilize count), stabilize latency stays flat, and the final
relation + view contents are exactly the inserted set.

Usage: python tools/store_stress.py [n_cycles] [storage_dir]
"""

from __future__ import annotations

import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    d = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="store-stress-")

    from codd_spark import Relation
    from codd_spark.session import get_spark
    from codd_spark.streaming.store import (
        _COMPACT_FILE_LIMIT,
        PersistentIncrementalDatabase,
    )

    spark = get_spark(app_name="store-stress", cpus="8", shuffle_partitions=4)
    db = PersistentIncrementalDatabase(spark, os.path.join(d, "db"))
    db.add_relation("nums", "n LONG")
    view = db.store_view(Relation("nums").select("n % 2 = 0"))

    rel_dir = os.path.join(d, "db", "rel", "nums")
    lat, max_files = [], 0
    for i in range(n):
        t0 = time.perf_counter()
        db.insert("nums", [(i,)])
        db.stabilize()
        lat.append(time.perf_counter() - t0)
        nf = sum(1 for f in os.listdir(rel_dir) if f.endswith(".parquet"))
        max_files = max(max_files, nf)
        if (i + 1) % 200 == 0:
            q = statistics.median(lat[-200:])
            print(f"cycle {i+1}: files={nf} max_files={max_files} "
                  f"median_stabilize={q*1000:.0f}ms", flush=True)

    rows = [r.n for r in db.view_rows(view)]
    ok_rows = rows == [x for x in range(n) if x % 2 == 0]
    first_q = statistics.median(lat[: n // 4])
    last_q = statistics.median(lat[-n // 4:])
    print(f"RESULT max_files={max_files} limit={_COMPACT_FILE_LIMIT} "
          f"bounded={max_files <= _COMPACT_FILE_LIMIT + 8} "
          f"rows_ok={ok_rows} "
          f"latency_first_q={first_q*1000:.0f}ms last_q={last_q*1000:.0f}ms "
          f"flat={last_q < 5 * first_q + 0.05}")
    spark.stop()
    shutil.rmtree(d, ignore_errors=True)
    sys.exit(0 if (ok_rows and max_files <= _COMPACT_FILE_LIMIT + 8) else 1)


if __name__ == "__main__":
    main()
