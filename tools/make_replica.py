"""Build an N× key-shifted replica of a testdata scale-factor directory —
the scale-experiment harness behind BASELINE.md's scaling table.

Key columns are shifted by i*1e9 per copy so joins keep their fan-out
(each replica joins only within itself, like real data growth), and
document text gets a per-copy suffix so dedup doesn't collapse replicas.

Usage: python tools/make_replica.py [src_sf_dir] [dst_dir] [multiplier]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from codd_spark.session import get_spark

SHIFT = 1_000_000_000


def replicate(df, key_cols, n):
    out = None
    for i in range(n):
        d = df
        for k in key_cols:
            d = d.withColumn(k, F.col(k) + F.lit(i * SHIFT))
        out = d if out is None else out.union(d)
    return out


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfbig"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    spark = get_spark(app_name="make-replica", cpus="32")
    spark.sparkContext.setLogLevel("ERROR")

    li = spark.read.parquet(f"{src}/lineitem.parquet")
    replicate(li, ["l_orderkey"], n).repartition(32).write.mode("overwrite").parquet(
        f"{dst}/lineitem.parquet"
    )
    od = spark.read.parquet(f"{src}/orders.parquet")
    replicate(od, ["o_orderkey"], n).repartition(8).write.mode("overwrite").parquet(
        f"{dst}/orders.parquet"
    )
    docs = spark.read.parquet(f"{src}/documents.parquet")
    docs_n = replicate(docs, ["doc_id"], n).withColumn(
        "text",
        F.concat(F.col("text"), F.lit(" tail"), (F.col("doc_id") % 1000).cast("string")),
    )
    docs_n.repartition(8).write.mode("overwrite").parquet(f"{dst}/documents.parquet")

    # events ship nano-precision timestamps; read as raw nanos so the
    # replica preserves the source representation end-to-end
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(f"{src}/events.parquet")
    replicate(ev, ["event_id"], n).repartition(8).write.mode("overwrite").parquet(
        f"{dst}/events.parquet"
    )

    for t in ["customer", "nation", "region", "supplier", "part", "embeddings"]:
        spark.read.parquet(f"{src}/{t}.parquet").write.mode("overwrite").parquet(
            f"{dst}/{t}.parquet"
        )
    print("done:", spark.read.parquet(f"{dst}/lineitem.parquet").count(), "lineitem rows")


if __name__ == "__main__":
    main()
