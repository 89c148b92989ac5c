"""Build an N× corpus-stress replica of documents + embeddings — the
harness behind BASELINE.md's 100×-documents scaling table.

Documents: every token gets a per-copy suffix (``regexp_replace`` of
``(\\S+)`` with ``$1x<i>``), so copies have fully disjoint vocabularies:
near-dup/pair DENSITY stays exactly per-copy (true pairs scale linearly
with the multiplier, never quadratically), which is what makes "is any
stage superlinear?" answerable from the timing alone.

Embeddings: vec_id shifts by i*1e9 per copy and the vector is rotated by
i mod dim positions — an orthogonal transform, so within-copy cosine
geometry (and thus per-copy cluster structure) is preserved while
cross-copy similarities are scrambled.

Usage: python tools/make_docs_replica.py [src_sf_dir] [dst_dir] [multiplier]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from codd_spark.session import get_spark

SHIFT = 1_000_000_000


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/docs_big"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 100

    spark = get_spark(app_name="make-docs-replica", cpus="32")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{src}/documents.parquet")
    out = None
    for i in range(n):
        d = docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * SHIFT)).withColumn(
            "text", F.regexp_replace("text", r"(\S+)", f"$1x{i}")
        )
        out = d if out is None else out.union(d)
    out.repartition(32).write.mode("overwrite").parquet(f"{dst}/documents.parquet")

    emb = spark.read.parquet(f"{src}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    out = None
    for i in range(n):
        off = i % dim
        rot = (
            F.expr(
                f"concat(slice(embedding, {off + 1}, {dim - off}),"
                f" slice(embedding, 1, {off}))"
            )
            if off
            else F.col("embedding")
        )
        d = emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * SHIFT)).withColumn(
            "embedding", rot
        )
        out = d if out is None else out.union(d)
    out.repartition(16).write.mode("overwrite").parquet(f"{dst}/embeddings.parquet")
    print(f"wrote {n}x documents+embeddings replica to {dst}")
    spark.stop()


if __name__ == "__main__":
    main()
