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
       [mode]

``mode`` picks the per-copy text transform — match it to the operator
family under test:

- ``suffix`` (default): every token gets ``x<i>``. Right for WORD-token
  operators (set-similarity joins, containment, BPE): copy vocabularies
  are fully disjoint, so cross-copy word n-gram overlap is zero.
  WRONG for char-shingle operators: the shared suffixes create common
  substrings between every token pair within a copy, inflating char-5
  shingle Jaccard far above the source corpus (measured: 32M minhash
  pairs at 10x vs 2.6k expected — a harness artifact, not a defect).
- ``rotate``: a per-copy affine permutation of the letters
  (j -> a*j + b mod 26, a coprime to 26; distinct for 312 copies).
  A bijection on characters preserves every within-copy shingle
  relation EXACTLY (shingle sets map 1:1, Jaccard unchanged) while
  cross-copy shingles land in disjoint images. Right for char-shingle
  operators (MinHash/fuzzy dedup, SimHash, winnowing).
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
    mode = sys.argv[4] if len(sys.argv) > 4 else "suffix"
    if mode not in ("suffix", "rotate"):
        raise SystemExit(f"mode must be 'suffix' or 'rotate', got {mode!r}")

    spark = get_spark(app_name="make-docs-replica", cpus="32")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{src}/documents.parquet")
    alpha = "abcdefghijklmnopqrstuvwxyz"
    # multipliers coprime to 26: 12 of them x 26 shifts = 312 distinct
    # affine letter permutations
    coprime = [1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25]

    def copy_text(i):
        if mode == "suffix":
            return F.regexp_replace("text", r"(\S+)", f"$1x{i}")
        a, b = coprime[(i // 26) % len(coprime)], i % 26
        perm = "".join(alpha[(a * j + b) % 26] for j in range(26))
        return F.translate("text", alpha, perm)

    out = None
    for i in range(n):
        d = docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * SHIFT)).withColumn(
            "text", copy_text(i)
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
