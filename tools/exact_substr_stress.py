"""ExactSubstr span-dedup scaling harness — the numbers behind
BASELINE.md's "ExactSubstr 1×/10×/100×" table.

Runs ``exact_substring_spans`` (min_len=40) on sf0.1 documents and on
alphabet-rotated replicas (``tools/make_docs_replica.py`` rotate mode —
a per-copy letter bijection preserves within-copy substring structure
exactly, so true spans scale linearly with the multiplier and the span
count doubles as a correctness check). One full warm-up pass per scale,
then the timed warm pass.

Usage: python tools/exact_substr_stress.py [x1_dir x10_dir x100_dir ...]
Each dir must hold documents.parquet. Defaults to sf0.1 + the
/tmp/docs_rot_x{10,100} replicas.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from codd_spark.operators.dedup import exact_substring_spans
from codd_spark.session import get_spark


def main():
    dirs = sys.argv[1:] or [
        "/root/testdata/sf0.1",
        "/tmp/docs_rot_x10",
        "/tmp/docs_rot_x100",
    ]
    spark = get_spark(app_name="exact-substr-stress", cpus="32")
    spark.sparkContext.setLogLevel("ERROR")
    print("| scale dir | docs | spans | warm | ms/doc |")
    for d in dirs:
        docs = spark.read.parquet(f"{d}/documents.parquet").select(
            "doc_id", "text"
        )
        n_docs = docs.count()
        # warm-up: full pipeline once (JIT + codegen + shuffle files)
        exact_substring_spans(docs, min_len=40).count()
        t0 = time.monotonic()
        n_spans = exact_substring_spans(docs, min_len=40).count()
        warm = time.monotonic() - t0
        print(
            f"| {d} | {n_docs:,} | {n_spans:,} | {warm:.1f} s "
            f"| {1000 * warm / n_docs:.3f} |",
            flush=True,
        )


if __name__ == "__main__":
    main()
