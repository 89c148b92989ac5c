"""Measure MinHash+LSH recall against the exact all-pairs Jaccard set.

The `minhash_near_dups` contract query is probabilistic by construction
(banded LSH candidates), so for three rounds it shipped rows-only. This
experiment justifies giving it a real DuckDB oracle: at oracle scales
the measured recall is exactly 1.0 — every pair with verified
char-5-shingle Jaccard >= 0.5 is produced, and the rounded jaccard
values agree to all 6 digits (hashed-shingle vs string-shingle Jaccard
differ only on xxhash64 collisions, ~n^2/2^64).

Usage: python tools/minhash_recall.py [sf_dir]
Prints spark/oracle pair counts, recall, and any asymmetric pairs.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    import duckdb
    import __spark_entry__ as entry
    import driver_compare as dcmp
    from codd_spark.session import get_spark

    spark = get_spark(app_name="minhash-recall", cpus="8", shuffle_partitions=8)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )

    scols, srows = dcmp.fetch_spark(
        entry.queries()["minhash_near_dups"](spark, sf_dir)
    )
    dcols, drows = dcmp.fetch_duck(con, entry.oracle_sql()["minhash_near_dups"])
    problems = dcmp.compare(scols, srows, dcols, drows)

    sset = {(r[0], r[1]) for r in srows}
    dset = {(r[0], r[1]) for r in drows}
    print(f"spark pairs: {len(srows)}  exact pairs: {len(drows)}")
    print(f"recall: {len(sset & dset) / len(dset) if dset else 1.0}")
    print(f"missed by LSH: {sorted(dset - sset)[:10]}")
    print(f"extra in LSH: {sorted(sset - dset)[:10]}")
    print(f"value compare: {problems if problems else 'EXACT MATCH'}")
    spark.stop()
    sys.exit(1 if problems else 0)


if __name__ == "__main__":
    main()
