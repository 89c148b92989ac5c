"""Round-10 curation-operator scale stress: line_dedup, dsir_select,
and url_dedup at 1x/10x/100x synthetic document counts — per-doc cost
must stay flat (linear scaling) or the operator does not survive a
100 TB corpus.

- line_dedup: ~7 lines/doc — 2 boilerplate lines drawn from a fixed
  20-template pool (the CCNet target: hot duplicated lines whose hash
  group is huge) + 5 unique content lines. The duplicated-line TABLE
  stays 20 rows at every scale while the flag join fans out linearly —
  exactly the shape a real crawl produces.
- dsir_select: planted-signal corpus; target = n/40 docs, raw = the
  rest, k = n/10. Two corpus-linear counting passes + broadcast-scored
  top-k.
- url_dedup: messy URL variants with the group size pinned at ~4 by
  widening the page modulus with n (real corpora have bounded
  per-page refetch counts, not groups that grow with the corpus).

Usage: python tools/round10_curation_stress.py [scales...]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from codd_spark.session import get_spark
from pyspark.sql import functions as F


def run_noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    scales = [int(x) for x in sys.argv[1:]] or [5_000, 50_000, 500_000]
    spark = get_spark(
        app_name="r10-curation-stress", cpus="32", shuffle_partitions=32,
        extra_conf={"spark.sql.adaptive.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    from codd_spark.operators.classify import planted_label_docs
    from codd_spark.operators.dedup import line_dedup, url_dedup
    from codd_spark.operators.pipeline import dsir_select

    print("op,n,wall_s,ms_per_doc,out_rows")
    for n in scales:
        ids = spark.range(0, n).selectExpr("id AS doc_id")

        # --- line_dedup: 2 boilerplate lines (20-template pool) + 5 unique
        d = F.col("doc_id")
        boiler1 = F.concat(F.lit("Subscribe to newsletter variant "), (d % 20).cast("string"))
        boiler2 = F.concat(F.lit("(c) 2024 Example Corp template "), ((d * 7) % 20).cast("string"))
        uniq = F.concat_ws(
            "\n",
            *[
                F.concat(
                    F.lit(f"content line {i} of doc "),
                    d.cast("string"),
                    F.lit(" token "),
                    ((d * 31 + i * 17) % 9973).cast("string"),
                )
                for i in range(5)
            ],
        )
        docs = ids.select(
            "doc_id",
            F.concat_ws("\n", boiler1, uniq, boiler2).alias("text"),
        )
        t0 = time.time()
        out = line_dedup(docs, min_count=4)
        run_noop(out)
        w = time.time() - t0
        rows = None
        print(f"line_dedup,{n},{w:.2f},{w / n * 1000:.4f},{rows}")

        # --- dsir_select: target n/40, raw the rest, k = n/10
        corpus = planted_label_docs(ids)
        target = corpus.filter("doc_id % 40 = 1").select("doc_id", "text")
        raw = corpus.filter("doc_id % 40 != 1").select("doc_id", "text")
        t0 = time.time()
        sel = dsir_select(raw, target, k=max(n // 10, 1), n_features=4096)
        run_noop(sel)
        w = time.time() - t0
        sel.release_cache()
        print(f"dsir_select,{n},{w:.2f},{w / n * 1000:.4f},{max(n // 10, 1)}")

        # --- url_dedup: group size ~4 via page modulus n//4
        page_mod = max(n // 4, 1)
        pg = d % page_mod
        page = pg.cast("string")
        v = d % 4
        urls = ids.select(
            "doc_id",
            F.concat(
                F.when(v == 2, F.lit("http")).when(v == 1, F.lit("HTTPS")).otherwise(F.lit("https")),
                F.lit("://"),
                F.when(v == 1, F.lit("WWW.")).otherwise(F.lit("")),
                F.lit("crawl-"), (pg % 1000).cast("string"), F.lit(".example.com"),
                F.when(v == 1, F.lit(":443")).otherwise(F.lit("")),
                F.lit("/p/"), page,
                F.when(v == 3, F.lit("/")).otherwise(F.lit("")),
                F.when(v == 0, F.concat(F.lit("?utm_source=feed&id="), page))
                .otherwise(F.concat(F.lit("?id="), page)),
            ).alias("url"),
        )
        t0 = time.time()
        out = url_dedup(urls)
        run_noop(out)
        w = time.time() - t0
        print(f"url_dedup,{n},{w:.2f},{w / n * 1000:.4f},None")

    spark.stop()


if __name__ == "__main__":
    main()
