"""Round-9 scale stress: the new operators at 1x/10x/100x synthetic
document counts — per-doc cost must stay flat (linear scaling) or the
operator does not survive a 100 TB corpus.

- image dedup: gradient-PNG synthesis -> real decode -> dhash ->
  chunk-pigeonhole pair mining (the full image_near_dups pipeline);
  the pair set is constructed to stay bounded per base (same-base
  groups grow, so pairs grow quadratically per group of size n/50 —
  for honest scaling we widen the base modulus with n to keep group
  size fixed at ~6, matching a real corpus's bounded duplication).
- quality classifier: train + score on the planted corpus.
- JPEG: encode+decode+metadata throughput.

Usage: python tools/round9_scale_stress.py [scales...]
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
        app_name="r9-stress", cpus="32", shuffle_partitions=32,
        extra_conf={"spark.sql.adaptive.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    from codd_spark.operators.classify import (
        nb_linear_score, nb_linear_train, planted_label_docs,
    )
    from codd_spark.operators.multimodal import (
        decode_image_features, image_near_duplicates, jpeg_media_from_ids,
    )
    import codd_spark.operators.multimodal as mm

    for n in scales:
        ids = spark.range(0, n).selectExpr("id AS doc_id")

        # --- image dedup: fixed group size ~6 via base modulus n//6 ---
        base_mod = max(n // 6, 1)
        import numpy as np
        import pandas as pd
        from codd_spark.functions import imaging
        from typing import Iterator

        def gen(batches, bm=base_mod):
            for pdf in batches:
                out = []
                for i in pdf["doc_id"]:
                    i = int(i)
                    base = i % bm
                    h = ((base + 1) * 0x9E3779B97F4A7C15) % (1 << 64)
                    if i >= bm:
                        h ^= 1 << ((i // bm) % 64)
                    arr = np.empty((8, 9), dtype=np.uint8)
                    for r in range(8):
                        arr[r, 0] = 128
                        for c in range(8):
                            arr[r, c + 1] = arr[r, c] + (
                                1 if (h >> (r * 8 + c)) & 1 else -1
                            )
                    out.append(imaging.encode_png(arr, filter_type=i % 5))
                yield pd.DataFrame(
                    {"media_id": pdf["doc_id"].astype("int64"),
                     "kind": "image", "format": "png", "payload": out}
                )

        par = spark.sparkContext.defaultParallelism
        media = ids.repartition(par, "doc_id").mapInPandas(gen, schema=mm.MEDIA_SCHEMA)
        t0 = time.time()
        npairs = image_near_duplicates(
            media, method="dhash", decode="real", max_hamming=2
        ).count()
        t_img = time.time() - t0

        # --- classifier: train on 80%, score 20% ---
        corpus = planted_label_docs(ids)
        t0 = time.time()
        model = nb_linear_train(corpus.filter("doc_id % 5 != 4"), "y",
                                n_features=2048)
        scored = nb_linear_score(corpus.filter("doc_id % 5 = 4"), model,
                                 n_features=2048)
        run_noop(scored)
        t_clf = time.time() - t0

        # --- JPEG encode+decode+metadata ---
        t0 = time.time()
        feats = decode_image_features(
            jpeg_media_from_ids(ids, "doc_id"), decode="real"
        )
        run_noop(feats)
        t_jpg = time.time() - t0

        print(
            f"n={n}: image_dedup {t_img:.1f}s ({1000*t_img/n:.3f} ms/doc, "
            f"{npairs} pairs) | classifier {t_clf:.1f}s "
            f"({1000*t_clf/n:.3f} ms/doc) | jpeg {t_jpg:.1f}s "
            f"({1000*t_jpg/n:.3f} ms/img)",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
