"""Round-9 media-dedup stress: video and audio near-dup at 1x/10x
synthetic corpus sizes — per-item cost must hold flat or fall. Video
pair structure (offset copies within id%B families) and audio gram
structure both keep duplicate-group size fixed as n grows (base modulus
widens with n), so pair output scales linearly like a real corpus.

Usage: python tools/round9_media_stress.py [scales...]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from codd_spark.session import get_spark


def main():
    scales = [int(x) for x in sys.argv[1:]] or [5_000, 50_000]
    spark = get_spark(
        app_name="r9-media-stress", cpus="32", shuffle_partitions=32,
        extra_conf={"spark.sql.adaptive.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    import numpy as np
    import pandas as pd
    import hashlib
    from codd_spark.functions import imaging
    import codd_spark.operators.multimodal as mm
    from codd_spark.operators.multimodal import (
        audio_near_duplicates, video_near_duplicates,
    )

    for n in scales:
        ids = spark.range(0, n).selectExpr("id AS media_id")
        par = spark.sparkContext.defaultParallelism
        bm = max(n // 3, 1)  # 3 shifted copies per base

        def gen_video(batches, bm=bm):
            for pdf in batches:
                out = []
                for v in pdf["media_id"]:
                    v = int(v)
                    frames = []
                    for f in range(5):
                        k = (v % bm) * 16 + (v // bm) + f
                        h = ((k + 1) * 0x9E3779B97F4A7C15) % (1 << 64)
                        arr = np.empty((8, 9), dtype=np.uint8)
                        for r in range(8):
                            arr[r, 0] = 128
                            for c in range(8):
                                arr[r, c + 1] = arr[r, c] + (
                                    1 if (h >> (r * 8 + c)) & 1 else -1
                                )
                        frames.append(arr)
                    out.append(imaging.encode_apng(frames, filter_type=v % 5))
                yield pd.DataFrame(
                    {"media_id": pdf["media_id"].astype("int64"),
                     "kind": "video", "format": "apng", "payload": out}
                )

        media_v = ids.repartition(par, "media_id").mapInPandas(
            gen_video, schema=mm.MEDIA_SCHEMA
        )
        t0 = time.time()
        nv = video_near_duplicates(media_v, min_shared=3).count()
        t_v = time.time() - t0

        def gen_audio(batches, bm=bm):
            for pdf in batches:
                out = []
                for v in pdf["media_id"]:
                    v = int(v)
                    segs = []
                    for s in range(12):
                        kk = (v % bm) * 16 + (v // bm) + s
                        c = 48 + (
                            int(hashlib.md5(str(kk).encode()).hexdigest()[:15], 16)
                            % 64
                        )
                        amp = round(2.0 ** ((c + 0.5) / 8.0) - 1.0)
                        segs.append(np.full(1600, amp, dtype=np.int16))
                    out.append(imaging.encode_wav(np.concatenate(segs), 16000))
                yield pd.DataFrame(
                    {"media_id": pdf["media_id"].astype("int64"),
                     "kind": "audio", "format": "wav", "payload": out}
                )

        media_a = ids.repartition(par, "media_id").mapInPandas(
            gen_audio, schema=mm.MEDIA_SCHEMA
        )
        t0 = time.time()
        na = audio_near_duplicates(media_a, min_shared=3).count()
        t_a = time.time() - t0

        print(
            f"n={n}: video_dedup {t_v:.1f}s ({1000*t_v/n:.3f} ms/item, "
            f"{nv} pairs) | audio_dedup {t_a:.1f}s "
            f"({1000*t_a/n:.3f} ms/item, {na} pairs)",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
