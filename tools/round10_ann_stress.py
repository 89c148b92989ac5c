"""Round-10 persisted-ANN stress: train-once/probe-later vs live
train-per-query at corpus scale.

Synthesizes N deterministic 64-dim vectors (JVM-side expressions, no
Python in the hot path), builds a PersistentANNIndex (IVF, mllib
trainer — the scale path; sq_kmeans is the oracle path), then measures
(a) one-time build cost, (b) the persisted probe for a 100-query batch
(reopen + routed-partition pruned scan), and (c) the live ivf_top_k
(retrains every call) for the same batch. The pitch of annstore.py is
(b) << (c) with (a) paid once.

Usage: python tools/round10_ann_stress.py [scales...]
"""

import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from codd_spark.operators.annstore import PersistentANNIndex
from codd_spark.operators.similarity import ivf_top_k
from codd_spark.session import get_spark


def synth_vectors(spark, n: int):
    """(vec_id, embedding): deterministic pseudo-random float vectors —
    64 xxhash64-derived dims scaled to [-1, 1), clustered structure via
    a per-id bucket offset so IVF lists are non-degenerate."""
    dims = F.array(
        *[
            (
                (F.xxhash64(F.col("vec_id"), F.lit(d)) % 1000000) / 500000.0
                - 1.0
                + (F.col("vec_id") % 32 == d % 32).cast("double") * 2.0
            ).cast("float")
            for d in range(64)
        ]
    )
    return spark.range(n).select(
        F.col("id").alias("vec_id"), dims.alias("embedding")
    )


def main():
    scales = [int(x) for x in sys.argv[1:]] or [60_000, 600_000]
    spark = get_spark(
        app_name="r10-ann-stress", cpus="32", shuffle_partitions=32,
        extra_conf={"spark.sql.adaptive.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    n_lists, n_probe, kq = 64, 4, 100
    for n in scales:
        emb = synth_vectors(spark, n).localCheckpoint(eager=True)
        queries = emb.filter(f"vec_id % {n // kq} = 0").select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
        ).localCheckpoint(eager=True)
        d = tempfile.mkdtemp(prefix="ann_stress_")
        shutil.rmtree(d)

        t0 = time.time()
        PersistentANNIndex.build_ivf(
            spark, emb, d, n_lists=n_lists, trainer="mllib"
        )
        t_build = time.time() - t0

        idx = PersistentANNIndex.open(spark, d)
        # warm + two timed probes (min)
        idx.top_k(queries, k=10, n_probe=n_probe).count()
        probes = []
        for _ in range(2):
            t0 = time.time()
            idx.top_k(queries, k=10, n_probe=n_probe).count()
            probes.append(time.time() - t0)
        t_probe = min(probes)

        t0 = time.time()
        ivf_top_k(
            emb, queries, k=10, n_lists=n_lists, n_probe=n_probe,
            trainer="mllib",
        ).count()
        t_live = time.time() - t0

        print(
            f"n={n}: build {t_build:.1f}s (once) | persisted probe "
            f"{t_probe:.2f}s /{kq}q = {1000*t_probe/kq:.1f} ms/q | "
            f"live train+probe {t_live:.1f}s = {t_live/max(t_probe,1e-9):.1f}x "
            f"the persisted probe",
            flush=True,
        )
        shutil.rmtree(d, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
