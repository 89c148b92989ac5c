"""Long-horizon semantic-gate stress (VERDICT r12 item 7): build the
persisted IVF index on one slice of the embeddings corpus, then feed
64 sequential arrivals through IncrementalSemanticDecontaminator ON
DEFAULTS (compact_every=8 auto-compaction). The pin: per-arrival wall
clock stays within ~1.2x of the single-generation floor across the
whole run — the generation creep the r12 16-arrival stress measured
(~18% at 16 uncompacted generations) must be bounded by the default
knob, not by caller-scheduled maintenance.

Usage: python tools/semantic_arrival_stress.py [sf_dir] [n_arrivals]

Caller hygiene (BASELINE.md r12): the returned checkpointed handle is
released and gc'd between arrivals, else old-gen checkpoint blocks
inflate later arrivals regardless of the gate's own behavior.
"""

import gc
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from codd_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_arrivals = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    spark = get_spark(cpus="32", shuffle_partitions=32)

    from codd_spark.operators.annstore import (
        IncrementalSemanticDecontaminator,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    n_slices = n_arrivals + 1
    total = emb.count()
    print(f"corpus {total} vectors, {n_arrivals} arrivals "
          f"(~{total // n_slices}/arrival), defaults (compact_every=8)",
          flush=True)

    d = tempfile.mkdtemp(prefix="codd_sem_stress_")
    shutil.rmtree(d)
    dec = IncrementalSemanticDecontaminator(
        spark, d, corpus=emb.filter(f"vec_id % {n_slices} = 0"),
        threshold=0.45, n_probe=3, n_lists=16,
    )
    walls, gens_after, kept_total = [], [], 0
    for a in range(1, n_arrivals + 1):
        batch = emb.filter(f"vec_id % {n_slices} = {a}")
        t0 = time.time()
        kept = dec.add_batch(batch)
        kept_total += kept.count()
        walls.append(time.time() - t0)
        gens_after.append(len(dec.index.gens))
        del kept, batch
        gc.collect()
        if a % 8 == 0:
            print(f"  arrival {a}: last8 "
                  f"{[round(w, 2) for w in walls[-8:]]} "
                  f"gens={gens_after[-8:]}", flush=True)

    # fold arrivals (gens_after == 1) carry the periodic O(state)
    # consolidation — report them separately. The pin compares the
    # AMORTIZED per-arrival cost (folds included) against the
    # single-generation floor: the post-warmup median of arrivals that
    # probed one committed generation (gens_after == 2). The first 8
    # arrivals are JIT/session warmup and are excluded from the floor.
    import statistics as st

    post = list(zip(walls, gens_after))[8:]
    floor_pool = [w for w, g in post if g == 2]
    fold = [w for w, g in post if g == 1]
    steady = [w for w, g in post if g != 1]
    floor = st.median(floor_pool)
    amortized = st.mean([w for w, _ in post])
    print(f"kept_total={kept_total}")
    print(f"walls={[round(w, 2) for w in walls]}")
    print(f"gens_after={gens_after}")
    for g in range(2, 8):
        pool = [w for w, gg in post if gg == g]
        if pool:
            print(f"  gens={g}: median {st.median(pool):.2f}s (n={len(pool)})")
    print(
        f"floor(single-gen post-warmup median)={floor:.2f}s "
        f"median_steady={st.median(steady):.2f}s "
        f"({st.median(steady) / floor:.3f}x) "
        f"mean_fold={st.mean(fold):.2f}s (n={len(fold)}) "
        f"amortized={amortized:.2f}s "
        f"amortized/floor={amortized / floor:.3f} (pin: ~1.2)",
        flush=True,
    )
    shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
