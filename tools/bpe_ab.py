"""A/B: distributed BPE merge loop, full-recount (r5) vs delta (r6).

Both paths forced distributed (driver_vocab_threshold=0) on the sf
documents table; merges must be IDENTICAL; wall-clock per path printed.
Usage: python tools/bpe_ab.py [sf_dir] [n_merges]
"""
import sys, time, os
sys.path.insert(0, "/root/repo")

def full_recount_train(df, text_col, n_merges, min_pair_count=2, checkpoint_every=8):
    from pyspark.sql import functions as F
    from codd_spark.operators.tokenize import _word_freq, _symbolize, _pair_counts, _merge_fold
    syms = _symbolize(_word_freq(df, text_col)).localCheckpoint(eager=False)
    merges = []
    for step in range(1, n_merges + 1):
        t0 = time.time()
        best = _pair_counts(syms).orderBy(F.desc("cnt"), "l", "r").limit(1).collect()
        if not best or best[0]["cnt"] < min_pair_count:
            break
        l, r, cnt = best[0]["l"], best[0]["r"], int(best[0]["cnt"])
        merges.append((step, l, r, cnt))
        syms = syms.select(_merge_fold(F.col("syms"), l, r).alias("syms"), "freq")
        if step % checkpoint_every == 0:
            syms = syms.localCheckpoint(eager=False)
        print(f"  old step {step}: {time.time()-t0:.1f}s", flush=True)
    return merges

def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    from codd_spark.session import get_spark
    from codd_spark.sources.readers import read_table
    from codd_spark.operators.tokenize import bpe_train
    spark = get_spark(app_name="bpe-ab", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"),
                      shuffle_partitions=32)
    docs = read_table(spark, sf_dir, "documents")
    n_words = docs.selectExpr("explode(split(text, '\\\\s+')) w").where("w != ''").select("w").distinct().count()
    print(f"vocab={n_words} distinct words, n_merges={n_merges}")
    # warm JVM/codegen
    docs.count()
    t0 = time.time()
    m_old = full_recount_train(docs, "text", n_merges)
    t_old = time.time() - t0
    t0 = time.time()
    m_new = bpe_train(docs, "text", n_merges=n_merges, driver_vocab_threshold=0)
    t_new = time.time() - t0
    assert m_old == m_new, f"MERGE MISMATCH:\n{m_old}\n{m_new}"
    print(f"identical merges ({len(m_new)}); full-recount {t_old:.1f}s vs delta {t_new:.1f}s ({t_old/t_new:.2f}x)")
    spark.stop()

if __name__ == "__main__":
    main()
