"""IncrementalDeduplicator: arrival-order fuzzy dedup with persistent
MinHash state.

Contract under test:
- ONE batch == ``fuzzy_dedup`` keepers exactly (same pairs, same
  closure, same min-id keeper election);
- chunked arrival == one-shot when batches respect cluster boundaries
  (the only divergence any one-pass dedup can have is a chain SPLIT
  across batches);
- a later arrival that near-duplicates an already-kept document is
  dropped; novel documents are kept; seeding installs an existing kept
  corpus as state.
"""

import pytest
from pyspark.sql import functions as F

from codd_spark.operators.dedup import IncrementalDeduplicator, fuzzy_dedup

PARAMS = dict(num_hashes=120, bands=20, shingle_k=5, threshold=0.5)


@pytest.fixture(scope="module")
def docs(spark):
    return (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .localCheckpoint(eager=True)
    )


def _keeper_ids(docs):
    return {
        r.doc_id
        for r in fuzzy_dedup(docs, threshold=PARAMS["threshold"]).filter(
            "is_keeper"
        ).collect()
    }


def test_one_batch_equals_fuzzy_dedup(spark, docs):
    dd = IncrementalDeduplicator(spark, **PARAMS)
    kept = {r.doc_id for r in dd.add_batch(docs).collect()}
    assert kept == _keeper_ids(docs)
    assert dd.n_kept == len(kept)


def test_cluster_respecting_chunks_equal_one_shot(spark, docs):
    """Split the corpus into two batches along CLUSTER boundaries (every
    near-dup cluster arrives whole): incremental == one-shot keepers."""
    clusters = fuzzy_dedup(docs, threshold=PARAMS["threshold"])
    assign = clusters.select(
        "doc_id", (F.col("cluster_id") % 2 == 0).alias("first_half")
    )
    tagged = docs.join(assign, "doc_id").localCheckpoint(eager=True)
    b1 = tagged.filter("first_half").select("doc_id", "text")
    b2 = tagged.filter("NOT first_half").select("doc_id", "text")
    assert b1.count() > 0 and b2.count() > 0

    dd = IncrementalDeduplicator(spark, **PARAMS)
    kept = {r.doc_id for r in dd.add_batch(b1).collect()}
    kept |= {r.doc_id for r in dd.add_batch(b2).collect()}
    assert kept == _keeper_ids(docs)


def test_later_near_dup_dropped_novel_kept(spark):
    base = [
        (1, "the quick brown fox jumps over the lazy dog tonight again"),
        (2, "completely unrelated text about spark shuffle partitions here"),
    ]
    arriving = [
        # near-copy of doc 1 (one word changed)
        (10, "the quick brown fox jumps over the lazy cat tonight again"),
        # novel
        (11, "fresh document with entirely new vocabulary and content"),
    ]
    schema = "doc_id LONG, text STRING"
    dd = IncrementalDeduplicator(spark, **PARAMS)
    first = {r.doc_id for r in dd.add_batch(spark.createDataFrame(base, schema)).collect()}
    assert first == {1, 2}
    second = {
        r.doc_id
        for r in dd.add_batch(spark.createDataFrame(arriving, schema)).collect()
    }
    assert second == {11}
    assert dd.n_kept == 3


def test_seed_state(spark):
    schema = "doc_id LONG, text STRING"
    seed = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog tonight again")], schema
    )
    batch = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy cat tonight again"),
            (11, "fresh document with entirely new vocabulary and content"),
        ],
        schema,
    )
    dd = IncrementalDeduplicator(spark, seed=seed, **PARAMS)
    assert dd.n_kept == 1
    kept = {r.doc_id for r in dd.add_batch(batch).collect()}
    assert kept == {11}


def test_within_batch_closure(spark):
    """Chained near-dups arriving TOGETHER collapse to one survivor
    (the closure property pairwise streaming dedup lacks)."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu"
    a = base
    b = base.replace("mu", "nu")          # near-dup of a
    c = b.replace("alpha", "omega")       # near-dup of b (chains to a)
    dd = IncrementalDeduplicator(spark, **PARAMS)
    kept = {
        r.doc_id
        for r in dd.add_batch(
            spark.createDataFrame(
                [(1, a), (2, b), (3, c)], "doc_id LONG, text STRING"
            )
        ).collect()
    }
    # all three chain into one cluster at t=0.5 -> min id survives
    assert kept == {1}


def test_streaming_foreach_batch_drives_dedup(spark, tmp_path):
    """File-source stream -> foreachBatch(IncrementalDeduplicator):
    accumulated kept set equals sequential add_batch over the same
    chunks."""
    from codd_spark.streaming.structured import (
        incremental_dedup_batch_fn,
        stream_from_directory,
    )

    schema = "doc_id LONG, text STRING"
    chunk1 = [
        (1, "the quick brown fox jumps over the lazy dog tonight again"),
        (2, "completely unrelated text about spark shuffle partitions here"),
    ]
    chunk2 = [
        (10, "the quick brown fox jumps over the lazy cat tonight again"),
        (11, "fresh document with entirely new vocabulary and content"),
    ]
    d = str(tmp_path / "docs_stream")
    spark.createDataFrame(chunk1, schema).coalesce(1).write.mode("append").parquet(d)
    spark.createDataFrame(chunk2, schema).coalesce(1).write.mode("append").parquet(d)

    dd = IncrementalDeduplicator(spark, **PARAMS)
    kept = []

    def sink(df, epoch_id):
        kept.extend(r.doc_id for r in df.collect())

    sdf = stream_from_directory(spark, d, schema)
    q = sdf.writeStream.foreachBatch(incremental_dedup_batch_fn(dd, sink)).start()
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(120)

    # doc 10 is a near-dup of kept doc 1 regardless of which micro-batch
    # boundary the file source picked; everything else is novel
    assert sorted(kept) == [1, 2, 11]
    assert dd.n_kept == 3


def test_no_two_kept_docs_are_near_dups_any_batching(spark):
    """Batching-independent invariant: whatever the batch split, the
    FINAL kept set contains no near-duplicate pair. (Within a batch the
    closure elects one keeper per component — representatives of
    different components share no edge; across batches a keeper survives
    only if it matches nothing already kept.)"""
    from codd_spark.operators.dedup import minhash_near_duplicates

    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
             "theta", "iota", "kappa"]
    import random

    rng = random.Random(31)
    docs = []
    base_docs = []
    for i in range(12):
        base = " ".join(rng.choice(words) for _ in range(12))
        base_docs.append(base)
        docs.append((i, base))
    # planted near-dups of earlier docs
    for j in range(12, 20):
        src = base_docs[rng.randrange(len(base_docs))]
        toks = src.split()
        toks[rng.randrange(len(toks))] = rng.choice(words)
        docs.append((j, " ".join(toks)))

    schema = "doc_id LONG, text STRING"
    for split in ([5, 15], [10, 5, 5], [1] * 20, [20]):
        dd = IncrementalDeduplicator(spark, **PARAMS)
        kept_rows = []
        start = 0
        for size in split:
            batch = spark.createDataFrame(docs[start : start + size], schema)
            kept_rows.extend(dd.add_batch(batch).collect())
            start += size
        kept_df = spark.createDataFrame(kept_rows, schema)
        n_pairs = minhash_near_duplicates(
            kept_df, "doc_id", "text", **{k: v for k, v in PARAMS.items()}
        ).count()
        assert n_pairs == 0, f"near-dup pair among kept docs (split={split})"
