"""Incremental decontamination: a new eval set arriving must cost
O(batch), not O(corpus) — the corpus's shingle/signature/bucket tables
are prepared once and reused across checks.

Matches the reference's IVM philosophy applied to the LLM-pipeline
extension operators: the expensive derived state is maintained, not
recomputed (cf. core/src/database/instance.rs stable-set reuse)."""

import pytest
from pyspark.sql import functions as F

from codd_spark.operators.dedup import (
    IncrementalDecontaminator,
    cross_near_duplicates,
)


def _text(i):
    # per-doc-unique vocabulary: cross-doc jaccard ~0, planted copies = 1.0
    return " ".join(f"w{i}x{j}q" for j in range(20))


@pytest.fixture()
def corpus(spark):
    rows = [(i, _text(i)) for i in range(60)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _batch(spark, ids):
    # each batch doc is a verbatim copy of corpus doc i's content
    rows = [(900 + j, _text(i)) for j, i in enumerate(ids)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_incremental_checks_match_batch_pipeline(spark, corpus):
    """Each arriving batch, checked against the pre-built corpus tables,
    finds exactly the pairs the one-shot cross pipeline finds."""
    batch1 = _batch(spark, [3, 17])
    batch2 = _batch(spark, [42])

    with IncrementalDecontaminator(corpus, threshold=0.5) as dec:
        for batch in (batch1, batch2):
            got = sorted(
                (r.id_l, r.id_r, r.jaccard) for r in dec.check(batch).collect()
            )
            ref = cross_near_duplicates(corpus, batch, threshold=0.5)
            want = sorted((r.id_l, r.id_r, r.jaccard) for r in ref.collect())
            ref.release_cache()
            assert got == want
            assert got, "sanity: the planted near-dups must be found"
        # dirty_ids: the corpus docs matched by a batch
        dirty = {r.doc_id for r in dec.dirty_ids(batch1).collect()}
        assert dirty == {3, 17}


def test_check_reuses_cached_corpus_tables(spark, corpus):
    """O(new) contract: after the first check materializes the corpus
    caches, subsequent check() plans read the corpus side from
    InMemoryTableScan — the corpus is never re-shingled/re-signed."""
    dec = IncrementalDecontaminator(corpus, threshold=0.5)
    try:
        dec.check(_batch(spark, [1])).collect()  # materialize corpus caches
        out = dec.check(_batch(spark, [5, 9]))
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("InMemoryTableScan") >= 2, plan  # buckets + shingles
        # the probe joins stay shuffle-pinned (corpus side is unbounded)
        assert "BroadcastHashJoin" not in plan.split("InMemoryTableScan")[0]
        out.release_cache()
    finally:
        dec.close()


def test_close_is_idempotent_and_releases(spark, corpus):
    dec = IncrementalDecontaminator(corpus)
    dec.check(_batch(spark, [2])).collect()
    assert dec._buckets.is_cached and dec._shingled.is_cached
    dec.close()
    dec.close()
    assert not dec._buckets.is_cached and not dec._shingled.is_cached


def test_streaming_semantic_decontam_equals_batch(spark, tmp_path):
    """The semantic arrival gate composed with Structured Streaming
    (round 12): arrivals land as parquet files in a watched directory;
    each availableNow run (the restart-per-crawl shape — deterministic
    batch order, unlike a single multi-file trigger) probes the growing
    persisted ANN index in foreachBatch and admits survivors. The kept
    sets must equal the batch-mode add_batch sequence exactly —
    earlier-kept-wins survives the streaming wiring."""
    from codd_spark.operators.annstore import IncrementalSemanticDecontaminator

    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select("vec_id", "embedding")
        .localCheckpoint(eager=True)
    )
    corpus = emb.filter("vec_id % 2 = 0")
    b1 = emb.filter("vec_id % 4 = 1")
    b2 = emb.filter("vec_id % 4 = 3")

    def ids(df):
        return {r.vec_id for r in df.select("vec_id").collect()}

    # batch-mode reference run
    ref = IncrementalSemanticDecontaminator(
        spark, str(tmp_path / "ref"), corpus=corpus,
        threshold=0.45, n_probe=3, n_lists=8,
    )
    want = [ids(ref.add_batch(b1)), ids(ref.add_batch(b2))]

    # streaming run: same gate, arrivals through a file-source stream
    dec = IncrementalSemanticDecontaminator(
        spark, str(tmp_path / "stream"), corpus=corpus,
        threshold=0.45, n_probe=3, n_lists=8,
    )
    arrivals = tmp_path / "arrivals"
    ckpt = str(tmp_path / "ckpt")
    got = []

    def run_available(expect_batches):
        def fb(df, epoch_id):
            if df.isEmpty():
                return
            got.append(ids(dec.add_batch(df)))

        q = (
            spark.readStream.schema(emb.schema)
            .parquet(str(arrivals))
            .writeStream.foreachBatch(fb)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        assert len(got) == expect_batches

    b1.coalesce(1).write.mode("append").parquet(str(arrivals))
    run_available(1)
    b2.coalesce(1).write.mode("append").parquet(str(arrivals))
    run_available(2)  # the source checkpoint replays ONLY the new file

    assert got == want
    assert dec.index.gens == ref.index.gens
