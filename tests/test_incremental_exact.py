"""IncrementalExactDeduplicator (dedup.py): the exact-key member of the
incremental family — arrival-order URL/content dedup. Contracts: one
batch == min-id-per-key snapshot dedup; across batches earlier-kept
wins; NULL keys always pass and never enter state; persistent state
survives a reopen (.open) and rejects foreign/mismatched state;
sequential arrivals == one-shot on the union when keys never straddle
batches AND == greedy arrival semantics when they do."""

import pytest
from pyspark.sql import functions as F

from codd_spark.operators.dedup import IncrementalExactDeduplicator


def _rows(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, url string")


def test_one_batch_equals_snapshot_dedup(spark):
    d = IncrementalExactDeduplicator(spark, key_col="url")
    batch = _rows(
        spark,
        [(3, "a"), (1, "a"), (2, "b"), (7, "b"), (5, "c"), (9, None), (10, None)],
    )
    kept = sorted(r.doc_id for r in d.add_batch(batch).collect())
    # min id per key + every NULL-key row
    assert kept == [1, 2, 5, 9, 10]
    assert d.n_kept == 3  # NULL rows never enter state


def test_arrival_order_earlier_kept_wins(spark):
    d = IncrementalExactDeduplicator(spark, key_col="url")
    d.add_batch(_rows(spark, [(1, "a"), (2, "b")]))
    kept2 = sorted(
        r.doc_id
        for r in d.add_batch(
            _rows(spark, [(0, "a"), (3, "c"), (4, "b"), (5, "c")])
        ).collect()
    )
    # id 0 loses to the EARLIER-kept id 1 despite being smaller
    assert kept2 == [3]
    assert d.n_kept == 3


def test_default_key_is_normalized_text(spark):
    d = IncrementalExactDeduplicator(spark)
    batch = spark.createDataFrame(
        [(1, "Hello  world"), (2, "hello world"), (3, "OTHER"), (4, None)],
        "doc_id long, text string",
    )
    kept = sorted(r.doc_id for r in d.add_batch(batch).collect())
    assert kept == [1, 3, 4]


def test_sequential_equals_one_shot_and_greedy(spark):
    rows = [(i, f"u{i % 7}") for i in range(30)]
    one = IncrementalExactDeduplicator(spark, key_col="url")
    kept_one = sorted(
        r.doc_id for r in one.add_batch(_rows(spark, rows)).collect()
    )
    seq = IncrementalExactDeduplicator(spark, key_col="url")
    kept_seq = []
    for lo in range(0, 30, 10):
        kept_seq += [
            r.doc_id
            for r in seq.add_batch(_rows(spark, rows[lo : lo + 10])).collect()
        ]
    # exact-key dedup is order-insensitive in the KEEPER SET SIZE and,
    # because ids arrive in increasing order here, in the ids too
    assert sorted(kept_seq) == kept_one == list(range(7))


def test_seed_installs_kept_corpus(spark):
    seed = _rows(spark, [(1, "a"), (2, "b")])
    d = IncrementalExactDeduplicator(spark, key_col="url", seed=seed)
    assert d.n_kept == 2
    kept = sorted(
        r.doc_id for r in d.add_batch(_rows(spark, [(5, "a"), (6, "z")])).collect()
    )
    assert kept == [6]


def test_persistent_state_and_reopen(spark, tmp_path):
    sd = str(tmp_path / "exact_state")
    d = IncrementalExactDeduplicator(spark, key_col="url", state_dir=sd)
    d.add_batch(_rows(spark, [(1, "a"), (2, "b")]))
    del d

    back = IncrementalExactDeduplicator.open(spark, sd)
    assert back.n_kept == 2
    assert back.key_col == "url"
    kept = sorted(
        r.doc_id
        for r in back.add_batch(_rows(spark, [(3, "a"), (4, "c")])).collect()
    )
    assert kept == [4]
    assert back.n_kept == 3

    # a second reopen still sees everything
    again = IncrementalExactDeduplicator.open(spark, sd)
    assert again.n_kept == 3


def test_open_rejects_foreign_state(spark, tmp_path):
    from codd_spark.operators.dedup import IncrementalDeduplicator

    sd = str(tmp_path / "fuzzy_state")
    fz = IncrementalDeduplicator(spark, state_dir=sd)
    fz.add_batch(
        spark.createDataFrame(
            [(1, "some document text here")], "doc_id long, text string"
        )
    )
    with pytest.raises(ValueError, match="exact_dedup"):
        IncrementalExactDeduplicator.open(spark, sd)


def test_open_missing_dir(spark, tmp_path):
    with pytest.raises(ValueError, match="no incremental exact-dedup state"):
        IncrementalExactDeduplicator.open(spark, str(tmp_path / "nope"))


def test_seed_on_resumed_state_rejected(spark, tmp_path):
    sd = str(tmp_path / "exact_state")
    d = IncrementalExactDeduplicator(spark, key_col="url", state_dir=sd)
    d.add_batch(_rows(spark, [(1, "a")]))
    with pytest.raises(ValueError, match="FRESH"):
        IncrementalExactDeduplicator(
            spark, key_col="url", state_dir=sd, seed=_rows(spark, [(9, "z")])
        )


def test_memory_equals_persistent(spark, tmp_path):
    rows1 = [(i, f"u{i % 11}") for i in range(40)]
    rows2 = [(i + 100, f"u{i % 17}") for i in range(40)]
    mem = IncrementalExactDeduplicator(spark, key_col="url")
    per = IncrementalExactDeduplicator(
        spark, key_col="url", state_dir=str(tmp_path / "s")
    )
    for rows in (rows1, rows2):
        km = sorted(r.doc_id for r in mem.add_batch(_rows(spark, rows)).collect())
        kp = sorted(r.doc_id for r in per.add_batch(_rows(spark, rows)).collect())
        assert km == kp
    assert mem.n_kept == per.n_kept


def test_streaming_foreach_batch_drives_exact_dedup(spark, tmp_path):
    """File-source stream -> foreachBatch(IncrementalExactDeduplicator):
    the generic arrival adapter drives the exact-key member too, and the
    accumulated kept KEY set is batching-independent."""
    from codd_spark.streaming.structured import (
        incremental_dedup_batch_fn,
        stream_from_directory,
    )

    schema = "doc_id LONG, url STRING"
    d = str(tmp_path / "urls_stream")
    spark.createDataFrame(
        [(1, "u1"), (2, "u2")], schema
    ).coalesce(1).write.mode("append").parquet(d)
    spark.createDataFrame(
        [(10, "u1"), (11, "u3")], schema
    ).coalesce(1).write.mode("append").parquet(d)

    dd = IncrementalExactDeduplicator(spark, key_col="url")
    kept = []

    def sink(df, epoch_id):
        kept.extend(r.doc_id for r in df.collect())

    sdf = stream_from_directory(spark, d, schema)
    q = sdf.writeStream.foreachBatch(incremental_dedup_batch_fn(dd, sink)).start()
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(120)

    # u1's duplicate is dropped whatever micro-batching the source picked
    assert sorted(kept) == [1, 2, 11]
    assert dd.n_kept == 3


def test_canonical_url_composition(spark):
    """The intended pipeline: canonicalize, then exact-dedup on the
    canonical key — messy refetch variants of one page collapse."""
    from codd_spark.functions.url import canonical_url

    d = IncrementalExactDeduplicator(spark, key_col="canon")
    b = _rows(
        spark,
        [
            (1, "HTTPS://WWW.Example.COM/a/?utm_source=x"),
            (2, "https://example.com/a"),
            (3, "https://example.com/b"),
        ],
    ).withColumn("canon", canonical_url(F.col("url")))
    kept = sorted(r.doc_id for r in d.add_batch(b).collect())
    assert kept == [1, 3]
