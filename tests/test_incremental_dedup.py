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


# ---------------------------------------------------------------------------
# persistent (band,h)-bucketed parquet state (VERDICT r5 item 2)
# ---------------------------------------------------------------------------

def _simulate_restart(spark, state_dir):
    """Drop the catalog entries (external tables: data survives) — what a
    brand-new SparkSession would look like before reopening."""
    import hashlib
    import os

    tag = hashlib.md5(os.path.abspath(state_dir).encode()).hexdigest()[:12]
    spark.sql(f"DROP TABLE IF EXISTS inc_minhash_{tag}_buckets")
    spark.sql(f"DROP TABLE IF EXISTS inc_minhash_{tag}_shingles")


def test_persistent_restart_equals_uninterrupted(spark, docs, tmp_path):
    """Kill-and-reopen: batches 1+2, 'restart' (catalog dropped, state
    reopened from the directory alone), batch 3 — kept set must equal
    the uninterrupted in-memory run batch for batch."""
    d = str(tmp_path / "ded_state")
    half = docs.count() // 3
    b1 = docs.filter(F.col("doc_id") < half)
    b2 = docs.filter((F.col("doc_id") >= half) & (F.col("doc_id") < 2 * half))
    b3 = docs.filter(F.col("doc_id") >= 2 * half)

    mem = IncrementalDeduplicator(spark, **PARAMS)
    want = [
        {r.doc_id for r in mem.add_batch(b).collect()} for b in (b1, b2, b3)
    ]

    dd = IncrementalDeduplicator(spark, state_dir=d, **PARAMS)
    got1 = {r.doc_id for r in dd.add_batch(b1).collect()}
    got2 = {r.doc_id for r in dd.add_batch(b2).collect()}
    n_before = dd.n_kept
    del dd
    _simulate_restart(spark, d)

    dd2 = IncrementalDeduplicator.open(spark, d)
    assert dd2.n_kept == n_before
    got3 = {r.doc_id for r in dd2.add_batch(b3).collect()}
    assert [got1, got2, got3] == want
    assert dd2.n_kept == sum(len(w) for w in want)


def test_persistent_crash_between_writes_is_invisible(spark, docs, tmp_path):
    """Orphan rows from an uncommitted generation (a crash between the
    buckets and shingles inserts) must never surface: the next open
    DELETES generations above committed (ADVICE r7 — numbering past them
    would let a later commit adopt them into the read range), so the
    orphan stays invisible even after further arrivals commit."""
    d = str(tmp_path / "crash_state")
    b1 = docs.filter("doc_id < 150")
    b2 = docs.filter("doc_id >= 150 AND doc_id < 300")

    dd = IncrementalDeduplicator(spark, state_dir=d, **PARAMS)
    kept1 = {r.doc_id for r in dd.add_batch(b1).collect()}
    committed = dd._state.committed

    # simulate a crash mid-append: bucket rows land at gen committed+1,
    # shingle rows never make it, manifest never commits
    spark.sql(
        f"INSERT INTO {dd._state._tb} "
        f"SELECT 999999 AS id, 0 AS band, 42 AS h, {committed + 1} AS gen"
    )
    del dd
    _simulate_restart(spark, d)

    dd2 = IncrementalDeduplicator.open(spark, d)
    assert dd2._state.committed == committed
    # orphan is invisible to reads
    assert dd2._kept_buckets.filter("id = 999999").count() == 0
    # orphan dirs are deleted on open, so the next arrival can reuse the
    # generation number and commit cleanly
    kept2 = {r.doc_id for r in dd2.add_batch(b2).collect()}
    assert dd2._state.committed == committed + 1
    # the adoption hazard: even though committed now covers the orphan's
    # old gen number, the orphan row must NOT have been adopted
    assert dd2._kept_buckets.filter("id = 999999").count() == 0

    mem = IncrementalDeduplicator(spark, **PARAMS)
    want1 = {r.doc_id for r in mem.add_batch(b1).collect()}
    want2 = {r.doc_id for r in mem.add_batch(b2).collect()}
    assert (kept1, kept2) == (want1, want2)


def test_persistent_probe_is_zero_exchange_on_state_side(spark, docs, tmp_path):
    """The whole point of bucketed state: the cross-probe join's state
    side reads Bucketed: true with no Exchange — only the O(batch) side
    shuffles."""
    d = str(tmp_path / "plan_state")
    dd = IncrementalDeduplicator(spark, state_dir=d, **PARAMS)
    dd.add_batch(docs.filter("doc_id < 200"))

    probe = spark.createDataFrame(
        [(7, 3, 123456789)], "id LONG, band INT, h LONG"
    )
    j = dd._kept_buckets.select(
        "band", "h", F.col("id").alias("id_l")
    ).join(
        probe.select("band", "h", F.col("id").alias("id_r")).hint("shuffle_merge"),
        on=["band", "h"],
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "Bucketed: true" in plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_persistent_state_rejects_param_drift(spark, docs, tmp_path):
    d = str(tmp_path / "drift_state")
    IncrementalDeduplicator(spark, state_dir=d, **PARAMS)
    bad = dict(PARAMS, shingle_k=7)
    with pytest.raises(ValueError, match="params"):
        IncrementalDeduplicator(spark, state_dir=d, **bad)


def test_persistent_decontaminator_reopen_skips_prep(spark, docs, tmp_path):
    """Prepare-once decontamination state: a reopened instance (corpus
    never touched again) flags the same pairs as the cached in-memory
    preparation."""
    from codd_spark.operators.dedup import IncrementalDecontaminator

    d = str(tmp_path / "dec_state")
    corpus = docs.filter("doc_id < 300")
    batch = docs.filter("doc_id >= 300 AND doc_id < 360")

    mem = IncrementalDecontaminator(corpus, threshold=0.5)
    want = {(r.id_l, r.id_r) for r in mem.check(batch).collect()}
    mem.close()

    dec = IncrementalDecontaminator(corpus, threshold=0.5, state_dir=d)
    got = {(r.id_l, r.id_r) for r in dec.check(batch).collect()}
    assert got == want
    del dec
    _simulate_restart(spark, d)

    dec2 = IncrementalDecontaminator.open(spark, d)
    got2 = {(r.id_l, r.id_r) for r in dec2.check(batch).collect()}
    assert got2 == want


def _parquet_files(state_dir):
    import glob
    import os

    return sorted(
        f
        for f in glob.glob(os.path.join(state_dir, "**", "*"), recursive=True)
        if os.path.isfile(f) and not f.endswith((".json", ".crc", "_SUCCESS"))
        and "manifest" not in os.path.basename(f)
    )


def test_compact_bounds_files_and_preserves_results(spark, docs, tmp_path):
    """Many arrivals -> many gen directories; compact() must consolidate
    to ONE generation per table (file count bounded by n_buckets), keep
    the kept-set identical, and keep accepting arrivals afterwards."""
    d = str(tmp_path / "compact_state")
    dd = IncrementalDeduplicator(spark, state_dir=d, state_buckets=4, **PARAMS)
    batches = [
        docs.filter(f"doc_id >= {i * 50} AND doc_id < {(i + 1) * 50}")
        for i in range(6)
    ]
    kept = set()
    for b in batches[:5]:
        kept |= {r.doc_id for r in dd.add_batch(b).collect()}
    files_before = len(_parquet_files(d))
    gens_before = {k for _t, _p, k in dd._state._gen_dirs()}
    assert gens_before == {0, 1, 2, 3, 4}  # one generation per arrival

    out = dd.compact()
    assert out["generation"] is not None and out["files_swept"] > 0
    files_after = len(_parquet_files(d))
    assert files_after < files_before
    # the consolidated generation is bucket-aligned on write: EXACTLY
    # n_buckets files per table, independent of how many generations
    # were merged (r8 — unaligned write tasks used to emit a file per
    # bucket they touched, growing the post-compact count with state)
    assert files_after <= 2 * 4  # two tables x state_buckets=4
    # exactly one generation directory left per table
    gens = {}
    for t, _p, k in dd._state._gen_dirs():
        gens.setdefault(t, set()).add(k)
    assert all(len(v) == 1 for v in gens.values()), gens
    # state contents unchanged: re-adding the same docs drops them all
    readd = docs.filter("doc_id < 250")
    assert dd.add_batch(readd).count() == 0
    # and a novel arrival still works after compaction
    kept6 = {r.doc_id for r in dd.add_batch(batches[5]).collect()}

    mem = IncrementalDeduplicator(spark, **PARAMS)
    want = set()
    for b in batches[:5]:
        want |= {r.doc_id for r in mem.add_batch(b).collect()}
    mem.add_batch(readd)
    want6 = {r.doc_id for r in mem.add_batch(batches[5]).collect()}
    assert kept == want and kept6 == want6


def test_compact_crash_before_manifest_is_invisible(spark, docs, tmp_path):
    """A crash AFTER the consolidated inserts but BEFORE the manifest
    commit leaves the old committed window intact — the orphan copy is
    DELETED on the next open (an orphan merely numbered past would be
    adopted as soon as a later append commits a higher gen — ADVICE r7)."""
    d = str(tmp_path / "ccrash_state")
    dd = IncrementalDeduplicator(spark, state_dir=d, state_buckets=4, **PARAMS)
    dd.add_batch(docs.filter("doc_id < 100"))
    dd.add_batch(docs.filter("doc_id >= 100 AND doc_id < 200"))
    st = dd._state
    committed, floor = st.committed, st.floor
    n_rows = st.buckets().count()

    # simulate the crash: perform ONLY the consolidated inserts (the
    # first half of compact()), never the manifest commit
    g = st._next_gen
    st.buckets().withColumn("gen", F.lit(g).cast("long")).write.mode(
        "append"
    ).insertInto(st._tb)
    st.shingles().withColumn("gen", F.lit(g).cast("long")).write.mode(
        "append"
    ).insertInto(st._ts)
    del dd
    _simulate_restart(spark, d)

    dd2 = IncrementalDeduplicator.open(spark, d)
    st2 = dd2._state
    assert (st2.committed, st2.floor) == (committed, floor)
    assert st2.buckets().count() == n_rows  # orphan copy invisible
    # the orphan dirs are GONE, not just numbered past
    assert all(k <= committed for _t, _p, k in st2._gen_dirs())
    # a compact() after the aborted one still converges to one gen/table
    dd2.compact()
    gens = {}
    for t, _p, k in st2._gen_dirs():
        gens.setdefault(t, set()).add(k)
    assert all(len(v) == 1 for v in gens.values()), gens
    assert st2.buckets().count() == n_rows


def test_compact_crash_then_add_batch_does_not_adopt_orphan(
    spark, docs, tmp_path
):
    """The ADVICE r7 adoption scenario, pinned end-to-end: compact()
    crashes before its manifest commit (leaving a full orphan copy of
    the state), and the NEXT operation is an ordinary add_batch() — not
    another compact(). The orphan must not be pulled into the read
    window when that append commits a higher generation; the state row
    count must equal an uninterrupted run's, and dedup results must be
    unchanged."""
    d = str(tmp_path / "ccrash_adopt_state")
    dd = IncrementalDeduplicator(spark, state_dir=d, state_buckets=4, **PARAMS)
    kept = set()
    for lo in (0, 100):
        kept |= {
            r.doc_id
            for r in dd.add_batch(
                docs.filter(f"doc_id >= {lo} AND doc_id < {lo + 100}")
            ).collect()
        }
    st = dd._state
    n_rows_b, n_rows_s = st.buckets().count(), st.shingles().count()

    # simulated compact crash: inserts done, manifest never committed
    g = st._next_gen
    st.buckets().withColumn("gen", F.lit(g).cast("long")).write.mode(
        "append"
    ).insertInto(st._tb)
    st.shingles().withColumn("gen", F.lit(g).cast("long")).write.mode(
        "append"
    ).insertInto(st._ts)
    del dd
    _simulate_restart(spark, d)

    # resume with a plain arrival — the adoption hazard path
    dd2 = IncrementalDeduplicator.open(spark, d)
    got3 = {
        r.doc_id
        for r in dd2.add_batch(
            docs.filter("doc_id >= 200 AND doc_id < 250")
        ).collect()
    }

    mem = IncrementalDeduplicator(spark, **PARAMS)
    for lo in (0, 100):
        mem.add_batch(docs.filter(f"doc_id >= {lo} AND doc_id < {lo + 100}"))
    want3 = {
        r.doc_id
        for r in mem.add_batch(
            docs.filter("doc_id >= 200 AND doc_id < 250")
        ).collect()
    }
    assert got3 == want3
    st2 = dd2._state
    # no duplicated pre-crash rows: committed window == uninterrupted run
    batch3_b = (
        spark.table(st2._tb).filter(F.col("gen") == st2.committed).count()
    )
    batch3_s = (
        spark.table(st2._ts).filter(F.col("gen") == st2.committed).count()
    )
    assert st2.buckets().count() == n_rows_b + batch3_b
    assert st2.shingles().count() == n_rows_s + batch3_s
    # re-adding pre-crash docs still drops them all (state not corrupted)
    assert dd2.add_batch(docs.filter("doc_id < 200")).count() == 0


def test_state_dir_scheme_routing(spark, tmp_path):
    """r9: URI-scheme state dirs route through the Hadoop FileSystem
    backend (full lifecycle tests in test_statefs_hcfs.py). Schemes the
    JVM cannot resolve on this classpath must still fail loud at
    construction with guidance — not subtly later."""
    import pytest as _pt

    for uri in ("s3://bucket/state", "gs://b/s"):
        with _pt.raises(ValueError, match="Hadoop FileSystem"):
            IncrementalDeduplicator(spark, state_dir=uri, **PARAMS)
    # file:// is the local scheme — accepted and normalized to the
    # POSIX fast path (same on-disk format as a plain path)
    d = str(tmp_path / "file_scheme_state")
    dd = IncrementalDeduplicator(spark, state_dir="file://" + d, **PARAMS)
    assert dd._state.state_dir == d
    from codd_spark.sources.statefs import PosixStateFS

    assert isinstance(dd._state.fs, PosixStateFS)


def test_failed_append_quarantined_then_retry_clean(spark, docs, tmp_path):
    """In-process half of ADVICE r7: when append()'s SECOND insert fails
    (buckets landed, shingles didn't), the partial generation must be
    quarantined so a retried append cannot commit its rows alongside the
    partial ones."""
    d = str(tmp_path / "failret_state")
    dd = IncrementalDeduplicator(spark, state_dir=d, state_buckets=4, **PARAMS)
    dd.add_batch(docs.filter("doc_id < 100"))
    st = dd._state
    n_b, n_s = st.buckets().count(), st.shingles().count()

    good_b = st.buckets().limit(5)
    good_s = st.shingles().limit(5)
    # shingles frame whose execution throws AFTER the buckets insert
    bad_s = good_s.select(
        "id", F.array(F.expr("assert_true(false)").cast("long")).alias("sh")
    )
    import pytest as _pt

    with _pt.raises(Exception):
        st.append(good_b, bad_s)
    # partial generation quarantined: nothing above committed remains
    assert all(k <= st.committed for _t, _p, k in st._gen_dirs())
    assert st.buckets().count() == n_b and st.shingles().count() == n_s

    st.append(good_b, good_s)  # the retry
    assert st.buckets().count() == n_b + 5
    assert st.shingles().count() == n_s + 5


def test_compact_crash_before_sweep_self_heals_on_open(spark, docs, tmp_path):
    """A crash AFTER the manifest commit but BEFORE the directory sweep
    leaves stale (invisible) gen dirs — the next open sweeps them."""
    d = str(tmp_path / "csweep_state")
    dd = IncrementalDeduplicator(spark, state_dir=d, state_buckets=4, **PARAMS)
    dd.add_batch(docs.filter("doc_id < 100"))
    dd.add_batch(docs.filter("doc_id >= 100 AND doc_id < 200"))
    st = dd._state
    n_rows = st.buckets().count()

    # compact, then resurrect a stale dir to simulate the unswept crash
    import shutil

    stale_src = [(t, p, k) for t, p, k in st._gen_dirs()]
    dd.compact()
    # recreate a fake stale generation BELOW the floor
    import os

    fake = os.path.join(d, "buckets", "gen=0")
    if not os.path.isdir(fake):
        live = [p for t, p, k in st._gen_dirs() if "buckets" in p][0]
        shutil.copytree(live, fake)
        spark.sql(f"MSCK REPAIR TABLE {st._tb} SYNC PARTITIONS")
    del dd, stale_src
    _simulate_restart(spark, d)

    dd2 = IncrementalDeduplicator.open(spark, d)
    assert not os.path.isdir(fake)  # swept on open
    assert dd2._state.buckets().count() == n_rows


def test_probe_still_zero_exchange_after_compact(spark, docs, tmp_path):
    d = str(tmp_path / "plan2_state")
    dd = IncrementalDeduplicator(spark, state_dir=d, state_buckets=4, **PARAMS)
    dd.add_batch(docs.filter("doc_id < 100"))
    dd.add_batch(docs.filter("doc_id >= 100 AND doc_id < 200"))
    dd.compact()

    probe = spark.createDataFrame(
        [(7, 3, 123456789)], "id LONG, band INT, h LONG"
    )
    j = dd._kept_buckets.select(
        "band", "h", F.col("id").alias("id_l")
    ).join(
        probe.select("band", "h", F.col("id").alias("id_r")).hint("shuffle_merge"),
        on=["band", "h"],
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "Bucketed: true" in plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_memory_mode_compaction_preserves_arrival_order_semantics(spark):
    """r10: in-memory state is a list of per-arrival checkpointed delta
    parts, consolidated every _MEMORY_COMPACT_PARTS arrivals to bound
    plan depth. 20 arrivals cross the threshold (16); the kept set per
    batch must equal the persistent-mode run (separate code path, same
    greedy earlier-kept-wins contract) batch for batch."""
    import random
    import tempfile

    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
             "theta", "iota", "kappa"]
    rng = random.Random(77)
    docs, base_docs = [], []
    for i in range(24):
        base = " ".join(rng.choice(words) for _ in range(12))
        base_docs.append(base)
        docs.append((i, base))
    for j in range(24, 40):
        toks = base_docs[rng.randrange(len(base_docs))].split()
        toks[rng.randrange(len(toks))] = rng.choice(words)
        docs.append((j, " ".join(toks)))
    schema = "doc_id LONG, text STRING"
    batches = [
        spark.createDataFrame(docs[i : i + 2], schema) for i in range(0, 40, 2)
    ]

    mem = IncrementalDeduplicator(spark, **PARAMS)
    got = [{r.doc_id for r in mem.add_batch(b).collect()} for b in batches]
    assert len(mem._bucket_parts) < mem._MEMORY_COMPACT_PARTS  # compacted

    with tempfile.TemporaryDirectory() as d:
        per = IncrementalDeduplicator(
            spark, state_dir=f"{d}/state", state_buckets=4, **PARAMS
        )
        want = [{r.doc_id for r in per.add_batch(b).collect()} for b in batches]
    assert got == want
    assert mem.n_kept == sum(len(s) for s in want)
