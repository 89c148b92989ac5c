"""End-to-end training-data pipeline: the composition a real user runs.

documents -> quality/language filter -> exact dedup -> near-dup removal
-> benchmark decontamination -> span-level boilerplate flagging ->
leakage-safe split -> context-window chunking -> packed-layout
assignment -> deterministic shard export order.

Each stage is covered by its own unit/oracle tests; THIS file asserts the
stages compose: schemas line up, invariants hold across stage boundaries,
and the whole flow is deterministic end-to-end (two runs, identical
results — the property that makes a 100 TB pipeline re-runnable after a
partial failure).
"""

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"

WINDOW = 64


@pytest.fixture(scope="module")
def flow(spark):
    def run():
        from codd_spark.operators.dedup import (
            decontaminate,
            duplicate_spans,
            ngram_jaccard_pairs,
        )
        from codd_spark.operators.pipeline import (
            chunk_documents,
            cluster_safe_split,
            curate_corpus,
            pack_sequences,
            shuffle_shards,
        )

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        n_raw = docs.count()

        curated = curate_corpus(
            docs, keep_langs=("en", "de", "fr", "es", "und"), min_quality=0.0,
            near_dup_threshold=0.5,
        )
        evalset = docs.filter("doc_id >= 450")
        train_pool = curated.filter("doc_id < 450")
        clean = decontaminate(train_pool, evalset, threshold=0.5, method="exact", n=3)

        spans = duplicate_spans(clean, "doc_id", "text", k=5, min_count=2)

        pairs = ngram_jaccard_pairs(clean, "doc_id", "text", n=3, threshold=0.3)
        split = cluster_safe_split(clean, pairs, val_pct=10, test_pct=10, salt=1)

        train = split.filter("split = 'train'")
        chunks = chunk_documents(train, chunk_tokens=32, overlap=4)
        # packing needs one row per unit with a unique id + token count
        units = chunks.select(
            (F.col("doc_id") * 10000 + F.col("chunk_idx")).alias("unit_id"),
            "n_tokens",
        )
        packed = pack_sequences(units, "unit_id", "n_tokens",
                                window=WINDOW, n_shards=4)
        sharded = shuffle_shards(train, 4, "doc_id", salt=2)
        return n_raw, clean, spans, split, train, chunks, packed, sharded

    return run


def test_pipeline_composes_with_invariants(spark, flow):
    n_raw, clean, spans, split, train, chunks, packed, sharded = flow()

    n_clean = clean.count()
    assert 0 < n_clean < n_raw  # filters and dedup actually removed rows

    # spans refer only to surviving documents and have sane geometry
    bad = spans.join(clean.select("doc_id"), on="doc_id", how="left_anti")
    assert bad.count() == 0
    assert spans.filter("span_start < 1 OR span_end < span_start").count() == 0

    # split covers every clean doc exactly once; no cluster leaks
    assert split.count() == n_clean
    leak = (
        split.groupBy("cluster_id")
        .agg(F.count_distinct("split").alias("k"))
        .filter("k > 1")
        .count()
    )
    assert leak == 0

    # chunking conserves membership: every train doc appears; every
    # chunk's parent is a train doc
    orphan = chunks.join(train.select("doc_id"), on="doc_id", how="left_anti")
    assert orphan.count() == 0
    n_train = train.count()
    assert chunks.select("doc_id").distinct().count() == n_train

    # packed layout covers every chunk once with in-window offsets
    n_chunks = chunks.count()
    assert packed.count() == n_chunks
    assert packed.filter(f"offset_tokens < 0 OR offset_tokens >= {WINDOW}").count() == 0
    assert packed.select("shard").distinct().count() == 4

    # sharding covers train exactly, all 4 shards populated
    assert sharded.count() == n_train
    assert sharded.select("shard").distinct().count() == 4


def test_pipeline_is_deterministic(spark, flow):
    """Two full runs produce identical splits, chunks, pack layout and
    shard assignments — no RNG, no timestamp, no partition-order
    dependence."""
    _, clean1, _, split1, _, chunks1, packed1, sharded1 = flow()
    _, clean2, _, split2, _, chunks2, packed2, sharded2 = flow()

    def canon(df, cols):
        return sorted(map(tuple, df.select(*cols).collect()))

    assert canon(clean1, ["doc_id"]) == canon(clean2, ["doc_id"])
    assert canon(split1, ["doc_id", "cluster_id", "split"]) == canon(
        split2, ["doc_id", "cluster_id", "split"]
    )
    assert canon(chunks1, ["doc_id", "chunk_idx", "n_tokens"]) == canon(
        chunks2, ["doc_id", "chunk_idx", "n_tokens"]
    )
    assert canon(packed1, ["unit_id", "shard", "pack_id", "offset_tokens"]) == canon(
        packed2, ["unit_id", "shard", "pack_id", "offset_tokens"]
    )
    assert canon(sharded1, ["doc_id", "shard", "shuffle_order"]) == canon(
        sharded2, ["doc_id", "shard", "shuffle_order"]
    )


def test_quality_gate_and_tokenizer_pipeline(spark):
    """Second composition: the data-quality gate + exact near-dup removal
    + tokenizer-training flow added in round 4. profile -> skew probe ->
    drift check -> EXACT set-similarity dedup (clusters -> keeper) ->
    BPE training on the survivors -> encode. Deterministic end-to-end."""
    from codd_spark.operators.dedup import set_similarity_join
    from codd_spark.operators.graph import connected_components
    from codd_spark.operators.profile import data_profile, key_skew, ks_statistic
    from codd_spark.operators.tokenize import WORD_END, bpe_encode, bpe_train

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")

    # 1. gate: profile must show no nulls in the id/text columns
    prof = {r.column: r for r in data_profile(docs, ["doc_id", "text"]).collect()}
    assert prof["doc_id"].n_null == 0 and prof["text"].n_null == 0
    n_raw = prof["doc_id"].n_rows

    # 2. skew probe on the join key a downstream enrichment would use
    [skew] = key_skew(events, ["user_id"]).collect()
    assert skew.top1_share < 0.5  # no single-straggler key: plain shuffle fine

    # 3. drift gate between user parities (a stand-in ingestion split)
    drift = ks_statistic(
        events.withColumn("is_b", (F.col("user_id") % 2) == 1),
        "value",
        "is_b",
        group_col="event_type",
    )
    assert drift.filter("ks > 0.5").count() == 0  # populations comparable

    # 4. exact near-dup removal: pairs -> components -> keep min id
    pairs = set_similarity_join(docs, "doc_id", "text", threshold=0.35, ngram_n=3)
    comp = connected_components(pairs)
    drop = comp.filter("id != component").select(F.col("id").alias("doc_id"))
    n_dups = drop.count()
    clean = docs.join(drop, "doc_id", "left_anti")
    pairs.release_cache()
    assert 0 < n_dups < n_raw
    assert clean.count() == n_raw - n_dups
    # no surviving pair: rerunning the miner on the cleaned corpus at the
    # same threshold finds nothing
    p2 = set_similarity_join(clean, "doc_id", "text", threshold=0.35, ngram_n=3)
    assert p2.count() == 0
    p2.release_cache()

    # 5. tokenizer training on survivors + encode roundtrip
    merges = bpe_train(clean, "text", n_merges=12)
    assert len(merges) == 12
    enc = bpe_encode(clean.limit(20), "text", merges)
    for r in enc.collect():
        words = [w for w in "".join(r.bpe_tokens).split(WORD_END) if w]
        assert words == r.text.split()

    # 6. determinism: the dedup decision and the merge table replay
    merges2 = bpe_train(clean, "text", n_merges=12)
    assert merges2 == merges
    drop2 = connected_components(
        set_similarity_join(docs, "doc_id", "text", threshold=0.35, ngram_n=3)
    ).filter("id != component")
    assert drop2.count() == n_dups


def test_crawl_frontend_pipeline(spark):
    """Third composition (round 10): the crawl FRONT-END that runs before
    everything above. Messy refetch URLs -> canonical_url + url_dedup
    (URL-level keeper election) -> line_dedup (corpus-wide boilerplate
    line removal) -> DSIR selection toward a target corpus. Asserts the
    stages compose (keeper rows join back to payloads, cleaned text
    feeds scoring) and the whole front-end is deterministic."""
    from codd_spark.functions.url import canonical_url, url_host
    from codd_spark.operators.dedup import line_dedup, url_dedup
    from codd_spark.operators.pipeline import dsir_select

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_raw = docs.count()

    # 1. every doc arrives under a messy URL; ~2 raw URLs per page
    pages = docs.withColumn(
        "url",
        F.concat(
            F.when(F.col("doc_id") % 2 == 0, F.lit("HTTPS://WWW.Crawl.NET"))
            .otherwise(F.lit("https://crawl.net")),
            F.lit("/p/"),
            (F.col("doc_id") % ((500 // 2) or 1)).cast("string"),
            F.when(F.col("doc_id") % 2 == 0, F.lit("/?utm_source=feed"))
            .otherwise(F.lit("")),
        ),
    )
    kept_urls = url_dedup(pages, "doc_id", "url")
    n_pages = kept_urls.count()
    assert n_pages < n_raw  # refetch variants collapsed
    assert kept_urls.filter("n_dups >= 2").count() > 0
    # host rollup agrees with the canonicalizer
    hosts = {r.host for r in kept_urls.select("host").distinct().collect()}
    assert hosts == {"crawl.net"}
    fetched = docs.join(kept_urls.select("doc_id"), "doc_id", "left_semi")
    assert fetched.count() == n_pages

    # 2. strip boilerplate chrome lines injected by the "template"
    lined = fetched.select(
        "doc_id",
        F.concat(
            F.lit("Subscribe to crawl.net!\n"), "text", F.lit("\n(c) crawl.net")
        ).alias("text"),
    )
    cleaned = line_dedup(lined, min_count=4)
    assert cleaned.filter("n_removed < 2").count() == 0  # chrome gone everywhere
    assert cleaned.count() == n_pages  # no document lost, only lines

    # 3. DSIR-select the half of the pool most like an 'en' target
    pool = cleaned.select("doc_id", F.col("cleaned_text").alias("text"))
    target = fetched.filter("lang = 'en'").select("doc_id", "text").limit(50)
    k = n_pages // 2
    sel = dsir_select(pool, target, k=k, n_features=1024)
    got = sel.count()
    assert got == k
    sel.release_cache()

    # 4. determinism end-to-end: rerun reproduces the same selection
    sel2 = dsir_select(pool, target, k=k, n_features=1024)
    a = sorted((r.doc_id, r.log_weight) for r in sel.collect())
    b = sorted((r.doc_id, r.log_weight) for r in sel2.collect())
    sel2.release_cache()
    assert a == b
