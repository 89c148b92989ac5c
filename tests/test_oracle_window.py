"""Driver-window hygiene tests.

The driver scores only the first 50 ``queries()`` entries against its
DuckDB oracle. Round 3 curated that window to cover the core reference
algebra + the LLM-pipeline flagships; twelve previously-scored (and
driver-green in round 2) queries were rotated out. Per ADVICE.md, those
must stay oracle-backed HERE so a regression in a de-scoped query is
still detectable.

Round 4: the replay now uses the DTYPE-EXACT compare from
``tools/driver_compare.py``. Round 3's ``pack_sequences`` passed the
old replay locally (both sides fetched as Python ints) while the driver
hashed it red (its pandas fetch coerced the oracle's HUGEINT window-SUM
to float64, 5.0 vs 5). The shared canon fetches the oracle via pandas
and tags every cell with its numeric kind, so that defect class can no
longer pass CI — ``test_hugeint_dtype_drift_is_caught`` pins it.
"""

import sys

import duckdb
import pytest

import __spark_entry__ as entry

sys.path.insert(0, "/root/repo/tools")
import driver_compare as dcmp  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

ROTATED_OUT = [
    # r2 -> r3
    "argmax_customer_per_nation",
    "ntile_order_quartiles",
    "above_nation_avg_customers",
    "percentrank_top_decile",
    "big_orders",
    "nation_order_statuses",
    "shipping_volume",
    "rollup_grouping_id",
    "waiting_suppliers",
    "top_supplier",
    "parts_from_nation_suppliers",
    "late_orders_by_priority",
    # r4 -> r5 (made room for six round-4 flagships; class coverage kept
    # by a sibling query that stayed in the window)
    "range_join_sessions",
    "latest_event_per_user",
    "lang_distribution",
    "cube_pricing",
    "topk_orders",
    "stratified_sample_events",
    # r5 -> r6 (made room for six round-5 flagships; class coverage kept
    # by a sibling query that stayed in the window: pack_sequences ~
    # chunk_documents, event_gap_stats ~ rolling_hour_value,
    # median_order_price ~ agg_pricing_summary, top_revenue_orders ~
    # window_top3_orders_per_cust, word_count_top ~ tf_idf_top_terms,
    # revenue_by_nation ~ join_orders_customer_nation)
    "pack_sequences",
    "event_gap_stats",
    "median_order_price",
    "top_revenue_orders",
    "word_count_top",
    "revenue_by_nation",
    # within r6 (made room for exact_substr_spans + events_resample_stream;
    # distinct_users_per_type ~ agg_pricing_summary, pivot_order_priority ~
    # rollup_pricing)
    "distinct_users_per_type",
    "pivot_order_priority",
    # r6 -> r7 (made room for the six round-6-upgraded queries; class
    # coverage kept in-window: similarity_topk ~ the four ANN rows,
    # embedding_near_dups ~ semantic_dedup, decontaminate_bloom ~
    # decontaminate_bloom_stream, rolling_hour_value ~ user_sessions,
    # rollup_pricing ~ agg_pricing_summary, left_join_nation_suppliers ~
    # join_orders_customer_nation)
    "similarity_topk",
    "embedding_near_dups",
    "decontaminate_bloom",
    "rolling_hour_value",
    "rollup_pricing",
    "left_join_nation_suppliers",
    # r7 -> r8 (made room for streaming_scd2 + streaming_drift; class
    # coverage kept in-window: events_hourly ~ user_sessions /
    # asof_join_events (event-time aggregation), frame_sample ~
    # image_metadata (multimodal mapInPandas))
    "events_hourly",
    "frame_sample",
    # r8 -> r9 (made room for salted_skew_join, decontaminate_bloom_multi,
    # incremental_dedup_two_batch, image_near_dups, quality_classifier,
    # jpeg_metadata; class coverage kept in-window: dedup_clusters ~
    # fuzzy_dedup_docs, tf_idf_top_terms ~ heavy_hitter_words +
    # bigram_surprisal, image_metadata ~ jpeg_metadata, chunk_documents ~
    # token_count_bpe + split_train_val_test, pagerank_interactions ~
    # triangle_count, window_top3_orders_per_cust ~ user_sessions)
    "dedup_clusters",
    "tf_idf_top_terms",
    "image_metadata",
    "chunk_documents",
    "pagerank_interactions",
    "window_top3_orders_per_cust",
    # r9 -> r10 (made room for video_near_dups, audio_near_dups,
    # incremental_image_dedup, curate_media_pipeline; class coverage
    # kept in-window: asof_join_events ~ range_join_value_bands +
    # user_sessions, token_count_bpe ~ heavy_hitter_words +
    # bigram_surprisal, split_train_val_test ~ quality_classifier's
    # deterministic hash-split synthesis, dedup_exact_documents ~
    # minhash_near_dups / fuzzy_dedup_docs / curate_media_pipeline's
    # exact-dedup stage)
    "asof_join_events",
    "token_count_bpe",
    "split_train_val_test",
    "dedup_exact_documents",
    # r10 -> r11 (made room for the eleven round-10 additions; class
    # coverage kept in-window: decontaminate_corpus ~
    # decontaminate_bloom_multi/stream, semantic_dedup ~
    # diverse_sample_fps + kmeans_clusters + ANN rows, merge_upsert +
    # scd2_history ~ streaming_scd2, heavy_hitter_words ~
    # bigram_surprisal, simhash_near_dups ~ minhash_near_dups /
    # winnowing_pairs / set_similarity_pairs, incremental_dedup_two_batch
    # (driver-green r9 AND r10) ~ incremental_url_dedup +
    # incremental_image_dedup. ann_lsh_topk, ann_sq_topk,
    # exact_substr_spans and events_resample_stream also rotated out but
    # replay via ROUND6_UPGRADES below, not here)
    "decontaminate_corpus",
    "semantic_dedup",
    "merge_upsert",
    "heavy_hitter_words",
    "scd2_history",
    "simhash_near_dups",
    "incremental_dedup_two_batch",
    # r11 -> r12 (made room for the seven round-11 additions; class
    # coverage kept in-window: decontaminate_bloom_multi ~
    # decontaminate_bloom_stream, diverse_sample_fps ~
    # diverse_sample_fps_batched (provably identical selection),
    # multiclass_classifier ~ langid_chargram (same NB multiclass
    # machinery, richer char-gram features) + quality_classifier,
    # audio_near_dups ~ video_near_dups + image_near_dups,
    # winnowing_pairs ~ minhash_near_dups + set_similarity_pairs.
    # ann_ivf_topk and ann_pq_topk also rotated out but replay via
    # ROUND6_UPGRADES below, not here)
    "decontaminate_bloom_multi",
    "diverse_sample_fps",
    "multiclass_classifier",
    "audio_near_dups",
    "winnowing_pairs",
    # r12 -> r13 (made room for the four round-12 additions; class
    # coverage kept in-window: image_near_dups ~ video_near_dups +
    # incremental_image_dedup + jpeg_metadata (multimodal near-dup /
    # decode family), quality_classifier ~ quality_classifier_persisted
    # (whose oracle IS the same full NB weight+score replay),
    # html_extract_docs ~ html_extract_routed (strict superset: same
    # regex chain on easy pages + the tree tier on spec-hard pages).
    # exact_substr_removal also rotated out (~ line_dedup_docs) but
    # replays via ROUND6_UPGRADES below, not here)
    "image_near_dups",
    "quality_classifier",
    "html_extract_docs",
]

FLAGSHIPS = [
    "minhash_near_dups",
    # rotated into the scored window r4 -> r5
    "set_similarity_pairs",
    "triangle_count",
    # rotated into the scored window r5 -> r6 (winnowing_pairs rotated
    # back OUT r11 -> r12; it replays via ROTATED_OUT above)
    "fuzzy_dedup_docs",
    "kmeans_clusters",
    "bigram_surprisal",
    # rotated into the scored window r6 -> r7 (ann_ivf_topk and
    # ann_pq_topk rotated back OUT r11 -> r12, and exact_substr_removal
    # back OUT r12 -> r13; all three replay via ROUND6_UPGRADES below)
    "decontaminate_bloom_stream",
    # rotated into the scored window r7 -> r8
    "streaming_scd2",
    "streaming_drift",
    # rotated into the scored window r8 -> r9 (decontaminate_bloom_multi
    # rotated back OUT r11 -> r12, image_near_dups and quality_classifier
    # back OUT r12 -> r13; all replay via ROTATED_OUT above)
    "salted_skew_join",
    "jpeg_metadata",
    # rotated into the scored window r9 -> r10 (audio_near_dups rotated
    # back OUT r11 -> r12; replays via ROTATED_OUT above)
    "video_near_dups",
    "incremental_image_dedup",
    "curate_media_pipeline",
    # rotated into the scored window r10 -> r11 (the eleven round-10
    # additions; multiclass_classifier and diverse_sample_fps rotated
    # back OUT r11 -> r12 and replay via ROTATED_OUT above)
    "ann_ivf_persisted",
    "ann_pq_persisted",
    "quality_classifier_persisted",
    "line_dedup_docs",
    "dsir_select_docs",
    "url_dedup_docs",
    "incremental_url_dedup",
    "unicode_dedup_docs",
    # (html_extract_docs rotated back OUT r12 -> r13; replays via
    # ROTATED_OUT above)
    # rotated into the scored window r11 -> r12 (the seven round-11
    # additions; they replay HERE — the ROUND11_ADDITIONS list below
    # no longer has its own parametrized replay)
    "langid_chargram",
    "ccnet_perplexity_buckets",
    "host_cap_docs",
    "curate_text_pipeline",
    "ann_ivf_grown",
    "ann_pq_grown",
    "diverse_sample_fps_batched",
    # rotated into the scored window r12 -> r13 (the four round-12
    # additions; they replay HERE — the ROUND12_ADDITIONS list below
    # no longer has its own parametrized replay)
    "html_extract_routed",
    "langid_real_text",
    "incremental_semantic_decontam",
    "curate_embeddings_pipeline",
]

# round-4 operators registered past the scored window: replay with the
# driver's exact compare every CI run, same discipline as ROTATED_OUT
# (the six rotated into the window r5 moved to FLAGSHIPS above)
ROUND4_ADDITIONS = [
    "resample_ffill",
    "hard_negatives",
    "histogram_prices",
    "weighted_sample",
    "ks_drift_events",
    "profile_orders",
    "token_cooccurrence",
    "edit_distance_names",
    "cusum_value_shift",
    "record_linkage_parts",
    "k_core_interactions",
    "sorted_neighborhood",
    "drift_daily_value",
    "key_skew_users",
    "quantile_bins_price",
    "dataset_diff_orders",
    "cohort_retention_weekly",
    "join_cardinality_events",
    "validate_orders_rules",
    "containment_evidence",
]

CORE_OPERATORS = [
    "scan_nation",
    "select_lineitem",
    "project_disc_price",
    "union_nation_keys",
    "intersect_nation_keys",
    "difference_nation_keys",
    "product_region_nation",
    "join_orders_customer_nation",
    "singleton",
    "empty",
    "semi_join",
    "anti_join",
    "view_over_select",
    "incremental_view",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def test_window_contains_core_and_flagships():
    """Structural guard: a future registry edit must not push the core
    operators, the LLM flagships, or the event-time queries back out of
    the driver's scored window."""
    window = list(entry.queries())[:50]
    for name in CORE_OPERATORS + FLAGSHIPS + ["user_sessions"]:
        assert name in window, f"{name} fell out of the driver's 50-query window"
    # every scored entry must have an oracle (the window is the hash gate)
    oracles = entry.oracle_sql()
    missing = [n for n in window if n not in oracles]
    assert not missing, f"scored-window queries without an oracle: {missing}"


def _replay(spark, duck, name):
    qs = entry.queries()
    oracles = entry.oracle_sql()
    scols, srows = dcmp.fetch_spark(qs[name](spark, SF_DIR))
    if name not in oracles:
        pytest.skip(f"{name} is rows-only by design (no oracle)")
    dcols, drows = dcmp.fetch_duck(duck, oracles[name])
    problems = dcmp.compare(scols, srows, dcols, drows)
    assert not problems, f"{name}: {problems}"


@pytest.mark.parametrize("name", ROTATED_OUT)
def test_rotated_out_query_matches_oracle(spark, duck, name):
    _replay(spark, duck, name)


@pytest.mark.parametrize("name", FLAGSHIPS)
def test_flagship_query_matches_oracle(spark, duck, name):
    _replay(spark, duck, name)


@pytest.mark.parametrize("name", ROUND4_ADDITIONS)
def test_round4_addition_matches_oracle(spark, duck, name):
    _replay(spark, duck, name)


def test_hugeint_dtype_drift_is_caught(duck):
    """Regression pin for round 3's pack_sequences red: an oracle whose
    window SUM yields HUGEINT (-> pandas float64) must FAIL the replay
    against a Spark BIGINT result, and pass once CAST to BIGINT."""
    uncast = "SELECT SUM(x) OVER () AS v FROM (SELECT 5::BIGINT AS x)"
    cast = f"SELECT CAST(v AS BIGINT) AS v FROM ({uncast})"
    scols, srows = ["v"], [(5,)]  # what Spark LongType collects to
    dcols, drows = dcmp.fetch_duck(duck, uncast)
    assert dcmp.compare(scols, srows, dcols, drows), (
        "uncast HUGEINT oracle must be flagged (float64 5.0 vs int 5)"
    )
    dcols, drows = dcmp.fetch_duck(duck, cast)
    assert not dcmp.compare(scols, srows, dcols, drows)


def test_decimal_vs_float_still_matches(duck):
    """The dtype-exact canon must NOT over-reject: Spark DECIMAL results
    (decimal.Decimal, possibly with trailing zeros) hash equal to the
    oracle's float64 — that pairing is driver-green in every round."""
    from decimal import Decimal

    dcols, drows = dcmp.fetch_duck(
        duck, "SELECT CAST(38273.10 AS DECIMAL(12,2)) AS v"
    )
    assert not dcmp.compare(["v"], [(Decimal("38273.10"),)], dcols, drows)
    # but int-vs-float kind drift is still a mismatch
    assert dcmp.compare(["v"], [(38273,)], *dcmp.fetch_duck(
        duck, "SELECT CAST(38273 AS DECIMAL(12,0)) AS v"))

# round-5: previously rows-only queries upgraded to full oracle replay
# (bpe_merges: 20 unrolled argmax+merge steps in DuckDB; winnowing: the
# portable md5_60 k-gram hash makes the sketch bit-replayable)
ROUND5_UPGRADES = [
    # (fuzzy_dedup_docs, kmeans_clusters, simhash_near_dups,
    # winnowing_pairs, decontaminate_bloom, bigram_surprisal moved to
    # FLAGSHIPS when they rotated into the scored window r5 -> r6)
    "bpe_merges",
    "winnowing",
    "decontaminate_bloom_stream",
    "zipf_stats",
    "ngram_novelty",
    "pii_stats",
]


@pytest.mark.parametrize("name", ROUND5_UPGRADES)
def test_round5_upgrade_matches_oracle(spark, duck, name):
    _replay(spark, duck, name)


# round-6: the four ANN routes upgraded rows-only -> oracle-backed.
# SQ/LSH/IVF are FULL replays (closed-form codes / inlined hyperplane
# parameters / shared exact-integer kmeans CTEs); PQ is the exact path
# replayed + per-scale golden recall pins (the one model DuckDB cannot
# express). All four replay here at sf0.001 — the pins carry both
# sf0.001 and sf0.01 keys.
ROUND6_UPGRADES = [
    "ann_sq_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "ann_pq_topk",
    # stateful applyInPandasWithState resample as a stream, oracle =
    # batch replay minus each key's trailing open bucket
    "events_resample_stream",
    # ExactSubstr char-span dedup: span mask + cleaned strings replayed
    # byte-for-byte (window mining, repeat counting, islands merge, cut)
    "exact_substr_spans",
    "exact_substr_removal",
]


@pytest.mark.parametrize("name", ROUND6_UPGRADES)
def test_round6_upgrade_matches_oracle(spark, duck, name):
    _replay(spark, duck, name)


ROUND8_ADDITIONS = [
    # stateful streaming SCD2: oracle = batch LAG-collapse/LEAD-interval
    # history, closed versions only (the open version lives in state)
    "streaming_scd2",
    # stateful streaming adjacent-bucket KS drift: oracle = per (key,
    # bucket-pair) cumulative-count KS over the pre-trailing buckets
    "streaming_drift",
    # skew regression guard: oracle is the PLAIN join, so hash equality
    # IS the salted-equals-unsalted equivalence assert
    "salted_skew_join",
    # GramBloom.union multi-benchmark probe: oracle = contaminated-by-
    # either containment (== two independent runs combined)
    "decontaminate_bloom_multi",
    # incremental dedup through the arrival machinery: one add_batch()
    # == fuzzy_dedup keepers (recursive-CTE closure oracle)
    "incremental_dedup_one_batch",
]


@pytest.mark.parametrize("name", ROUND8_ADDITIONS)
def test_round8_addition_matches_oracle(spark, duck, name):
    _replay(spark, duck, name)


ROUND10_ADDITIONS = [
    # persisted IVF probe: build -> reopen -> routed-partition-pruned
    # probe; oracle = the live ivf_top_k full replay (same sq_kmeans
    # trainer, same params)
    "ann_ivf_persisted",
    # persisted PQ probe with exact rerank from the stored corpus;
    # oracle = ann_pq_topk's recall-pinned exact-top-10 replay (same
    # params/seed -> identical codebooks)
    "ann_pq_persisted",
    # persisted classifier: saved/reloaded weights score the held-out
    # fold; oracle = quality_classifier's full weight+score replay
    "quality_classifier_persisted",
    # CCNet-style corpus-wide line dedup over planted boilerplate pages;
    # oracle replays the md5_60 line hash, count, removal and reassembly
    "line_dedup_docs",
    # DSIR top-k selection on the planted corpus; oracle replays both
    # hashed-ngram LMs, every importance score, and the top-100
    "dsir_select_docs",
    # URL canonicalization + keeper election over closed-form messy
    # URLs; oracle replays the RE2-safe canonical form char-for-char
    "url_dedup_docs",
    # exact-key arrival dedup (IncrementalExactDeduplicator) over two
    # crawl batches of canonical URLs; oracle replays both batch keeper
    # elections and the earlier-kept-wins cross drop
    "incremental_url_dedup",
    # NFC-normalized exact dedup (composed/decomposed variants collapse);
    # oracle = DuckDB nfc_normalize (both engines implement UAX #15)
    "unicode_dedup_docs",
    # 4-class multinomial NB (trained LID/domain gate); oracle replays
    # synthesis, all class LMs, every log-joint score, and the argmax
    "multiclass_classifier",
    # regex-tier HTML -> text extraction over synthesized pages; oracle
    # replays the RE2 chain + entity decode character for character
    "html_extract_docs",
    # k-center farthest-point sampling on exact-integer sq codes; the
    # oracle unrolls all 8 greedy steps (MATERIALIZED per step)
    "diverse_sample_fps",
]

# (no parametrized replay for ROUND10_ADDITIONS: all eleven rotated
# into the scored window r10 -> r11 and now replay via FLAGSHIPS above —
# a second replay here would double CI time for no extra signal)


# (no parametrized replay for ROUND11_ADDITIONS: all seven rotated
# into the scored window r11 -> r12 and now replay via FLAGSHIPS above —
# a second replay here would double CI time for no extra signal)
ROUND11_ADDITIONS = [
    # char 2..4-gram language ID (langid.py feature space) over the
    # closed-form multilingual syllable synthesis; oracle replays
    # synthesis, every gram, all four class LMs, and the argmax
    "langid_chargram",
    # batched FPS: identical selection to diverse_sample_fps in ~k/m
    # rounds; shares the unrolled oracle — equality IS the contract
    "diverse_sample_fps_batched",
    # grown persisted-IVF index: oracle replays half-corpus training,
    # frozen-centroid growth routing, and the probe over grown lists
    "ann_ivf_grown",
    # CCNet head/middle/tail cut: closed-form NTILE == the oracle window
    "ccnet_perplexity_buckets",
    # per-host cap: two-phase min-N aggregate == per-host ROW_NUMBER
    "host_cap_docs",
    # grown persisted-PQ: exact-top-10 replay + grown-path recall pins
    "ann_pq_grown",
    # end-to-end text curation: ONE oracle replays url dedup -> LID ->
    # language keep -> survivor-trained bigram LM -> NTILE head/middle
    "curate_text_pipeline",
]


# (no parametrized replay for ROUND12_ADDITIONS: all four rotated into
# the scored window r12 -> r13 and now replay via FLAGSHIPS above — a
# second replay here would double CI time for no extra signal)
ROUND12_ADDITIONS = [
    # two-tier routed HTML extraction: easy pages replay the regex
    # chain, spec-hard pages (double/single-quoted '>', CDATA, tables)
    # replay the tree tier's closed-form output; via_tree pins routing
    "html_extract_routed",
    # semantic arrival decontamination against a GROWING persisted ANN
    # index: the oracle replays training, both batch probes, threshold
    # drops on the rounded cosine, and the survivors' growth routing —
    # batch 2 (with a planted clone of an admitted batch-1 vector)
    # probes build ∪ batch-1, pinning earlier-kept-wins through the
    # persisted index
    "incremental_semantic_decontam",
    # char-gram LID scored on REAL text (UDHR sentences, 4 languages,
    # shared literal fixture); accuracy pinned exactly in test_classify
    "langid_real_text",
    # composed embeddings curation: planted-clone exact vector dedup
    # (group by the raw float array) -> broadcast eval-set cosine
    # decontamination; one oracle replays both stages
    "curate_embeddings_pipeline",
]


ROUND13_ADDITIONS = [
    # arrival-order CCNet line dedup over two crawl dumps of the
    # line_dedup_docs synthesis: within-dump >= 4 removal, cross-dump
    # seen-line removal, per-doc reassembly — oracle replays both dumps
    # and the seen set via the portable md5_60 hash
    "incremental_line_dedup",
    # composed web curation: html extraction -> corpus line dedup ->
    # token gate -> per-host cap, ONE oracle replaying all four stages
    "curate_web_pipeline",
    # the streaming twin of incremental_line_dedup (availableNow file
    # arrivals through the generic foreachBatch adapter) — shares the
    # batch oracle verbatim: the hash match IS stream==batch
    "streaming_line_dedup",
]


@pytest.mark.parametrize("name", ROUND13_ADDITIONS)
def test_round13_addition_matches_oracle(spark, duck, name):
    _replay(spark, duck, name)


def test_round11_additions_guarded_in_window():
    """All seven round-11 additions must stay inside the scored window
    (they moved there r11 -> r12); FLAGSHIPS carries their replay."""
    window = list(entry.queries())[:50]
    for name in ROUND11_ADDITIONS:
        assert name in window, f"{name} fell back out of the scored window"
        assert name in FLAGSHIPS, f"{name} lost its FLAGSHIPS replay"


def test_round12_additions_guarded_in_window():
    """All four round-12 additions must stay inside the scored window
    (they moved there r12 -> r13); FLAGSHIPS carries their replay."""
    window = list(entry.queries())[:50]
    for name in ROUND12_ADDITIONS:
        assert name in window, f"{name} fell back out of the scored window"
        assert name in FLAGSHIPS, f"{name} lost its FLAGSHIPS replay"
