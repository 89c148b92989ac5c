"""Regenerate PLANS.md: captured physical plans for the queries whose
shape is the point (pushdown, broadcast choice, single-exchange windows,
bucketed range join). tests/test_plans.py asserts the same properties in
CI; this file is the human-readable evidence.

Usage: python tools/gen_plans.py
"""

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as em
from codd_spark.session import get_spark

PICK = {
    "select_lineitem": "Filter + projection fully pushed to the parquet scan; single distinct exchange for set semantics.",
    "revenue_by_nation": "3-way join: nation carries an explicit broadcast hint (fixed 25 rows); customer's strategy is size-gated by Catalyst/AQE — broadcast at bench scale, shuffle at SF100+ (no forced hint); partial aggregation before the exchange.",
    "top_revenue_orders": "Join + group + TakeOrderedAndProject: the top-k never materializes a global sort.",
    "asof_join_events": "As-of join as union + running window: exactly one shuffle (on user_id), no range probe.",
    "minhash_near_dups": "One-permutation signature: binned partial-min + window densification; every corpus self-join is SortMergeJoin by hint (broadcast would OOM at scale); exact-Jaccard verify on hashed shingles.",
    "big_orders": "Q18 HAVING shape: the quantity aggregate (with partial agg) runs BEFORE the joins, so only qualifying orders join back; customer join size-gated (no forced hint).",
    "latest_event_per_user": "Snapshot dedup: one exchange on the key feeds the row_number window; filter on rn=1 follows immediately.",
    "dedup_exact_documents": "Fingerprint groupBy with map-side partial aggregation; one exchange total.",
    "user_sessions": "Sessionize: lag-probe and running-sum windows share one partitioning — a single exchange on user_id feeds both windows AND the final aggregate.",
    "range_join_value_bands": "Global range join compiled to an equi hash join on the bucket key (intervals exploded to covered buckets) — never a nested-loop cross product.",
    "split_train_val_test": "Hash split is a pure projection: the only exchange belongs to the summary groupBy, not the split.",
    "late_orders_by_priority": "Q4 EXISTS shape: fact-fact left-semi SortMergeJoin with the cross-side date predicate evaluated inside the join; probe side pruned to two columns before its exchange; partial count before the priority exchange.",
    "customer_order_distribution": "Q13 shape: left-outer SMJ, then the per-customer count reuses the join's c_custkey partitioning (no extra exchange); only the tiny count-domain aggregate shuffles again.",
    "supplier_part_variety": "Q16 shape: count-distinct expands to a two-level aggregate (dedup on (brand,size,supp) then count); the NOT IN is a left-anti on a pruned key column whose strategy AQE size-gates (the blacklist grows with SF); the part-lineitem join is shuffle-pinned.",
    "doc_repetition_stats": "Gopher repetition stats: three explode->groupBy(id,gram) legs with map-side partial counts, merged by left joins on the doc id — linear in corpus size, no per-row frequency maps.",
    "tf_idf_top_terms": "TF-IDF: one explode, two aggregates (partial-agg both), vocabulary-keyed SortMergeJoin (vocab grows with the corpus — never broadcast), 1-row doc count broadcast, per-doc window.",
    "boilerplate_ngrams": "Cross-doc boilerplate: array_distinct BEFORE the explode (per-doc dedup costs no shuffle), one ngram-keyed partial-agg exchange, 1-row total broadcast.",
    "unigram_surprisal": "Unigram surprisal: token rows join the vocab-keyed frequency table via SortMergeJoin; per-doc aggregate with map-side combine.",
    "embedding_centroids": "Group centroids: posexplode then ONE (group, dim)-keyed aggregate with partial agg — shuffle width #groups x dim, independent of corpus size.",
    "decontaminate_containment": "Containment decontamination: both sides explode to (xxhash64(gram), id) rows and meet in ONE shuffle equi-join + count aggregate — no all-pairs stage, cost bounded by true overlap.",
    "ngram_jaccard": "Bounded-subset exact Jaccard: the theta-join's streamed side is explicitly repartitioned so the nested-loop compare spreads across cores (a single-partition subset otherwise serializes all |n|^2/2 comparisons onto one task).",
    "sq_codes": "Scalar quantization: per-dim min/max folded into the encode expression as literals — the scan is a pure projection (no join against a stats table), codes computed in whole-stage codegen.",
    "frame_sample": "APNG frame walk: synthesis ids repartitioned before mapInPandas so the CPU-bound Python decode runs on every core; Arrow-batched, bounded memory per batch.",
    "triangle_count": "Degree-oriented triangle counting: every graph-sized join (degree attach, wedge self-join, closing-edge probe) is SortMergeJoin by hint; orientation bounds the wedge fan-out at O(m^1.5) so no hub explosion.",
    "resample_ffill": "Time-series densify: per-key sequence+explode grid (no global calendar), left join back to the bucket aggregate, and the fill-group windows share one (user_id) partitioning.",
    "scd2_history": "SCD2: lag-collapse and lead-interval windows share one (user_id, ts, event_id) sort — a single exchange for the whole operator.",
    "merge_upsert": "MERGE as algebra: two left-anti SortMergeJoins (match-removal, delete-removal) around a union — no full outer join, the source is never broadcast.",
    "semantic_dedup": "SemDeDup: hoisted per-vector norms (norm fold runs corpus-linear, before the pair stage), pair mining feeds min-label propagation whose per-round joins are shuffle-pinned; singletons bypass the loop entirely.",
    "hard_negatives": "Hard-negative mining: broadcast query side (corpus never shuffles), label inequality inside the join condition, one dot-product fold per surviving pair, per-query window rank.",
    "histogram_prices": "Fixed-width histogram: closed-form bin expression with partial_count before the single exchange; dense bin spine joined at nbins cost.",
    "set_similarity_pairs": "Exact AllPairs/PPJoin: doc-frequency aggregate + rarest-first ordering (one vocab-keyed SMJ); ASYMMETRIC prefixes — the size-smaller side explodes only the 2t/(1+t) indexing prefix, the larger side the t probe prefix — meet in a candidate SMJ whose positional overlap bound rides the pair-dedup aggregate; exact verify on hashed-long arrays. Three pinned shuffles, never a cross join.",
    "heavy_hitter_words": "Pigeonhole heavy hitters: the (partition, item) count shuffles ~one map-side-combined row per distinct item per partition; partition sizes come from a window over the SAME aggregate rows (no second lineage evaluation -> completeness survives AQE replans); only the <=k*partitions candidate table is broadcast for the exact verify, so no vocabulary-wide global aggregate ever runs.",
    "ks_drift_events": "Two-sample KS: (group, value) tie-absorbing partial-agg, then cumulative + full-partition windows sharing ONE group-keyed exchange; output one row per group.",
    "profile_orders": "One-pass profile: all per-column count/distinct/min/max in a single expand-aggregate (one scan regardless of column count); the stack unpivot is shuffle-free.",
    "token_cooccurrence": "Association lift: distinct (doc, token) explode, vocab prune via size-gated equi-join, per-doc pair self-join on the doc id (documents parallelize, cross-doc pairs never form), one pair-count aggregate, 1-row corpus-size broadcast.",
    "edit_distance_names": "Blocked levenshtein: padded q-gram explode meets in one gram-keyed SMJ, count filter per pair, verify on survivors only; the degenerate-string pool is the one (bounded) broadcast.",
    "cusum_value_shift": "CUSUM: cumulative + full-partition windows share one event_type exchange; argmax is a rank-1 filter, no second shuffle.",
    "record_linkage_parts": "Record linkage: ONE equi-join on the blocking key (shuffle-pinned), all attribute similarities evaluated as codegen expressions inside the pair projection.",
    "decontaminate_bloom": "Bloom decontamination: bitmap assembled distributively (explode k positions, bit_or per word) and collected as a benchmark-bounded sketch; the corpus pass is MAP-ONLY (Arrow membership UDF, no corpus-gram shuffle); only bloom-positive docs reach the exact containment equi-join.",
    "kmeans_clusters": "Exact-replay k-means: per iteration one k-row centroid BROADCAST against the corpus, linear argmin window keyed by id, elementwise (cluster, dim) integer sum with map-side combine; centroid state is k rows on the driver (model-sized, not data-sized).",
    "zipf_stats": "Zipf diagnostics: corpus-linear explode, vocabulary-sized frequency aggregate, per-group rank window + regression aggregate over the vocab table only.",
    "winnowing_pairs": "Fingerprint overlap mining: grams as rows (collapse-proof), window min per doc; r9 — the miner consumes the sketch as PERSISTED (id, fp) rows (the unpersisted plan re-evaluated the explode+window stage per consumer, Generate x6 / zero ReusedExchange; the array sketch was a serialization wash), so the InMemoryRelation build appears once and the runtime plan is ONE fingerprint-keyed shuffle-pinned equi-join + pair aggregate; hot buckets guarded.",
    "bigram_surprisal": "Bigram LM scoring: the (w1,w2) count and w1 context count tables (both model-sized) join EACH OTHER first, then the single fact-table join shuffles once on (w1,w2); vocab size is a 1-row broadcast; per-doc aggregate has map-side combine.",
    "k_core_interactions": "k-core peeling: per round one degree aggregate + two semi-joins against survivors, lineage cut per round; the only driver value is the 1-row convergence count.",
    "sorted_neighborhood": "Sorted-neighborhood: global rank via RangePartitioning + per-partition row_number + broadcast offsets (no single-task window), then rank-vs-rank+delta equi-joins.",
    "exact_substr_spans": "ExactSubstr mask at sf0.1 (r8: the small-corpus gate routes <=50k docs / <=32M windows through the precise hash-join plan — the bloom path's fixed costs lose at this scale; see exact_substr_spans_bloom below for the large-corpus plan): position stream joins the repeated-hash set shuffle-pinned, candidates rejoin the text, exact substring verify + islands merge. Identical output to the bloom path (pinned in tests).",
    "exact_substr_removal": "Span cut: spans aggregate to ONE sorted array per doc (map-side combine), one shuffle_merge left join back to the corpus, then a single expression fold stitches the kept segments — no Python, no character explode; inherits whichever spans plan the corpus-size gate picked (precise at sf0.1, bloom at scale) plus the one removal join.",
    "image_near_dups": "Perceptual image dedup (r9): the ONLY Python stage is the Arrow-batched decode+dhash pass (mapInPandas over payload partitions, 16 bytes/row out); candidates + verify are the SimHash chunk-pigeonhole join — explode to (chunk, value) buckets, shuffle-pinned self-join (broadcast would OOM on a corpus-derived side at scale), bitcount verify in codegen, degenerate buckets capped.",
    "quality_classifier": "Trained NB linear classifier (r9): feature extraction is pure codegen (tokens -> bigrams -> md5 hash -> modulo, one explode); training is ONE (feature)-keyed aggregate with map-side partial counts plus a 1-row totals aggregate; the bounded model (<= n_features rows) is explicitly BROADCAST, so held-out scoring is a map-side join + per-doc aggregate — no corpus-sized shuffle after the count.",
    "ann_ivf_persisted": "Persisted IVF probe (r10): the lists scan carries a static PartitionFilters IN over the routed list ids (only n_probe directories read) plus Spark's own dynamic pruning subquery; routed queries broadcast, so the corpus side reaches the join with NO Exchange — the only exchanges are post-join over scored candidates.",
    "jpeg_metadata": "Baseline JPEG decode contract (r9): synthesis ids repartitioned before mapInPandas so the CPU-bound pure-Python encode+decode runs on every core (the frame_sample discipline); Arrow-batched, bounded memory; everything after the 6-column feature rows is expression-only.",
    "line_dedup_docs": "Corpus-wide line dedup (r10): posexplode to (id, pos, line) then exactly three exchanges — the hashed-line frequency aggregate (map-side partials), the shuffle-pinned flag join against the boilerplate-sized duplicated-hash set (broadcast would bet on a corpus-derived side), and the per-doc reassembly aggregate. No pairwise stage, no Python.",
    "dsir_select_docs": "DSIR selection (r10): both hashed-n-gram LMs are bounded (feature)-keyed count aggregates read from a persisted cache (one raw-corpus scan for the LM, one for scoring); the log-ratio table (<= n_features rows) is explicitly BROADCAST so per-doc scoring is a map-side join + id-keyed sum; the top-k is TakeOrderedAndProject, never a global sort.",
    "url_dedup_docs": "URL dedup (r10): canonicalization is a pure codegen projection (regexp/array expressions, no UDF); the whole operator is ONE min/count aggregate on the canonical key — a single exchange end to end.",
    "multiclass_classifier": "Multiclass NB (r10): training is one (label, feature)-keyed count aggregate; the bounded K*(n_features+1)-row model BROADCASTS; scoring joins only observed rows (unseen weights pre-subtracted at train time — never densifies), then one (id, label) aggregate and a struct-max argmax.",
    "html_extract_docs": "HTML extraction (r10): the entire operator is a chained regexp_replace/replace projection — whole-stage codegen, zero exchanges of its own (the one exchange belongs to the contract's synthesis/compare harness, not the extraction).",
    "diverse_sample_fps": "k-center FPS (r10): per pick, the newest center is a dim-length literal array in a shuffle-free projection over the checkpointed running-min column; the argmax is TakeOrderedAndProject(1); no corpus-sized shuffle in any iteration.",
    "diverse_sample_fps_batched": "Batched FPS (r11): one TakeOrderedAndProject(m) candidate collect per ROUND instead of per pick (k=256 runs in 17 rounds); the round's accepted centers fold into a single least() projection over the checkpointed running-min column — job count sub-linear in k, per-round plan identical in shape to the sequential variant.",
    "langid_chargram": "Char-gram language ID (r11): gram extraction is sequence->substr->hash->count, all codegen (one explode, one (id,feature) aggregate with map-side partials); the bounded K*(n_features+1)-row model BROADCASTS; scoring is the multiclass_classifier plan on char features — no corpus-sized shuffle after the counts.",
    "ann_ivf_grown": "Grown persisted IVF (r11): the probe union-reads the build generation and the appended generation as separate partitioned roots — BOTH scans keep their static PartitionFilters IN over the routed list ids, so growth adds directories, never an exchange; append-time routing is a map-only literal-centroid argmin.",
    "host_cap_docs": "Per-host cap (r11): exact two-phase salted min-N aggregate — NO Window operator anywhere (a 10^9-page host never serializes one sort task); phase 1 collects per-(host,salt) bounded lists with map-side partials, phase 2 merges the <= n_salts lists per host; NULL-url rows bypass via the union's other branch. Two exchanges total, both aggregate-owned.",
    "ccnet_perplexity_buckets": "CCNet head/middle/tail (r11): the per-language NTILE is a scalable global rank — range repartition + per-PARTITION row_number + broadcast offsets; every Window in the plan is partitioned by __pid (the physical partition id), never by language and never unpartitioned, so a dominant language cannot serialize through one window task. The LM itself is the bigram_surprisal plan (model-sized joins, one fact shuffle).",
    "curate_text_pipeline": "Composed text curation (r11): URL dedup -> char-gram LID -> perplexity cut with EAGER localCheckpoint at stage boundaries — the final plan reads ONLY checkpointed RDDs (Scan ExistingRDD; zero FileScan, zero upstream synthesis/canonicalization/gram-hash expressions), so no stage's lineage replays per downstream consumer (96 s -> 4.9 s when this was first enforced).",
    "html_extract_routed": "Two-tier routed HTML extraction (r12): one scan-speed routing predicate splits the corpus into a codegen regex branch and an Arrow-batched tree-walk branch, unioned — two map-only legs, ZERO exchanges; at 100 TB only the spec-hard sliver pays Python.",
    "curate_web_pipeline": "Composed web curation (r13): html extraction (map-only codegen) -> corpus line dedup -> token gate -> salted per-host cap, with EAGER localCheckpoint at stage boundaries — the post-gate plan reads ONLY checkpointed RDDs, NO Window operator anywhere (the cap is the two-phase min-N aggregate), and the extraction expressions appear exactly once.",
    "incremental_line_dedup": "Arrival line dedup (r13): per dump, one explode + one (h,h2) count aggregate with map-side partials + ONE probe join against the seen-hash state on the bucket columns (persistent state side reads Bucketed: true, zero Exchange) + the per-doc reassembly aggregate; state append ships only the dump's NOVEL distinct hashes.",
}


def main():
    spark = get_spark(app_name="gen-plans", cpus="8", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.1"
    qs = em.queries()
    out = [
        "# PLANS — captured physical plans (sf0.1, AQE on)",
        "",
        "Regenerate with `python tools/gen_plans.py` (see tests/test_plans.py",
        "for the properties asserted in CI). Commentary first, plan below.",
        "",
    ]
    for name, note in PICK.items():
        df = qs[name](spark, sf)
        plan = df._jdf.queryExecution().executedPlan().toString()
        lines = [l[:160] for l in plan.splitlines()[:40]]
        out.append(f"## {name}\n\n{note}\n\n```\n" + "\n".join(lines) + "\n```\n")
    out.extend(_exact_substr_bloom_section(spark, sf))
    out.extend(_streaming_resample_section(spark, sf))
    out.extend(_bucketed_state_sections(spark, sf))
    open("/root/repo/PLANS.md", "w").write("\n".join(out))
    print("written", sum(len(o) for o in out))


def _exact_substr_bloom_section(spark, sf):
    """The LARGE-corpus ExactSubstr plan (r7 bloom path), captured with
    the small-corpus gate disabled — this is the plan a 100-TB corpus
    takes."""
    import codd_spark.operators.dedup as dd
    from codd_spark.sources.readers import read_table

    saved = dd._EXACT_SUBSTR_SMALL_DOCS
    dd._EXACT_SUBSTR_SMALL_DOCS = -1
    try:
        docs = read_table(spark, sf, "documents").select("doc_id", "text")
        spans = dd.exact_substring_spans(docs, min_len=40, min_count=2)
        plan = spans._jdf.queryExecution().executedPlan().toString()
        spans.release_cache()
    finally:
        dd._EXACT_SUBSTR_SMALL_DOCS = saved
    note = (
        "ExactSubstr LARGE-corpus plan (gate disabled; the 100-TB "
        "shape): phase 1 counts BARE 8-byte window hashes (map-side "
        "partials) — the only corpus-sized exchange; the repeated set "
        "becomes a capped (2^27-bit) blocked-Bloom broadcast that "
        "prunes candidate positions MAP-SIDE with the text still in "
        "scope (one BroadcastHashJoin, zero position exchange — the r6 "
        "(id,off,h) shuffle and the full-text re-join are gone); exact "
        "substring-count verify and per-doc islands merge run on "
        "candidate-sized exchanges only ({s} and {id} keys). No "
        "pairwise stage, no suffix array."
    )
    lines = [l[:160] for l in plan.splitlines()[:40]]
    return [
        "## exact_substr_spans_bloom (large-corpus path)\n\n"
        + note
        + "\n\n```\n"
        + "\n".join(lines)
        + "\n```\n"
    ]


def _streaming_resample_section(spark, sf):
    """events_resample_stream: the executed micro-batch plan, captured
    from the availableNow run itself (a streaming frame has no
    executedPlan until a trigger fires)."""
    import uuid

    from pyspark.sql import functions as F  # noqa: F401

    from __spark_entry__ import _events_stream
    from codd_spark.streaming.stateful import streaming_resample

    sdf = _events_stream(spark, sf).filter("user_id < 20")
    o = streaming_resample(sdf, "ts", "value", key_col="user_id", unit="hour")
    name = f"plans_resample_{uuid.uuid4().hex[:8]}"
    q = (
        o.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    plan = q._jsq.explainInternal(False)
    q.stop()
    note = (
        "Stateful streaming resample (applyInPandasWithState, append "
        "mode): ONE exchange on the state key feeds "
        "FlatMapGroupsWithStateExec; emission is close-on-later-bucket "
        "so the streamed rows equal the batch resample minus each key's "
        "trailing open bucket (the driver oracle's exact definition)."
    )
    lines = [l[:160] for l in plan.splitlines()[:40]]
    return [f"## events_resample_stream\n\n{note}\n\n```\n" + "\n".join(lines) + "\n```\n"]


def _bucketed_state_sections(spark, sf):
    """Persistent incremental-dedup state: the cross-probe plan against
    the bucketed tables, BEFORE and AFTER compact() — the state side
    must read `Bucketed: true` with no Exchange in both (the only
    Exchange belongs to the O(batch) probe side)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from codd_spark.operators.dedup import IncrementalDeduplicator
    from codd_spark.sources.readers import read_table

    docs = read_table(spark, sf, "documents")
    d = tempfile.mkdtemp(prefix="plans_state_")
    out = []
    try:
        dd = IncrementalDeduplicator(spark, state_dir=d, state_buckets=8)
        dd.add_batch(docs.filter("doc_id < 200"))
        dd.add_batch(docs.filter("doc_id >= 200 AND doc_id < 400"))

        def probe_plan():
            probe = spark.createDataFrame(
                [(7, 3, 123456789)], "id LONG, band INT, h LONG"
            )
            j = dd._kept_buckets.select(
                "band", "h", F.col("id").alias("id_l")
            ).join(
                probe.select("band", "h", F.col("id").alias("id_r")).hint(
                    "shuffle_merge"
                ),
                on=["band", "h"],
            )
            return j._jdf.queryExecution().executedPlan().toString()

        pre = probe_plan()
        dd.compact()
        post = probe_plan()
        note_pre = (
            "Probe join against the (band,h)-bucketed persistent state "
            "(2 arrivals, 2 generation dirs): state side scans with "
            "`Bucketed: true` and NO Exchange — the single Exchange is "
            "the O(batch) probe side."
        )
        note_post = (
            "Same probe AFTER compact(): generations consolidated to one "
            "directory per table (file count bounded at n_buckets), plan "
            "shape unchanged — still exactly one probe-side Exchange, "
            "state side bucketed."
        )
        for title, note, plan in (
            ("bucketed_state_probe", note_pre, pre),
            ("bucketed_state_probe_post_compact", note_post, post),
        ):
            lines = [l[:160] for l in plan.splitlines()[:40]]
            out.append(f"## {title}\n\n{note}\n\n```\n" + "\n".join(lines) + "\n```\n")
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return out


if __name__ == "__main__":
    main()
