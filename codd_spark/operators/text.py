"""Text-analysis operators: language ID, quality scoring, token stats,
winnowing fingerprints. All pure column expressions (codegen path)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

from codd_spark.functions.text import punct_ratio, token_count, tokens

# Tiny high-frequency stopword sets per language — the classic cheap
# lang-id heuristic: score = fraction of tokens that are stopwords of L.
_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "that", "it", "for", "on", "with", "as", "was", "at"),
    "de": ("der", "die", "das", "und", "ist", "ich", "nicht", "ein", "eine", "zu", "den", "mit", "von", "auf", "für"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "de", "des", "que", "pour", "dans", "qui", "pas", "sur"),
    "es": ("el", "la", "los", "las", "y", "es", "un", "una", "de", "que", "en", "por", "con", "para", "no"),
    "it": ("il", "la", "le", "e", "è", "un", "una", "di", "che", "per", "non", "con", "sono", "del", "si"),
}


def _stopword_hits(toks_lc: Column, words: tuple[str, ...]) -> Column:
    return F.size(F.array_intersect(toks_lc, F.array(*[F.lit(w) for w in words])))


def lang_id_from_tokens(
    toks_lc: Column, langs: dict[str, tuple[str, ...]] | None = None
) -> Column:
    """lang_id over a pre-materialized lowercase token-array column.
    Prefer this inside multi-feature projections: referencing an expression
    (rather than an attribute) here re-tokenizes once per language."""
    langs = langs or _STOPWORDS
    scored = F.array(
        *[
            F.struct(_stopword_hits(toks_lc, words).alias("score"), F.lit(code).alias("lang"))
            for code, words in sorted(langs.items())
        ]
    )
    best = F.array_max(scored)
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def lang_id(text_col: Column, langs: dict[str, tuple[str, ...]] | None = None) -> Column:
    """Best-guess language code by stopword-hit score; 'und' (undetermined)
    when no stopword of any language appears. Ties break lexicographically
    larger-lang-wins via struct max — deterministic."""
    return lang_id_from_tokens(F.transform(tokens(text_col), F.lower), langs)


def stopword_ratio_from_tokens(
    toks_lc: Column, words: tuple[str, ...] | None = None
) -> Column:
    """stopword_ratio over a pre-materialized lowercase token array.
    Counts multiplicity (filter, not set-intersect)."""
    words = words or _STOPWORDS["en"]
    return F.when(
        F.size(toks_lc) > 0,
        F.size(F.filter(toks_lc, lambda t: t.isin(*words))).cast("double")
        / F.size(toks_lc).cast("double"),
    ).otherwise(F.lit(0.0))


def stopword_ratio(text_col: Column, words: tuple[str, ...] | None = None) -> Column:
    return stopword_ratio_from_tokens(F.transform(tokens(text_col), F.lower), words)


def quality_score(text_col: Column, n_tok: Column | None = None) -> Column:
    """Heuristic document quality in [0,1] from cheap surface statistics:
    length band, mean token length band, punctuation ratio, all-caps ratio.
    The shape (not the exact weights) mirrors standard pretraining-corpus
    quality filters (C4/Gopher-style rules). Pass a pre-computed token
    count via ``n_tok`` to avoid re-tokenizing in multi-feature
    projections."""
    n_tok = token_count(text_col) if n_tok is None else n_tok
    n_char = F.length(text_col)
    mean_tok_len = F.when(n_tok > 0, n_char.cast("double") / n_tok.cast("double")).otherwise(0.0)
    p_ratio = punct_ratio(text_col)

    len_ok = F.when((n_tok >= 10) & (n_tok <= 100000), 1.0).otherwise(0.3)
    tok_len_ok = F.when((mean_tok_len >= 2.5) & (mean_tok_len <= 12.0), 1.0).otherwise(0.4)
    punct_ok = F.when(p_ratio <= 0.25, 1.0).otherwise(0.5)
    caps = F.length(F.regexp_replace(text_col, r"[^A-Z]", ""))
    caps_ratio = F.when(n_char > 0, caps.cast("double") / n_char.cast("double")).otherwise(0.0)
    caps_ok = F.when(caps_ratio <= 0.3, 1.0).otherwise(0.6)

    return F.round(len_ok * 0.4 + tok_len_ok * 0.25 + punct_ok * 0.2 + caps_ok * 0.15, 6)


def winnowing_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    w: int = 4,
    *,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD'03): hash
    every k-gram, slide a window of w hashes, keep each window's minimum —
    a position-robust sketch for plagiarism-style overlap detection.
    Returns (id, fingerprints sorted array<long>).

    Implemented in ROW form (grams exploded to rows, sliding minimum as
    a rows-between window, collect_set reassembly) rather than nested
    array lambdas — see the in-body comment for why the array
    formulation was an optimizer hazard.

    ``hash_fn`` picks the k-gram hash: ``"xxhash64"`` (default — fastest,
    JVM-native) or ``"md5_60"`` (the top 60 bits of md5 as a BIGINT via
    conv(substring(md5(g),1,15),16,10) — bit-identical in DuckDB as
    CAST('0x'||substr(md5(g),1,15) AS BIGINT), which makes the contract
    query independently oracle-replayable). Same sketch guarantees
    either way; fingerprints from different hash_fn values don't mix."""
    from codd_spark.functions.text import normalize_ws

    if hash_fn == "xxhash64":
        def h(c):
            return F.xxhash64(c)
    elif hash_fn == "md5_60":
        def h(c):
            return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")
    else:
        raise ValueError(f"hash_fn must be 'xxhash64' or 'md5_60', got {hash_fn!r}")

    # ROW form, not nested array lambdas: grams become rows via a
    # generator, the sliding minimum is the engine's window operator,
    # and the sketch reassembles with collect_set. The earlier staged
    # array formulation was one optimizer decision away from an O(n³)
    # cliff: CollapseProject's protection depends on DOWNSTREAM
    # reference counts, so any consumer referencing `fingerprints` once
    # (sum(size(...)), an explode feeding a pair join) let Catalyst
    # inline the stages — re-running regex-normalize per k-gram per
    # window (observed: a thread spinning in Lower.eval for minutes on
    # 500 docs; projections also push through a repartition, so an
    # exchange is no barrier either). Row form is collapse-proof by
    # construction — the generator's child project evaluates
    # normalize_ws ONCE per document, every per-row expression reads
    # attributes — and costs ONE corpus-linear exchange: the groupBy
    # reuses the window's id partitioning.
    # repartition by id BEFORE the per-position hashing — same move as
    # _winnowing_fp_rows (r13): the window needs hashpartitioning(id)
    # anyway, so the exchange carries (id, text) instead of exploded
    # gram rows and the k-gram hashing runs at full parallelism.
    par = df.sparkSession.sparkContext.defaultParallelism
    normed = df.repartition(par, F.col(id_col)).select(
        F.col(id_col).alias("id"), normalize_ws(F.col(text_col)).alias("t")
    )
    n_grams = F.greatest(F.length("t") - (k - 1), F.lit(1))
    rows = normed.select(
        "id",
        "t",
        n_grams.alias("ng"),
        F.explode(F.sequence(F.lit(1), n_grams)).alias("i"),
    ).select(
        "id", "ng", "i", h(F.col("t").substr(F.col("i"), F.lit(k))).alias("kh")
    )
    win = (
        Window.partitionBy("id")
        .orderBy("i")
        .rowsBetween(Window.currentRow, w - 1)
    )
    mins = rows.select(
        "id", "ng", "i", F.min("kh").over(win).alias("m")
    ).filter(F.col("i") <= F.greatest(F.col("ng") - (w - 1), F.lit(1)))
    out = mins.groupBy("id").agg(
        F.array_sort(F.collect_set("m")).alias("fingerprints")
    )
    return out.withColumnRenamed("id", id_col) if id_col != "id" else out


def _winnowing_fp_rows(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
    w: int,
    hash_fn: str,
) -> DataFrame:
    """The fingerprint sketch in ROW form: distinct (id, fp) — exactly
    the rows ``explode(winnowing_fingerprints(...).fingerprints)`` would
    produce (collect_set dedups; distinct dedups the same), minus the
    collect_set + re-explode round trip. The pair miner works on rows
    anyway, so the array stage was two aggregates of pure overhead on
    its path — and flat (long, long) rows are an order of magnitude
    cheaper to persist than array<long> sketches."""
    from codd_spark.functions.text import normalize_ws

    if hash_fn == "xxhash64":
        def h(c):
            return F.xxhash64(c)
    else:
        def h(c):
            return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")

    # repartition by id BEFORE the per-position k-gram hashing (r13): the
    # sliding-min window needs hashpartitioning(id) anyway, so putting
    # the exchange first (a) carries (id, text) bytes instead of the
    # ~10x larger exploded (id, ng, i, kh) gram rows, and (b) runs the
    # per-position md5/xxhash — the operator's dominant CPU — at full
    # parallelism instead of at the input's split count (profiled r13:
    # a one-file corpus serialized 5 s of hashing onto ONE task). Same
    # two-exchange plan at any scale; strictly fewer shuffled bytes.
    par = df.sparkSession.sparkContext.defaultParallelism
    normed = df.repartition(par, F.col(id_col)).select(
        F.col(id_col).alias("id"), normalize_ws(F.col(text_col)).alias("t")
    )
    n_grams = F.greatest(F.length("t") - (k - 1), F.lit(1))
    rows = normed.select(
        "id",
        "t",
        n_grams.alias("ng"),
        F.explode(F.sequence(F.lit(1), n_grams)).alias("i"),
    ).select(
        "id", "ng", "i", h(F.col("t").substr(F.col("i"), F.lit(k))).alias("kh")
    )
    win = (
        Window.partitionBy("id")
        .orderBy("i")
        .rowsBetween(Window.currentRow, w - 1)
    )
    mins = rows.select(
        "id", "ng", "i", F.min("kh").over(win).alias("m")
    ).filter(F.col("i") <= F.greatest(F.col("ng") - (w - 1), F.lit(1)))
    return mins.select("id", F.col("m").alias("fp")).distinct()


def winnowing_overlap_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    w: int = 4,
    *,
    min_shared: int = 2,
    max_bucket_size: int = 1000,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """MOSS-style overlap mining over winnowing fingerprints (Schleimer
    et al., SIGMOD'03 §4): all document pairs sharing >= ``min_shared``
    fingerprints, with the shared count and each side's overlap fraction
    -> (id_a, id_b, n_shared, frac_a, frac_b), id_a < id_b.

    The fingerprint sketch guarantees any shared substring of length
    >= k + w - 1 contributes at least one common fingerprint, so pairs
    with substantial verbatim overlap are always candidates; counting
    shared fingerprints (not verifying substrings) is the plagiarism-
    detector contract — ``frac`` is the containment-style score MOSS
    reports.

    Scale shape: fingerprints are corpus-linear (the winnowing density
    is 2/(w+1) per position); ONE equi-join on the fingerprint hash +
    one pair aggregate — the same bucket-join discipline as the LSH
    miners, including the degenerate-bucket guard: a fingerprint shared
    by more than ``max_bucket_size`` docs (boilerplate) would contribute
    O(bucket²) candidate rows and is dropped from pair generation (its
    absence only lowers n_shared — same guard semantics as
    minhash_near_duplicates). Both join sides are corpus-derived, so the
    join is shuffle-pinned, never broadcast.

    The fingerprint sketch is computed ONCE, in row form, and PERSISTED
    across the pair join (r9 — VERDICT r8 item 6, the same discipline as
    minhash's shingle cache): the unpersisted plan re-evaluated the
    explode+window stage once per consumer (Generate appeared 6x in the
    executed plan, zero ReusedExchange — both self-join sides and both
    size joins), and persisting the ARRAY sketch was a wash because
    serializing array<long> cells cost as much as the recompute. The
    row form (distinct (id, fp) longs — what the miner consumes anyway)
    skips the collect_set+re-explode round trip AND caches cheaply; the
    per-doc size is a count over the cached rows, identical to
    size(fingerprints). Release via ``result.release_cache()`` or gc,
    as with the dedup pipelines. The join+guard+aggregate itself is the
    generic shared-key miner (``dedup.shared_key_overlap_pairs``), also
    used for frame-hash video near-dup (operators/multimodal.py)."""
    from codd_spark.operators.dedup import shared_key_overlap_pairs

    rows = _winnowing_fp_rows(df, id_col, text_col, k, w, hash_fn)
    return shared_key_overlap_pairs(
        rows, min_shared=min_shared, max_bucket_size=max_bucket_size
    )


def ngram_novelty(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    n: int = 3,
) -> DataFrame:
    """Per-document n-gram novelty -> (id, n_grams, novel_frac): the
    fraction of the document's DISTINCT word-n-grams that appear in no
    other document. The inverse lens of ``boilerplate_ngrams`` — that
    ranks shared templates corpus-wide, this scores each document:
    near-0 means assembled from corpus boilerplate (SEO spam, mirror
    chrome), near-1 means mostly original text. A standard cheap
    curation signal between exact dedup and MinHash.

    Scale shape: per-doc distinct BEFORE the explode (no multiplicity
    inflation), grams travel as xxhash64 longs, ONE gram-keyed count
    aggregate with map-side combine, one gram-keyed join back, per-doc
    aggregate. All corpus-linear; nothing broadcasts."""
    toked = df.select(
        F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("__toks")
    )
    grams = toked.select(
        "id",
        F.explode(
            F.array_distinct(ngram_array(F.col("__toks"), n))
        ).alias("g"),
    ).select("id", F.xxhash64("g").alias("gh"))
    freq = grams.groupBy("gh").agg(F.count("*").alias("df_"))
    return (
        grams.join(freq.hint("shuffle_merge"), on="gh")
        .groupBy("id")
        .agg(
            F.count("*").alias("n_grams"),
            F.round(
                F.sum(F.when(F.col("df_") == 1, 1).otherwise(0))
                / F.count("*"),
                6,
            ).alias("novel_frac"),
        )
        .select(F.col("id").alias(id_col), "n_grams", "novel_frac")
    )


def pii_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    patterns: dict[str, str] | None = None,
) -> DataFrame:
    """Per-document PII hit counts -> (id, <one count column per
    pattern>, pii_total): the measurement half of ``redact_pii`` — run
    it first to decide drop-vs-redact thresholds and to audit a corpus
    before release. Pure ``regexp_count`` column expressions (one scan,
    no explode, no shuffle beyond the caller's)."""
    pats = patterns or PII_PATTERNS
    counts = [
        F.regexp_count(F.col(text_col), F.lit(rx)).alias(f"n_{name}")
        for name, rx in pats.items()
    ]
    out = df.select(F.col(id_col), *counts)
    total = None
    for name in pats:
        c = F.col(f"n_{name}")
        total = c if total is None else total + c
    return out.withColumn("pii_total", total)


def zipf_stats(
    df: DataFrame,
    text_col: str = "text",
    group_col: str | None = "source",
) -> DataFrame:
    """Vocabulary-shape diagnostics per group (or one corpus-wide row
    with ``group_col=None``): token count, vocabulary size, type-token
    ratio, top-token share, and the Zipf slope — the OLS slope of
    ln(frequency) against ln(rank) over the full vocabulary (a healthy
    natural-language corpus sits near -1; templated/boilerplate slices
    flatten toward 0, key-value dumps steepen). The standard quick probe
    for "does this source look like language?" before expensive quality
    models.

    Shape at scale: one explode (corpus-linear) -> (group, term)
    frequency aggregate with map-side combine (vocabulary-sized) ->
    per-group rank window + regression AGGREGATES over the vocabulary
    table only. Ranks use row_number ordered (freq DESC, term ASC) so
    ties are deterministic and any SQL engine replays them exactly.
    With ``group_col=None`` the corpus-wide rank would funnel the whole
    vocabulary through ONE task as an empty-key window; that mode
    instead uses ``global_rank`` (range-repartition + broadcast
    per-partition offsets), which produces the identical total order
    (-tf ASC, term ASC ≡ tf DESC, term ASC) partition-parallel."""
    gcols = [group_col] if group_col else []
    term_rows = df.select(
        *gcols, F.explode(F.transform(tokens(F.col(text_col)), F.lower)).alias("term")
    ).where(F.col("term") != "")
    freq = term_rows.groupBy(*gcols, "term").agg(F.count("*").alias("tf"))
    if gcols:
        w = Window.partitionBy(*gcols).orderBy(
            F.col("tf").desc(), F.col("term").asc()
        )
        ranked = freq.select(
            *gcols, "tf", F.row_number().over(w).alias("rk")
        )
    else:
        from codd_spark.operators.linkage import global_rank

        ranked = global_rank(
            freq.withColumn("__neg_tf", -F.col("tf")),
            ["__neg_tf", "term"],
            out_col="rk",
        ).select("tf", "rk")
    out = ranked.groupBy(*gcols).agg(
        F.sum("tf").alias("n_tokens"),
        F.count("*").alias("vocab_size"),
        F.round(F.count("*") / F.sum("tf"), 6).alias("type_token_ratio"),
        F.round(F.max("tf") / F.sum("tf"), 6).alias("top_token_share"),
        F.round(
            F.regr_slope(F.log(F.col("tf").cast("double")), F.log(F.col("rk").cast("double"))),
            6,
        ).alias("zipf_slope"),
    )
    return out


def ngram_array(toks: Column, n: int) -> Column:
    """Token n-grams (space-joined) from a token-array column via
    zip_with over shifted slices — pure codegen, no explode."""
    if n == 1:
        return toks
    size = F.size(toks)
    out = F.slice(toks, 1, F.greatest(size - (n - 1), F.lit(0)))
    for i in range(2, n + 1):
        shifted = F.slice(toks, i, F.greatest(size - (n - 1), F.lit(0)))
        out = F.zip_with(out, shifted, lambda a, b: F.concat_ws(" ", a, b))
    return out


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition signals per document (Rae et al. 2021 §A1.1
    use these to drop boilerplate/spam from pretraining corpora):

    - ``distinct_token_ratio``  — type/token ratio (low = repetitive)
    - ``top_token_frac``        — share of the single most frequent token
    - ``dup_2gram_frac``/``dup_3gram_frac`` — fraction of n-gram
      occurrences that are repeats of an earlier n-gram

    Deliberately computed as explode → groupBy(id, gram) → groupBy(id)
    partial-aggregating counts, NOT per-row array lambdas: the groupBy
    shape is linear in corpus size, map-side combines before the one
    exchange on the doc id, and never materializes a per-document
    frequency map in executor memory — a 100k-token document costs the
    same per token as a 50-token one."""
    toks_lc = F.transform(tokens(F.col(text_col)), F.lower)
    base = df.select(F.col(id_col).alias("__id"), toks_lc.alias("__toks"))

    def per_doc(gram_col: Column, prefix: str) -> DataFrame:
        return (
            base.select("__id", F.explode(gram_col).alias("g"))
            .groupBy("__id", "g")
            .agg(F.count("*").alias("cnt"))
            .groupBy("__id")
            .agg(
                F.sum("cnt").alias(f"{prefix}_total"),
                F.count("*").alias(f"{prefix}_distinct"),
                F.max("cnt").alias(f"{prefix}_top"),
            )
        )

    t1 = per_doc(F.col("__toks"), "t1")
    t2 = per_doc(ngram_array(F.col("__toks"), 2), "t2")
    t3 = per_doc(ngram_array(F.col("__toks"), 3), "t3")
    joined = t1.join(t2, "__id", "left").join(t3, "__id", "left")

    def frac(num: Column, den: Column) -> Column:
        return F.round(
            F.when(den > 0, num.cast("double") / den.cast("double")).otherwise(0.0), 6
        )

    return joined.select(
        F.col("__id").alias(id_col),
        F.col("t1_total").alias("n_tokens"),
        frac(F.col("t1_distinct"), F.col("t1_total")).alias("distinct_token_ratio"),
        frac(F.col("t1_top"), F.col("t1_total")).alias("top_token_frac"),
        frac(F.col("t2_total") - F.col("t2_distinct"), F.col("t2_total")).alias("dup_2gram_frac"),
        frac(F.col("t3_total") - F.col("t3_distinct"), F.col("t3_total")).alias("dup_3gram_frac"),
    )


def add_text_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the standard text-analysis feature columns.

    Two projections, not one: the lowercase token array is materialized as
    a staged column first, and every token-derived feature (token count,
    stopword ratio, the 5 per-language lang-id intersects, quality) then
    references that ATTRIBUTE. CollapseProject leaves the stage in place
    because the non-cheap producer is referenced many times downstream; the
    fully-inlined formulation re-splits the text once per feature (~7× —
    measured 2.45 s vs ~0.9 s at sf0.1)."""
    c = F.col(text_col)
    staged = df.withColumn("__toks_lc", F.transform(tokens(c), F.lower))
    toks = F.col("__toks_lc")
    n_tok = F.size(toks)
    return staged.withColumns(
        {
            "n_chars_actual": F.length(c),
            "n_tokens": n_tok,
            "punct_ratio": F.round(punct_ratio(c), 6),
            "stopword_ratio_en": F.round(stopword_ratio_from_tokens(toks), 6),
            "lang_guess": lang_id_from_tokens(toks),
            "quality": quality_score(c, n_tok=n_tok),
        }
    ).drop("__toks_lc")


def tf_idf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    k: int = 5,
) -> DataFrame:
    """Top-k TF-IDF terms per document: (id, term, tf, tf_idf, rank).

    Shape at scale: tokens explode ONCE; term frequencies are one
    (doc, term) groupBy with map-side combine; document frequencies are a
    second, term-keyed aggregate over the (doc, term) rows the first
    aggregate already produced (no re-tokenization, no second explode);
    the tf<->df join shuffles on the term key — vocabulary-sized, which
    grows with the corpus, so it is never broadcast — and the 1-row doc
    count broadcasts. idf = ln(n_docs / df). Ranking uses the ROUNDED
    score with a term tiebreak so the top-k cut is deterministic across
    engines.
    """
    from pyspark.sql.window import Window

    toked = df.select(
        F.col(id_col).alias("id"),
        F.transform(tokens(F.col(text_col)), F.lower).alias("toks"),
    )
    term_rows = toked.select("id", F.explode("toks").alias("term")).where(
        F.col("term") != ""
    )
    tf = term_rows.groupBy("id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = df.select(F.countDistinct(id_col).alias("n_docs"))
    scored = (
        tf.join(dfreq.hint("shuffle_merge"), on="term")
        .join(F.broadcast(n_docs))
        .withColumn(
            "tf_idf",
            F.round(
                F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")), 6
            ),
        )
    )
    w = Window.partitionBy("id").orderBy(F.desc("tf_idf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(F.col("id").alias(id_col), "term", "tf", "tf_idf", "rank")
    )


def bm25_top_k(
    df: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 lexical retrieval: top-k documents for a bag of query terms —
    the sparse complement of the dense ANN family (brute/LSH/IVF/PQ/SQ);
    hybrid retrieval unions both candidate sets and re-scores.

    Okapi BM25 with the standard +1-smoothed idf:
    score(d) = Σ_t ln(1 + (N - df_t + 0.5)/(df_t + 0.5)) ·
               tf_td·(k1+1) / (tf_td + k1·(1 − b + b·|d|/avgdl)).

    Shape at scale: tokens explode ONCE; per-doc term frequencies and doc
    lengths come from one (doc, term) aggregate; document frequencies are
    computed ONLY for the query terms (the term rows are semi-filtered by
    the literal query array before the df aggregate, so the vocab-sized
    table never materializes); N and avgdl are a 1-row broadcast. Final
    score is one per-doc aggregate + top-k via TakeOrderedAndProject.
    Ranking uses the ROUNDED score with an id tiebreak so the cut is
    deterministic across engines.
    """
    from pyspark.sql.window import Window

    terms = [t.lower() for t in query_terms]
    if not terms:
        raise ValueError("query_terms must be non-empty")
    qlit = F.array(*[F.lit(t) for t in terms])

    toked = df.select(
        F.col(id_col).alias("id"),
        F.transform(tokens(F.col(text_col)), F.lower).alias("toks"),
    )
    lens = toked.select("id", F.size("toks").alias("dl"))
    stats = lens.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )

    term_rows = toked.select("id", F.explode("toks").alias("term")).where(
        F.array_contains(qlit, F.col("term"))
    )
    tf = term_rows.groupBy("id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))  # query-terms only: tiny

    scored = (
        tf.join(F.broadcast(dfreq), on="term")
        .join(lens.hint("shuffle_merge"), on="id")
        .join(F.broadcast(stats))
        .withColumn(
            "part",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            )
            * (F.col("tf") * F.lit(k1 + 1.0))
            / (
                F.col("tf")
                + F.lit(k1)
                * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
            ),
        )
    )
    per_doc = scored.groupBy("id").agg(
        F.round(F.sum("part"), 6).alias("bm25"),
        F.count("*").alias("n_matched_terms"),
    )
    # top-k via orderBy+limit = TakeOrderedAndProject (per-partition heap +
    # driver merge of k rows) — a global rank window here would funnel
    # every matched document through one task; the rank is assigned over
    # the k survivors only
    topk = per_doc.orderBy(F.desc("bm25"), F.asc("id")).limit(k)
    w = Window.orderBy(F.desc("bm25"), F.asc("id"))
    return (
        topk.withColumn("rank", F.row_number().over(w))
        .select(F.col("id").alias(id_col), "bm25", "n_matched_terms", "rank")
    )


def boilerplate_ngrams(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    n: int = 5,
    min_docs: int = 2,
) -> DataFrame:
    """Cross-document boilerplate mining: token n-grams appearing in at
    least ``min_docs`` DISTINCT documents -> (ngram, n_docs, doc_frac).

    The complement of repetition_stats (within-doc signals): shared
    n-grams across documents are headers/footers/navigation chrome/
    license blocks — the stock preprocessing step before near-dup mining
    so boilerplate doesn't glue unrelated documents into one cluster.
    Shape at scale: explode -> per-doc DISTINCT n-grams (array_distinct
    BEFORE the explode, so a doc repeating its own header doesn't
    inflate the count) -> one ngram-keyed count with map-side combine;
    the 1-row corpus count broadcasts. Linear in corpus token count.
    """
    toks_lc = F.transform(tokens(F.col(text_col)), F.lower)
    per_doc = df.select(
        F.col(id_col).alias("__id"),
        F.explode(F.array_distinct(ngram_array(toks_lc, n))).alias("ngram"),
    ).where(F.col("ngram") != "")
    n_docs_total = df.select(F.countDistinct(id_col).alias("n_docs_total"))
    return (
        per_doc.groupBy("ngram")
        .agg(F.count("*").alias("n_docs"))  # rows are distinct (doc, ngram)
        .where(F.col("n_docs") >= min_docs)
        .join(F.broadcast(n_docs_total))
        .select(
            "ngram",
            "n_docs",
            F.round(
                F.col("n_docs").cast("double") / F.col("n_docs_total"), 6
            ).alias("doc_frac"),
        )
    )


def unigram_surprisal(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Mean unigram surprisal per document: -avg(ln p(token)), with p
    estimated from the corpus itself -> (id, n_tokens, mean_surprisal).

    The cheap LM-quality proxy: documents whose tokens are corpus-typical
    score low; gibberish, wrong-language and machine-mangled text score
    high — a standard pretraining-corpus outlier filter one rung below a
    real LM. Shape at scale: one explode; token frequencies are one
    vocab-keyed aggregate; the tokens<->frequency join shuffles on the
    token key (vocab grows with the corpus — never broadcast); the 1-row
    total broadcasts; final per-doc aggregate with map-side combine.
    """
    toked = df.select(
        F.col(id_col).alias("id"),
        F.transform(tokens(F.col(text_col)), F.lower).alias("toks"),
    )
    term_rows = toked.select("id", F.explode("toks").alias("term")).where(
        F.col("term") != ""
    )
    freq = term_rows.groupBy("term").agg(F.count("*").alias("tf"))
    total = freq.agg(F.sum("tf").alias("n_total"))
    return (
        term_rows.join(freq.hint("shuffle_merge"), on="term")
        .join(F.broadcast(total))
        .groupBy("id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(
                -F.avg(F.log(F.col("tf").cast("double") / F.col("n_total"))), 6
            ).alias("mean_surprisal"),
        )
        .select(F.col("id").alias(id_col), "n_tokens", "mean_surprisal")
    )


def bigram_surprisal(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    k: float = 1.0,
) -> DataFrame:
    """Mean bigram surprisal per document: -avg(ln p(w2 | w1)) under a
    corpus-trained add-k (Laplace) bigram model ->
    (id, n_bigrams, mean_surprisal).

    One rung above ``unigram_surprisal`` on the LM-quality-filter ladder
    (the CCNet/Gopher recipe scores documents with an n-gram LM before
    any neural model): word-salad that passes the unigram filter —
    corpus-typical tokens in corpus-atypical ORDER — scores high here.
    p(w2|w1) = (c(w1,w2) + k) / (c(w1) + k·V), with c(w1) the count of
    bigrams starting with w1 and V the corpus unigram vocabulary, so the
    estimate is a proper conditional distribution per context.

    Shape at scale: one explode into bigram rows (corpus-linear); the
    (w1,w2) count and the w1 context count are vocabulary-keyed
    aggregates JOINED TO EACH OTHER first (model-sized, never the fact
    table twice); the single fact-table join shuffles on (w1,w2); V is a
    1-row broadcast; final per-doc aggregate has map-side combine.
    Documents with fewer than two tokens have no bigrams and are absent
    from the output (no conditional to score)."""
    toked = df.select(
        F.col(id_col).alias("id"),
        F.filter(
            F.transform(tokens(F.col(text_col)), F.lower), lambda t: t != ""
        ).alias("toks"),
    )
    bigram_rows = toked.select(
        "id",
        F.explode(
            F.arrays_zip(
                F.slice("toks", 1, F.greatest(F.size("toks") - 1, F.lit(0))).alias("w1"),
                F.slice("toks", 2, F.greatest(F.size("toks") - 1, F.lit(0))).alias("w2"),
            )
        ).alias("bg"),
    ).select("id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    c12 = bigram_rows.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    c1 = bigram_rows.groupBy("w1").agg(F.count("*").alias("c1"))
    vocab = toked.select(F.explode("toks").alias("t")).agg(
        F.countDistinct("t").alias("v")
    )
    model = (
        c12.join(c1.hint("shuffle_merge"), on="w1")
        .join(F.broadcast(vocab))
        .select(
            "w1",
            "w2",
            (
                (F.col("c12") + F.lit(k))
                / (F.col("c1") + F.lit(k) * F.col("v"))
            ).alias("p"),
        )
    )
    return (
        bigram_rows.join(model.hint("shuffle_merge"), on=["w1", "w2"])
        .groupBy("id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(-F.avg(F.log("p")), 6).alias("mean_surprisal"),
        )
        .select(F.col("id").alias(id_col), "n_bigrams", "mean_surprisal")
    )


def perplexity_buckets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    *,
    k: float = 1.0,
    n_buckets: int = 3,
) -> DataFrame:
    """CCNet-style LM-quality bucketing (Wenzek et al. 2020): score
    every document with the corpus-trained Laplace bigram LM
    (``bigram_surprisal``) and split each LANGUAGE's documents into
    ``n_buckets`` equal tiers by ascending surprisal — CCNet's
    head/middle/tail cut, where pretraining keeps "head" (the cleanest
    third) and drops or downsamples "tail". Returns (id, lang,
    n_bigrams, mean_surprisal, bucket, tier): bucket 1..n_buckets,
    tier = head/middle/tail when n_buckets == 3 (else NULL). Documents
    with fewer than two tokens have no bigrams and are absent, matching
    ``bigram_surprisal``.

    NO single-task window at scale: the per-language NTILE is computed
    from a scalable global rank (``linkage.global_rank`` — range
    repartition + per-partition row_number + broadcast offsets) over
    (lang, surprisal, id), converted to a per-language rank by
    subtracting broadcast per-language bases, then mapped through the
    CLOSED FORM of SQL NTILE semantics (first n%b buckets take
    ceil(n/b) rows). A 10^9-document dominant language never serializes
    through one window task, yet the result is exactly what
    ``NTILE(b) OVER (PARTITION BY lang ORDER BY surprisal, id)``
    computes — which is how the oracle replays it. Determinism: the
    order key is the ROUNDED surprisal (both engines agree on it) with
    the id as tiebreak.

    NULL-language documents (an upstream LID gate that abstained) pass
    through with NULL bucket/tier instead of silently vanishing — the
    same NULL-key contract ``url_dedup``/``host_cap`` adopted (ADVICE
    r11: the per-language join would otherwise drop them with no
    error). One stream, no union: NULL-lang rows ride the same rank +
    LEFT-join path (a NULL key matches no per-language base row, so
    the NTILE closed form yields NULL bucket arithmetically) — an
    earlier union-based passthrough duplicated the whole bigram-LM
    scoring subtree into a second leg (r12 self-review)."""
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    from codd_spark.operators.linkage import global_rank

    ms = bigram_surprisal(df, id_col, text_col, k=k)
    scored = ms.join(
        df.select(F.col(id_col), F.col(lang_col).alias("__lang")), on=id_col
    )
    ranked = global_rank(
        scored, ["__lang", "mean_surprisal", id_col], out_col="__g"
    )
    per_lang = ranked.groupBy("__lang").agg(
        F.count("*").alias("__n"), F.min("__g").alias("__base")
    ).where(F.col("__lang").isNotNull())
    # LEFT join: a NULL language key matches no per-language row, so
    # __n/__base stay NULL and the closed-form arithmetic below yields
    # the NULL bucket the passthrough contract requires — no union leg
    r = (
        ranked.join(F.broadcast(per_lang), on="__lang", how="left")
        .withColumn("__r", F.col("__g") - F.col("__base") + 1)
    )
    size = F.floor(F.col("__n") / n_buckets).cast("long")
    rem = (F.col("__n") % n_buckets).cast("long")
    big = size + 1
    cut = rem * big  # ranks <= cut live in the (size+1)-row buckets
    bucket = F.when(
        F.col("__r") <= cut, F.floor((F.col("__r") - 1) / big) + 1
    ).otherwise(
        rem
        + F.floor(
            (F.col("__r") - 1 - cut) / F.greatest(size, F.lit(1))
        )
        + 1
    ).cast("int")
    out = r.select(
        F.col(id_col),
        F.col("__lang").alias(lang_col),
        "n_bigrams",
        "mean_surprisal",
        bucket.alias("bucket"),
    )
    tier = (
        F.when(F.col("bucket").isNull(), F.lit(None).cast("string"))
        .when(F.col("bucket") == 1, "head")
        .when(F.col("bucket") == 2, "middle")
        .otherwise("tail")
        if n_buckets == 3
        else F.lit(None).cast("string")
    )
    return out.withColumn("tier", tier)


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# Patterns restricted to syntax valid in BOTH Java regex (Spark) and RE2
# (DuckDB oracle): no lookarounds, no backrefs. Order matters — patterns
# are applied sequentially, so earlier categories must not leave partial
# matches for later ones (email before ipv4 before phone).
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "phone": r"\+?\d{3}[-. ]\d{3}[-. ]\d{4}",
}


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    patterns: dict[str, str] | None = None,
    token: str = "[PII]",
    redacted_col: str = "redacted",
) -> DataFrame:
    """Scrub PII-shaped substrings (emails, IPv4, SSN, phone) from a text
    column and count per-category hits.

    Training-corpus compliance pass: the reference engine exposes no text
    scrubbing, but any pipeline feeding a 100 TB crawl into a model needs
    one. Everything is a chained ``regexp_replace`` / ``regexp_extract_all``
    Column expression — whole-stage codegen, zero Python, zero shuffles:
    the operator is a pure map and composes with scan pushdown (filters on
    the counts prune at the parquet reader if staged before a write).
    Counts are computed against the ORIGINAL text per category, so one
    category's replacement never hides another's hits.
    """
    pats = patterns or PII_PATTERNS
    out = df
    red: Column = F.col(text_col)
    for name, pat in pats.items():
        out = out.withColumn(
            f"n_{name}",
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), 0)).cast("bigint"),
        )
        red = F.regexp_replace(red, pat, token)
    return out.withColumn(redacted_col, red)


def token_cooccurrence(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    min_pairs: int = 5,
    min_token_docs: int = 2,
    top: int = 100,
) -> DataFrame:
    """Document-level token association mining: for token pairs that
    co-occur in >= ``min_pairs`` documents, the association ``lift``
    = P(a,b) / (P(a)P(b)) = n_ab * N / (n_a * n_b), plus ``pmi``
    = ln(lift). Output: top ``top`` pairs by (lift desc, tok_a, tok_b)
    — (tok_a, tok_b, n_ab, lift, pmi), lift/pmi rounded to 6.

    The word2vec/phrase-mining preprocessing primitive. Plan: distinct
    (doc, token) pairs -> token doc-frequency (one agg; tokens below
    ``min_token_docs`` docs are pruned BEFORE the pair stage) -> per-doc
    pair generation via a self-equi-join on the doc id (tok_a < tok_b)
    -> one pair-count aggregate -> broadcast of the 1-row corpus size.
    Vocabulary joins (prune, n_a/n_b lookups) stay size-gated equi-joins
    — a web-scale vocabulary is not broadcastable; only the 1-row corpus
    count is forced broadcast.
    Co-occurrence is inherently O(L^2) per document in the pair stage;
    the min_token_docs prune and the per-doc bound keep the blowup
    L_pruned^2, and the join is an equi-join on the doc id, so documents
    parallelize perfectly (no cross-doc pairs ever form).

    ``lift`` is pure arithmetic on counts (hash-stable across engines);
    ``pmi`` goes through libm's log, deterministic within an engine but
    cross-engine comparisons should use lift."""
    dt = (
        df.select(F.col(id_col).alias("doc"), F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("tok"))
        .filter(F.col("tok") != "")
    )
    tok_df = dt.groupBy("tok").agg(F.count("*").alias("n_t")).filter(
        F.col("n_t") >= min_token_docs
    )
    pruned = dt.join(tok_df.select("tok"), "tok")
    a = pruned.select("doc", F.col("tok").alias("tok_a"))
    b = pruned.select("doc", F.col("tok").alias("tok_b"))
    pairs = (
        a.join(b, "doc")
        .filter(F.col("tok_a") < F.col("tok_b"))
        .groupBy("tok_a", "tok_b")
        .agg(F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= min_pairs)
    )
    n_docs = df.select(F.count("*").alias("__N"))
    na = tok_df.select(F.col("tok").alias("tok_a"), F.col("n_t").alias("n_a"))
    nb = tok_df.select(F.col("tok").alias("tok_b"), F.col("n_t").alias("n_b"))
    lift = (
        F.col("n_ab").cast("double")
        * F.col("__N")
        / (F.col("n_a") * F.col("n_b"))
    )
    return (
        pairs.join(na, "tok_a")
        .join(nb, "tok_b")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "tok_a",
            "tok_b",
            "n_ab",
            F.round(lift, 6).alias("lift"),
            F.round(F.log(lift), 6).alias("pmi"),
        )
        .orderBy(F.desc("lift"), "tok_a", "tok_b")
        .limit(top)
    )
