"""End-to-end corpus curation — the composition the engine exists for:
quality-filter -> language-filter -> exact dedup -> (optional) near-dup
removal -> stats. Everything stays declarative, so Catalyst fuses the
filters into the scan and the whole pipeline is one job.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from codd_spark.functions.text import fingerprint_md5
from codd_spark.operators.dedup import minhash_near_duplicates
from codd_spark.operators.text import quality_score


def curate_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str | None = "lang",
    keep_langs: tuple[str, ...] = ("en",),
    min_quality: float = 0.7,
    near_dup_threshold: float | None = None,
) -> DataFrame:
    """Curated corpus: quality- and language-filtered, exact-deduped
    (keep the smallest id per normalized-content fingerprint), optionally
    minus MinHash near-duplicates (keeping each pair's smaller id).

    ``near_dup_threshold=None`` skips the LSH stage (the exact pipeline is
    fully SQL-checkable; the LSH stage is probabilistic-recall)."""
    filtered = df.withColumn("__q", quality_score(F.col(text_col))).filter(
        F.col("__q") >= min_quality
    )
    if lang_col is not None and keep_langs:
        filtered = filtered.filter(F.col(lang_col).isin(*keep_langs))

    # exact dedup, deterministic keeper = min id per fingerprint
    fp = filtered.withColumn("__fp", fingerprint_md5(F.col(text_col)))
    keepers = fp.groupBy("__fp").agg(F.min(id_col).alias(id_col))
    curated = fp.join(keepers, on=["__fp", id_col]).drop("__fp", "__q")

    if near_dup_threshold is not None:
        from codd_spark.operators.dedup import _adopt_release

        pairs = minhash_near_duplicates(
            curated, id_col, text_col, threshold=near_dup_threshold
        )
        # losers grow with the corpus — shuffle anti-join, never broadcast
        losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
        curated = _adopt_release(
            curated.join(losers.hint("shuffle_merge"), on=[id_col], how="anti"),
            pairs,
        )
    return curated


def corpus_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-row corpus summary with the approximate (sketch-based) scale
    paths: HLL distinct fingerprints, approximate length percentiles."""
    return df.agg(
        F.count("*").alias("n_docs"),
        F.approx_count_distinct(fingerprint_md5(F.col(text_col)), 0.02).alias(
            "approx_distinct_contents"
        ),
        F.percentile_approx(F.length(text_col), [0.5, 0.9, 0.99], 10000).alias(
            "len_percentiles"
        ),
    )


def normalize_per_group(
    df: DataFrame, keys: list[str], value_col: str, out_col: str = "z"
) -> DataFrame:
    """Per-group z-score via window mean/stddev — the built-in route for
    what naive code does with a grouped-map pandas UDF (this stays in the
    JVM; use applyInPandas only when the per-group logic is genuinely
    opaque)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(*keys)
    mean = F.avg(value_col).over(w)
    std = F.stddev_samp(value_col).over(w)
    return df.withColumn(
        out_col, F.when(std > 0, (F.col(value_col) - mean) / std)
    )


def latest_per_key(
    df: DataFrame,
    keys: list[str],
    order_by: list[str],
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Keep the most recent version of each key — the "current snapshot"
    dedup every refreshed corpus needs (crawl recrawls, upserted records).

    row_number over (keys, order_by DESC) = 1, with an explicit unique
    ``tiebreak`` so the kept row is deterministic when versions share a
    timestamp. One shuffle on the keys; at 100 TB prefer pre-bucketing the
    table on the same keys so the window sorts within bucket files and the
    exchange disappears (see sinks.write_bucketed)."""
    from pyspark.sql.window import Window

    order = [F.desc(c) for c in order_by] + [F.desc(c) for c in (tiebreak or [])]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    fractions: dict[str, float],
    id_col: str,
    salt: int = 0,
    hasher: str = "xxhash64",
) -> DataFrame:
    """Deterministic per-stratum subsample: keep a row iff
    hash(id, salt) mod 1e6 < fraction·1e6 for its stratum's fraction
    (missing strata keep nothing). Unlike ``df.sampleBy`` this is a pure
    projection — no RNG state, stable across retries/cluster sizes, and
    the same id set is chosen no matter how the data is partitioned,
    which is what makes downsampling reproducible in a recurring
    pipeline. Fractions are exact in expectation; per-stratum counts
    concentrate tightly for large strata.

    ``hasher``: "xxhash64" (default, well-mixed) or "lcg" (expressible in
    any SQL dialect — used by the cross-engine oracle)."""
    if hasher == "xxhash64":
        mills = F.pmod(F.xxhash64(F.col(id_col), F.lit(salt)), F.lit(1_000_000))
    elif hasher == "lcg":
        m = F.lit(2147483648)
        h = F.pmod(F.pmod(F.col(id_col) + F.lit(salt), m) * F.lit(1103515245) + F.lit(12345), m)
        mills = F.pmod(h, F.lit(1_000_000))
    else:
        raise ValueError(f"unknown hasher {hasher!r}")
    thresh = None
    for stratum, frac in sorted(fractions.items()):
        cond = (F.col(stratum_col) == stratum) & (mills < F.lit(int(frac * 1_000_000)))
        thresh = cond if thresh is None else (thresh | cond)
    if thresh is None:
        raise ValueError("fractions must be non-empty")
    return df.filter(thresh)


def train_val_test_split(
    df: DataFrame,
    id_col: str,
    val_pct: int = 10,
    test_pct: int = 10,
    salt: int = 0,
    hasher: str = "xxhash64",
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment by hashing a stable id —
    the split every training-data pipeline needs. Purely row-local (a
    projection: no shuffle, no sample() nondeterminism across retries or
    cluster sizes); the same id always lands in the same split, so
    incremental corpus refreshes never leak rows across splits.

    ``hasher="xxhash64"`` (default) gives well-mixed 64-bit buckets.
    ``hasher="lcg"`` uses a 31-bit linear-congruential mix expressible in
    any SQL dialect (used by the cross-engine oracle test); both are
    overflow-safe: the id is reduced mod 2^31 before the multiply.
    """
    if val_pct + test_pct >= 100:
        raise ValueError("val_pct + test_pct must leave room for train")
    if hasher == "xxhash64":
        bucket = F.pmod(F.xxhash64(F.col(id_col), F.lit(salt)), F.lit(100))
    elif hasher == "lcg":
        m = F.lit(2147483648)
        h = F.pmod(F.pmod(F.col(id_col) + F.lit(salt), m) * F.lit(1103515245) + F.lit(12345), m)
        bucket = F.pmod(h, F.lit(100))
    else:
        raise ValueError(f"unknown hasher {hasher!r}")
    train_hi = 100 - val_pct - test_pct
    return df.withColumn(
        split_col,
        F.when(bucket < train_hi, F.lit("train"))
        .when(bucket < train_hi + val_pct, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def cluster_safe_split(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    *,
    val_pct: int = 10,
    test_pct: int = 10,
    salt: int = 0,
    hasher: str = "xxhash64",
) -> DataFrame:
    """Leakage-safe train/val/test split: hash the near-dup CLUSTER id,
    not the document id, so every member of a duplicate cluster lands in
    the same split. Splitting by document id silently leaks: a train doc
    and its near-duplicate in the eval split share almost all content,
    and the eval loss stops measuring generalization. Returns docs +
    (cluster_id, split).

    Composition: connected components over the pair graph (isolated docs
    are their own singleton cluster) -> deterministic hash split on the
    component id. Same shuffle budget as dedup_clusters plus a projection.
    """
    from codd_spark.operators.graph import connected_components

    cc = connected_components(pairs, nodes=docs.select(id_col), node_col=id_col)
    labeled = docs.join(
        cc.hint("shuffle_merge").select(
            F.col("id").alias(id_col), F.col("component").alias("cluster_id")
        ),
        on=id_col,
    )
    return train_val_test_split(
        labeled, "cluster_id", val_pct=val_pct, test_pct=test_pct,
        salt=salt, hasher=hasher,
    )


def robust_outliers(
    df: DataFrame,
    value_col: str,
    keys: list[str] | None = None,
    *,
    z_max: float = 3.5,
    out_col: str = "is_outlier",
) -> DataFrame:
    """Median/MAD robust outlier flag — the data-cleaning filter that
    mean/stddev z-scores cannot be: one wild value inflates the stddev
    until nothing is an outlier (masking), while the median and the
    median-absolute-deviation have a 50% breakdown point.

    Flags rows with modified z-score |0.6745·(x - median) / MAD| > z_max
    (the standard Iglewicz-Hoaglin form). EXACT medians via two grouped
    ``percentile`` passes (each a key-partitioned aggregate with partial
    combine — two exchanges total; swap in ``percentile_approx`` at
    true scale for one-pass sketching). MAD = 0 (over half the group
    identical) flags nothing — every deviation is then infinite-z by the
    formula, which misreads discrete-valued groups.

    Returns the input rows plus THREE documented columns: ``out_col``
    (the flag), ``med`` and ``mad`` (the group stats the flag was scored
    against — callers routinely need them for reporting/thresholding,
    and re-deriving them would repeat both percentile passes).
    """
    gkeys = keys or []
    # the stats tables are one row per key group: join strategy is left
    # to AQE's size gate (auto-broadcast when small, shuffle when the key
    # cardinality grows with the corpus) — never force-broadcast a table
    # whose size scales with the data
    med = (
        df.groupBy(*gkeys).agg(F.percentile(value_col, F.lit(0.5)).alias("med"))
        if gkeys
        else df.agg(F.percentile(value_col, F.lit(0.5)).alias("med"))
    )
    joined = df.join(med, on=gkeys) if gkeys else df.crossJoin(F.broadcast(med))
    dev = joined.withColumn("__adev", F.abs(F.col(value_col) - F.col("med")))
    mad = (
        dev.groupBy(*gkeys).agg(F.percentile("__adev", F.lit(0.5)).alias("mad"))
        if gkeys
        else dev.agg(F.percentile("__adev", F.lit(0.5)).alias("mad"))
    )
    scored = dev.join(mad, on=gkeys) if gkeys else dev.crossJoin(F.broadcast(mad))
    z = F.lit(0.6745) * (F.col(value_col) - F.col("med")) / F.col("mad")
    return scored.withColumn(
        out_col,
        F.when(F.col("mad") > 0, F.abs(z) > F.lit(z_max)).otherwise(F.lit(False)),
    ).drop("__adev")


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    chunk_tokens: int = 128,
    overlap: int = 16,
) -> DataFrame:
    """Split documents into fixed-size token chunks with overlap ->
    (id, chunk_idx, chunk_text, n_tokens) — the context-window
    preparation step of a training pipeline.

    Chunks start every ``chunk_tokens - overlap`` tokens; the final chunk
    may be short; a document shorter than one chunk yields exactly one.
    Pure Column expressions: the token array is staged once, chunk starts
    come from ``sequence`` + posexplode, each chunk is a ``slice`` of the
    staged array — no Python, no quadratic re-tokenization; output rows
    are ~(total tokens / stride), linear in corpus size.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    from codd_spark.functions.text import tokens

    stride = chunk_tokens - overlap
    toked = df.select(
        F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("__toks")
    ).select("id", "__toks", F.size("__toks").alias("__n"))
    # number of chunks: ceil(max(n - overlap, 1) / stride), minimum 1
    n_chunks = F.greatest(
        F.ceil((F.greatest(F.col("__n") - overlap, F.lit(1))) / F.lit(stride)),
        F.lit(1),
    ).cast("int")
    return (
        toked.select(
            "id",
            "__toks",
            F.posexplode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx", "__s"),
        )
        .select(
            F.col("id").alias(id_col),
            "chunk_idx",
            F.concat_ws(
                " ", F.slice(F.col("__toks"), F.col("__s") * stride + 1, chunk_tokens)
            ).alias("chunk_text"),
            F.least(
                F.size("__toks") - F.col("__s") * stride, F.lit(chunk_tokens)
            ).alias("n_tokens"),
        )
    )


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    token_count_col: str = "n_tokens",
    *,
    window: int = 2048,
    n_shards: int = 64,
    shard_expr: F.Column | None = None,
) -> DataFrame:
    """Lay documents out in packed training context windows (the
    GPT-style concatenate-then-split layout): (id, shard, pack_id,
    offset_tokens), where each shard is an independent concatenated token
    stream split into ``window``-token context windows; ``pack_id`` is
    the window containing the document's first token and
    ``offset_tokens`` its start position inside that window. Documents
    may straddle window boundaries — standard for packed pretraining
    batches, where attention masks handle the crossings.

    Packing is inherently sequential, so it shards first: docs hash into
    ``n_shards`` independent streams; within a stream the layout is an
    exclusive running token-count sum (one window function partitioned by
    shard, ordered by id — deterministic, no RNG). One shuffle on the
    shard key; parallelism = n_shards regardless of corpus size.
    ``shard_expr`` overrides the default xxhash64 sharding (e.g. a plain
    modulus when the layout must be reproducible by another engine).
    """
    from pyspark.sql.window import Window as W

    if shard_expr is None:
        shard_expr = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards))
    shard = shard_expr.alias("shard")
    w = W.partitionBy("shard").orderBy(F.col(id_col))
    run = F.sum(token_count_col).over(w)  # inclusive running total
    start = F.col("__run") - F.col(token_count_col)  # exclusive prefix sum
    return (
        df.select(F.col(id_col), F.col(token_count_col), shard)
        .withColumn("__run", run)
        .select(
            id_col,
            "shard",
            F.floor(start / F.lit(window)).cast("bigint").alias("pack_id"),
            (start - F.floor(start / F.lit(window)) * window)
            .cast("bigint")
            .alias("offset_tokens"),
        )
    )


def _lcg_mills(id_col: str, salt: int) -> Column:
    """31-bit LCG hash of an integer id, reduced to [0, 1e6) — the
    cross-engine deterministic sampler shared with stratified_sample /
    train_val_test_split (expressible in any SQL dialect)."""
    m = F.lit(2147483648)
    h = F.pmod(F.pmod(F.col(id_col) + F.lit(salt), m) * F.lit(1103515245) + F.lit(12345), m)
    return F.pmod(h, F.lit(1_000_000))


def token_budget_sample(
    df: DataFrame,
    group_col: str,
    budget: int,
    cost_col: str,
    id_col: str,
    salt: int = 0,
) -> DataFrame:
    """Per-group budget cap: keep a deterministic pseudo-random subset of
    each group whose cumulative ``cost_col`` (tokens, chars, bytes) stays
    within ``budget`` — "at most N tokens per source/domain", the mixture
    control every pretraining corpus applies before packing.

    Rows are prioritized by a stable hash of the id (so the kept set is a
    uniform sample of the group, reproducible across retries and cluster
    sizes, and REFRESH-STABLE: re-running on a grown corpus keeps a
    superset-invariant priority order rather than whatever order the scan
    produced). One window shuffle on the group key; the running sum is a
    single sort within each group partition. Skewed groups (one domain
    with 10^9 docs) sort within their partition only — at 100 TB, stage
    the heavy groups through ``stratified_sample`` first if a group's
    rows exceed executor memory."""
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy(group_col)
        .orderBy(_lcg_mills(id_col, salt), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("__cum", F.sum(F.col(cost_col)).over(w))
        .filter(F.col("__cum") <= F.lit(budget))
        .drop("__cum")
    )


def temperature_mixture_sample(
    df: DataFrame,
    group_col: str,
    target_rows: int,
    id_col: str,
    salt: int = 0,
) -> DataFrame:
    """Temperature-weighted (alpha = 0.5) mixture resampling across
    sources: sample group g at a rate proportional to sqrt(n_g)/n_g, so
    small sources are upweighted relative to their natural share — the
    standard multiplicative rebalancing for multilingual / multi-domain
    pretraining mixes (rates clip at 1.0: no upsampling, only relative
    downsampling of dominant sources).

    rate_g = min(1, target_rows * sqrt(n_g) / (sum_h sqrt(n_h)) / n_g)

    The per-group weight sqrt(n_g) is staged through DECIMAL before the
    cross-group sum so the sum is order-insensitive (float addition order
    varies with partitioning; decimal addition doesn't) — the same
    discipline the aggregate oracles use. Group counts are one partial-agg
    shuffle over the group key; the tiny rate table (one row per source —
    bounded by the domain vocabulary, not the corpus) broadcasts back, and
    selection is the pure-projection hash filter. Expected output size is
    ~target_rows when no rate clips."""
    counts = df.groupBy(group_col).agg(F.count("*").alias("__n"))
    weighted = counts.withColumn(
        "__w", F.sqrt(F.col("__n").cast("double")).cast("decimal(25,10)")
    )
    total = weighted.agg(F.sum("__w").alias("__sw"))
    rates = (
        weighted.join(F.broadcast(total))
        .withColumn(
            "__rate",
            F.least(
                F.lit(1.0),
                F.lit(float(target_rows))
                * F.col("__w").cast("double")
                / F.col("__sw").cast("double")
                / F.col("__n").cast("double"),
            ),
        )
        .withColumn("__cut", F.floor(F.col("__rate") * F.lit(1_000_000)).cast("bigint"))
        .select(group_col, "__cut")
    )
    return (
        df.join(F.broadcast(rates), on=group_col)
        .filter(_lcg_mills(id_col, salt) < F.col("__cut"))
        .drop("__cut")
    )


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    n_features: int = 4096,
    alpha: float = 1.0,
    bigrams: bool = True,
    mode: str = "topk",
    salt: int = 0,
) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR, Xie et al.,
    NeurIPS 2023): pick the ``k`` documents from a large RAW pool that
    look most like a small TARGET corpus, under hashed-n-gram bag
    unigram language models of each side. The standard
    pretraining-data-selection step — "give me the CommonCrawl subset
    that looks like Wikipedia" — as two counting passes and a top-k.

    Importance log-weight of a raw document with hashed-feature counts
    x_f:  log w = sum_f x_f * (ln p_target(f) - ln p_raw(f)), where
    p(f) = (c_f + alpha) / (C + alpha * n_features) are
    Laplace-smoothed hashed-n-gram LMs (the raw LM is trained on the
    pool being scored, the target LM on ``target``). Selection:

    - ``mode="topk"`` (default): the k highest log-weights —
      deterministic, the paper's "top-k" variant;
    - ``mode="gumbel"``: Gumbel-top-k, i.e. sampling WITHOUT
      replacement proportionally to w — the paper's resampling
      variant, with the Gumbel noise -ln(-ln u) drawn from the shared
      deterministic 31-bit LCG over the id (reruns and SQL oracles
      reproduce the sample bit-for-bit).

    Returns (id, log_weight) for the k selected documents, log_weight
    rounded to 6 digits (cross-engine float discipline; ties break on
    id). Join back to ``raw`` on the id for the full rows.

    Scale shape: feature extraction is expression-only (the classifier's
    ``hashed_text_features``); each LM is ONE feature-keyed count
    aggregate bounded at ``n_features`` rows; the log-ratio table
    (<= n_features rows) BROADCASTS, so scoring is a map-side join plus
    one id-keyed sum; selection is TakeOrderedAndProject. No
    corpus-sized shuffle after the counts, no driver collect — the same
    plan at 100 TB, which is exactly why DSIR-style selection is used
    at that scale.
    """
    from codd_spark.operators.classify import hashed_text_features

    if mode not in ("topk", "gumbel"):
        raise ValueError(f"mode must be 'topk' or 'gumbel', got {mode!r}")
    if k < 1:
        raise ValueError("k must be >= 1")
    if target.isEmpty():
        # an empty target LM would silently score every document 0 —
        # fail loud instead (the target is small by definition, so this
        # probe costs one partition scan)
        raise ValueError("target corpus is empty — nothing to match against")

    fr = hashed_text_features(
        raw, id_col, text_col, n_features=n_features, bigrams=bigrams
    )
    ft = hashed_text_features(
        target, id_col, text_col, n_features=n_features, bigrams=bigrams
    )
    # the two LM count tables are bounded at n_features rows but each
    # derives from a full corpus scan — persist them so totals and the
    # log-ratio table read the cached counts instead of re-aggregating
    # the corpus (3 raw-corpus scans -> 1 for the LM + 1 for scoring);
    # release rides the result's lifecycle (dedup's finalizer pattern)
    from codd_spark.operators.dedup import _attach_release

    cr = fr.groupBy("feature").agg(F.sum("x").alias("cr")).persist()
    ct = ft.groupBy("feature").agg(F.sum("x").alias("ct")).persist()
    aD = float(alpha) * n_features
    totals = (
        cr.agg(F.sum("cr").alias("__tot_r"))
        .crossJoin(ct.agg(F.sum("ct").alias("__tot_t")))
    )
    # every feature of every raw doc appears in cr by construction (the
    # raw LM is trained on the pool being scored), so a left join from
    # cr covers the whole scoring domain; target-unseen features get
    # ct_f = 0 through the smoothing
    lam = (
        cr.join(ct, on="feature", how="left")
        .crossJoin(F.broadcast(totals))
        .select(
            "feature",
            (
                F.log(F.coalesce(F.col("ct"), F.lit(0)) + F.lit(float(alpha)))
                - F.log(F.col("__tot_t") + F.lit(aD))
                - F.log(F.col("cr") + F.lit(float(alpha)))
                + F.log(F.col("__tot_r") + F.lit(aD))
            ).alias("lam"),
        )
    )
    scores = (
        fr.join(F.broadcast(lam), on="feature")
        .groupBy("id")
        .agg(F.sum(F.col("x") * F.col("lam")).alias("__dot"))
    )
    scored = (
        raw.select(F.col(id_col).alias("id"))
        .join(scores, on="id", how="left")
        .select(
            "id", F.round(F.coalesce(F.col("__dot"), F.lit(0.0)), 6).alias("log_weight")
        )
    )
    if mode == "gumbel":
        u = (_lcg_mills("id", salt).cast("double") + F.lit(0.5)) / F.lit(1_000_000.0)
        scored = scored.withColumn(
            "__key", F.round(F.col("log_weight") - F.log(-F.log(u)), 6)
        )
    else:
        scored = scored.withColumn("__key", F.col("log_weight"))
    out = (
        scored.orderBy(F.desc("__key"), F.asc("id"))
        .limit(k)
        .select(F.col("id").alias(id_col), "log_weight")
    )
    return _attach_release(out, cr, ct)


def shuffle_shards(
    df: DataFrame,
    n_shards: int,
    id_col: str,
    salt: int = 0,
    shard_col: str = "shard",
    order_col: str = "shuffle_order",
) -> DataFrame:
    """Deterministic global training-order shuffle: every row gets a shard
    in [0, n_shards) and an in-shard order key, both pure functions of
    (id, salt). Unlike ``df.orderBy(rand())`` this is reproducible across
    retries, cluster sizes and partitionings — re-running the export
    yields byte-identical epoch order — and changing ``salt`` re-deals a
    fresh epoch permutation without touching the data. A pure projection:
    no shuffle until a writer repartitions by shard."""
    m = F.lit(2147483648)
    h = F.pmod(
        F.pmod(F.col(id_col) + F.lit(salt), m) * F.lit(1103515245) + F.lit(12345), m
    )
    return df.withColumn(shard_col, F.pmod(h, F.lit(n_shards))).withColumn(order_col, h)


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str,
    salt: int = 0,
    fmt: str = "parquet",
) -> None:
    """Export the corpus as n_shards hash-ordered shard directories — the
    final layout a data loader consumes (shard = worker unit, in-shard
    order = deterministic epoch shuffle). One repartition on the shard id
    (each output task owns whole shards -> one file per shard directory)
    and a sortWithinPartitions for the in-shard order; nothing touches
    the driver. At 100 TB pick n_shards so each shard is 100 MB - 1 GB:
    shard count scales with the corpus, never with the cluster."""
    out = shuffle_shards(df, n_shards, id_col, salt)
    (
        # the shard column leads the sort so the partitioned writer's
        # required ordering is already satisfied and it never re-sorts
        # (its internal sort is partition-cols-only and not stable)
        out.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "shuffle_order", id_col)
        .write.partitionBy("shard")
        .format(fmt)
        .mode("overwrite")
        .save(path)
    )


def weighted_sample_k(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str,
    salt: int = 0,
    *,
    group_col: str | None = None,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement of exactly k
    rows (per group, if ``group_col`` is given): the Efraimidis-Spirakis
    A-ES scheme — each row draws u in (0,1) and ranks by ln(u)/w, the
    top k win. Inclusion probability is proportional to weight, no row
    repeats, and — unlike weighted-rate filters — the output size is
    EXACTLY k even when weights are skewed.

    The quality-weighted corpus subsample: w = quality score (or token
    count, or recency decay) picks the best-k documents stochastically
    instead of a hard threshold, preserving tail diversity.

    u comes from the shared 31-bit LCG over the row id (the
    cross-engine deterministic sampler of stratified_sample /
    train_val_test_split), so reruns and SQL oracles reproduce the
    sample bit-for-bit. Plan shape: pure projection for the key, one
    window (or TakeOrderedAndProject when ungrouped) for the top-k.
    Rows with weight <= 0 or NULL never win (key -> -infinity).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    u = (_lcg_mills(id_col, salt).cast("double") + F.lit(0.5)) / F.lit(1_000_000.0)
    key = F.when(
        F.col(weight_col).isNotNull() & (F.col(weight_col) > 0),
        F.log(u) / F.col(weight_col).cast("double"),
    ).otherwise(F.lit(float("-inf")))
    keyed = df.withColumn("__aes", F.round(key, 9))
    if group_col is None:
        out = keyed.orderBy(F.desc("__aes"), F.asc(id_col)).limit(k)
    else:
        from pyspark.sql.window import Window

        w = Window.partitionBy(group_col).orderBy(F.desc("__aes"), F.asc(id_col))
        out = keyed.withColumn("__rn", F.row_number().over(w)).filter(
            F.col("__rn") <= k
        ).drop("__rn")
    return out.drop("__aes")


def host_cap(
    df: DataFrame,
    id_col: str = "doc_id",
    url_col: str = "url",
    *,
    max_per_host: int = 1000,
    strip_www: bool = True,
    n_salts: int = 32,
) -> DataFrame:
    """Per-host document cap — the crawl-politeness / anti-SEO-farm
    curation move: keep at most ``max_per_host`` documents per canonical
    host (lowest ids win, so reruns and grown crawls keep the same
    pages), dropping the rest. Link farms and auto-generated mirror
    sites otherwise contribute millions of near-identical pages that no
    content-level dedup fully removes.

    Returns (id, host, host_rank): one row per KEPT document,
    host_rank = 1..max_per_host within its host. Documents whose URL is
    NULL or carries no parseable host are NOT a host: they bypass the
    cap and pass through with host NULL and host_rank NULL (the same
    NULL-key contract as ``url_dedup``).

    Scale shape: NO per-host window sort — a 10^9-page host would
    serialize one task through one global sort. The cap is an exact
    two-phase min-N aggregate: per (host, salt) partial top-N via
    array_sort + slice, then the per-host merge re-sorts the
    <= n_salts * max_per_host surviving candidates (min-N composes:
    top-N of a union == top-N of per-part top-Ns). Memory honesty: the
    LEAF collect_list state is (host ∩ salt)-sized — ``n_salts`` is the
    knob that divides the hottest host across tasks (size it ~
    host_size / 10^6 under extreme skew); each partial EMITS only
    max_per_host ids, so the merge level is bounded by config. Spark
    has no bounded top-N aggregate without a Python UDAF; this trades
    one tunable leaf for never paying a single-task host sort."""
    if max_per_host < 1:
        raise ValueError(f"max_per_host must be >= 1, got {max_per_host}")
    from codd_spark.functions.url import url_host

    host = F.when(
        F.col(url_col).isNotNull(),
        F.nullif(url_host(F.col(url_col), strip_www=strip_www), F.lit("")),
    )
    based = df.select(F.col(id_col).alias("id"), host.alias("host"))
    hosted = based.where(F.col("host").isNotNull())
    partial = (
        hosted.withColumn("__salt", F.pmod(F.col("id"), F.lit(n_salts)))
        .groupBy("host", "__salt")
        .agg(
            F.slice(
                F.array_sort(F.collect_list("id")), 1, max_per_host
            ).alias("ids")
        )
    )
    kept = (
        partial.groupBy("host")
        .agg(
            F.slice(
                F.array_sort(F.flatten(F.collect_list("ids"))),
                1,
                max_per_host,
            ).alias("ids")
        )
        .select("host", F.posexplode("ids").alias("r0", "id"))
        .select(
            F.col("id").alias(id_col),
            "host",
            (F.col("r0") + 1).cast("int").alias("host_rank"),
        )
    )
    passthrough = based.where(F.col("host").isNull()).select(
        F.col("id").alias(id_col),
        F.lit(None).cast("string").alias("host"),
        F.lit(None).cast("int").alias("host_rank"),
    )
    return kept.unionByName(passthrough)


def curate_web_pipeline(
    df: DataFrame,
    id_col: str = "doc_id",
    html_col: str = "html",
    url_col: str = "url",
    *,
    line_min_count: int = 4,
    min_tokens: int = 20,
    max_per_host: int = 50,
    n_salts: int = 32,
) -> DataFrame:
    """End-to-end WEB curation (round 13) — the fetch-side chain a
    crawl runs BEFORE the text pipeline, composed from audited
    building blocks and replayable whole:

    1. **Extract** (``text.html_to_text``): raw HTML -> text, the
       codegen regex chain (script/style/comment kill, block-closer
       newlines, tag strip, entity decode, whitespace normalize).
    2. **Line dedup** (``dedup.line_dedup``, md5_60): corpus-wide
       CCNet boilerplate removal over the EXTRACTED text — lines
       repeating >= ``line_min_count`` drop from every page, pages
       reassemble in order.
    3. **Length gate**: pages with fewer than ``min_tokens``
       whitespace tokens AFTER cleaning drop (navigation shells whose
       content was all chrome die here, not in the tokenizer).
    4. **Host cap** (``host_cap``): at most ``max_per_host`` surviving
       pages per canonical host, lowest ids win; NULL/unparseable-host
       pages bypass (the NULL-key contract).

    Returns (id, host, host_rank, cleaned_text, n_lines, n_removed,
    n_tokens) for the surviving pages. The composition is semi-joins on
    ids over stages that each keep their audited scale shape (regex
    chain is map-only; line dedup is one count aggregate + reassembly;
    the cap is the salted two-phase min-N aggregate — no per-host
    window). Stage boundaries are MATERIALIZED (eager localCheckpoint)
    because downstream stages re-read their input (line_dedup's count
    and reassembly both consume the extraction; the cap and the final
    join both consume the gate) — the curate_text_pipeline lesson.
    """
    from codd_spark.functions.text import html_to_text
    from codd_spark.operators.dedup import line_dedup

    extracted = df.select(
        F.col(id_col), html_to_text(F.col(html_col)).alias("text")
    ).localCheckpoint(eager=True)
    deduped = line_dedup(
        extracted, id_col, "text",
        min_count=line_min_count, hash_fn="md5_60",
    )
    # token count of the CLEANED text; empty-filtered so an all-chrome
    # page counts 0 (split("") yields [""] otherwise)
    n_tokens = F.size(
        F.filter(
            F.split(F.trim(F.col("cleaned_text")), r"\s+"),
            lambda t: t != "",
        )
    )
    gated = (
        deduped.withColumn("n_tokens", n_tokens.cast("long"))
        .where(F.col("n_tokens") >= min_tokens)
        .localCheckpoint(eager=True)
    )
    capped = host_cap(
        df.select(id_col, url_col).join(
            gated.select(id_col).hint("shuffle_merge"),
            on=id_col, how="left_semi",
        ),
        id_col, url_col,
        max_per_host=max_per_host, n_salts=n_salts,
    )
    return capped.join(gated.hint("shuffle_merge"), on=id_col).select(
        id_col, "host", "host_rank",
        "cleaned_text", "n_lines", "n_removed", "n_tokens",
    )


def curate_text_pipeline(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    url_col: str = "url",
    *,
    keep_langs: tuple[int, ...] = (0,),
    lang_model_features: int = 4096,
    keep_tiers: tuple[str, ...] = ("head", "middle"),
    train_filter: str | None = None,
) -> DataFrame:
    """End-to-end TEXT curation — the chain a crawl actually runs, as
    one composed operator over this round's building blocks:

    1. **URL dedup** (``dedup.url_dedup``): one keeper per canonical
       URL (refetches never reach the tokenizer); NULL-url docs pass.
    2. **Language ID** (``classify.nb_multiclass_*`` on char 2..4-gram
       features): a NB language gate trained IN-PIPELINE on the labeled
       slice selected by ``train_filter`` (SQL over the input columns;
       None = train on every kept doc — the contract uses a held-in
       80% slice), scoring every URL-kept doc; keep ``keep_langs``.
    3. **Perplexity cut** (``text.perplexity_buckets``): bigram-LM
       head/middle/tail within each PREDICTED language over the
       lang-kept subset; keep ``keep_tiers``.

    Returns (id, pred_lang, mean_surprisal, bucket, tier) — the
    surviving training-set candidates with their routing metadata.

    Every stage is the already-audited scale shape (single aggregate
    URL dedup; broadcast-bounded NB model, map-side scoring; scalable
    rank + closed-form NTILE). The stages compose map-to-aggregate with
    no new join classes, so the pipeline inherits each stage's 100 TB
    judgment. Requires a label column ``y`` on ``df`` for the LID
    training slice (production would load a pretrained model via
    ``nb_multiclass_load`` instead — the in-pipeline training keeps the
    contract engine-replayable end to end)."""
    from codd_spark.operators.classify import (
        hashed_char_ngram_features,
        nb_multiclass_score,
        nb_multiclass_train,
    )
    from codd_spark.operators.dedup import url_dedup
    from codd_spark.operators.text import perplexity_buckets

    kept_urls = url_dedup(df, id_col, url_col).select(id_col)
    # stage boundaries are MATERIALIZED (eager localCheckpoint): each
    # downstream stage reads its input several times (NB train + score
    # both consume the feature table; the bigram LM's three aggregates
    # and the rank all re-read `lang_kept`), and without the cut every
    # read replays the whole upstream chain — measured 6x the pipeline
    # cost at sf0.1. Checkpoints are O(surviving corpus) rows,
    # GC-managed.
    kept = df.join(
        kept_urls.hint("shuffle_merge"), on=id_col, how="left_semi"
    ).localCheckpoint(eager=True)

    # featurize ONCE (r13 — the langid_chargram featurize-once move,
    # VERDICT r12 item 9, applied to the composed pipeline): the char
    # 2..4-gram pass is the pipeline's dominant CPU and used to run
    # twice (train + score each featurized `kept`). One materialized
    # (id, feature, x) table feeds both; the trainer's label join
    # restricts it to the training split. The spine is spread to full
    # parallelism first — `kept` is a post-join checkpoint that AQE has
    # typically coalesced to a handful of partitions, which would
    # serialize the substr->md5->count chain.
    par = df.sparkSession.sparkContext.defaultParallelism
    feats_all = hashed_char_ngram_features(
        kept.repartition(par, F.col(id_col)), id_col, text_col,
        n_features=lang_model_features,
    ).localCheckpoint(eager=True)

    train = kept.filter(train_filter) if train_filter else kept
    model = nb_multiclass_train(
        train, "y", id_col, text_col,
        n_features=lang_model_features, features="char", feats=feats_all,
    )
    scored = nb_multiclass_score(
        kept, model, id_col, text_col,
        n_features=lang_model_features, features="char", feats=feats_all,
    ).select(id_col, F.col("pred").alias("pred_lang"))
    lang_kept = (
        kept.join(scored, on=id_col)
        .filter(F.col("pred_lang").isin(*[int(l) for l in keep_langs]))
        .select(id_col, text_col, "pred_lang")
        .localCheckpoint(eager=True)
    )

    buckets = perplexity_buckets(
        lang_kept, id_col, text_col, "pred_lang",
    )
    return buckets.filter(F.col("tier").isin(*keep_tiers)).select(
        id_col, "pred_lang", "mean_surprisal", "bucket", "tier"
    )
