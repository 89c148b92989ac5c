"""Deduplication operators for large text corpora.

Four families, all expressed with JVM-side higher-order functions (no
Python in the hot path), so every stage stays in whole-stage codegen and
scales with executor count:

- exact:       hash-groupBy on a normalized-content fingerprint
- MinHash+LSH: shingles -> minhash signature -> banded buckets ->
               candidate bucket-join -> exact-Jaccard verification
- SimHash:     64-bit token-vote signature; near-dups = small Hamming
               distance; candidates via 16-bit chunk pigeonholing
- n-gram Jaccard: exact pairwise Jaccard on word n-grams (verification
               primitive / small-subset brute force)
- containment: verbatim n-gram hit counting (GPT-3-style benchmark
               decontamination; one shuffle join on hashed grams)

Scale notes: the LSH candidate join shuffles on (band, bucket-hash) — bound
the blowup with ``max_bucket_size`` (degenerate buckets = boilerplate text;
at 100 TB you drop or special-case them, you don't join them). Signatures
are computed in one projection pass per document.
"""

from __future__ import annotations

import contextlib
import functools
import random
import weakref

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

from codd_spark.functions.text import normalize_ws, tokens
from codd_spark.sources.statefs import resolve_statefs as _resolve_statefs


@contextlib.contextmanager
def arrival_shuffle_partitions(
    spark, *plans: DataFrame, target_bytes: int = 64 << 20
):
    """Scope ``spark.sql.shuffle.partitions`` to the ARRIVAL batch's
    size for the Spark actions run inside the block — the batch-path
    twin of ``streaming.structured.stateful_stream_partitions`` (guide
    §2 scale-adaptive partitioning): an incremental ``add_batch`` runs
    several small jobs whose post-shuffle stages AQE coalesces only down
    to the session's default parallelism (``parallelismFirst``), so a
    150-document arrival pays dozens of near-empty 32-task stages of
    pure scheduling churn per action (profiled r14: task run ~300 ms,
    task CPU ~3 ms, 160 s summed task time for 22 s of CPU on the
    two-batch bench row).

    The partition count derives from Catalyst's byte ESTIMATE of the
    batch plans (``optimizedPlan().stats().sizeInBytes`` — no job is
    triggered): ``ceil(bytes / target_bytes)`` clamped to [1, session
    setting]. At cluster scale a terabyte arrival clamps to the session
    knob unchanged (derive-from-input-size, not a local-mode constant);
    an unknown/failed estimate leaves the session setting untouched.
    Explicit ``repartition(n, col)`` calls inside the scope (the
    full-parallelism hashing stages) are unaffected — only the default
    shuffle-partition count moves. The conf is restored on exit; the
    LAZY result a caller returns out of the block executes later under
    the session setting, which is exactly the contract: arrival-state
    maintenance is small-batch-sized, the caller's downstream plan is
    corpus-sized."""
    key = "spark.sql.shuffle.partitions"
    old = spark.conf.get(key)
    try:
        est = 0
        for p in plans:
            est += int(
                p._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
            )
        n = max(1, min(int(old), (est + target_bytes - 1) // target_bytes))
    except Exception:  # noqa: BLE001 — unknown size: leave the conf alone
        yield None
        return
    if n >= int(old):
        yield None
        return
    aqe_key = "spark.sql.adaptive.enabled"
    old_aqe = spark.conf.get(aqe_key)
    spark.conf.set(key, str(n))
    if n == 1:
        # with ONE shuffle partition there is nothing for AQE to
        # optimize — no partitions to coalesce, no skew to split — but
        # it still costs one sub-job plus a re-optimization pass per
        # exchange (profiled r14: the arrival rows' remaining wall was
        # inter-job driver gaps, ~90 ms x ~30 AQE stage-jobs per
        # arrival). Larger batches (n > 1) keep AQE: skew handling is
        # load-bearing at real arrival sizes.
        spark.conf.set(aqe_key, "false")
    try:
        yield n
    finally:
        spark.conf.set(key, old)
        spark.conf.set(aqe_key, old_aqe)


def _safe_unpersist(df: DataFrame) -> None:
    """Finalizer target: unpersist quietly (the JVM may already be gone
    at interpreter shutdown)."""
    try:
        df.unpersist()
    except Exception:
        pass


def _eager_cache(df: DataFrame) -> DataFrame:
    """persist() + materialize NOW (one cheap count job).

    A lazily persisted plan consumed by several shuffle subtrees is NOT
    computed once: AQE submits every ready leaf stage concurrently, and
    each one that finds the cache unpopulated evaluates the full child
    plan itself (stage-level profile, r13 optimization round: the
    120-hash shingle pipeline executed 3x inside one action — the OPH
    aggregate and both exact-verify join sides raced; set-similarity's
    ordered-token cache raced 4 ways). Paying one up-front count job
    pins exactly one evaluation; every subsequent stage reads the cache.
    The count also runs the plan at full scan parallelism, which the
    coalesced single-stage evaluations did not."""
    df = df.persist()
    df.count()
    return df


def _attach_release(result: DataFrame, *cached: DataFrame) -> DataFrame:
    """Give ``result`` an explicit, deterministic cache lifecycle.

    ``result.release_cache()`` unpersists every intermediate this pipeline
    cached — idempotent, safe to call any time after the caller is done
    with ``result``. The same callbacks are also registered as weakref
    finalizers, so dropping the result still releases executor storage
    eventually; but long-lived sessions running many corpus passes should
    call ``release_cache()`` (or use ``contextlib.closing``-style wrappers)
    rather than rely on gc timing. ``result.close`` aliases it so
    ``contextlib.closing(minhash_near_duplicates(...))`` works as a
    context manager.

    Self-reference guard (r9): pipelines that persist their OWN output
    pass ``result`` itself in ``cached``. ``weakref.finalize(result, fn,
    result)`` would hold a strong reference to its callback args — the
    result could never be garbage-collected and NO finalizer (its own or
    its siblings') would ever fire. Register the self-unpersist against a
    fresh DataFrame wrapper of the same plan instead: unpersisting the
    wrapper uncaches the identical CacheManager entry, and the wrapper
    holds only the JVM handle, not the watched Python object."""
    targets = [
        DataFrame(df._jdf, df.sparkSession) if df is result else df
        for df in cached
    ]
    fins = [weakref.finalize(result, _safe_unpersist, df) for df in targets]

    def release() -> None:
        for fin in fins:
            fin()  # weakref.finalize objects are idempotent callables

    result._release_finalizers = fins
    result.release_cache = release
    result.close = release
    return result


def _adopt_release(child: DataFrame, parent: DataFrame) -> DataFrame:
    """Move ``parent``'s cache-release obligation onto ``child``.

    Used when a pipeline wraps another pipeline's result (e.g.
    decontaminate over cross_near_duplicates): the intermediate is a local
    the caller never sees, so without adoption its weakref finalizer would
    fire as soon as the wrapper returns — unpersisting the shingle cache
    *before* the final result ever materializes and silently recomputing
    the most expensive stage twice."""
    cached = []
    for fin in getattr(parent, "_release_finalizers", ()):
        info = fin.detach()  # cancel parent's finalizer, recover the df
        if info is not None:
            cached.append(info[2][0])
    if not cached:
        return child
    return _attach_release(child, *cached)


def adopt_release(child: DataFrame, parent: DataFrame) -> DataFrame:
    """Public face of ``_adopt_release`` — REQUIRED whenever you derive a
    new DataFrame (``.select``/``.drop``/``.filter``/joins) from a
    cache-carrying pipeline result and drop the original.

    The pipeline operators (minhash/cross near-dups, decontaminate,
    curate_corpus) persist their shingle/signature intermediates and tie
    the unpersist to the RESULT OBJECT's lifetime. A derived frame does
    not inherit that tie, so ``decontaminate(...).select(...)`` lets the
    parent die and its finalizer unpersist the caches BEFORE the derived
    plan ever executes — the expensive signature stage then silently
    recomputes on every downstream action (measured 5x on the
    decontamination bench query). ``adopt_release(derived, parent)``
    moves the obligation onto the frame you actually keep.
    """
    return _adopt_release(child, parent)

# Modulus prime for the minhash universal-hash family (fits in 31 bits so
# a*h+b stays overflow-free in a 64-bit long).
_P = 2038074743


def _coeffs(num_hashes: int, seed: int) -> list[tuple[int, int]]:
    rng = random.Random(seed)
    return [(rng.randrange(1, _P), rng.randrange(0, _P)) for _ in range(num_hashes)]


# ---------------------------------------------------------------------------
# shingling
# ---------------------------------------------------------------------------

def char_shingles(c: Column, k: int = 5) -> Column:
    """Distinct k-character shingles of whitespace-normalized text.

    NOTE: expressions referenced inside a transform() lambda re-evaluate
    per array element — pass an already-materialized *column* of normalized
    text (see _shingled in minhash_near_duplicates), or accept the
    normalization running once per shingle position."""
    norm = normalize_ws(c)
    n = F.greatest(F.length(norm) - (k - 1), F.lit(1))
    return F.array_distinct(
        F.transform(F.sequence(F.lit(1), n), lambda i: norm.substr(i, F.lit(k)))
    )


def _shingles_of_attr(t: Column, k: int) -> Column:
    """char_shingles over a cheap attribute column (no embedded regex)."""
    n = F.greatest(F.length(t) - (k - 1), F.lit(1))
    return F.array_distinct(
        F.transform(F.sequence(F.lit(1), n), lambda i: t.substr(i, F.lit(k)))
    )


def _hashed_shingles_of_attr(t: Column, k: int) -> Column:
    """Distinct xxhash64 values of the k-char shingles of ``t``
    (array<long>). The shingle strings are never materialized — hashing
    happens inside the position transform — so the set is 8 bytes/element
    regardless of k, and downstream set ops (min-hash, exact Jaccard)
    compare longs, not strings. Jaccard on the hashed sets equals Jaccard
    on the string sets up to ~n²/2⁻⁶⁴ collision probability."""
    n = F.greatest(F.length(t) - (k - 1), F.lit(1))
    return F.array_distinct(
        F.transform(F.sequence(F.lit(1), n), lambda i: F.xxhash64(t.substr(i, F.lit(k))))
    )


def word_ngrams(c: Column, n: int = 3) -> Column:
    """Distinct word n-grams (space-joined) of the text. Same caveat as
    char_shingles: pass a materialized token-array column where possible
    (the tokenizing split re-runs per n-gram position otherwise)."""
    return _ngrams_of_attr(tokens(c), n)


def _ngrams_of_attr(toks: Column, n: int) -> Column:
    cnt = F.greatest(F.size(toks) - (n - 1), F.lit(1))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), cnt), lambda i: F.concat_ws(" ", F.slice(toks, i, n))
        )
    )


def let1(value: Column, body) -> Column:
    """Single-evaluation let-binding: evaluate ``value`` ONCE, then
    compute ``body(bound_value)`` — via a one-element higher-order
    transform, whose lambda variable is bound to the already-computed
    element. Why this exists (r13): Catalyst freely inlines
    deterministic column aliases when it pushes a filter into a join
    condition (and when it collapses projects), so an expression like
    ``when(union > 0, inter / union) >= t`` lands in the SortMergeJoin
    condition with ``array_intersect`` spelled out THREE times — three
    O(|A|+|B|) hash-set builds per candidate pair (read straight off
    the executed plan). A lambda variable cannot be inlined, so the
    binding survives every rewrite and the expensive subexpression is
    computed exactly once wherever the predicate ends up."""
    return F.element_at(F.transform(F.array(value), body), 1)


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard similarity of two array-set columns. Accepts arrays
    WITH duplicates (array_union/array_intersect both dedup), so it is
    safe for raw n-gram transforms; pipelines whose arrays are already
    distinct should use :func:`jaccard_distinct` (half the per-pair
    hash-set work). Both set builds are let-bound (:func:`let1`), so a
    filter over this value costs exactly one intersect + one union per
    row no matter where the optimizer moves it."""
    return let1(
        F.size(F.array_intersect(a, b)),
        lambda inter: let1(
            F.size(F.array_union(a, b)),
            lambda union: F.when(
                union > 0, inter.cast("double") / union.cast("double")
            ).otherwise(0.0),
        ),
    )


def jaccard_distinct(a: Column, b: Column) -> Column:
    """Exact Jaccard of two DISTINCT-element array columns: the union
    size is |A| + |B| - |A∩B| by inclusion-exclusion, so only the
    intersection builds a hash set — array_union (a second O(|A|+|B|)
    set build per pair) drops out of the verify hot loop (r13: the
    exact-verify stage was the single largest CPU block in the fuzzy
    dedup family), and the intersection itself is let-bound
    (:func:`let1`) so predicate pushdown cannot re-inline it into a
    multi-evaluation join condition. IDENTICAL output to
    :func:`jaccard` whenever both inputs are duplicate-free — which the
    hashed-shingle projections guarantee by construction
    (array_distinct upstream)."""
    sa, sb = F.size(a), F.size(b)
    return let1(
        F.size(F.array_intersect(a, b)),
        lambda inter: F.when(
            sa + sb - inter > 0,
            inter.cast("double") / (sa + sb - inter).cast("double"),
        ).otherwise(0.0),
    )


def verified_jaccard(a: Column, b: Column, threshold: float) -> Column:
    """``round(jaccard_distinct(a, b), 6)`` with the size-companion
    band of the prefix filter (VERDICT r13 item 7, guide §2.2/§3 —
    filter before the expensive work) short-circuiting the intersect:
    for distinct sets J(A,B) <= min(|A|,|B|)/max(|A|,|B|), so a pair
    whose size ratio is below the threshold band cannot verify and
    returns 0.0 WITHOUT building the per-pair hash set (``when``
    branches evaluate lazily, so the guard runs first no matter how the
    optimizer orders pushed conjuncts). Under the caller's
    ``>= threshold`` filter the output is IDENTICAL to the unbanded
    value: a kept pair needs round(J, 6) >= t, i.e. J >= t - 5e-7,
    hence min/max >= t - 5e-7 > t - 1e-6 = the band; a banded-out pair
    has J <= min/max < t - 1e-6, hence round(J, 6) < t either way.
    ONLY for filter-at-threshold sites: banded-out rows report 0.0,
    not their true (sub-threshold) jaccard."""
    if threshold <= 0.0:
        return F.round(jaccard_distinct(a, b), 6)
    sa, sb = F.size(a), F.size(b)
    feasible = F.least(sa, sb).cast("double") >= F.lit(
        threshold - 1e-6
    ) * F.greatest(sa, sb).cast("double")
    return F.when(feasible, F.round(jaccard_distinct(a, b), 6)).otherwise(
        F.lit(0.0)
    )


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def dedup_exact(
    df: DataFrame,
    text_col: str,
    id_col: str,
    score_col: str | None = None,
) -> DataFrame:
    """Exact content dedup: one row per normalized-content fingerprint,
    keeping the minimum id (deterministic keeper). One partial-aggregated
    shuffle on the fingerprint.

    With ``score_col``, the keeper is the HIGHEST-scoring copy instead
    (ties break to the smallest id, so the choice stays deterministic) —
    the common curation need: duplicates often differ in metadata
    (source reputation, fetch recency, quality score), and "keep any
    copy" throws that signal away. Still one aggregate: an argmin via
    MIN_BY over (-score, id) structs — no window, no join-back. The id
    can be ANY orderable type (string ids work the same as numeric ones:
    only the score is negated, the id rides along for tie-breaks)."""
    from codd_spark.functions.text import fingerprint_md5

    fp = df.withColumn("fp", fingerprint_md5(F.col(text_col)))
    if score_col is None:
        return fp.groupBy("fp").agg(
            F.min(id_col).alias("keeper"), F.count("*").alias("n_copies")
        )
    order = F.struct(
        (-F.col(score_col)).alias("ns"), F.col(id_col).alias("id")
    )
    return fp.groupBy("fp").agg(
        F.min_by(F.col(id_col), order).alias("keeper"),
        F.count("*").alias("n_copies"),
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def shingle_hashes(shingles: Column) -> Column:
    """Base hashes of a shingle set: one xxhash64 per shingle, folded into
    [0, P). Materialize this as a real column ONCE — the per-function
    signature min then works on longs, never re-hashing strings."""
    return F.transform(shingles, lambda s: F.pmod(F.xxhash64(s), F.lit(_P)))


def minhash_signature_from_hashes(
    hashes: Column, num_hashes: int = 128, seed: int = 42
) -> Column:
    """Minhash signature (array<long> of length num_hashes) from
    pre-computed base hashes: min over the universal-hash family
    h_i(x) = (a_i*x + b_i) mod P."""
    sigs = [
        F.array_min(F.transform(hashes, lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(_P)))
        for a, b in _coeffs(num_hashes, seed)
    ]
    return F.array(*sigs)


def minhash_signature(
    shingles: Column, num_hashes: int = 128, seed: int = 42
) -> Column:
    """Convenience composition — prefer materializing shingle_hashes()
    in its own projection first (see minhash_near_duplicates)."""
    return minhash_signature_from_hashes(shingle_hashes(shingles), num_hashes, seed)


def _oph_signatures(exploded: DataFrame, num_hashes: int, ids: DataFrame) -> DataFrame:
    """One-permutation-hashing signatures from (id, h) base-hash rows.

    Instead of k independent universal hashes (k expression evals per
    shingle), split the hash universe [0, P) into ``num_hashes`` equal
    ranges and take the min base hash per range — one floor-divide per
    shingle, O(1) per row instead of O(k). Empty ranges are filled by
    rotation densification (borrow the value of the next non-empty bin,
    circularly), which preserves the unbiased Jaccard-estimate property
    of the signature (Shrivastava & Li, ICML'14).

    Two shuffles: (id, bin) partial-min — same bytes as the k-hash
    formulation, ~1% of its CPU — then a tiny (id)-keyed assembly of at
    most num_hashes entries per doc.
    """
    B = num_hashes
    binned = exploded.withColumn(
        "bin", F.floor(F.col("h") * F.lit(B) / F.lit(_P)).cast("int")
    )
    # Union a full (id, bin) grid with null sentinels so empty bins survive
    # the aggregation as rows — the grid rides the same shuffle as the
    # shingle hashes (num_hashes extra rows/doc, negligible next to the
    # shingles). ``ids`` must be one row per document id.
    grid = ids.select(
        "id", F.explode(F.sequence(F.lit(0), F.lit(B - 1))).alias("bin")
    ).withColumn("h", F.lit(None).cast("long"))
    minb = binned.unionByName(grid).groupBy("id", "bin").agg(
        F.min("h").alias("mh")  # min skips nulls: real min, or null if empty bin
    )
    # Rotation densification as window fills (allocation-free, O(B) per doc):
    # empty bin takes the first non-empty bin at-or-after it, wrapping to the
    # first non-empty bin overall. Both windows share one sort on (id, bin);
    # the final collect reuses the window's id-partitioning — no extra shuffle.
    w_after = (
        Window.partitionBy("id").orderBy("bin")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    w_all = (
        Window.partitionBy("id").orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    filled = minb.withColumn(
        "f",
        F.coalesce(
            F.first("mh", ignorenulls=True).over(w_after),
            F.first("mh", ignorenulls=True).over(w_all),
        ),
    )
    return filled.groupBy("id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("bin", "f"))), lambda x: x["f"]
        ).alias("sig")
    )


def _band_structs(sig_col: Column, bands: int, rows_per_band: int) -> Column:
    """array<struct<band:int, h:long>> — one bucket hash per band."""
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.xxhash64(F.slice(sig_col, i * rows_per_band + 1, rows_per_band)).alias("h"),
            )
            for i in range(bands)
        ]
    )


def minhash_near_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    num_hashes: int = 120,
    bands: int = 20,
    shingle_k: int = 5,
    threshold: float = 0.5,
    max_bucket_size: int = 1000,
    seed: int = 42,
    sig_method: str = "oph",
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, exact jaccard >= threshold).

    Pipeline: shingle -> signature -> banded buckets -> bucket self-join for
    candidates -> exact-Jaccard verification on the shingle sets. The
    default 20 bands x 6 rows puts the S-curve midpoint at
    (1/20)^(1/6) ≈ 0.61: pairs with J >= 0.8 are found with probability
    ~1, J ≈ 0.5 at ~25%, and the sub-0.3 noise floor of boilerplate-heavy
    corpora generates almost no candidates (which is what keeps the
    candidate join bounded at scale). Raise ``bands`` (e.g. 30x4) for
    higher recall near the threshold at the cost of more candidates; every
    candidate is verified with exact Jaccard, so precision is always exact.

    ``sig_method``: 'oph' (default) computes the signature by
    one-permutation hashing (one hash per shingle, binned min +
    rotation densification — see _oph_signatures); 'kmin' is the classic
    k independent universal hashes (k expression evals per shingle).
    Same S-curve, ~identical recall on non-tiny documents; oph is ~k×
    cheaper in signature CPU.
    """
    if num_hashes % bands != 0:
        raise ValueError("num_hashes must be divisible by bands")
    r = num_hashes // bands
    parallelism = df.sparkSession.sparkContext.defaultParallelism

    # Scalable signature computation: explode the per-doc shingle hashes to
    # (id, h) rows, then take 128 plain MIN aggregates (one per hash
    # function). Catalyst does partial aggregation map-side, so the shuffle
    # carries only num_hashes longs per document — and unlike the
    # array-expression formulation (which CollapseProject inlines into one
    # giant tree that re-hashes every shingle per function), each shingle is
    # hashed exactly once.
    # Repartition up front: corpora often arrive as few large files, and
    # every stage below is CPU-bound — without this the string-heavy
    # shingling runs at the input's (possibly single-file) parallelism.
    # Stage normalized text as a real column so the shingling lambda
    # references an attribute, not the embedded regex normalization (which
    # would otherwise re-run once per shingle position).
    normed = df.repartition(parallelism, F.col(id_col)).select(
        F.col(id_col).alias("id"), normalize_ws(F.col(text_col)).alias("__t")
    )
    # Persist the hashed-shingle projection EAGERLY: it feeds the OPH
    # signature aggregate, the id grid, and BOTH exact-Jaccard verify
    # join sides — four AQE leaf stages that would otherwise each
    # re-evaluate the shingling before any of them populates the lazy
    # cache (profiled r13: the shingle stage executed 3x per action).
    # Shingles are stored as xxhash64 longs, never as strings (see
    # _hashed_shingles_of_attr). At true corpus scale swap the persist
    # for a write to a bucketed table (see sinks).
    shingled = _eager_cache(
        normed.select(
            "id", _hashed_shingles_of_attr(F.col("__t"), shingle_k).alias("sh")
        )
    )
    exploded = shingled.select("id", F.explode(F.col("sh")).alias("h64")).select(
        "id", F.pmod(F.col("h64"), F.lit(_P)).alias("h")
    )
    if sig_method == "oph":
        # the OPH grid needs one row per doc id — take it from the cheap
        # pre-shingle projection (id column only; the normalize/shingle
        # expressions prune away), not from the cached ARRAY table: a
        # columnar array<long> cache is expensive to scan, and this was
        # one of its four readers (r13 stage profile)
        sigs = _oph_signatures(exploded, num_hashes, normed.select("id"))
    elif sig_method == "kmin":
        coeffs = _coeffs(num_hashes, seed)
        sig_df = exploded.groupBy("id").agg(
            *[
                F.min((F.lit(a) * F.col("h") + F.lit(b)) % F.lit(_P)).alias(f"_s{i}")
                for i, (a, b) in enumerate(coeffs)
            ]
        )
        sigs = sig_df.select(
            "id", F.array(*[F.col(f"_s{i}") for i in range(num_hashes)]).alias("sig")
        )
    else:
        raise ValueError(f"unknown sig_method {sig_method!r} (use 'oph' or 'kmin')")

    buckets = sigs.select(
        "id", F.explode(_band_structs(F.col("sig"), bands, r)).alias("bk")
    ).select("id", F.col("bk.band").alias("band"), F.col("bk.h").alias("h"))

    # Degenerate-bucket guard: giant buckets are boilerplate/empty docs; a
    # self-join there is O(n^2). Count and drop oversized buckets.
    sized = buckets.withColumn(
        "bsz", F.count("*").over(Window.partitionBy("band", "h"))
    ).filter(F.col("bsz") <= max_bucket_size)

    # Every join below is unbounded×unbounded (both sides grow with the
    # corpus), so force shuffle joins: Catalyst's static size estimate,
    # shrunk by the bucket-size filter, otherwise picks a broadcast build
    # that works at test scale and OOMs the driver at corpus scale (seen
    # at 500k docs: a ~0.5 GB broadcast of the banded buckets).
    a = sized.select(F.col("band"), F.col("h"), F.col("id").alias("id_a"))
    b = sized.select(F.col("band"), F.col("h"), F.col("id").alias("id_b"))
    cand = (
        a.join(b.hint("shuffle_merge"), on=["band", "h"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )

    # Verification reads the persisted shingle sets directly — every id in
    # cand came from sigs, whose ids are exactly shingled's ids, so no join
    # through the signature aggregate is needed.
    sh = shingled
    verified = (
        cand.join(
            sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a")).hint("shuffle_merge"),
            on="id_a",
        )
        .join(
            sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b")).hint("shuffle_merge"),
            on="id_b",
        )
        .withColumn("jaccard", verified_jaccard(F.col("sh_a"), F.col("sh_b"), threshold))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    # Persist the OUTPUT too (r8): the verified pair set is tiny (true
    # near-dups), but its plan is the whole signature+band+verify tail —
    # ~6 s at sf0.1 — and consumers like fuzzy_dedup's closure act on it
    # several times (edge build, sizes, label joins). Without this, each
    # action re-runs the tail from the cached shingles.
    verified = verified.persist()
    # Explicit cache lifecycle: persist() is lazy (nothing is cached until
    # the result is computed), and once the caller is done with the result
    # the cache can never be reused — without release, repeated corpus
    # passes in one session accumulate executor storage memory. Callers
    # release deterministically via verified.release_cache(); a weakref
    # finalizer backstops callers that just drop the object.
    return _attach_release(verified, shingled, verified)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash64(text_col: Column, hash_fn: str = "xxhash64") -> Column:
    """64-bit SimHash over whitespace tokens (token multiplicity counts).

    One aggregate pass: each token's hash votes +1/-1 per bit; the
    signature sets bit b iff the vote is positive. Pure expression tree —
    runs in codegen, no UDF.

    ``hash_fn``: ``"xxhash64"`` (default, fastest) or ``"md5_60"`` (top
    60 bits of md5 as BIGINT — the same portable hash as winnowing's
    contract variant, making the whole signature, and therefore the
    near-dup pair set, bit-replayable in any SQL engine; bits 60-63 are
    always 0, a 4-bit resolution cost only the oracle path pays)."""
    masks = [1 << b for b in range(63)] + [-(1 << 63)]  # bit 63 as signed long

    if hash_fn == "xxhash64":
        def hfn(t):
            return F.xxhash64(t)
    elif hash_fn == "md5_60":
        def hfn(t):
            return F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long")
    else:
        raise ValueError(f"hash_fn must be 'xxhash64' or 'md5_60', got {hash_fn!r}")

    def bits_of(h: Column) -> Column:
        return F.array(
            *[
                F.when(h.bitwiseAND(F.lit(m)) != 0, F.lit(1)).otherwise(F.lit(-1))
                for m in masks
            ]
        )

    votes = F.aggregate(
        F.transform(tokens(text_col), lambda t: hfn(t)),
        F.array_repeat(F.lit(0), 64),
        lambda acc, h: F.zip_with(acc, bits_of(h), lambda a, v: a + v),
    )
    # fold positive votes into a long via bitwise OR of the bit masks
    pairs = F.zip_with(
        votes,
        F.array(*[F.lit(m) for m in masks]),
        lambda v, m: F.when(v > 0, m).otherwise(F.lit(0)),
    )
    return F.aggregate(
        pairs, F.lit(0).cast("long"), lambda acc, m: acc.bitwiseOR(m)
    )


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    max_hamming: int = 3,
    n_chunks: int = 4,
    max_bucket_size: int = 1000,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Near-duplicate pairs by SimHash Hamming distance <= max_hamming.

    Candidates by pigeonhole: split the 64-bit signature into ``n_chunks``
    equal chunks; any pair within Hamming <= n_chunks-1 must agree on at
    least one chunk, so a bucket-join per chunk finds all of them. Choose
    n_chunks > max_hamming for an exact result (the default 4/3 suits long
    documents where near-dups flip few bits; short docs need more chunks).
    """
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    sigs = df.repartition(parallelism, F.col(id_col)).select(
        F.col(id_col).alias("id"),
        simhash64(F.col(text_col), hash_fn=hash_fn).alias("sig"),
    )
    return hamming_banded_pairs(
        sigs,
        max_hamming=max_hamming,
        n_chunks=n_chunks,
        max_bucket_size=max_bucket_size,
    )


def shared_key_overlap_pairs(
    rows: DataFrame,
    *,
    min_shared: int = 2,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """MOSS-style overlap mining over DISTINCT (id, key) rows — the
    generic miner behind winnowing fingerprint overlap (text) and
    frame-hash video near-dup (multimodal): all id pairs sharing >=
    ``min_shared`` keys -> (id_a, id_b, n_shared, frac_a, frac_b),
    id_a < id_b, frac = shared / that side's key count.

    Scale shape: ONE equi-join on the key + one pair aggregate — the
    LSH bucket-join discipline, including the degenerate-bucket guard
    (a key shared by more than ``max_bucket_size`` ids contributes
    O(bucket²) candidate rows and is dropped; its absence only lowers
    n_shared). Both join sides are corpus-derived, so the join is
    shuffle-pinned, never broadcast. The input rows are PERSISTED
    across the self-join and size joins (flat rows cache cheaply — the
    r9 winnowing lesson) and released via the result's
    ``release_cache()``/finalizer."""
    from pyspark.sql.window import Window as _W

    # eager: the bucket-guard window and the per-id size aggregate are
    # concurrent AQE leaf consumers — a lazy cache would let both re-run
    # the caller's (expensive) fingerprint pipeline (see _eager_cache)
    ex = _eager_cache(
        rows.select(
            F.col(rows.columns[0]).alias("id"), F.col(rows.columns[1]).alias("fp")
        )
    )
    sizes = ex.groupBy("id").agg(F.count("*").alias("nf"))
    guarded = (
        ex.withColumn("bsz", F.count("*").over(_W.partitionBy("fp")))
        .filter(F.col("bsz") <= max_bucket_size)
        .select("id", "fp")
    )
    a = guarded.select(F.col("id").alias("id_a"), "fp")
    b = guarded.select(F.col("id").alias("id_b"), "fp")
    pairs = (
        a.hint("shuffle_merge")
        .join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    out = (
        pairs.join(
            sizes.select(F.col("id").alias("id_a"), F.col("nf").alias("nf_a")).hint(
                "shuffle_merge"
            ),
            on="id_a",
        )
        .join(
            sizes.select(F.col("id").alias("id_b"), F.col("nf").alias("nf_b")).hint(
                "shuffle_merge"
            ),
            on="id_b",
        )
        .select(
            "id_a",
            "id_b",
            "n_shared",
            F.round(F.col("n_shared") / F.col("nf_a"), 6).alias("frac_a"),
            F.round(F.col("n_shared") / F.col("nf_b"), 6).alias("frac_b"),
        )
    )
    return _attach_release(out, ex)


def hamming_banded_pairs(
    sigs: DataFrame,
    *,
    max_hamming: int = 3,
    n_chunks: int = 4,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """All (id_a, id_b, hamming) pairs with Hamming(sig_a, sig_b) <=
    ``max_hamming`` over an (id, sig) frame of 64-bit signatures — the
    chunk-pigeonhole candidate join shared by SimHash text dedup and
    perceptual image dedup (operators/multimodal.py).

    EXACT when ``n_chunks > max_hamming``: split the signature into
    n_chunks equal chunks; a pair within Hamming <= n_chunks-1 must
    agree on at least one whole chunk, so one bucket-join per chunk
    finds every qualifying pair (then the cheap bitcount verify drops
    the rest). Never an all-pairs stage: candidates shuffle on
    (chunk, value) buckets, and ``max_bucket_size`` caps degenerate
    buckets (constant images / boilerplate text) the same way the LSH
    band join does — at 100 TB you special-case those, not join them."""
    from pyspark.sql.window import Window

    if 64 % n_chunks != 0:
        raise ValueError("n_chunks must divide 64")
    if max_hamming > n_chunks - 1:
        raise ValueError(
            f"max_hamming={max_hamming} needs n_chunks>={max_hamming + 1} for exactness"
        )
    width = 64 // n_chunks
    mask = (1 << width) - 1

    chunks = sigs.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk"),
                        F.shiftright("sig", i * width).bitwiseAND(F.lit(mask)).alias("v"),
                    )
                    for i in range(n_chunks)
                ]
            )
        ).alias("ck"),
    ).select("id", "sig", F.col("ck.chunk").alias("chunk"), F.col("ck.v").alias("v"))

    sized = chunks.withColumn(
        "bsz", F.count("*").over(Window.partitionBy("chunk", "v"))
    ).filter(F.col("bsz") <= max_bucket_size)

    a = sized.select("chunk", "v", F.col("id").alias("id_a"), F.col("sig").alias("sig_a"))
    b = sized.select("chunk", "v", F.col("id").alias("id_b"), F.col("sig").alias("sig_b"))
    # unbounded self-join: force a shuffle join (see minhash_near_duplicates
    # — static size estimates under-count filtered bucket tables and pick
    # driver-killing broadcasts at corpus scale)
    return (
        a.join(b.hint("shuffle_merge"), on=["chunk", "v"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", hamming64(F.col("sig_a"), F.col("sig_b")).alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact, for verification / bounded subsets)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    threshold: float = 0.1,
) -> DataFrame:
    """Exact pairwise Jaccard on word n-grams. O(n^2) cross join — meant
    for bounded subsets or as the verification stage after LSH candidate
    generation (use minhash_near_duplicates for corpus-scale).

    The theta-join compares every (a, b) pair inside ONE task per stream
    partition — a bounded subset usually arrives as a single partition, so
    without an explicit repartition all |df|^2/2 Jaccard evaluations run
    on one core. Spreading the probe side across the cluster's cores makes
    the nested-loop stage embarrassingly parallel (measured 6.4 s -> sub-
    second on a 200-doc subset at local[32])."""
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    toked = df.select(F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("__toks"))
    g = toked.select("id", _ngrams_of_attr(F.col("__toks"), n).alias("ng"))
    a = g.repartition(parallelism, F.col("id")).select(
        F.col("id").alias("id_a"), F.col("ng").alias("ng_a")
    )
    b = g.select(F.col("id").alias("id_b"), F.col("ng").alias("ng_b"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("jaccard", F.round(jaccard(F.col("ng_a"), F.col("ng_b")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def set_similarity_join(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    threshold: float = 0.5,
    ngram_n: int | None = None,
    order: str = "df",
) -> DataFrame:
    """EXACT Jaccard self-join via prefix filtering (AllPairs / PPJoin
    family) — the scale path for exact set-similarity without LSH's
    probabilistic recall and without the O(n^2) cross join of
    ``ngram_jaccard_pairs``.

    Sets are distinct whitespace tokens of the raw text (or word n-grams
    when ``ngram_n`` is given). Tokens are canonically ordered
    rarest-first by global document frequency; each set indexes only its
    PREFIX (the first ``|x| - ceil(t*|x|) + 1`` tokens). Two sets with
    Jaccard >= t must share at least one prefix token under any common
    total order, so an equi-join on prefix tokens generates a candidate
    superset, which a second join verifies with exact Jaccard — output is
    exactly the >=t pair set, same contract as the brute-force baseline.

    100-TB design: three shuffles (doc-frequency agg, prefix-token
    candidate join, verify join), all equi-joins pinned to shuffle
    strategies — nothing broadcasts an unbounded side. The rarest-first
    ordering is what bounds the candidate join's fan-out: hot tokens sort
    to the END of every set and never enter a prefix, so bucket sizes
    shrink as the threshold rises. Tokens travel as xxhash64 longs from
    the first shuffle on (the minhash discipline: ~8 bytes instead of a
    string per n-gram, and the verify intersections compare longs) —
    "exact" is therefore exact up to 64-bit token-hash collisions,
    ~n_distinct^2/2^65 expected merged token pairs, zero at any tested
    scale. Candidates pass PPJoin's positional filter before any array
    is shuffled: with prefix tokens matched at 0-based positions, the
    overlap can't exceed n_shared + min(|x|-1-max_pos_x, |y|-1-max_pos_y)
    and a >=t pair needs overlap >= t/(1+t)*(|x|+|y|) (halves the verify
    load on template-heavy corpora). The prefix length uses floor()
    rather than ceil() on the double product — one token longer than the
    exact bound where t*|x| is integral — and the positional/size
    filters get a +1e-9 slack, so float rounding can only ever ADD
    candidates, never drop a true pair (verification stays exact either
    way). Returns (id_a, id_b, jaccard) with id_a < id_b."""
    if not (0.0 < threshold <= 1.0):
        raise ValueError("threshold must be in (0, 1]")
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    # materialize the token array BEHIND an exchange boundary before the
    # n-gram transform references it: inside transform(), an embedded
    # split() expression re-evaluates once per n-gram position (measured
    # 11 s -> 2.5 s on the sf0.1 ordering stage), while an attribute
    # reference reads the already-computed row value. Same discipline as
    # _minhash_prep's normalized-text column.
    base = df.repartition(parallelism, F.col(id_col)).select(
        F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("__toks")
    )
    # gram strings via concat_ws, then one hash per distinct gram. The
    # tempting "hash n token fields directly per position" variant
    # (multi-arg xxhash64 over F.get(toks, i+j)) measured 2.3x SLOWER on
    # the real filtered plan (8 vs 3 s at sf0.1): higher-order lambdas
    # evaluate interpreted, and 3 bounds-checked gets + a 3-field hash
    # per position costs more tree-walking than one concat + one hash —
    # beware microbenchmarks here, Catalyst folds size(transform(...))
    # without running the lambda.
    raw = (
        F.col("__toks")
        if ngram_n is None
        else _ngrams_of_attr(F.col("__toks"), ngram_n)
    )
    sets = base.select(
        "id",
        F.array_distinct(
            F.transform(F.array_distinct(raw), lambda s: F.xxhash64(s))
        ).alias("toks"),
    ).filter(F.size("toks") > 0)
    if order == "df":
        # rarest-first canonical order: sort each set by (doc freq, token
        # hash). Costs a vocabulary aggregate + join-back, and minimizes
        # candidates on Zipfian vocabularies (hot tokens never enter a
        # prefix). The robust default for natural-language corpora.
        tok = sets.select("id", F.explode("toks").alias("tok"))
        dfreq = tok.groupBy("tok").agg(F.count("*").alias("dfc"))
        ordered = _eager_cache(
            tok.hint("shuffle_merge")
            .join(dfreq, "tok")
            .groupBy("id")
            .agg(F.array_sort(F.collect_list(F.struct("dfc", "tok"))).alias("ord"))
            .select(
                "id",
                F.transform("ord", lambda s: s["tok"]).alias("toks"),
                F.size("ord").alias("sz"),
            )
        )
    elif order == "hash":
        # hash canonical order: any global total order keeps the prefix
        # theorem (and thus the OUTPUT) exactly correct — only the
        # candidate count changes. Sorting each set by token hash is a
        # pure projection (no stats pass, two fewer shuffles); the right
        # choice when document frequency is near-uniform, where
        # rarest-first buys nothing.
        # eager: the index/probe prefix explodes and both verify join
        # sides are four AQE leaf consumers — a lazy cache would let each
        # re-run the tokenize+hash+sort pipeline (see _eager_cache)
        ordered = _eager_cache(
            sets.select(
                "id", F.array_sort("toks").alias("toks"), F.size("toks").alias("sz")
            )
        )
    else:
        raise ValueError(f"order must be 'df' or 'hash', got {order!r}")
    # Asymmetric PPJoin prefixes: every candidate pair is oriented
    # smaller-set-first (size, then id tie-break), so the indexed
    # (smaller) side a only explodes its INDEX prefix of length
    # |x| - floor(2t/(1+t)*|x|) + 1 while the probing (larger) side b
    # explodes the standard probe prefix |x| - floor(t*|x|) + 1.
    # Soundness: for an oriented pair with Jaccard >= t the required
    # overlap is a = t/(1+t)*(sz_a+sz_b) >= 2t/(1+t)*sz_a (since
    # sz_b >= sz_a) and >= t*sz_b (since sz_a >= t*sz_b for any >=t
    # pair), so both exploded prefixes reach position sz - a + 1 and
    # the shared-prefix-token theorem applies. At t=0.35 the index
    # fraction is 1 - 0.7/1.35 = 0.48 vs the probe's 0.65 — candidate
    # buckets shrink from n^2 to n_idx*n_prb per token (PPJoin's
    # indexing-prefix optimization, Xiao et al. WWW'08 §3.1). The
    # - 1e-9 before floor() keeps integral products conservative
    # (prefix gets LONGER, never shorter, under float rounding).
    eps = 1e-9
    plen_probe = (
        F.col("sz")
        - F.floor(F.lit(threshold) * F.col("sz") - eps).cast("int")
        + 1
    )
    idx_frac = 2.0 * threshold / (1.0 + threshold)
    plen_idx = (
        F.col("sz")
        - F.floor(F.lit(idx_frac) * F.col("sz") - eps).cast("int")
        + 1
    )
    a = ordered.select(
        "id", "sz", F.posexplode(F.slice("toks", 1, plen_idx)).alias("pos", "tok")
    ).select(
        F.col("id").alias("id_a"), F.col("sz").alias("sz_a"), F.col("pos").alias("pos_a"), "tok"
    )
    b = ordered.select(
        "id", "sz", F.posexplode(F.slice("toks", 1, plen_probe)).alias("pos", "tok")
    ).select(
        F.col("id").alias("id_b"), F.col("sz").alias("sz_b"), F.col("pos").alias("pos_b"), "tok"
    )
    min_overlap = F.lit(threshold / (1.0 + threshold)) * (F.col("sz_a") + F.col("sz_b"))
    cands = (
        a.hint("shuffle_merge")
        .join(b, "tok")
        .filter(
            (
                (F.col("sz_a") < F.col("sz_b"))
                | ((F.col("sz_a") == F.col("sz_b")) & (F.col("id_a") < F.col("id_b")))
            )
            & (F.col("sz_a") + eps >= threshold * F.col("sz_b"))
        )
        .groupBy("id_a", "id_b", "sz_a", "sz_b")
        .agg(
            F.count("*").alias("nsh"),
            F.max("pos_a").alias("mpa"),
            F.max("pos_b").alias("mpb"),
        )
        # positional filter: shared tokens keep their relative (canonical)
        # order in both sets, so every uncounted shared token lies past
        # BOTH maxima — the bound holds for any pair of prefix lengths
        .filter(
            F.col("nsh")
            + F.least(F.col("sz_a") - F.col("mpa") - 1, F.col("sz_b") - F.col("mpb") - 1)
            + eps
            >= min_overlap
        )
        .select("id_a", "id_b")
    )
    # exact verification — output equals the brute-force >=t pair set.
    # Only the INTERSECTION is materialized per pair: |A ∪ B| =
    # |A| + |B| - |A ∩ B| since both are distinct sets with known sizes,
    # which halves the per-pair higher-order-function work on the
    # candidate-heavy regimes (template corpora) where verification
    # dominates (measured 72 s -> ~40 s on the 10x replica).
    ta = ordered.select(
        F.col("id").alias("id_a"), F.col("toks").alias("toks_a"), F.col("sz").alias("vsz_a")
    )
    tb = ordered.select(
        F.col("id").alias("id_b"), F.col("toks").alias("toks_b"), F.col("sz").alias("vsz_b")
    )
    # let-bound intersection (see let1): the >= threshold filter below is
    # pushed into the verify join's condition, where an inlined alias
    # would re-evaluate array_intersect three times per candidate pair
    jac = let1(
        F.size(F.array_intersect(F.col("toks_a"), F.col("toks_b"))),
        lambda inter: F.when(
            F.col("vsz_a") + F.col("vsz_b") - inter > 0,
            inter.cast("double")
            / (F.col("vsz_a") + F.col("vsz_b") - inter).cast("double"),
        ).otherwise(0.0),
    )
    out = (
        cands.hint("shuffle_merge")
        .join(ta, "id_a")
        .hint("shuffle_merge")
        .join(tb, "id_b")
        .withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= threshold)
        # candidates are size-oriented; the output contract is id-ordered
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
            "jaccard",
        )
    )
    return _attach_release(out, ordered)


def _minhash_prep(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    num_hashes: int,
    bands: int,
    shingle_k: int,
    cache_partitions: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """(banded buckets, persisted hashed-shingle projection) for one table —
    the per-side half of the MinHash pipeline, factored out so SELF-join
    (near-dup mining) and CROSS-join (decontamination) share one
    implementation and, critically, one hash family: signatures from two
    tables are only comparable because every constant here is identical.

    ``cache_partitions`` (arrival paths): land the shingle CACHE behind
    a batch-sized exchange — the hashing still computes at full
    parallelism, but the cached relation holds that many partitions
    instead of defaultParallelism, so the ~6 consumer stages that scan
    it per ``add_batch`` stop paying a 32-near-empty-task scan each
    (profiled r14). Corpus callers leave it None: their cache IS meant
    to be scanned at full parallelism, and the extra exchange of the
    shingle arrays would cost real shuffle bytes."""
    r = num_hashes // bands
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    normed = df.repartition(parallelism, F.col(id_col)).select(
        F.col(id_col).alias("id"), normalize_ws(F.col(text_col)).alias("__t")
    )
    # eager (r13): the signature aggregate, the OPH id grid and the
    # callers' verify joins are concurrent AQE leaf stages — a lazy
    # cache lets each re-run the shingling (see _eager_cache)
    hashed = normed.select(
        "id", _hashed_shingles_of_attr(F.col("__t"), shingle_k).alias("sh")
    )
    if cache_partitions is not None and cache_partitions > 0:
        hashed = hashed.repartition(cache_partitions, F.col("id"))
    shingled = _eager_cache(hashed)
    exploded = shingled.select("id", F.explode(F.col("sh")).alias("h64")).select(
        "id", F.pmod(F.col("h64"), F.lit(_P)).alias("h")
    )
    # grid ids from the cheap pre-shingle projection, not the array cache
    # (same move as minhash_near_duplicates — one fewer cache reader)
    sigs = _oph_signatures(exploded, num_hashes, normed.select("id"))
    buckets = sigs.select(
        "id", F.explode(_band_structs(F.col("sig"), bands, r)).alias("bk")
    ).select("id", F.col("bk.band").alias("band"), F.col("bk.h").alias("h"))
    return buckets, shingled


def cross_near_duplicates(
    left: DataFrame,
    right: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    num_hashes: int = 120,
    bands: int = 20,
    shingle_k: int = 5,
    threshold: float = 0.5,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """Cross-TABLE near-duplicate pairs (id_l, id_r, jaccard >= threshold):
    which left documents near-match any right document. The cross-corpus
    counterpart of minhash_near_duplicates, sharing its hash family via
    _minhash_prep; the candidate join is left-buckets ⋈ right-buckets on
    (band, bucket-hash) — shuffle-pinned (both sides grow with their
    corpora) with a per-side degenerate-bucket guard — then every
    candidate is verified with exact Jaccard on the hashed shingles.

    This is the decontamination primitive: right = the eval/benchmark
    set, left = the training corpus.

    Both sides ride ONE pipeline: the union (ids tagged with a side bit)
    is shingled/signed/bucketed in a single pass — one repartition, one
    persist, one set of signature shuffles — and the buckets split by
    side only at the candidate join. Halves the fixed pipeline cost vs
    preparing each table separately, and guarantees the shared hash
    family by construction.
    """
    if num_hashes % bands != 0:
        raise ValueError("num_hashes must be divisible by bands")
    # side bit in the low id bit (doc ids stay < 2^62 — checked cheap)
    tagged = (
        left.select((F.col(id_col) * 2).alias("__xid"), F.col(text_col).alias("__txt"))
        .unionByName(
            right.select(
                (F.col(id_col) * 2 + 1).alias("__xid"), F.col(text_col).alias("__txt")
            )
        )
    )
    buckets, shingled = _minhash_prep(
        tagged, "__xid", "__txt",
        num_hashes=num_hashes, bands=bands, shingle_k=shingle_k,
    )
    # persist the guarded buckets EAGERLY: BOTH side-branches below read
    # them concurrently, and a lazy cache would let each run the whole
    # signature+guard pipeline itself (see _eager_cache)
    sized = _eager_cache(
        buckets.withColumn(
            "bsz", F.count("*").over(Window.partitionBy("band", "h"))
        ).filter(F.col("bsz") <= max_bucket_size)
    )
    lb = sized.filter(F.col("id") % 2 == 0).select(
        "band", "h", (F.col("id") / 2).cast("long").alias("id_l")
    )
    rb = sized.filter(F.col("id") % 2 == 1).select(
        "band", "h", ((F.col("id") - 1) / 2).cast("long").alias("id_r")
    )
    cand = (
        lb.join(rb.hint("shuffle_merge"), on=["band", "h"])
        .select("id_l", "id_r")
        .distinct()
    )
    lsh_side = shingled.filter(F.col("id") % 2 == 0).select(
        (F.col("id") / 2).cast("long").alias("id_l"), F.col("sh").alias("sh_l")
    )
    rsh_side = shingled.filter(F.col("id") % 2 == 1).select(
        ((F.col("id") - 1) / 2).cast("long").alias("id_r"), F.col("sh").alias("sh_r")
    )
    verified = (
        cand.join(lsh_side.hint("shuffle_merge"), on="id_l")
        .join(rsh_side.hint("shuffle_merge"), on="id_r")
        .withColumn("jaccard", verified_jaccard(F.col("sh_l"), F.col("sh_r"), threshold))
        .filter(F.col("jaccard") >= threshold)
        .select("id_l", "id_r", "jaccard")
    )
    return _attach_release(verified, shingled, sized)


def cross_ngram_jaccard_pairs(
    left: DataFrame,
    right: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact cross-table word-n-gram Jaccard pairs (id_l, id_r, jaccard).
    O(|L|·|R|) — the verification/bounded-subset form whose answer is
    engine-independent; cross_near_duplicates is the scale path.

    As in ngram_jaccard_pairs, the left stream is repartitioned so the
    nested-loop compare runs on every core instead of one-task-per-input-
    partition."""
    from codd_spark.functions.text import tokens

    parallelism = left.sparkSession.sparkContext.defaultParallelism

    def grams(df: DataFrame, out: str) -> DataFrame:
        toked = df.select(
            F.col(id_col).alias(out), tokens(F.col(text_col)).alias("__toks")
        )
        return toked.select(out, _ngrams_of_attr(F.col("__toks"), n).alias(f"ng_{out}"))

    a = grams(left, "id_l").repartition(parallelism, F.col("id_l"))
    b = grams(right, "id_r")
    return (
        a.crossJoin(b.hint("shuffle_merge"))
        .withColumn("jaccard", F.round(jaccard(F.col("ng_id_l"), F.col("ng_id_r")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_l", "id_r", "jaccard")
    )


def ngram_containment_matches(
    corpus: DataFrame,
    contaminants: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    n: int = 13,
    min_hits: int = 1,
) -> DataFrame:
    """Containment-style contamination detection (the GPT-3/PaLM method,
    distinct from Jaccard overlap): a corpus document is contaminated if
    at least ``min_hits`` distinct word n-grams of ANY contaminant
    document appear verbatim in it. Jaccard misses the eval-question-
    quoted-inside-a-long-page case (tiny union ratio); containment is
    asymmetric and catches exactly that.

    Returns (id_l = corpus doc, id_r = contaminant doc, n_hits).

    Scale shape: both sides explode to (gram-hash, id) rows — word
    n-grams travel as xxhash64 longs, never strings — and meet in ONE
    shuffle equi-join on the hash, followed by a count aggregate. No
    all-pairs stage exists anywhere: cost is bounded by the true overlap,
    and the contaminant side (an eval benchmark) is typically tiny but is
    still joined shuffle-pinned, never broadcast, because "the eval set"
    is unbounded in general (n-gram rows explode |doc| × n ways).
    """
    from codd_spark.functions.text import tokens

    def gram_hashes(df: DataFrame, out_id: str) -> DataFrame:
        toked = df.select(
            F.col(id_col).alias(out_id), tokens(F.col(text_col)).alias("__toks")
        )
        grams = toked.select(
            out_id, F.explode(_ngrams_of_attr(F.col("__toks"), n)).alias("__g")
        )
        return grams.select(out_id, F.xxhash64("__g").alias("gh"))

    lg = gram_hashes(corpus, "id_l")
    rg = gram_hashes(contaminants, "id_r")
    return (
        lg.join(rg.hint("shuffle_merge"), on="gh")
        .groupBy("id_l", "id_r")
        .agg(F.count("*").alias("n_hits"))
        .filter(F.col("n_hits") >= min_hits)
    )


def containment_evidence(
    corpus: DataFrame,
    contaminants: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    n: int = 13,
    min_hits: int = 1,
) -> DataFrame:
    """``ngram_containment_matches`` with WHERE: per (corpus doc,
    contaminant) pair, the token span inside the corpus document that
    contains every verbatim n-gram hit — (id_l, id_r, n_hits,
    span_start, span_end), positions 1-based inclusive over whitespace
    tokens. The interpretability surface of decontamination: a reviewer
    (or an automated span-removal pass, see ``remove_spans``) sees
    exactly which passage quotes the benchmark instead of a bare doc id.

    Same single-shuffle shape as the detector — corpus grams carry their
    token position through the hash join (still longs, positions are
    ints), one (pair)-keyed aggregate computes distinct-hit count and
    the min/max matched position. ``n_hits`` equals the detector's count
    (distinct matched grams)."""
    from codd_spark.functions.text import tokens

    toked = corpus.select(
        F.col(id_col).alias("id_l"), tokens(F.col(text_col)).alias("__toks")
    )
    cnt = F.greatest(F.size("__toks") - (n - 1), F.lit(1))
    pos_grams = toked.select(
        "id_l",
        F.size("__toks").alias("__nt"),
        F.explode(
            F.transform(
                F.sequence(F.lit(1), cnt),
                lambda i: F.struct(
                    i.alias("pos"),
                    F.xxhash64(F.concat_ws(" ", F.slice(F.col("__toks"), i, n))).alias(
                        "gh"
                    ),
                ),
            )
        ).alias("pg"),
    ).select("id_l", "__nt", F.col("pg.pos").alias("pos"), F.col("pg.gh").alias("gh"))

    rt = contaminants.select(
        F.col(id_col).alias("id_r"), tokens(F.col(text_col)).alias("__toks")
    )
    rg = rt.select(
        "id_r", F.explode(_ngrams_of_attr(F.col("__toks"), n)).alias("__g")
    ).select("id_r", F.xxhash64("__g").alias("gh"))

    return (
        pos_grams.join(rg.hint("shuffle_merge"), on="gh")
        .groupBy("id_l", "id_r")
        .agg(
            F.count_distinct("gh").alias("n_hits"),
            F.min("pos").alias("span_start"),
            F.least(F.max("pos") + (n - 1), F.first("__nt")).alias("span_end"),
        )
        .filter(F.col("n_hits") >= min_hits)
    )


def duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    k: int = 20,
    min_count: int = 2,
) -> DataFrame:
    """Repeated-substring spans: contiguous token regions whose every
    k-token window occurs >= ``min_count`` times across the corpus —
    the span-level dedup signal (remove the repeated PASSAGE, keep the
    document) that doc-level near-dup mining cannot produce. Boilerplate
    headers, license blocks and templated paragraphs are repeated spans
    inside otherwise-unique documents.

    Returns (id, span_start, span_end, n_windows): token positions
    (1-based, inclusive) of each maximal merged span plus how many
    flagged windows it absorbed.

    Scale shape: one posexplode to (id, pos, window-hash) rows — linear
    in corpus tokens, windows travel as xxhash64 longs; ONE hash-keyed
    count aggregate (map-side partials) finds repeated windows; a
    shuffle-pinned join flags positions; per-doc gaps-and-islands (one
    window over the id partition) merges overlapping [pos, pos+k) into
    maximal spans. No pairwise stage anywhere — cost is corpus-linear,
    unlike suffix-array construction, while flagging the same >=k-token
    verbatim repeats.
    """
    from codd_spark.functions.text import tokens

    # repartition by id first + cache the window stream eagerly (r13):
    # the per-position window hashing (concat_ws over a k-token slice +
    # xxhash64, the operator's dominant CPU) otherwise runs at the
    # input's split count — single-task for a one-file corpus — and runs
    # TWICE, because both the repeated-hash aggregate and the flag join
    # consume `wins` as concurrent AQE leaf stages.
    par = df.sparkSession.sparkContext.defaultParallelism
    toked = df.repartition(par, F.col(id_col)).select(
        F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("__toks")
    )
    n_wins = F.size(F.col("__toks")) - (k - 1)
    # guard: sequence(1, 0) would generate a DESCENDING [1, 0] — docs
    # shorter than one window must contribute no rows, not partial hashes
    positions = F.when(n_wins >= 1, F.sequence(F.lit(1), n_wins)).otherwise(
        F.array().cast("array<int>")
    )
    wins = _eager_cache(
        toked.select(
            "id",
            F.posexplode(
                F.transform(
                    positions,
                    lambda i: F.xxhash64(F.concat_ws(" ", F.slice(F.col("__toks"), i, k))),
                )
            ).alias("pos0", "h"),
        ).select("id", (F.col("pos0") + 1).alias("pos"), "h")
    )

    repeated = (
        wins.groupBy("h").agg(F.count("*").alias("__c")).filter(F.col("__c") >= min_count)
    )
    flagged = wins.join(repeated.hint("shuffle_merge").select("h"), on="h").select(
        "id", "pos"
    )

    w = Window.partitionBy("id").orderBy("pos")
    spans = (
        flagged.withColumn(
            "__brk",
            F.when(
                F.col("pos") - F.lag("pos").over(w) <= k, F.lit(0)
            ).otherwise(F.lit(1)),
        )
        .withColumn("__span", F.sum("__brk").over(
            Window.partitionBy("id").orderBy("pos")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ))
        .groupBy("id", "__span")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(k - 1)).alias("span_end"),
            F.count("*").alias("n_windows"),
        )
        .select(
            F.col("id").alias(id_col), "span_start", "span_end", "n_windows"
        )
    )
    # the cached window stream must be released once the caller is done
    # (same contract as every cached dedup pipeline)
    return _attach_release(spans, wins)


def remove_spans(
    df: DataFrame,
    spans: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "cleaned_text",
) -> DataFrame:
    """Cut flagged token spans out of each document — the removal half of
    span-level dedup (``duplicate_spans`` flags, this removes; keep both
    steps separate so a pipeline can audit what it deletes).

    ``spans`` is (id, span_start, span_end) with 1-based inclusive token
    positions. Returns the input plus (cleaned_text, n_tokens_orig,
    n_tokens_kept). Documents with no spans pass through verbatim
    (including their original whitespace); documents with spans are
    rebuilt from the kept tokens, whitespace-normalized.

    Pure expression plan: spans aggregate to one array per doc (sizes are
    bounded by doc length / k, so the per-row array is small), one left
    join, then a token-position filter via nested higher-order functions
    — no Python, no explode of the token stream.
    """
    from codd_spark.functions.text import tokens

    agg = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("__spans")
    )
    joined = df.join(agg.hint("shuffle_merge"), on=id_col, how="left")
    toks = tokens(F.col(text_col))
    positions = F.sequence(F.lit(1), F.greatest(F.size(toks), F.lit(1)))
    kept = F.filter(
        positions,
        lambda i: ~F.exists(
            F.coalesce(F.col("__spans"), F.array()),
            lambda sp: (i >= sp["span_start"]) & (i <= sp["span_end"]),
        ),
    )
    staged = joined.withColumn("__toks", toks).withColumn("__kept", kept)
    cleaned = F.when(
        F.col("__spans").isNull(), F.col(text_col)
    ).otherwise(
        F.concat_ws(
            " ",
            F.transform(F.col("__kept"), lambda i: F.element_at(F.col("__toks"), i)),
        )
    )
    return (
        staged.withColumn(out_col, cleaned)
        .withColumn("n_tokens_orig", F.size(F.col("__toks")))
        .withColumn(
            "n_tokens_kept",
            F.when(F.col("__spans").isNull(), F.size(F.col("__toks"))).otherwise(
                F.size(F.col("__kept"))
            ),
        )
        .drop("__spans", "__toks", "__kept")
    )


def line_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    min_count: int = 2,
    sep: str = "\n",
    normalize: bool = True,
    min_line_chars: int = 1,
    hash_fn: str = "xxhash64",
    out_col: str = "cleaned_text",
) -> DataFrame:
    """Corpus-wide line-level dedup (the CCNet / RefinedWeb curation
    step): any LINE whose normalized form appears >= ``min_count`` times
    across the whole corpus is removed from EVERY document that contains
    it, and each document is reassembled from its surviving lines in
    original order. This is the boilerplate killer ("subscribe to our
    newsletter", cookie banners, nav menus) that document-level near-dup
    mining cannot express — the documents are unique, the lines are not.

    All occurrences are dropped (CCNet semantics), not all-but-one:
    a line repeated across thousands of pages is template chrome, not
    content anywhere. Lines shorter than ``min_line_chars`` after trim
    (default: empty/whitespace-only lines) never count as duplicates and
    are always kept, so paragraph structure survives.

    Returns (id, ``out_col``, n_lines, n_removed).

    Scale shape: one posexplode to (id, pos, line) — linear in corpus
    lines; hashing to a 64-bit key keeps the frequency aggregate's
    shuffle rows narrow (ONE count aggregate with map-side partials);
    the duplicated-hash set (boilerplate — tiny relative to the corpus,
    but corpus-derived, so the flag join is pinned to shuffle rather
    than broadcast); one groupBy(id) reassembles. No pairwise stage, no
    driver collect — corpus-linear end to end, same plan at 100 TB.

    ``hash_fn``: "xxhash64" (default) or "md5_60" (portable top-60-bits
    -of-md5 — the cross-engine contract variant every SQL oracle can
    replay bit-for-bit).
    """
    if hash_fn == "xxhash64":
        hfn = F.xxhash64
    elif hash_fn == "md5_60":
        def hfn(c):
            return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")
    else:
        raise ValueError(f"hash_fn must be 'xxhash64' or 'md5_60', got {hash_fn!r}")

    # F.split takes a Java REGEX — quote the separator so "." or "|"
    # split literally (\Q...\E quoting; a separator containing the
    # two-char sequence \E is not supported)
    if "\\E" in sep:
        raise ValueError(r"sep must not contain the sequence \E")
    lines = df.select(
        F.col(id_col).alias("id"),
        F.posexplode_outer(
            F.split(F.col(text_col), "\\Q" + sep + "\\E")
        ).alias("pos", "__line"),
    )
    key = normalize_ws(F.col("__line")) if normalize else F.col("__line")
    eligible = F.length(F.trim(F.col("__line"))) >= min_line_chars
    hashed = lines.withColumn("h", F.when(eligible, hfn(key)))

    dup_hashes = (
        hashed.where(F.col("h").isNotNull())
        .groupBy("h")
        .agg(F.count("*").alias("__c"))
        .where(F.col("__c") >= min_count)
        .select("h")
    )
    flagged = hashed.join(
        dup_hashes.hint("shuffle_merge").withColumn("__dup", F.lit(True)),
        on="h",
        how="left",
    )
    return (
        flagged.groupBy("id")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(F.when(F.col("__dup").isNotNull(), 1).otherwise(0)).alias(
                "n_removed"
            ),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("__dup").isNull(),
                                F.struct(F.col("pos"), F.col("__line").alias("line")),
                            )
                        )
                    ),
                    lambda s: s.getField("line"),
                ),
                sep,
            ).alias(out_col),
        )
        .select(
            F.col("id").alias(id_col),
            out_col,
            F.col("n_lines").cast("long").alias("n_lines"),
            F.col("n_removed").cast("long").alias("n_removed"),
        )
    )


def url_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    url_col: str = "url",
    *,
    strip_www: bool = True,
) -> DataFrame:
    """URL-level dedup for crawl corpora: canonicalize every URL
    (``functions.url.canonical_url`` — lowercased scheme/host, www and
    default ports stripped, fragments and utm_*/tracking params dropped,
    remaining params sorted, trailing slashes removed) and keep ONE
    document per canonical URL — the lowest id, so reruns and grown
    crawls elect the same keeper. The cheapest dedup pass a crawl
    pipeline runs, BEFORE any content hashing: refetches of the same
    page under cosmetically different URLs never reach the tokenizer.

    Returns (id, canonical_url, host, n_dups) — one row per kept
    document, ``n_dups`` = how many raw URLs collapsed onto it.

    NULL semantics: documents with a NULL url are NOT a duplicate set.
    ``canonical_url(NULL)`` is NULL and ``groupBy`` would treat NULL as
    one key, silently dropping every url-less document except the
    min-id one — the exact defect class IncrementalExactDeduplicator's
    contract forbids (NULL keys never collapse together). NULL-url rows
    bypass the aggregate and pass through unchanged with ``n_dups=1``.

    Scale shape: canonicalization is a pure projection (codegen string
    expressions, no UDF); the keeper election is ONE min/count aggregate
    keyed on the canonical URL — map-side partials, corpus-linear, no
    join anywhere (the NULL-url branch is a map-only filter unioned
    back). At 100 TB this is a single shuffle of (url, id) pairs.
    """
    from codd_spark.functions.url import canonical_url, url_host

    projected = df.select(
        F.col(id_col).alias("id"),
        canonical_url(F.col(url_col), strip_www=strip_www).alias(
            "canonical_url"
        ),
        url_host(F.col(url_col), strip_www=strip_www).alias("host"),
        F.col(url_col).isNull().alias("__no_url"),
    )
    deduped = (
        projected.where(~F.col("__no_url"))
        .groupBy("canonical_url", "host")
        .agg(F.min("id").alias("id"), F.count("*").alias("n_dups"))
    )
    passthrough = projected.where(F.col("__no_url")).select(
        "canonical_url", "host", "id", F.lit(1).alias("n_dups")
    )
    return deduped.unionByName(passthrough).select(
        F.col("id").alias(id_col),
        "canonical_url",
        "host",
        F.col("n_dups").cast("long").alias("n_dups"),
    )


def decontaminate(
    corpus: DataFrame,
    contaminants: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    threshold: float = 0.5,
    method: str = "minhash",
    min_hits: int | None = None,
    **kwargs,
) -> DataFrame:
    """Remove corpus documents that near-match ANY contaminant document
    (benchmark/eval-set decontamination of a training corpus).

    ``method="minhash"`` is the scale path (LSH candidates + exact
    verification); ``method="exact"`` computes every pairwise Jaccard —
    bounded subsets only, but its answer is engine-independent (used by
    the oracle-checked contract query); ``method="containment"`` flags a
    corpus doc when >= ``min_hits`` distinct contaminant n-grams appear
    verbatim in it (an integer HIT COUNT, not a Jaccard ratio —
    GPT-3-style verbatim-overlap decontamination; one shuffle join on
    hashed n-grams, exact and engine-independent). For containment,
    pass ``min_hits`` explicitly; an integral ``threshold`` >= 1 is
    accepted for backward compatibility, but a ratio-style value < 1 is
    rejected (it would truncate to 0 hits and silently remove every doc
    sharing a single n-gram). The removal itself is an anti join on the
    matched ids — shuffle-pinned, the matched set grows with the corpus.
    """
    if method == "minhash":
        pairs = cross_near_duplicates(
            corpus, contaminants, id_col, text_col, threshold=threshold, **kwargs
        )
    elif method == "exact":
        pairs = cross_ngram_jaccard_pairs(
            corpus, contaminants, id_col, text_col, threshold=threshold, **kwargs
        )
    elif method == "containment":
        if min_hits is None:
            if threshold < 1 or int(threshold) != threshold:
                raise ValueError(
                    "method='containment' counts verbatim n-gram hits: pass "
                    "min_hits=<int >= 1> (or an integral threshold >= 1), "
                    f"not a Jaccard-style ratio (got threshold={threshold!r})"
                )
            min_hits = int(threshold)
        pairs = ngram_containment_matches(
            corpus, contaminants, id_col, text_col,
            min_hits=min_hits, **kwargs,
        )
    else:
        raise ValueError(
            f"unknown method {method!r} (use 'minhash', 'exact' or 'containment')"
        )
    dirty = pairs.select(F.col("id_l").alias(id_col)).distinct()
    clean = corpus.join(dirty.hint("shuffle_merge"), on=id_col, how="left_anti")
    return _adopt_release(clean, pairs)


def fuzzy_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    threshold: float = 0.5,
    num_hashes: int = 120,
    bands: int = 20,
    shingle_k: int = 5,
) -> DataFrame:
    """MinHash fuzzy dedup END-TO-END (the standard web-corpus recipe —
    e.g. SlimPajama/Dolma-style fuzzy dedup): banded one-permutation
    MinHash near-dup pairs (exact-Jaccard verified), closed transitively
    into clusters by min-label propagation, one keeper elected per
    cluster. Returns (id, cluster_id, cluster_size, is_keeper) —
    ``semantic_dedup``'s text twin; filter ``is_keeper`` for the
    deduplicated corpus.

    The transitive closure is the point: chained near-dups (A~B~C with
    J(A,C) < t) still collapse to ONE surviving document, which pairwise
    filtering alone cannot guarantee. Scale bounds are inherited from
    the stages — banded bucket self-join (no all-pairs stage), label
    propagation over edge endpoints only (graph.py::dedup_clusters),
    bounded driver fixpoint with per-round lineage cuts."""
    from codd_spark.operators.graph import dedup_clusters

    pairs = minhash_near_duplicates(
        df,
        id_col,
        text_col,
        threshold=threshold,
        num_hashes=num_hashes,
        bands=bands,
        shingle_k=shingle_k,
    )
    # adopt the miner's cache obligation: `pairs` dies on return, and in
    # the distributed-closure regime the result plan still references it
    # (premature release would re-run the whole miner at first action)
    return _adopt_release(dedup_clusters(df, pairs, id_col, "id_a", "id_b"), pairs)


def _gram_hash_arrays(
    df: DataFrame, id_col: str, text_col: str, n: int, keep_id: bool
) -> DataFrame:
    """One xxhash64 long per word-n-gram, as an array column. The SECOND
    Kirsch-Mitzenmacher hash is a xorshift64 mix of this one (_xs_mix_col
    / its numpy twin), derived identically on the JVM build side and the
    numpy probe side — so only ONE gram pass runs and only ONE array
    ships through Arrow."""
    cols = [F.col(id_col).alias("__id")] if keep_id else []
    toked = df.select(*cols, tokens(F.col(text_col)).alias("__toks"))
    return toked.select(
        *(["__id"] if keep_id else []),
        F.transform(
            _ngrams_of_attr(F.col("__toks"), n), lambda g: F.xxhash64(g)
        ).alias("gh1"),
    )


def _xs_mix_col(c):
    """xorshift64 step — XOR/shift only, so it is wrap-free under ANSI
    SQL and bit-identical to the numpy uint64 version in the probe."""
    z = c.bitwiseXOR(F.shiftleft(c, 13))
    z = z.bitwiseXOR(F.shiftrightunsigned(z, 7))
    return z.bitwiseXOR(F.shiftleft(z, 17))


class GramBloom:
    """Serializable Bloom sketch of a document set's word-n-grams — the
    build half of ``bloom_decontaminate``, separable so one corpus pass
    can be probed against MANY benchmarks: build one sketch per
    benchmark as it arrives, ``union`` them (bitwise OR — lossless, the
    defining monoid property of Bloom filters), persist with
    ``to_bytes``/``from_bytes``, and pass the union as ``prebuilt``.
    Sketches are union-compatible iff built with identical
    (m_bits, n_hashes, ngram_n) — pin ``m_bits`` explicitly when
    building a family of sketches to union."""

    __slots__ = ("bitmap", "m_bits", "n_hashes", "ngram_n", "n_items")

    def __init__(self, bitmap, m_bits: int, n_hashes: int, ngram_n: int, n_items: int):
        self.bitmap = bitmap  # np.int64[m_bits // 64]
        self.m_bits = m_bits
        self.n_hashes = n_hashes
        self.ngram_n = ngram_n
        self.n_items = n_items

    def union(self, other: "GramBloom") -> "GramBloom":
        import numpy as np

        if (self.m_bits, self.n_hashes, self.ngram_n) != (
            other.m_bits, other.n_hashes, other.ngram_n,
        ):
            raise ValueError(
                "union requires identical (m_bits, n_hashes, ngram_n): "
                f"{(self.m_bits, self.n_hashes, self.ngram_n)} vs "
                f"{(other.m_bits, other.n_hashes, other.ngram_n)}"
            )
        return GramBloom(
            np.bitwise_or(self.bitmap, other.bitmap),
            self.m_bits, self.n_hashes, self.ngram_n,
            self.n_items + other.n_items,
        )

    def to_bytes(self) -> bytes:
        import struct

        return (
            struct.pack("<QQQQ", self.m_bits, self.n_hashes, self.ngram_n, self.n_items)
            + self.bitmap.tobytes()
        )

    @classmethod
    def from_bytes(cls, data: bytes) -> "GramBloom":
        import struct

        import numpy as np

        m_bits, n_hashes, ngram_n, n_items = struct.unpack("<QQQQ", data[:32])
        bitmap = np.frombuffer(data[32:], dtype=np.int64).copy()
        return cls(bitmap, int(m_bits), int(n_hashes), int(ngram_n), int(n_items))

    # -- persistence (train once on the benchmark, reuse across crawls) ----

    def save(self, spark, state_dir: str) -> None:
        """Persist the sketch to ``state_dir`` (any scheme statefs
        resolves: local, hdfs://, s3a://, viewfs://). A decontamination
        benchmark changes rarely while crawl batches arrive daily —
        rebuilding the sketch per run re-scans the benchmark for
        nothing. Layout: a CONTENT-ADDRESSED write-once blob
        (``sketch-<sha16>.bin`` — two saves of the same sketch are
        idempotent, a torn write can never be read because the manifest
        names only fully-written files) published by a manifest commit
        (versioned write-once on HCFS; POSIX-atomic locally). Re-saving
        into the same dir (e.g. after ``union``-ing a new benchmark)
        writes a new blob and moves the manifest pointer; readers see
        the old or the new sketch, never a mix."""
        import hashlib

        fs = _resolve_statefs(spark, state_dir)
        if fs.manifest_exists() and fs.read_manifest().get("kind") != "gram_bloom":
            raise ValueError(
                f"{state_dir} holds non-GramBloom state — refusing to adopt"
            )
        fs.mkdirs()
        blob = self.to_bytes()
        name = f"sketch-{hashlib.sha256(blob).hexdigest()[:16]}.bin"
        fs.write_bytes(fs.join(fs.state_dir, name), blob)
        fs.commit_manifest(
            {
                "kind": "gram_bloom",
                "file": name,
                "m_bits": self.m_bits,
                "n_hashes": self.n_hashes,
                "ngram_n": self.ngram_n,
                "n_items": self.n_items,
            }
        )

    @classmethod
    def load(cls, spark, state_dir: str) -> "GramBloom":
        """Reload a sketch persisted by :meth:`save` — the probe-only
        entry point for later sessions (no benchmark scan)."""
        fs = _resolve_statefs(spark, state_dir)
        if not fs.manifest_exists():
            raise ValueError(f"no GramBloom manifest at {state_dir}")
        m = fs.read_manifest()
        if m.get("kind") != "gram_bloom":
            raise ValueError(
                f"{state_dir} holds {m.get('kind')!r} state, not a GramBloom"
            )
        out = cls.from_bytes(fs.read_bytes(fs.join(fs.state_dir, m["file"])))
        if (out.m_bits, out.n_hashes, out.ngram_n) != (
            m["m_bits"], m["n_hashes"], m["ngram_n"],
        ):
            raise ValueError(f"sketch blob/manifest mismatch in {state_dir}")
        return out


def build_gram_bloom(
    contaminants: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    n: int = 13,
    bits_per_item: int = 16,
    n_hashes: int = 7,
    m_bits: int | None = None,
) -> GramBloom:
    """Build the n-gram Bloom sketch of a contaminant set. The bitmap is
    assembled DISTRIBUTIVELY (every distinct gram explodes to n_hashes
    bit positions, bit_or per 64-bit word) and only the finished sketch
    is collected — bounded by the BENCHMARK size by construction (capped
    at 2^27 bits = 16 MB), never by the corpus; the same boundary class
    as a 1-row scalar. ``m_bits`` (power of two) overrides auto-sizing —
    pin it when building sketches meant to be ``GramBloom.union``ed."""
    import numpy as np

    if n_hashes < 1 or bits_per_item < 1:
        raise ValueError("n_hashes and bits_per_item must be >= 1")
    cg = (
        _gram_hash_arrays(contaminants, id_col, text_col, n, keep_id=False)
        .select(F.explode("gh1").alias("g1"))
        .distinct()
        .select("g1", _xs_mix_col(F.col("g1")).alias("g2"))
    )
    n_grams = cg.count()  # sketch sizing: one count over the benchmark side
    if m_bits is None:
        m_bits = 1 << 10
        while m_bits < n_grams * bits_per_item and m_bits < (1 << 27):
            m_bits <<= 1
    elif m_bits & (m_bits - 1) or m_bits < 64:
        raise ValueError("m_bits must be a power of two >= 64")
    mask = m_bits - 1
    g1m = F.col("g1").bitwiseAND(F.lit(mask))
    g2m = F.col("g2").bitwiseAND(F.lit(mask))
    pos = F.explode(
        F.array(*[(g1m + F.lit(j) * g2m).bitwiseAND(F.lit(mask)) for j in range(n_hashes)])
    ).alias("pos")
    bm_rows = (
        cg.select(pos)
        .select(
            F.shiftright("pos", 6).alias("word"),
            F.expr("shiftleft(cast(1 as bigint), cast(pmod(pos, 64) as int))").alias("bit"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(bit)").alias("bits"))
        .collect()  # bounded: <= m_bits/64 rows (16 MB cap), sketch-sized
    )
    bitmap = np.zeros(m_bits // 64, dtype=np.int64)
    for r in bm_rows:
        bitmap[r.word] = r.bits
    return GramBloom(bitmap, m_bits, n_hashes, n, n_grams)


def bloom_hits_udf(bloom: GramBloom):
    """Vectorized Arrow UDF over an ``array<long>`` gram-hash column:
    returns how many DISTINCT grams have all ``bloom.n_hashes`` probe
    bits set in the sketch. Stateless scalar pandas UDF — the map-only
    probe half of ``bloom_decontaminate``, factored out so batch and
    STREAMING plans share one kernel (see ``bloom_probe``)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    bitmap = bloom.bitmap
    mask = bloom.m_bits - 1
    k = bloom.n_hashes

    def _hits(gh1s):
        import pandas as pd

        n_rows = len(gh1s)
        # a NULL text yields a NULL gram array (tokens(NULL) -> null),
        # which Arrow hands over as None — treat as zero grams
        l1 = [
            np.asarray(v if v is not None else (), dtype=np.int64)
            for v in gh1s
        ]
        lens = np.fromiter((a.size for a in l1), dtype=np.int64, count=n_rows)
        if lens.sum() == 0:
            return pd.Series(np.zeros(n_rows, dtype=np.int32))
        # one flat membership pass over the WHOLE Arrow batch (no per-row
        # Python loop): k probes on the concatenated gram stream, then a
        # lexsort gives distinct (row, gram) hit counts vectorized
        flat1 = np.concatenate(l1)
        row_ids = np.repeat(np.arange(n_rows, dtype=np.int64), lens)
        # second hash = the same xorshift64 mix the build side applied
        # JVM-side (_xs_mix_col) — uint64 domain makes >> logical
        u = flat1.astype(np.uint64)
        z = u ^ (u << np.uint64(13))
        z = z ^ (z >> np.uint64(7))
        z = z ^ (z << np.uint64(17))
        p1 = flat1 & mask
        p2 = (z & np.uint64(mask)).astype(np.int64)
        ok = np.ones(flat1.size, dtype=bool)
        for j in range(k):
            p = (p1 + j * p2) & mask
            ok &= ((bitmap[p >> 6] >> (p & 63)) & 1).astype(bool)
        r, g = row_ids[ok], flat1[ok]
        out = np.zeros(n_rows, dtype=np.int64)
        if r.size:
            order = np.lexsort((g, r))
            r, g = r[order], g[order]
            first = np.ones(r.size, dtype=bool)
            first[1:] = (r[1:] != r[:-1]) | (g[1:] != g[:-1])
            out = np.bincount(r[first], minlength=n_rows)
        return pd.Series(out.astype(np.int32))

    # no type annotations: `from __future__ import annotations` stringifies
    # hints, which the pandas_udf signature inspector rejects — the
    # 1-arg no-hint form is a plain SCALAR (batch Series -> Series) UDF
    return pandas_udf(_hits, "integer")


def bloom_probe(
    df: DataFrame,
    bloom: GramBloom,
    *,
    text_col: str = "text",
    hits_col: str = "bloom_hits",
) -> DataFrame:
    """Append ``hits_col`` = number of the document's distinct
    word-``bloom.ngram_n``-grams that are (probably) in ``bloom``'s gram
    set. MAP-ONLY: one JVM gram-hash pass feeding one Arrow batch probe
    per partition — no shuffle, no state — so the same expression applies
    unchanged to a STREAMING DataFrame (wrapped by
    streaming/structured.py::streaming_bloom_decontaminate). No false
    negatives (Bloom guarantee); hits over-count only at the sketch's
    false-positive rate."""
    # stage the token array as a real column first: higher-order
    # functions evaluate INTERPRETED (no codegen subexpression
    # elimination), so an inline tokens() would re-split the text once
    # per n-gram position — quadratic in document length. The staged
    # column survives CollapseProject because _ngrams_of_attr references
    # it twice (size + slice).
    tok_col = f"__{hits_col}_toks"
    gh1 = F.transform(
        _ngrams_of_attr(F.col(tok_col), bloom.ngram_n),
        lambda g: F.xxhash64(g),
    )
    return (
        df.withColumn(tok_col, tokens(F.col(text_col)))
        .withColumn(hits_col, bloom_hits_udf(bloom)(gh1))
        .drop(tok_col)
    )


def bloom_decontaminate(
    corpus: DataFrame,
    contaminants: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    n: int = 13,
    min_hits: int = 1,
    bits_per_item: int = 16,
    n_hashes: int = 7,
    exact_verify: bool = True,
    prebuilt: GramBloom | None = None,
) -> DataFrame:
    """Containment decontamination with a Bloom-filter prefilter — the
    Dolma/CCNet-style shape for "check a 100-TB corpus against every
    benchmark" where even ONE shuffle of the corpus's n-gram stream is
    the dominant cost (compare ``decontaminate(method='containment')``,
    which equi-joins hashed corpus grams against contaminant grams).

    Build: every distinct contaminant word-n-gram sets ``n_hashes`` bits
    (Kirsch-Mitzenmacher double hashing: h1 = xxhash64 of the gram, h2 =
    a xorshift64 mix of h1 — XOR/shift only, so the JVM build side and
    the numpy probe side compute it bit-identically with no wrapping
    multiply under ANSI, and only ONE hash array ships through Arrow)
    in an m-bit filter, m = next power of two >= grams *
    ``bits_per_item`` (16 bits/item + 7 hashes ~ 0.04% fp). The bitmap
    is assembled DISTRIBUTIVELY (explode k positions -> bit_or per
    64-bit word) and only the finished sketch is collected — bounded by
    the BENCHMARK size by construction (capped at 2^27 bits = 16 MB),
    never by the corpus, the same boundary class as a 1-row scalar.

    Probe: the corpus side is MAP-ONLY — a vectorized Arrow UDF tests
    each document's gram hashes against the broadcast bitmap; no corpus
    gram ever shuffles. No false negatives (Bloom guarantee + a doc
    whose best per-contaminant hit count reaches ``min_hits`` certainly
    has >= min_hits hits in the union filter), so the flagged set is a
    complete candidate superset; with ``exact_verify=True`` (default)
    candidates — typically a vanishing fraction of the corpus — go
    through the exact hashed-gram equi-join and per-contaminant
    ``min_hits`` rule of ``ngram_containment_matches``, making the
    output EXACT (oracle-replayable). ``exact_verify=False`` skips the
    join and removes on union-filter hits alone (false-positive rate
    applies; cheapest possible full-corpus pass).

    A prebuilt/unioned ``GramBloom`` (see ``build_gram_bloom``) skips
    the build pass — the many-benchmarks pattern: one corpus probe
    against the OR-union of every benchmark's sketch. With ``prebuilt``,
    ``contaminants`` is only needed for ``exact_verify``.

    Returns the clean corpus (original columns)."""
    if prebuilt is None:
        if contaminants is None:
            raise ValueError("pass contaminants or a prebuilt GramBloom")
        prebuilt = build_gram_bloom(
            contaminants, id_col, text_col,
            n=n, bits_per_item=bits_per_item, n_hashes=n_hashes,
        )
    elif prebuilt.ngram_n != n:
        raise ValueError(
            f"prebuilt sketch holds {prebuilt.ngram_n}-grams, probe asked for {n}"
        )
    if exact_verify and contaminants is None:
        raise ValueError(
            "exact_verify needs the contaminants DataFrame "
            "(pass exact_verify=False for sketch-only removal)"
        )
    flagged_ids = (
        bloom_probe(
            corpus.select(id_col, text_col),
            prebuilt,
            text_col=text_col,
            hits_col="__bloom_hits",
        )
        .filter(F.col("__bloom_hits") >= min_hits)
        .select(id_col)
    )
    if exact_verify:
        cand_docs = corpus.join(
            flagged_ids.hint("shuffle_merge"), on=id_col, how="left_semi"
        )
        pairs = ngram_containment_matches(
            cand_docs, contaminants, id_col, text_col, n=n, min_hits=min_hits
        )
        dirty = pairs.select(F.col("id_l").alias(id_col)).distinct()
    else:
        dirty = flagged_ids
    return corpus.join(dirty.hint("shuffle_merge"), on=id_col, how="left_anti")


class _BucketedMinhashState:
    """Restart-surviving MinHash state as EXTERNAL (band,h)-bucketed
    parquet tables — the durable backend behind
    ``IncrementalDeduplicator(state_dir=...)`` and
    ``IncrementalDecontaminator(state_dir=...)``.

    Layout under ``state_dir``: ``buckets/`` (id, band, h, gen) bucketed
    by (band, h); ``shingles/`` (id, sh, gen) bucketed by id;
    ``manifest.json`` with the MinHash params and the last COMMITTED
    generation. Tables are ``CREATE TABLE ... USING PARQUET CLUSTERED BY
    ... LOCATION`` externals, re-registered idempotently on every open —
    so a brand-new SparkSession (a real process restart) recovers both
    data and the bucket spec from the directory alone.

    Why bucketed: the per-arrival probe joins state on (band, h) / (id).
    With the state side bucketed, the executed plan carries exactly ONE
    Exchange — the O(batch) probe side — and the state side reads
    ``Bucketed: true`` with no shuffle ever again (verified by plan
    assertion in test_incremental_dedup). Pay the clustering once per
    append, probe shuffle-free forever — the 100-TB shape the in-memory
    localCheckpoint path cannot give across restarts.

    Crash safety (same contract as streaming/store.py): each append
    writes both tables under ``gen = committed + 1`` and only then
    commits the manifest (atomic tmp + rename). Readers filter
    ``gen <= committed``, so a crash between the two inserts leaves only
    invisible orphan rows. Orphans must never be ADOPTED by a later
    commit either (a later append that raises ``committed`` past the
    orphan's gen would pull every orphan row into the read window —
    ADVICE r7): under the single-writer contract any generation above
    ``committed`` is uncommitted by definition, so layout-2 opens DELETE
    ``gen=<K>`` dirs with K > committed before resuming, and in-process
    insert failures quarantine the partial generation the same way.
    Layout-1 dirs (gen is a data column, not deletable) instead record
    such generations in a persistent ``dead_gens`` manifest list that
    every reader excludes. A batch whose commit never landed is simply
    "not processed" — replay it.

    Durability backends (round 9 — sources/statefs.py): local paths and
    ``file://`` keep the r8 POSIX fast path (atomic ``os.replace`` of
    ``manifest.json``, ``os.listdir`` discovery, ``shutil.rmtree``
    sweeps; existing dirs need no migration). Any OTHER HCFS scheme
    (``hdfs://``, ``viewfs://``, ``s3a://`` with its connector, ...)
    routes every metadata operation through the JVM Hadoop
    ``FileSystem`` for that URI, and the manifest commit becomes a
    WRITE-ONCE VERSIONED file (``manifest-v<N>.json`` via tmp + rename
    to a never-reused name): stores without atomic rename-over-existing
    (S3 rename is copy+delete) can still never expose a torn current
    manifest, because readers take the highest version that parses and
    no committed version is ever rewritten. The SINGLE-writer contract
    is unchanged on both backends — two concurrent writers corrupt the
    generation protocol on any filesystem; at 100 TB that means the
    driver of the one ingestion pipeline owns the state dir.

    Compaction (round 7 — the long-lived-crawl growth vector): each
    arrival adds ``n_buckets`` files per table, so thousands of arrivals
    mean thousands of small files per bucket. Layout 2 additionally
    PARTITIONS both tables by ``gen`` — the committed filter becomes
    directory pruning, and ``compact()`` can retire old generations by
    directory name: it rewrites the committed window as ONE new
    generation through the ordinary orphan-invisible append, commits the
    manifest with ``floor_gen`` raised to that generation (readers see
    gen in [floor, committed]), and only then deletes ``gen=<K>`` dirs
    below the floor. A crash at any step leaves a readable state: before
    the manifest commit the consolidated copy is an invisible orphan;
    after it, the stale dirs are invisible (below the floor) and are
    swept by the next open or compact. Layout-1 dirs (pre-r7) still open
    and append; ``compact()`` on them raises with guidance.
    """

    def __init__(
        self,
        spark,
        state_dir: str,
        *,
        n_buckets: int = 32,
        params: dict | None = None,
        extra: dict | None = None,
    ):
        import hashlib

        self.spark = spark
        # backend routing (r9): local paths and file:// take the POSIX
        # fast path (same manifest.json + os.replace commit as r8, zero
        # migration for existing dirs); any other HCFS scheme goes
        # through the session's Hadoop FileSystem with the write-once
        # versioned-manifest commit (sources/statefs.py). Schemes the
        # JVM cannot resolve fail loud here with Hadoop's own error.
        self.fs = _resolve_statefs(spark, state_dir)
        self.state_dir = self.fs.state_dir
        # the path is interpolated into CREATE TABLE ... LOCATION '<d>'
        # DDL below; a quote would terminate the string literal there
        if "'" in self.state_dir or "\n" in self.state_dir:
            raise ValueError(
                f"state_dir {self.state_dir!r} contains a quote/newline — "
                "unsupported in a catalog LOCATION"
            )
        tag = hashlib.md5(self.state_dir.encode()).hexdigest()[:12]
        self._tb = f"inc_minhash_{tag}_buckets"
        self._ts = f"inc_minhash_{tag}_shingles"

        if self.fs.manifest_exists():
            m = self.fs.read_manifest()
            if params is not None and dict(m["params"]) != dict(params):
                raise ValueError(
                    f"state_dir {self.state_dir} was built with MinHash "
                    f"params {m['params']}, got {params} — signatures "
                    "would not be comparable"
                )
            self.params = dict(m["params"])
            self.extra = dict(m.get("extra", {}))
            self.n_buckets = int(m["n_buckets"])
            self.committed = int(m["committed_gen"])
            self.layout = int(m.get("layout", 1))
            self.floor = int(m.get("floor_gen", 0))
            self.dead_gens = [int(g) for g in m.get("dead_gens", [])]
            self._register()
            if self.layout >= 2:
                self._sweep_below_floor()
                # generations ABOVE committed are uncommitted orphans
                # (single-writer contract) — delete them so no later
                # commit can adopt their rows (ADVICE r7). Any that
                # survive deletion land in dead_gens; numbering must
                # skip those too or new rows would share a dead gen and
                # be excluded with it.
                self._sweep_above_committed()
                self._next_gen = (
                    max(self.committed, *self.dead_gens, -1) + 1
                    if self.dead_gens
                    else self.committed + 1
                )
            else:
                # layout 1 keeps gen as a data column — orphan rows
                # cannot be dir-deleted; record their gens as dead so
                # readers exclude them forever, and resume numbering past
                mx = (
                    self.spark.table(self._tb)
                    .agg(F.max("gen"))
                    .union(self.spark.table(self._ts).agg(F.max("gen")))
                    .agg(F.max("max(gen)"))
                    .first()[0]
                )
                mx = mx if mx is not None else -1
                orphans = [
                    g
                    for g in range(self.committed + 1, mx + 1)
                    if g not in self.dead_gens
                ]
                if orphans:
                    self.dead_gens = sorted(set(self.dead_gens) | set(orphans))
                    self._write_manifest()
                self._next_gen = max(self.committed, mx) + 1
        else:
            if params is None:
                raise ValueError(
                    f"no manifest at {self.state_dir} — pass params to "
                    "create a fresh state dir"
                )
            if self.fs.listdir(self.state_dir):
                raise ValueError(
                    f"{self.state_dir} is non-empty but has no "
                    "manifest — refusing to adopt a foreign directory"
                )
            self.fs.mkdirs()
            self.params = dict(params)
            self.extra = dict(extra or {})
            self.n_buckets = n_buckets
            self.committed = -1
            self.layout = 2
            self.floor = 0
            self.dead_gens = []
            self._next_gen = 0
            # a stale catalog entry may point at a DELETED old dir with
            # the same path hash — drop before (re)creating
            spark.sql(f"DROP TABLE IF EXISTS {self._tb}")
            spark.sql(f"DROP TABLE IF EXISTS {self._ts}")
            self._register()
            self._write_manifest()

    @staticmethod
    def exists(state_dir: str, spark=None) -> bool:
        """Whether ``state_dir`` holds a committed manifest. Local paths
        (and ``file://``) are checked directly; HCFS URIs need the
        ``spark`` handle to reach the JVM FileSystem."""
        import os
        import re

        m = re.match(r"^([A-Za-z][A-Za-z0-9+.-]*)://", state_dir)
        if m is None or m.group(1).lower() == "file":
            d = state_dir[len(m.group(0)) :] if m else state_dir
            return os.path.exists(
                os.path.join(os.path.abspath(d), "manifest.json")
            )
        if spark is None:
            raise ValueError(
                f"state_dir {state_dir!r} is an HCFS URI — pass the "
                "SparkSession to exists() so the scheme can be resolved"
            )
        return _resolve_statefs(spark, state_dir).manifest_exists()

    def _register(self) -> None:
        d = self.state_dir
        # layout 2 partitions by gen (directory-prunable generations,
        # compactable); layout 1 (pre-r7 dirs) kept gen as a data column
        part = "PARTITIONED BY (gen) " if self.layout >= 2 else ""
        self.spark.sql(
            f"CREATE TABLE IF NOT EXISTS {self._tb} "
            f"(id BIGINT, band INT, h BIGINT, gen BIGINT) USING PARQUET {part}"
            f"CLUSTERED BY (band, h) SORTED BY (band, h) "
            f"INTO {self.n_buckets} BUCKETS LOCATION '{d}/buckets'"
        )
        self.spark.sql(
            f"CREATE TABLE IF NOT EXISTS {self._ts} "
            f"(id BIGINT, sh ARRAY<BIGINT>, gen BIGINT) USING PARQUET {part}"
            f"CLUSTERED BY (id) SORTED BY (id) "
            f"INTO {self.n_buckets} BUCKETS LOCATION '{d}/shingles'"
        )
        if self.layout >= 2:
            # a fresh catalog (new SparkSession after restart) must
            # rediscover the gen=<K> partition directories; skip on a
            # brand-new state whose location dirs don't exist yet
            for t, sub in ((self._tb, "buckets"), (self._ts, "shingles")):
                if self.fs.is_dir(self.fs.join(d, sub)):
                    self.spark.sql(f"MSCK REPAIR TABLE {t} SYNC PARTITIONS")

    def _write_manifest(self) -> None:
        # the commit point of the whole durability protocol — POSIX:
        # tmp + os.replace onto manifest.json; HCFS: a new write-once
        # manifest-v<N>.json (statefs.HadoopStateFS docstring)
        self.fs.commit_manifest(
            {
                "params": self.params,
                "extra": self.extra,
                "n_buckets": self.n_buckets,
                "committed_gen": self.committed,
                "layout": self.layout,
                "floor_gen": self.floor,
                "dead_gens": self.dead_gens,
            }
        )

    def _committed_window(self, c: Column) -> Column:
        # layout 2: [floor, committed] — partition-pruned directory
        # range; layout 1 has no floor (nothing below 0 exists). Dead
        # generations (quarantined failed/orphan layout-1 inserts) are
        # excluded explicitly — the range alone would adopt them once a
        # later commit raises `committed` past them (ADVICE r7).
        w = (c >= F.lit(self.floor)) & (c <= F.lit(self.committed))
        if self.dead_gens:
            w = w & ~c.isin([int(g) for g in self.dead_gens])
        return w

    def buckets(self) -> DataFrame:
        """Committed (id, band, h) state — bucketed scan, no Exchange."""
        return (
            self.spark.table(self._tb)
            .filter(self._committed_window(F.col("gen")))
            .drop("gen")
        )

    def shingles(self) -> DataFrame:
        """Committed (id, sh) state — bucketed scan, no Exchange."""
        return (
            self.spark.table(self._ts)
            .filter(self._committed_window(F.col("gen")))
            .drop("gen")
        )

    def append(self, buckets_df: DataFrame, shingles_df: DataFrame) -> None:
        """Durably append one arrival's survivor state: write both
        tables at the next generation, then commit the manifest."""
        g = self._next_gen
        try:
            (
                buckets_df.select(
                    F.col("id").cast("long"),
                    F.col("band").cast("int"),
                    F.col("h").cast("long"),
                    F.lit(g).cast("long").alias("gen"),
                ).write.mode("append").insertInto(self._tb)
            )
            (
                shingles_df.select(
                    F.col("id").cast("long"),
                    F.col("sh").cast("array<long>"),
                    F.lit(g).cast("long").alias("gen"),
                ).write.mode("append").insertInto(self._ts)
            )
        except BaseException:
            self._quarantine_failed_gen(g)
            raise
        self.committed = g
        self._next_gen = g + 1
        self._write_manifest()

    def _gen_dirs(self) -> list[tuple[str, str, int]]:
        """(table_name, abs_path_or_uri, gen) for every gen=<K> directory.
        Name-filtered on the gen= prefix, so checksum sidecars and
        _SUCCESS markers some HCFS backends add are never candidates."""
        out = []
        for table, sub in ((self._tb, "buckets"), (self._ts, "shingles")):
            root = self.fs.join(self.state_dir, sub)
            for name in self.fs.listdir(root):
                if name.startswith("gen="):
                    try:
                        k = int(name.split("=", 1)[1])
                    except ValueError:
                        continue
                    out.append((table, self.fs.join(root, name), k))
        return out

    def _sweep_below_floor(self) -> int:
        """Delete generation directories below the floor (invisible to
        every reader) and resync the catalog. Safe at any time; called
        on open and after compact so a crash mid-sweep self-heals."""
        stale = [(t, p) for t, p, k in self._gen_dirs() if k < self.floor]
        for _t, p in stale:
            self.fs.delete_recursive(p)
        if stale:
            for t in {t for t, _p in stale}:
                self.spark.sql(f"MSCK REPAIR TABLE {t} SYNC PARTITIONS")
        return len(stale)

    def _sweep_above_committed(self) -> int:
        """Delete generation directories ABOVE the committed generation
        (layout 2). Under the single-writer contract these are by
        definition uncommitted — partial appends or a compact() that
        crashed before its manifest commit. They must be removed (not
        merely numbered past): a later append that commits a higher gen
        would otherwise pull every orphan row into the reader's
        [floor, committed] range (ADVICE r7). Any dir that survives
        deletion is recorded in ``dead_gens`` as a backstop."""
        orphan = [(t, p, k) for t, p, k in self._gen_dirs() if k > self.committed]
        survivors = []
        for _t, p, k in orphan:
            self.fs.delete_recursive(p)
            if self.fs.exists(p):
                survivors.append(k)
        if orphan:
            for t in {t for t, _p, _k in orphan}:
                self.spark.sql(f"MSCK REPAIR TABLE {t} SYNC PARTITIONS")
        if survivors:
            self.dead_gens = sorted(set(self.dead_gens) | set(survivors))
            self._write_manifest()
        return len(orphan)

    def _quarantine_failed_gen(self, g: int) -> None:
        """In-process failure path for append()/compact(): generation
        ``g`` may hold a partial insert. Layout 2 deletes its dirs (so
        the number can be reused); layout 1 marks it dead and burns the
        number. Either way a retry can never commit rows alongside the
        partial ones (ADVICE r7)."""
        if self.layout >= 2:
            self._sweep_above_committed()
            if self.dead_gens:
                # a dir that survived deletion was marked dead — the
                # retry must not reuse its number (new rows would be
                # excluded along with the dead generation)
                self._next_gen = max(self._next_gen, max(self.dead_gens) + 1)
        else:
            self.dead_gens = sorted(set(self.dead_gens) | {int(g)})
            self._next_gen = g + 1
            self._write_manifest()

    def compact(self) -> dict:
        """Rewrite the committed window [floor, committed] as ONE new
        generation and retire the old directories — bounds the file
        count of a long-lived crawl at ``n_buckets`` per table (plus
        whatever arrived since the last compact) instead of
        ``n_buckets × arrivals``.

        Crash protocol (same invariants as append): the consolidated
        copy is written as an ordinary next-generation insert (orphan
        and invisible until commit), row counts of both tables are
        verified EQUAL to the committed window, and only then does the
        manifest commit committed = floor = the new generation. Stale
        directories below the floor are deleted last; a crash anywhere
        leaves either the old committed window (manifest not yet
        committed) or the new one (stale dirs invisible, swept on the
        next open/compact). Returns {"generation", "files_swept",
        "rows_buckets", "rows_shingles"}.

        Session-wide side effect: the rewrite pins
        ``spark.sql.sources.bucketing.autoBucketedScan.enabled`` OFF for
        its duration (reason in the inline comment below), and SQL confs
        are SparkSession-global — concurrent queries on the same session
        from other threads lose auto-bucketed scans during that window
        (a perf, not correctness, effect). The single-writer contract
        this class documents covers the state dir, not the session; run
        compact() from the writer's session when that matters, or give
        the writer ``spark.newSession()``."""
        if self.layout < 2:
            raise ValueError(
                f"state_dir {self.state_dir} uses the pre-r7 layout "
                "(generations not partition directories) — rebuild the "
                "state to enable compaction"
            )
        if self.committed < 0:
            return {
                "generation": None,
                "files_swept": 0,
                "rows_buckets": 0,
                "rows_shingles": 0,
            }
        g = self._next_gen
        nb_old = self.buckets().count()
        ns_old = self.shingles().count()
        # The consolidated generation must land BUCKET-ALIGNED: exactly
        # one file per bucket per table, independent of how many
        # generations were merged. Two pieces make that true: (a)
        # repartition on the bucket columns (same pmod(hash, n) mapping
        # as Spark's bucket id, so each write task holds one bucket) and
        # (b) autoBucketedScan pinned OFF for the read — with it on,
        # Spark reports the bucketed HashPartitioning (eliding the
        # repartition as redundant) yet actually scans with arbitrary
        # file splits, so write tasks straddle buckets and the
        # consolidated gen's file count GROWS with state size (measured
        # r8: 666 -> 1033 -> 1224 files across three compacts).
        auto_key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
        auto_old = self.spark.conf.get(auto_key, "true")
        self.spark.conf.set(auto_key, "false")
        try:
            (
                self.buckets()
                .repartition(self.n_buckets, "band", "h")
                .withColumn("gen", F.lit(g).cast("long"))
                .write.mode("append")
                .insertInto(self._tb)
            )
            (
                self.shingles()
                .repartition(self.n_buckets, "id")
                .withColumn("gen", F.lit(g).cast("long"))
                .write.mode("append")
                .insertInto(self._ts)
            )
            nb = self.spark.table(self._tb).filter(F.col("gen") == g).count()
            ns = self.spark.table(self._ts).filter(F.col("gen") == g).count()
            if nb != nb_old or ns != ns_old:
                raise RuntimeError(
                    f"compaction row mismatch (buckets {nb_old} -> {nb}, "
                    f"shingles {ns_old} -> {ns}); manifest not committed — "
                    "consolidated generation deleted, state unchanged"
                )
        except BaseException:
            self._quarantine_failed_gen(g)
            raise
        finally:
            self.spark.conf.set(auto_key, auto_old)
        self.committed = g
        self.floor = g
        self._next_gen = g + 1
        # dead generations below the new floor are gone with the sweep —
        # drop them so the exclusion list never grows unboundedly
        self.dead_gens = [x for x in self.dead_gens if x >= self.floor]
        self._write_manifest()
        swept = self._sweep_below_floor()
        return {
            "generation": g,
            "files_swept": swept,
            "rows_buckets": nb,
            "rows_shingles": ns,
        }


class IncrementalDecontaminator:
    """Decontamination at eval-set-arrival granularity: prepare the
    corpus ONCE, then check each arriving contaminant batch in O(batch).

    ``decontaminate(method="minhash")`` re-shingles and re-signs the
    whole corpus for every eval set — correct, but a recurring pipeline
    that gains a new benchmark (or a new slice of one) should not pay
    the O(corpus) preparation again. This class materializes the corpus
    half of the MinHash pipeline (hashed shingles + guarded banded
    buckets — exactly what _minhash_prep builds for cross_near_duplicates)
    as PERSISTED relations; each ``check(batch)`` runs _minhash_prep on
    the batch alone, with the same constants, and probes the cached
    corpus tables. One-permutation signatures are a per-document closed
    form of (text, num_hashes, shingle_k), so signatures prepared in
    separate passes are identical to union-pass signatures — the shared
    hash family holds by construction, not by co-processing.

    At true corpus scale, pass ``state_dir=...``: the prepared corpus
    state is written ONCE to (band,h)-bucketed external parquet tables
    (``_BucketedMinhashState``) and every later
    ``IncrementalDecontaminator.open(spark, state_dir)`` — including
    after a process restart — probes it with zero corpus recompute and
    zero Exchange on the corpus side of the probe join. The
    incremental-view machinery (streaming/incremental.py) covers the
    same need when the CORPUS side is what grows.

    Call ``close()`` (or use ``contextlib.closing``) when done — the
    corpus tables stay cached across checks by design (in-memory mode;
    persistent state needs no release).
    """

    def __init__(
        self,
        corpus: DataFrame | None,
        id_col: str = "doc_id",
        text_col: str = "text",
        *,
        num_hashes: int = 120,
        bands: int = 20,
        shingle_k: int = 5,
        threshold: float = 0.5,
        max_bucket_size: int = 1000,
        state_dir: str | None = None,
        state_buckets: int = 32,
    ):
        if num_hashes % bands != 0:
            raise ValueError("num_hashes must be divisible by bands")
        self.id_col, self.text_col = id_col, text_col
        self.params = dict(num_hashes=num_hashes, bands=bands, shingle_k=shingle_k)
        self.threshold = threshold
        self.max_bucket_size = max_bucket_size
        self._state = None
        if state_dir is not None:
            # resolve the session BEFORE the exists() probe (r9): HCFS
            # state dirs need the JVM FileSystem to check for a manifest
            spark = corpus.sparkSession if corpus is not None else None
            if spark is None:
                from pyspark.sql import SparkSession

                spark = SparkSession.getActiveSession()
            if spark is None:
                raise RuntimeError(
                    "IncrementalDecontaminator(corpus=None, state_dir=...) "
                    "needs an active SparkSession to reopen state — none "
                    "found; create one first or use "
                    "IncrementalDecontaminator.open(spark, state_dir)"
                )
            resuming = _BucketedMinhashState.exists(state_dir, spark)
            if not resuming and corpus is None:
                raise ValueError(
                    f"no prepared state at {state_dir} and no corpus to "
                    "prepare it from"
                )
            self._state = _BucketedMinhashState(
                spark,
                state_dir,
                n_buckets=state_buckets,
                params=self.params,
                extra=dict(
                    kind="decontaminate",
                    id_col=id_col,
                    text_col=text_col,
                    threshold=threshold,
                    max_bucket_size=max_bucket_size,
                ),
            )
            if resuming:
                # MinHash params are guarded inside the state class; the
                # scoring knobs stored alongside them must match too, or
                # the same state dir would score pairs differently than
                # .open() (ADVICE r6)
                stored = self._state.extra
                backfilled = False
                for key, got in (
                    ("threshold", threshold),
                    ("max_bucket_size", max_bucket_size),
                ):
                    if key in stored:
                        if stored[key] != got:
                            raise ValueError(
                                f"state_dir {state_dir} was prepared with "
                                f"{key}={stored[key]}, got {got} — reopen via "
                                ".open() or pass the stored value"
                            )
                    else:
                        # pre-r7 manifest without scoring knobs: adopt
                        # the passed value as THE stored value so every
                        # later resume is guarded too (ADVICE r7 — a
                        # silently skipped check would accept divergent
                        # knobs forever)
                        stored[key] = got
                        backfilled = True
                if backfilled:
                    self._state._write_manifest()
            if not resuming:
                buckets, sh = _minhash_prep(
                    corpus, id_col, text_col, **self.params
                )
                guarded = (
                    buckets.withColumn(
                        "bsz", F.count("*").over(Window.partitionBy("band", "h"))
                    )
                    .filter(F.col("bsz") <= max_bucket_size)
                    .select("id", "band", "h")
                )
                self._state.append(guarded, sh)
                _safe_unpersist(sh)
            self._buckets = self._state.buckets()
            self._shingled = self._state.shingles()
            return
        buckets, self._shingled = _minhash_prep(
            corpus, id_col, text_col, **self.params
        )
        # per-side degenerate-bucket guard, then pin the corpus tables
        self._buckets = (
            buckets.withColumn(
                "bsz", F.count("*").over(Window.partitionBy("band", "h"))
            )
            .filter(F.col("bsz") <= max_bucket_size)
            .select("id", "band", "h")
            .persist()
        )

    @classmethod
    def open(cls, spark, state_dir: str) -> "IncrementalDecontaminator":
        """Reopen prepared corpus state (possibly from an earlier
        process) without touching the corpus again."""
        if not _BucketedMinhashState.exists(state_dir, spark):
            raise ValueError(f"no prepared decontamination state at {state_dir}")
        st = _BucketedMinhashState(spark, state_dir)
        e = st.extra
        inst = cls.__new__(cls)
        inst.id_col, inst.text_col = e["id_col"], e["text_col"]
        inst.params = dict(st.params)
        inst.threshold = e["threshold"]
        inst.max_bucket_size = e["max_bucket_size"]
        inst._state = st
        inst._buckets = st.buckets()
        inst._shingled = st.shingles()
        return inst

    def check(self, contaminants: DataFrame) -> DataFrame:
        """(id_l = corpus doc, id_r = contaminant doc, jaccard) pairs for
        ONE arriving batch. Only the batch is shingled/signed; the corpus
        side comes from the cached tables (the probe plan's corpus scans
        are InMemoryTableScans — asserted by the contract test)."""
        bb, bsh = _minhash_prep(
            contaminants, self.id_col, self.text_col, **self.params
        )
        bb = (
            bb.withColumn(
                "bsz", F.count("*").over(Window.partitionBy("band", "h"))
            )
            .filter(F.col("bsz") <= self.max_bucket_size)
            .select("id", "band", "h")
        )
        cand = (
            self._buckets.select("band", "h", F.col("id").alias("id_l"))
            .join(
                bb.select("band", "h", F.col("id").alias("id_r")).hint("shuffle_merge"),
                on=["band", "h"],
            )
            .select("id_l", "id_r")
            .distinct()
        )
        verified = (
            cand.join(
                self._shingled.select(
                    F.col("id").alias("id_l"), F.col("sh").alias("sh_l")
                ).hint("shuffle_merge"),
                on="id_l",
            )
            .join(
                bsh.select(
                    F.col("id").alias("id_r"), F.col("sh").alias("sh_r")
                ).hint("shuffle_merge"),
                on="id_r",
            )
            .withColumn("jaccard", verified_jaccard(F.col("sh_l"), F.col("sh_r"), self.threshold))
            .filter(F.col("jaccard") >= self.threshold)
            .select("id_l", "id_r", "jaccard")
        )
        # the batch's own shingle cache belongs to this result; the corpus
        # tables stay cached for future checks
        return _attach_release(verified, bsh)

    def dirty_ids(self, contaminants: DataFrame) -> DataFrame:
        """Distinct corpus ids matched by this batch (one column, named
        after the corpus id column)."""
        pairs = self.check(contaminants)
        return _adopt_release(
            pairs.select(F.col("id_l").alias(self.id_col)).distinct(), pairs
        )

    def compact(self) -> dict:
        """Consolidate persistent state generations into one directory
        per table (see ``_BucketedMinhashState.compact``). Only
        meaningful with ``state_dir=``; in-memory mode is a no-op.
        Re-resolve the corpus relations afterwards — the table contents
        are unchanged but the old plans point at retired directories."""
        if self._state is None:
            return {"generation": None, "files_swept": 0}
        out = self._state.compact()
        self._buckets = self._state.buckets()
        self._shingled = self._state.shingles()
        return out

    def close(self) -> None:
        """Release the corpus-side caches. Idempotent."""
        _safe_unpersist(self._buckets)
        _safe_unpersist(self._shingled)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False


class IncrementalDeduplicator:
    """Arrival-order fuzzy dedup for a GROWING corpus: each arriving
    batch keeps only documents that are not near-duplicates (char-shingle
    Jaccard >= threshold) of anything ALREADY KEPT — the continuous-crawl
    production shape, where re-running ``fuzzy_dedup`` over the whole
    corpus per shard would cost O(corpus) per arrival.

    The kept corpus's MinHash state (banded buckets + hashed shingle
    sets, the two tables ``_minhash_prep`` builds) persists across
    arrivals; each ``add_batch`` shingles/signs ONLY the batch, resolves
    duplicates in two steps, and appends the survivors' state:

    1. WITHIN the batch: banded self-join -> exact-Jaccard verify ->
       transitive closure -> min-id keeper per cluster (identical
       semantics to ``fuzzy_dedup`` on the batch alone).
    2. AGAINST the kept corpus: batch-keeper buckets probe the state
       buckets (shuffle-pinned equi-join), candidates exact-verified;
       matched keepers are dropped (greedy arrival-order rule: earlier
       kept wins).

    Batch boundaries matter only for CHAINS that span them: A~B~C with
    J(A,C) < t collapses to one survivor when it arrives together
    (closure) but keeps A and C when B arrives in between and is dropped
    against A — inherent to any one-pass dedup that never revisits kept
    documents (same contract as the streaming dedup in CCNet-style
    pipelines). When everything arrives in one batch the result equals
    ``fuzzy_dedup`` keepers exactly (tested). Signatures computed in
    separate passes are comparable because one-permutation signatures
    are a per-document closed form of (text, num_hashes, shingle_k) —
    same shared-hash-family argument as ``IncrementalDecontaminator``.

    Two state backends:

    - **In-memory** (default): lineage cut with an eager localCheckpoint
      per arrival (MEMORY_AND_DISK — spill-safe). Dies with the process.
    - **Persistent** (``state_dir=...``): (band,h)-bucketed external
      parquet tables via ``_BucketedMinhashState`` — the state side of
      every probe join reads ``Bucketed: true`` with ZERO Exchange (only
      the O(batch) side shuffles), appends commit generation-wise so a
      crash between writes is invisible, and
      ``IncrementalDeduplicator.open(spark, state_dir)`` resumes after a
      process restart with batch N+1 ≡ the uninterrupted run (tested).

    ``seed`` installs an already-deduplicated kept corpus as the initial
    state (fresh state dirs only).
    """

    def __init__(
        self,
        spark,
        id_col: str = "doc_id",
        text_col: str = "text",
        *,
        num_hashes: int = 120,
        bands: int = 20,
        shingle_k: int = 5,
        threshold: float = 0.5,
        max_bucket_size: int = 1000,
        seed: DataFrame | None = None,
        state_dir: str | None = None,
        state_buckets: int = 32,
    ):
        if num_hashes % bands != 0:
            raise ValueError("num_hashes must be divisible by bands")
        self.id_col, self.text_col = id_col, text_col
        self.params = dict(num_hashes=num_hashes, bands=bands, shingle_k=shingle_k)
        self.threshold = threshold
        self.max_bucket_size = max_bucket_size
        self.n_kept = 0
        self._state = None
        if state_dir is not None:
            resuming = _BucketedMinhashState.exists(state_dir, spark)
            self._state = _BucketedMinhashState(
                spark,
                state_dir,
                n_buckets=state_buckets,
                params=self.params,
                extra=dict(
                    kind="dedup",
                    id_col=id_col,
                    text_col=text_col,
                    threshold=threshold,
                    max_bucket_size=max_bucket_size,
                ),
            )
            if resuming:
                if seed is not None:
                    raise ValueError(
                        "seed only applies to a FRESH state_dir — this one "
                        "already holds kept-corpus state"
                    )
                # scoring knobs must match the stored ones (same contract
                # as IncrementalDecontaminator); absent keys (pre-r7
                # manifests) are backfilled so later resumes are guarded
                stored = self._state.extra
                backfilled = False
                for key, got in (
                    ("threshold", threshold),
                    ("max_bucket_size", max_bucket_size),
                ):
                    if key in stored:
                        if stored[key] != got:
                            raise ValueError(
                                f"state_dir {state_dir} was prepared with "
                                f"{key}={stored[key]}, got {got} — reopen "
                                "via .open() or pass the stored value"
                            )
                    else:
                        stored[key] = got
                        backfilled = True
                if backfilled:
                    self._state._write_manifest()
                self.n_kept = self._state.shingles().count()
            elif seed is not None:
                sb, ss = _minhash_prep(seed, id_col, text_col, **self.params)
                self._state.append(self._guard(sb), ss)
                _safe_unpersist(ss)
                self.n_kept = self._state.shingles().count()
            return
        # emptyRDD (0 partitions): createDataFrame([]) parallelizes into
        # defaultParallelism EMPTY partitions, and every state consumer
        # then scans them 32-near-empty-tasks wide per stage (r14)
        _e = spark.sparkContext.emptyRDD()
        self._empty_b = spark.createDataFrame(_e, "id LONG, band INT, h LONG")
        self._empty_s = spark.createDataFrame(_e, "id LONG, sh ARRAY<LONG>")
        # in-memory state lives as a LIST of eagerly-checkpointed delta
        # parts (one per arrival, both tables riding ONE checkpoint —
        # see _append_memory); the kept-corpus views are lazy unions
        self._bucket_parts: list[DataFrame] = []
        self._shingle_parts: list[DataFrame] = []
        if seed is not None:
            sb, ss = _minhash_prep(seed, id_col, text_col, **self.params)
            self._append_memory(self._guard(sb), ss)
            _safe_unpersist(ss)
            self.n_kept = self._kept_shingles.count()

    @classmethod
    def open(cls, spark, state_dir: str) -> "IncrementalDeduplicator":
        """Reopen a persistent state dir after a (real or simulated)
        process restart: params, id/text columns, threshold and guard
        come from the manifest; kept-corpus state from the bucketed
        tables."""
        if not _BucketedMinhashState.exists(state_dir, spark):
            raise ValueError(f"no incremental-dedup state at {state_dir}")
        st = _BucketedMinhashState(spark, state_dir)
        e = st.extra
        return cls(
            spark,
            e["id_col"],
            e["text_col"],
            num_hashes=st.params["num_hashes"],
            bands=st.params["bands"],
            shingle_k=st.params["shingle_k"],
            threshold=e["threshold"],
            max_bucket_size=e["max_bucket_size"],
            state_dir=state_dir,
            state_buckets=st.n_buckets,
        )

    @property
    def _kept_buckets(self) -> DataFrame:
        if self._state is not None:
            return self._state.buckets()
        if not self._bucket_parts:
            return self._empty_b
        return functools.reduce(DataFrame.union, self._bucket_parts)

    @property
    def _kept_shingles(self) -> DataFrame:
        if self._state is not None:
            return self._state.shingles()
        if not self._shingle_parts:
            return self._empty_s
        return functools.reduce(DataFrame.union, self._shingle_parts)

    # consolidate cached parts once the lazy union grows this many legs:
    # probe-plan analysis cost and task count stay bounded while the
    # amortized re-copy cost is O(total / threshold) per arrival
    _MEMORY_COMPACT_PARTS = 16

    def _append_memory(self, new_b: DataFrame, new_s: DataFrame) -> None:
        """Append one arrival's state delta with a SINGLE eager
        localCheckpoint (VERDICT r9 item 7): the r9 path re-unioned and
        re-checkpointed BOTH full state tables every arrival — two
        jobs, each recopying the entire accumulated corpus state, a
        fixed cost that dominated the two-batch bench row and scaled
        with corpus size instead of batch size. Buckets and shingles
        now ride one tagged union (an explicit tag, not sh-nullness —
        a pathological null shingle row must not be misfiled as a
        bucket row), so each arrival pays one O(batch) materialization;
        the kept views are lazy unions of the cached parts, compacted
        every ``_MEMORY_COMPACT_PARTS`` arrivals to bound plan depth."""
        combined = (
            new_b.select(
                F.lit(0).alias("__t"),
                "id",
                "band",
                "h",
                F.lit(None).cast("array<long>").alias("sh"),
            )
            .unionByName(
                new_s.select(
                    F.lit(1).alias("__t"),
                    F.col("id"),
                    F.lit(None).cast("int").alias("band"),
                    F.lit(None).cast("long").alias("h"),
                    "sh",
                )
            )
            .localCheckpoint(eager=True)
        )
        self._append_parts(
            combined.filter("__t = 0").select("id", "band", "h"),
            combined.filter("__t = 1").select("id", "sh"),
        )

    def _append_parts(self, bucket_part: DataFrame, shingle_part: DataFrame) -> None:
        """Record one arrival's ALREADY-MATERIALIZED state delta (narrow
        projections of a checkpointed DataFrame — no further action is
        needed or taken here; r13 optimization round) and consolidate
        the lazy-union views every ``_MEMORY_COMPACT_PARTS`` arrivals to
        bound plan depth."""
        self._bucket_parts.append(bucket_part)
        self._shingle_parts.append(shingle_part)
        if len(self._bucket_parts) >= self._MEMORY_COMPACT_PARTS:
            b, s = self._kept_buckets, self._kept_shingles
            self._bucket_parts, self._shingle_parts = [], []
            self._append_memory(b, s)

    def _guard(self, buckets: DataFrame) -> DataFrame:
        return (
            buckets.withColumn(
                "bsz", F.count("*").over(Window.partitionBy("band", "h"))
            )
            .filter(F.col("bsz") <= self.max_bucket_size)
            .select("id", "band", "h")
        )

    def _verify(self, cand: DataFrame, sh_l: DataFrame, sh_r: DataFrame) -> DataFrame:
        """Exact-Jaccard filter of candidate (id_l, id_r) pairs."""
        return (
            cand.join(
                sh_l.select(F.col("id").alias("id_l"), F.col("sh").alias("sh_l"))
                .hint("shuffle_merge"),
                on="id_l",
            )
            .join(
                sh_r.select(F.col("id").alias("id_r"), F.col("sh").alias("sh_r"))
                .hint("shuffle_merge"),
                on="id_r",
            )
            # same rounded comparison as minhash_near_duplicates, so the
            # one-batch case matches fuzzy_dedup pair-for-pair
            .filter(
                verified_jaccard(F.col("sh_l"), F.col("sh_r"), self.threshold)
                >= self.threshold
            )
            .select("id_l", "id_r")
        )

    def add_batch(self, batch: DataFrame) -> DataFrame:
        """Process one arriving batch; returns the KEPT rows (original
        columns) and appends their MinHash state for future arrivals."""
        # every per-arrival action runs at batch-sized shuffle
        # partitions (guide §2 — see arrival_shuffle_partitions); the
        # lazy result returned to the caller executes under the session
        # setting
        with arrival_shuffle_partitions(batch.sparkSession, batch) as n:
            survivors = self._add_batch_inner(batch, n)
        return batch.join(
            survivors.hint("shuffle_merge"), on=self.id_col, how="left_semi"
        )

    def _add_batch_inner(
        self, batch: DataFrame, cache_partitions: int | None = None
    ) -> DataFrame:
        from codd_spark.operators.graph import dedup_clusters

        bb_raw, bsh = _minhash_prep(
            batch,
            self.id_col,
            self.text_col,
            cache_partitions=cache_partitions,
            **self.params,
        )
        # persist the guarded buckets EAGERLY: the within-batch self-join
        # reads them twice and the keeper/cross/state stages read them
        # again — concurrent AQE leaf stages over a lazy cache would each
        # re-execute the 120-hash signature pipeline (measured ~1.9x
        # per-arrival cost lazily-persisted, worse unpersisted)
        bb = _eager_cache(self._guard(bb_raw))

        # 1. within-batch closure -> min-id keeper per cluster
        cand_in = (
            bb.select("band", "h", F.col("id").alias("id_l"))
            .join(
                bb.select("band", "h", F.col("id").alias("id_r")).hint(
                    "shuffle_merge"
                ),
                on=["band", "h"],
            )
            .filter(F.col("id_l") < F.col("id_r"))
            .select("id_l", "id_r")
            .distinct()
        )
        pairs_in = self._verify(cand_in, bsh, bsh)
        keepers = (
            dedup_clusters(
                batch.select(self.id_col), pairs_in, self.id_col, "id_l", "id_r"
            )
            .filter("is_keeper")
            .select(self.id_col)
        )

        # 2. batch keepers vs the kept corpus (state scans are
        # checkpointed — O(batch) probe, no corpus recompute)
        kb = bb.join(
            keepers.withColumnRenamed(self.id_col, "id").hint("shuffle_merge"),
            on="id",
            how="left_semi",
        )
        cand_x = (
            self._kept_buckets.select("band", "h", F.col("id").alias("id_l"))
            .join(
                kb.select("band", "h", F.col("id").alias("id_r")).hint(
                    "shuffle_merge"
                ),
                on=["band", "h"],
            )
            .select("id_l", "id_r")
            .distinct()
        )
        dropped = (
            self._verify(cand_x, self._kept_shingles, bsh)
            .select(F.col("id_r").alias(self.id_col))
            .distinct()
        )
        # the kept count rides the checkpoint job as an observed metric
        # (r12, VERDICT r11 item 6): a separate survivors.count() was one
        # whole Spark action per arrival on an orchestration-floor path.
        # (r13 optimization round note: fusing this checkpoint with the
        # state append into ONE tagged-union job was tried and A/B'd
        # SLOWER — 9.1 -> 16.0 s isolated on the one-batch row — the
        # fused DAG re-evaluates the guarded-bucket window and the
        # probe/verify joins more than the two-job shape does; the
        # two-job shape stays.)
        from pyspark.sql import Observation

        _kept_obs = Observation()
        survivors = (
            keepers.join(
                dropped.hint("shuffle_merge"), on=self.id_col, how="left_anti"
            )
            .observe(_kept_obs, F.count(F.lit(1)).alias("n"))
            .localCheckpoint(eager=True)
        )

        # 3. append survivor state; lineage stays O(batch) per arrival —
        # localCheckpoint in memory mode, a generation-committed parquet
        # append in persistent mode
        sid = survivors.withColumnRenamed(self.id_col, "id")
        new_b = kb.join(sid.hint("shuffle_merge"), on="id", how="left_semi")
        new_s = bsh.join(sid.hint("shuffle_merge"), on="id", how="left_semi")
        if self._state is not None:
            self._state.append(new_b, new_s)
        else:
            self._append_memory(new_b, new_s)
        _safe_unpersist(bsh)
        _safe_unpersist(bb)
        # already materialized by the eager checkpoint — no extra action
        self.n_kept += int(_kept_obs.get["n"])
        return survivors

    def compact(self) -> dict:
        """Consolidate persistent state generations into one directory
        per table (see ``_BucketedMinhashState.compact``). Only
        meaningful with ``state_dir=``; in-memory mode is a no-op."""
        if self._state is None:
            return {"generation": None, "files_swept": 0}
        return self._state.compact()

    def close(self) -> None:
        """Idempotent; state checkpoints are GC-managed, nothing pinned."""

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False


class IncrementalExactDeduplicator:
    """Arrival-order EXACT dedup for a growing corpus — the degenerate
    (and cheapest) member of the incremental family: each arriving
    batch keeps only rows whose KEY was never kept before. The key is
    either a caller-named column (``key_col`` — canonical URL, content
    fingerprint, simhash...) or, by default, the whitespace-normalized
    document text (exact content dedup). This is the URL-first pass a
    continuous crawl runs before any fuzzy machinery: refetches never
    reach shingling.

    Keys travel as a PAIR of independent 64-bit hashes (xxhash64 with
    two seeds — 128 effective bits, so a false merge needs a 2^-128
    collision event; the raw key string never enters the state, keeping
    state rows fixed-width). Within a batch the min-id row per key wins
    (one aggregate — key equality is transitive, no closure machinery
    needed); across batches earlier-kept-wins. Rows with a NULL key
    never match anything: they are always kept and never enter the
    state (documents without a URL must not collapse together).

    State = the same restart-surviving machinery as the fuzzy/image
    deduplicators (``_BucketedMinhashState``): one bucket row per kept
    key (band 0, h = hash1), the second hash riding the shingle table
    as a 1-element array — crash matrix, orphan sweep, compaction and
    HCFS backends apply unchanged, and probes stay zero-Exchange on the
    state side in persistent mode. No ``max_bucket_size`` guard exists
    or is needed: the state holds AT MOST ONE row per distinct key by
    construction (a key only appends when it did not match), so a
    million refetches of one page cost one aggregate row per batch,
    never a hot bucket.

    Per-arrival cost is O(batch): one projection, one (h1,h2) keeper
    aggregate, one probe join against the bucketed state, one append.
    """

    def __init__(
        self,
        spark,
        id_col: str = "doc_id",
        text_col: str = "text",
        *,
        key_col: str | None = None,
        seed: DataFrame | None = None,
        state_dir: str | None = None,
        state_buckets: int = 32,
    ):
        self.id_col, self.text_col, self.key_col = id_col, text_col, key_col
        self.params = dict(
            key=f"column:{key_col}" if key_col else "normalized_text"
        )
        self.n_kept = 0
        self._state = None
        if state_dir is not None:
            resuming = _BucketedMinhashState.exists(state_dir, spark)
            self._state = _BucketedMinhashState(
                spark,
                state_dir,
                n_buckets=state_buckets,
                params=self.params,
                extra=dict(
                    kind="exact_dedup",
                    id_col=id_col,
                    text_col=text_col,
                    key_col=key_col,
                ),
            )
            if resuming:
                if seed is not None:
                    raise ValueError(
                        "seed only applies to a FRESH state_dir — this one "
                        "already holds kept-corpus state"
                    )
                self.n_kept = self._state.shingles().count()
            elif seed is not None:
                ks = self._prep(seed)
                self._state.append(*self._state_rows(ks))
                self.n_kept = self._state.shingles().count()
            return
        # emptyRDD (0 partitions): createDataFrame([]) parallelizes into
        # defaultParallelism EMPTY partitions, and every state consumer
        # then scans them 32-near-empty-tasks wide per stage (r14)
        _e = spark.sparkContext.emptyRDD()
        self._empty_b = spark.createDataFrame(_e, "id LONG, band INT, h LONG")
        self._empty_s = spark.createDataFrame(_e, "id LONG, sh ARRAY<LONG>")
        self._bucket_parts: list[DataFrame] = []
        self._shingle_parts: list[DataFrame] = []
        if seed is not None:
            ks = self._prep(seed)
            self._append_memory(*self._state_rows(ks))
            self.n_kept = self._kept_shingles.count()

    @classmethod
    def open(cls, spark, state_dir: str) -> "IncrementalExactDeduplicator":
        """Reopen a persistent state dir after a process restart; key
        derivation and columns come from the manifest."""
        if not _BucketedMinhashState.exists(state_dir, spark):
            raise ValueError(f"no incremental exact-dedup state at {state_dir}")
        st = _BucketedMinhashState(spark, state_dir)
        e = st.extra
        if e.get("kind") != "exact_dedup":
            raise ValueError(
                f"{state_dir} holds {e.get('kind')!r} state, not exact_dedup"
            )
        return cls(
            spark,
            e["id_col"],
            e["text_col"],
            key_col=e.get("key_col"),
            state_dir=state_dir,
            state_buckets=st.n_buckets,
        )

    @property
    def _kept_buckets(self) -> DataFrame:
        if self._state is not None:
            return self._state.buckets()
        if not self._bucket_parts:
            return self._empty_b
        return functools.reduce(DataFrame.union, self._bucket_parts)

    @property
    def _kept_shingles(self) -> DataFrame:
        if self._state is not None:
            return self._state.shingles()
        if not self._shingle_parts:
            return self._empty_s
        return functools.reduce(DataFrame.union, self._shingle_parts)

    _MEMORY_COMPACT_PARTS = 16

    def _append_memory(self, new_b: DataFrame, new_s: DataFrame) -> None:
        """Same single-checkpoint tagged-delta append as the fuzzy
        deduplicator (VERDICT r9 item 7): one O(batch) materialization
        per arrival, lazy-union views, periodic consolidation."""
        combined = (
            new_b.select(
                F.lit(0).alias("__t"),
                "id",
                "band",
                "h",
                F.lit(None).cast("array<long>").alias("sh"),
            )
            .unionByName(
                new_s.select(
                    F.lit(1).alias("__t"),
                    "id",
                    F.lit(None).cast("int").alias("band"),
                    F.lit(None).cast("long").alias("h"),
                    "sh",
                )
            )
            .localCheckpoint(eager=True)
        )
        self._append_parts(
            combined.filter("__t = 0").select("id", "band", "h"),
            combined.filter("__t = 1").select("id", "sh"),
        )

    def _append_parts(self, bucket_part: DataFrame, shingle_part: DataFrame) -> None:
        """Record one arrival's already-materialized state delta (narrow
        projections of the checkpointed survivors — zero extra actions;
        r13 optimization round) and consolidate every
        ``_MEMORY_COMPACT_PARTS`` arrivals."""
        self._bucket_parts.append(bucket_part)
        self._shingle_parts.append(shingle_part)
        if len(self._bucket_parts) >= self._MEMORY_COMPACT_PARTS:
            b, s = self._kept_buckets, self._kept_shingles
            self._bucket_parts, self._shingle_parts = [], []
            self._append_memory(b, s)

    def _key_expr(self) -> Column:
        if self.key_col is not None:
            return F.col(self.key_col).cast("string")
        return normalize_ws(F.col(self.text_col))

    def _prep(self, batch: DataFrame) -> DataFrame:
        """(id, h, h2) per NON-NULL-key row, min-id per key already
        elected — within one batch, key equality is transitive, so the
        keeper election is a single aggregate, no closure."""
        key = self._key_expr()
        return (
            batch.where(key.isNotNull())
            .select(
                F.col(self.id_col).alias("id"),
                F.xxhash64(key).alias("h"),
                F.xxhash64(F.lit(1), key).alias("h2"),
            )
            .groupBy("h", "h2")
            .agg(F.min("id").alias("id"))
        )

    @staticmethod
    def _state_rows(ks: DataFrame) -> tuple[DataFrame, DataFrame]:
        new_b = ks.select("id", F.lit(0).alias("band"), "h")
        new_s = ks.select("id", F.array("h2").alias("sh"))
        return new_b, new_s

    def add_batch(self, batch: DataFrame) -> DataFrame:
        """Process one arriving batch; returns the KEPT rows (original
        columns — batch keepers minus already-kept keys, plus every
        NULL-key row) and appends the survivors' keys for future
        arrivals."""
        # per-arrival actions run at batch-sized shuffle partitions
        # (guide §2 — see arrival_shuffle_partitions)
        with arrival_shuffle_partitions(batch.sparkSession, batch):
            survivors = self._add_batch_inner(batch)
        key = self._key_expr()
        kept_keyed = batch.join(
            survivors.select(F.col("id").alias(self.id_col)).hint(
                "shuffle_merge"
            ),
            on=self.id_col,
            how="left_semi",
        )
        null_rows = batch.where(key.isNull())
        return kept_keyed.unionByName(null_rows)

    def _add_batch_inner(self, batch: DataFrame) -> DataFrame:
        # lazy checkpoint (r13 optimization round): ks materializes (and
        # its lineage cuts) inside the survivors checkpoint job below —
        # the r12 eager checkpoint here was a whole extra Spark action
        # per arrival on a two-aggregate O(batch) path
        ks = self._prep(batch).localCheckpoint(eager=False)

        # probe the kept corpus: bucketed state side, O(batch) probe side
        cand = self._kept_buckets.select(
            F.col("h"), F.col("id").alias("__kept_id")
        ).join(ks.hint("shuffle_merge"), on="h")
        dropped = (
            cand.join(
                self._kept_shingles.select(
                    F.col("id").alias("__kept_id"),
                    F.element_at("sh", 1).alias("__h2_kept"),
                ),
                on="__kept_id",
            )
            .where(F.col("__h2_kept") == F.col("h2"))
            .select("id")
            .distinct()
        )
        # kept count rides the checkpoint job as an observed metric
        # (r12 — same action merge as the fuzzy deduplicator)
        from pyspark.sql import Observation

        _kept_obs = Observation()
        survivors = (
            ks.join(dropped.hint("shuffle_merge"), on="id", how="left_anti")
            .observe(_kept_obs, F.count(F.lit(1)).alias("n"))
            .localCheckpoint(eager=True)
        )

        if self._state is not None:
            self._state.append(*self._state_rows(survivors))
        else:
            # the state rows are narrow projections of the CHECKPOINTED
            # survivors — append them directly, no second checkpoint
            # (r13 optimization round: was _append_memory, one more
            # eager action per arrival)
            self._append_parts(*self._state_rows(survivors))
        self.n_kept += int(_kept_obs.get["n"])
        return survivors

    def compact(self) -> dict:
        """Consolidate persistent state generations (no-op in memory)."""
        if self._state is None:
            return {"generation": None, "files_swept": 0}
        return self._state.compact()

    def close(self) -> None:
        """Idempotent; state checkpoints are GC-managed, nothing pinned."""

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False


def edit_distance_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    max_distance: int = 2,
    q: int = 3,
) -> DataFrame:
    """EXACT edit-distance near-dup pairs over SHORT strings (titles,
    names, product labels): all (id_a < id_b) with
    ``levenshtein(a, b) <= max_distance`` and the distance.

    Candidate generation is a q-gram count filter on PADDED strings
    (q-1 sentinel chars on each end — the standard boundary fix, so edits
    near the ends still leave shared grams), stated on DISTINCT gram
    sets: one edit operation touches at most q sliding windows, so it
    removes at most q elements from the padded distinct q-gram set,
    giving ``|A ∩ B| >= max(|A|,|B|) - q*d`` within edit distance d;
    lengths also differ by at most d. When a string's gram set has
    <= q*d elements the bound is vacuous (a within-distance partner may
    share ZERO grams — e.g. very short or single-character-run strings),
    so those DEGENERATE strings bypass the gram join entirely: they are
    broadcast against the corpus on the |len| <= d band and verified
    directly — completeness never rests on the gram filter where it
    doesn't hold. Verification is the built-in ``levenshtein`` on the
    original strings — a JVM expression, no UDF — so output equals the
    brute-force cross-join contract exactly.

    Scale: one shuffle on the q-gram for the mainstream path, then
    levenshtein only on survivors; the degenerate pool is tiny in real
    name/title data (bounded by the space of near-empty / single-run
    strings) and travels as a broadcast. Never O(n^2) unless the data
    genuinely is all-pairs-similar."""
    if max_distance < 0:
        raise ValueError("max_distance must be >= 0")
    pad = "\u0001" * (q - 1)
    s = df.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("txt"),
        F.length(text_col).alias("len"),
        F.array_distinct(
            _hashed_shingles_of_attr(
                F.concat(F.lit(pad), F.col(text_col), F.lit(pad)), q
            )
        ).alias("gs"),
    ).withColumn("ng", F.size("gs"))
    vac = q * max_distance  # gram bound vacuous at/below this set size

    grams = s.filter(F.col("ng") > vac).select(
        "id", "len", "ng", F.explode("gs").alias("g")
    )
    a = grams.select(
        F.col("id").alias("id_a"),
        F.col("len").alias("len_a"),
        F.col("ng").alias("ng_a"),
        "g",
    )
    b = grams.select(
        F.col("id").alias("id_b"),
        F.col("len").alias("len_b"),
        F.col("ng").alias("ng_b"),
        "g",
    )
    main = (
        a.hint("shuffle_merge")
        .join(b, "g")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.col("len_a") - F.col("len_b")) <= max_distance)
        )
        .groupBy("id_a", "id_b")
        .agg(
            F.count("*").alias("shared"),
            F.first(F.greatest("ng_a", "ng_b") - F.lit(vac)).alias("bound"),
        )
        .filter(F.col("shared") >= F.col("bound"))
        .select("id_a", "id_b")
    )
    pool = s.filter(F.col("ng") <= vac).select(
        F.col("id").alias("pid"), F.col("len").alias("plen")
    )
    degen = (
        s.select(F.col("id").alias("oid"), F.col("len").alias("olen"))
        .join(
            F.broadcast(pool),
            (F.abs(F.col("olen") - F.col("plen")) <= max_distance)
            & (F.col("oid") != F.col("pid")),
        )
        .select(
            F.least("oid", "pid").alias("id_a"),
            F.greatest("oid", "pid").alias("id_b"),
        )
    )
    cands = main.unionByName(degen).distinct()
    ta = s.select(F.col("id").alias("id_a"), F.col("txt").alias("txt_a"))
    tb = s.select(F.col("id").alias("id_b"), F.col("txt").alias("txt_b"))
    return (
        cands.hint("shuffle_merge")
        .join(ta, "id_a")
        .hint("shuffle_merge")
        .join(tb, "id_b")
        .withColumn("distance", F.levenshtein("txt_a", "txt_b"))
        .filter(F.col("distance") <= max_distance)
        .select("id_a", "id_b", "distance")
    )


# ExactSubstr candidate-filter sketch: 20 bits/repeated-window, capped at
# 2^27 bits (16 MB, 2^21 words) — past the cap the operator falls back to
# the precise hash-join plan. Module-level so tests can force the fallback.
_EXACT_SUBSTR_BLOOM_BPI = 20
_EXACT_SUBSTR_BLOOM_CAP_BITS = 1 << 27
# small-corpus gate: below this many docs AND total windows, the precise
# hash-join plan beats the bloom path's fixed costs (measured at sf0.1:
# 4.8 s precise vs 6.8 s bloom on 5k docs / ~15M windows; bloom wins by
# 10x replication). Doc pre-gate first so large corpora never pay a
# text scan just to decide.
_EXACT_SUBSTR_SMALL_DOCS = 50_000
_EXACT_SUBSTR_SMALL_WINDOWS = 32_000_000


def exact_substring_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    min_len: int = 40,
    min_count: int = 2,
) -> DataFrame:
    """ExactSubstr-style verbatim-duplication mask (Lee et al., ACL 2022,
    "Deduplicating Training Data Makes Language Models Better"): flag
    every maximal CHARACTER span whose every position is covered by some
    length->=``min_len`` substring occurring >= ``min_count`` times in
    the corpus (counting all positions, including self-repeats within
    one document — the suffix-array semantics).

    The coverage identity that makes this suffix-array-free: a duplicated
    substring of length > L contains duplicated length-L substrings at
    every offset, and a duplicated length-L substring IS a duplicated
    substring of length >= L — so the union of positions covered by
    duplicated substrings of length >= L equals the union covered by
    duplicated length-EXACTLY-L windows. Mining fixed-L windows and
    merging overlapping seeds therefore reproduces the ExactSubstr
    removal mask exactly, with corpus-linear cost instead of distributed
    suffix-array construction.

    Unlike ``duplicate_spans`` (fixed k-TOKEN windows, hash-only), this
    is character-level, variable-length after merging, and EXACT: hash
    candidates are re-verified against the actual substrings, so an
    xxhash64 collision can never flag a false span.

    Returns (id_col, span_start, span_end, n_windows): 0-based char
    offsets, ``span_end`` exclusive (Python-slice convention), plus how
    many seed windows the span absorbed.

    Scale shape (round 7 — cuts the r6 corpus exchange): phase 1 counts
    BARE window hashes (8-byte rows, map-side partials) to find the
    repeated set; the repeated hashes then build a blocked-Bloom
    (word, bits) table whose size is CAPPED at 2^27 bits by
    construction — broadcastable like a scalar sketch, NOT a
    corpus-derived side. Phase 2 re-derives windows with the document
    text still in scope, drops non-candidates map-side through one
    BroadcastHashJoin probe (zero exchange), and emits the verify
    substring inline — so the only corpus-scale shuffles are the phase-1
    hash count and the candidate fraction. The r6 plan shuffled every
    (id, off, h) position row (~20 B/char) AND re-joined the full text;
    both exchanges are gone. Correctness does not rest on the Bloom:
    positions of a truly repeated substring share one hash and pass or
    fail the probe together, and the substring-count verify below is
    what defines the output — the Bloom only bounds the candidate
    superset (false positives die at the verify). If the repeated set
    would saturate the capped sketch (> ~6.7M repeated windows), the
    operator falls back to the r6 precise hash-join plan — same output,
    documented cost. Small corpora (<= 50k docs and <= 32M windows,
    round 8) take the precise plan directly: the bloom path's fixed
    costs (eager count, sketch build, second window pass) dominate when
    the position shuffle is cheap anyway, and the gate's text scan runs
    only under the doc-count pre-gate so a 100-TB input never pays it.
    A per-doc gaps-and-islands window then merges seeds into maximal
    spans. No pairwise stage, no suffix array, no Python.
    """
    L = int(min_len)
    if L < 2:
        raise ValueError(f"min_len must be >= 2 (got {min_len})")
    # repartition by id first (r13): both window-hash passes (the bare
    # phase-1 hash stream and the candidate position stream) explode one
    # xxhash per CHARACTER of the corpus — the operator's dominant CPU —
    # and a one-file input would serialize each pass onto a single task
    # (profiled: 2 x 3.5 s single-task stages at sf0.1). The exchange
    # carries only (id, text); both passes hang off the SAME repartition
    # node, so the shuffle is written once and reused.
    par = df.sparkSession.sparkContext.defaultParallelism
    base = df.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("__txt")
    ).repartition(par, F.col("id"))
    txt = F.col("__txt")
    # sequence(0, len-L) would DESCEND for docs shorter than one window —
    # they must contribute no rows
    offs = F.when(
        F.length(txt) >= L, F.sequence(F.lit(0), F.length(txt) - F.lit(L))
    ).otherwise(F.array().cast("array<int>"))

    def _win_hash(o):
        return F.xxhash64(F.substring(txt, o + 1, L))

    # ---- phase 1: repeated-window hashes over 8-byte rows ----
    hs = base.select(F.explode(F.transform(offs, _win_hash)).alias("h"))
    repeated_plan = (
        hs.groupBy("h")
        .agg(F.count("*").alias("__c"))
        .filter(F.col("__c") >= min_count)
        .select("h")
    )

    pos_struct = F.explode(
        F.transform(
            offs,
            lambda o: F.struct(o.alias("off"), _win_hash(o).alias("h")),
        )
    ).alias("p")

    # small-corpus gate (round 8 — reclaims the r7 1x overhead): the
    # bloom path's fixed costs (eager phase-1 count, sketch build and
    # checkpoint, second window derivation) dominate small corpora where
    # shuffling the position stream is cheap anyway; the precise
    # hash-join plan is measurably faster below ~2x the sf0.1 shape.
    # The doc-count pre-gate keeps the window-sum scan off large corpora
    # (a 100-TB input never pays a full text pass just to decide).
    small = False
    if base.limit(_EXACT_SUBSTR_SMALL_DOCS + 1).count() <= _EXACT_SUBSTR_SMALL_DOCS:
        n_win_total = (
            base.select(
                F.sum(F.greatest(F.length(txt) - F.lit(L - 1), F.lit(0)))
            ).first()[0]
            or 0
        )
        small = n_win_total <= _EXACT_SUBSTR_SMALL_WINDOWS

    if not small:
        repeated = repeated_plan.persist()
        n_rep = repeated.count()  # sketch sizing; also materializes phase 1

    if (
        not small
        and n_rep * _EXACT_SUBSTR_BLOOM_BPI <= _EXACT_SUBSTR_BLOOM_CAP_BITS
    ):
        # blocked Bloom: word index from hash bits [6, 6+log2(n_words)),
        # two in-word probe bits from disjoint hash bits (0-5 and 58-63)
        n_words = 1
        while n_words * 64 < n_rep * _EXACT_SUBSTR_BLOOM_BPI:
            n_words <<= 1

        # F.shiftleft takes a literal int shift, so the column-shift
        # probe-mask goes through expr strings (always applied to "h")
        _word = F.expr(f"shiftrightunsigned(h, 6) & {n_words - 1}L")
        _req = F.expr(
            "shiftleft(cast(1 as bigint), cast(h & 63 as int)) | "
            "shiftleft(cast(1 as bigint), cast(shiftrightunsigned(h, 58) as int))"
        )

        words = (
            repeated.select(_word.alias("word"), _req.alias("req"))
            .groupBy("word")
            .agg(F.expr("bit_or(req)").alias("bits"))
            # bounded: <= n_words rows (16 MB cap) by construction —
            # broadcastable like a finished sketch. persist + count (not
            # localCheckpoint): DataFrame.unpersist() only releases
            # CacheManager entries, it is a NO-OP on local-checkpoint RDD
            # blocks (ADVICE r8) — so a checkpointed sketch could only be
            # reclaimed by JVM GC, breaking the deterministic
            # release_cache() contract below. With persist the release is
            # real; the only cost is that a (16 MB, unlikely) cache
            # eviction re-runs the phase-1 aggregate instead of failing.
            .persist()
        )
        words.count()  # materialize so the result plan never re-runs phase 1
        _safe_unpersist(repeated)
        to_release = (words,)
        cand_s = (
            base.select("id", "__txt", pos_struct)
            .select("id", "__txt", F.col("p.off").alias("off"), F.col("p.h").alias("h"))
            .withColumn("word", _word)
            .withColumn("req", _req)
            .join(F.broadcast(words), on="word")
            .filter(
                F.col("bits").bitwiseAND(F.col("req")) == F.col("req")
            )
            .select("id", "off", F.substring(txt, F.col("off") + 1, L).alias("s"))
        )
    else:
        # the precise plan (the r6 shape): shuffle-pinned hash-keyed
        # join flags candidate positions, candidates rejoin the text.
        # Taken for SMALL corpora (gate above — the position shuffle is
        # cheap there and the bloom path's fixed costs are not) and as
        # the SATURATION fallback when the repeated set would overflow
        # the capped sketch. Small path: `repeated` feeds one join, no
        # persist needed; saturation path: `repeated` stays persisted
        # (the returned plan references it lazily) — released via the
        # result's release_cache()/finalizer below (ADVICE r7).
        rep_side = repeated if not small else repeated_plan
        pos = base.select("id", pos_struct).select(
            "id", F.col("p.off").alias("off"), F.col("p.h").alias("h")
        )
        cand = pos.join(rep_side.hint("shuffle_merge"), on="h").select("id", "off")
        cand_s = cand.join(base.hint("shuffle_merge"), on="id").select(
            "id", "off", F.substring(txt, F.col("off") + 1, L).alias("s")
        )
        to_release = () if small else (repeated,)

    # exact verification: group by the ACTUAL substring — a colliding
    # hash (or Bloom false positive) whose substrings differ is dropped
    # here; all positions of one substring share one hash, so the count
    # below is the true corpus count
    seed_w = Window.partitionBy("s")
    seeds = (
        cand_s.withColumn("__sc", F.count("*").over(seed_w))
        .filter(F.col("__sc") >= min_count)
        .select("id", "off")
    )

    # same-length intervals [off, off+L) merge iff off - lag(off) <= L
    # (running-max-end degenerates to the lag because end is monotone)
    w = Window.partitionBy("id").orderBy("off")
    result = (
        seeds.withColumn(
            "__brk",
            F.when(F.col("off") - F.lag("off").over(w) <= L, F.lit(0)).otherwise(
                F.lit(1)
            ),
        )
        .withColumn(
            "__span",
            F.sum("__brk").over(
                Window.partitionBy("id")
                .orderBy("off")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy("id", "__span")
        .agg(
            F.min("off").cast("long").alias("span_start"),
            (F.max("off") + F.lit(L)).cast("long").alias("span_end"),
            F.count("*").alias("n_windows"),
        )
        .select(F.col("id").alias(id_col), "span_start", "span_end", "n_windows")
    )
    # deterministic lifecycle for the per-call cached/checkpointed side
    # (bloom path: the 16 MB words sketch; fallback: the persisted
    # repeated-hash table) — release_cache() or gc, not session lifetime
    return _attach_release(result, *to_release)


def remove_exact_substrings(
    df: DataFrame,
    spans: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "cleaned_text",
) -> DataFrame:
    """Cut character spans (from ``exact_substring_spans``) out of each
    document — the removal half of ExactSubstr dedup. Every flagged
    occurrence is removed (the Lee-et-al. tool's cut-all policy; at
    corpus scale a non-duplicated copy of genuinely useful text survives
    elsewhere, and the policy keeps the operator one-pass — no global
    "which occurrence to keep" election).

    ``spans`` is (id, span_start, span_end), 0-based char offsets, end
    exclusive; spans for one doc must be disjoint (merged-maximal output
    of ``exact_substring_spans`` always is). Returns the input plus
    (``out_col``, n_chars_orig, n_chars_kept). Docs with no spans pass
    through verbatim.

    Pure expression plan: spans aggregate to one small sorted array per
    doc, one left join, then ONE fold over the span array stitches the
    kept segments — no Python, no explode of the character stream.
    """
    agg = spans.groupBy(id_col).agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("span_start").cast("int").alias("s"),
                    F.col("span_end").cast("int").alias("e"),
                )
            )
        ).alias("__spans")
    )
    joined = df.join(agg.hint("shuffle_merge"), on=id_col, how="left")
    txt = F.col(text_col)
    acc0 = F.struct(F.lit("").alias("out"), F.lit(0).alias("cur"))
    folded = F.aggregate(
        F.col("__spans"),
        acc0,
        lambda a, sp: F.struct(
            F.concat(
                a["out"],
                F.substring(txt, a["cur"] + 1, F.greatest(sp["s"] - a["cur"], F.lit(0))),
            ).alias("out"),
            sp["e"].alias("cur"),
        ),
        lambda a: F.concat(
            a["out"],
            F.substring(txt, a["cur"] + 1, F.greatest(F.length(txt) - a["cur"], F.lit(0))),
        ),
    )
    staged = joined.withColumn(
        out_col, F.when(F.col("__spans").isNull(), txt).otherwise(folded)
    )
    out = (
        staged.withColumn("n_chars_orig", F.length(txt).cast("long"))
        .withColumn("n_chars_kept", F.length(F.col(out_col)).cast("long"))
        .drop("__spans")
    )
    # spans from exact_substring_spans carries a cache-release
    # obligation; this plan embeds it, so adopt (else the spans local
    # dies on return and its finalizer releases the cached side before
    # this result ever materializes)
    return _adopt_release(out, spans)


class IncrementalLineDeduplicator:
    """Arrival-order LINE-level dedup for a growing corpus — the
    streaming form of :func:`line_dedup` (CCNet / RefinedWeb boilerplate
    removal across crawl dumps): each arriving batch drops every
    eligible line occurrence whose normalized form was EITHER seen in
    any earlier arrival OR repeats >= ``min_count`` times within the
    batch, then reassembles each document from its surviving lines in
    original order. This is what document-level dedup cannot express on
    a continuous crawl: later dumps must not re-publish the template
    chrome ("subscribe to our newsletter", cookie banners) earlier
    dumps already carried, even when every document is unique.

    Semantics are the arrival-causal projection of batch
    :func:`line_dedup` over the concatenated corpus: an occurrence in
    batch B is removed exactly when the concatenation's count rule
    would remove it using information available at B's arrival —
    already-seen lines (count across dumps necessarily >= 2) drop
    immediately; a line's FIRST dump keeps it unless the dump itself
    repeats it >= ``min_count`` times. Earlier dumps are never edited
    retroactively (they shipped). Lines shorter than
    ``min_line_chars`` after trim never count and never enter state.

    State = one fixed-width row per DISTINCT seen line hash in the same
    restart-surviving bucketed store as the other incremental
    deduplicators (``_BucketedMinhashState`` — crash matrix, orphan
    sweep, ``compact()``, HCFS backends unchanged): bucket row
    (id=h, band=0, h), second hash riding the shingle table as a
    1-element array. Keys are a PAIR of 64-bit hashes (128 effective
    bits — at 100 TB a single 64-bit lane WOULD birthday-collide across
    billions of distinct lines and silently delete content lines), and
    the line text itself never enters the state. Every distinct
    eligible hash a batch carries is recorded (kept or removed — both
    are "seen"), at most once ever.

    Per-arrival cost is O(batch): one explode, one (h, h2) count
    aggregate with map-side partials, one probe join against the
    bucketed state (state side zero-Exchange in persistent mode), one
    per-doc reassembly aggregate, one anti-join + append of the novel
    hashes. Reference analog: none — the reference has no text
    pipeline; this extends SURVEY.md's north-star dedup family.

    ``hash_fn``: "xxhash64" (default; pair via independent seeds) or
    "md5_60" (portable pair via a salt prefix — the cross-engine
    contract variant a SQL oracle replays bit-for-bit).
    """

    def __init__(
        self,
        spark,
        id_col: str = "doc_id",
        text_col: str = "text",
        *,
        min_count: int = 2,
        sep: str = "\n",
        normalize: bool = True,
        min_line_chars: int = 1,
        hash_fn: str = "xxhash64",
        state_dir: str | None = None,
        state_buckets: int = 32,
    ):
        if min_count < 2:
            raise ValueError(f"min_count must be >= 2, got {min_count}")
        if hash_fn not in ("xxhash64", "md5_60"):
            raise ValueError(
                f"hash_fn must be 'xxhash64' or 'md5_60', got {hash_fn!r}"
            )
        if "\\E" in sep:
            raise ValueError(r"sep must not contain the sequence \E")
        self.spark = spark
        self.id_col, self.text_col = id_col, text_col
        self.min_count = int(min_count)
        self.sep = sep
        self.normalize = bool(normalize)
        self.min_line_chars = int(min_line_chars)
        self.hash_fn = hash_fn
        self.n_seen = 0
        self.params = dict(
            min_count=self.min_count,
            normalize=self.normalize,
            min_line_chars=self.min_line_chars,
            hash_fn=hash_fn,
        )
        self._state = None
        if state_dir is not None:
            resuming = _BucketedMinhashState.exists(state_dir, spark)
            self._state = _BucketedMinhashState(
                spark,
                state_dir,
                n_buckets=state_buckets,
                params=self.params,
                extra=dict(
                    kind="line_dedup",
                    id_col=id_col,
                    text_col=text_col,
                    sep=sep,
                    **self.params,
                ),
            )
            if resuming:
                self.n_seen = self._state.buckets().count()
            return
        # emptyRDD (0 partitions): createDataFrame([]) parallelizes into
        # defaultParallelism EMPTY partitions, and every state consumer
        # then scans them 32-near-empty-tasks wide per stage (r14)
        _e = spark.sparkContext.emptyRDD()
        self._empty_b = spark.createDataFrame(_e, "id LONG, band INT, h LONG")
        self._empty_s = spark.createDataFrame(_e, "id LONG, sh ARRAY<LONG>")
        self._bucket_parts: list[DataFrame] = []
        self._shingle_parts: list[DataFrame] = []

    @classmethod
    def open(cls, spark, state_dir: str) -> "IncrementalLineDeduplicator":
        """Reopen a persistent state dir after a process restart; the
        line-keying parameters come from the manifest (dedup under the
        WRONG normalization would silently diverge from the state)."""
        if not _BucketedMinhashState.exists(state_dir, spark):
            raise ValueError(f"no incremental line-dedup state at {state_dir}")
        st = _BucketedMinhashState(spark, state_dir)
        e = st.extra
        if e.get("kind") != "line_dedup":
            raise ValueError(
                f"{state_dir} holds {e.get('kind')!r} state, not line_dedup"
            )
        return cls(
            spark,
            e["id_col"],
            e["text_col"],
            min_count=int(e["min_count"]),
            sep=e.get("sep", "\n"),
            normalize=bool(e["normalize"]),
            min_line_chars=int(e["min_line_chars"]),
            hash_fn=e["hash_fn"],
            state_dir=state_dir,
            state_buckets=st.n_buckets,
        )

    # -- state views (same lazy-union memory fallback as the exact
    # deduplicator) --
    @property
    def _seen_buckets(self) -> DataFrame:
        if self._state is not None:
            return self._state.buckets()
        if not self._bucket_parts:
            return self._empty_b
        return functools.reduce(DataFrame.union, self._bucket_parts)

    @property
    def _seen_shingles(self) -> DataFrame:
        if self._state is not None:
            return self._state.shingles()
        if not self._shingle_parts:
            return self._empty_s
        return functools.reduce(DataFrame.union, self._shingle_parts)

    _MEMORY_COMPACT_PARTS = 16

    def _append_memory(self, new_b: DataFrame, new_s: DataFrame) -> None:
        combined = (
            new_b.select(
                F.lit(0).alias("__t"), "id", "band", "h",
                F.lit(None).cast("array<long>").alias("sh"),
            )
            .unionByName(
                new_s.select(
                    F.lit(1).alias("__t"), "id",
                    F.lit(None).cast("int").alias("band"),
                    F.lit(None).cast("long").alias("h"), "sh",
                )
            )
            .localCheckpoint(eager=True)
        )
        self._append_parts(
            combined.filter("__t = 0").select("id", "band", "h"),
            combined.filter("__t = 1").select("id", "sh"),
        )

    def _append_parts(self, bucket_part: DataFrame, shingle_part: DataFrame) -> None:
        """Record one dump's already-materialized state delta (narrow
        projections of the checkpointed novel-key table — zero extra
        actions; r13 optimization round) and consolidate every
        ``_MEMORY_COMPACT_PARTS`` dumps."""
        self._bucket_parts.append(bucket_part)
        self._shingle_parts.append(shingle_part)
        if len(self._bucket_parts) >= self._MEMORY_COMPACT_PARTS:
            b, s = self._seen_buckets, self._seen_shingles
            self._bucket_parts, self._shingle_parts = [], []
            self._append_memory(b, s)

    def _hash_pair(self, key: Column) -> tuple[Column, Column]:
        if self.hash_fn == "xxhash64":
            return F.xxhash64(key), F.xxhash64(F.lit(1), key)

        def md5_60(c):
            return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")

        return md5_60(key), md5_60(F.concat(F.lit("1"), key))

    def add_batch(self, batch: DataFrame, out_col: str = "cleaned_text") -> DataFrame:
        """Process one arriving dump; returns (id, out_col, n_lines,
        n_removed) — every input document appears — and records the
        batch's novel line hashes for future arrivals."""
        # per-arrival actions run at batch-sized shuffle partitions
        # (guide §2 — see arrival_shuffle_partitions); the lazy ``out``
        # the caller consumes executes under the session setting
        with arrival_shuffle_partitions(batch.sparkSession, batch):
            return self._add_batch_inner(batch, out_col)

    def _add_batch_inner(self, batch: DataFrame, out_col: str) -> DataFrame:
        lines = batch.select(
            F.col(self.id_col).alias("id"),
            F.posexplode_outer(
                F.split(F.col(self.text_col), "\\Q" + self.sep + "\\E")
            ).alias("pos", "__line"),
        )
        key = (
            normalize_ws(F.col("__line")) if self.normalize else F.col("__line")
        )
        eligible = F.length(F.trim(F.col("__line"))) >= self.min_line_chars
        h, h2 = self._hash_pair(key)
        # lazy checkpoint (r13 optimization round): hashed materializes
        # (and its lineage cuts) inside the novel-keys checkpoint job —
        # the eager checkpoint here was a whole extra action per dump;
        # the caller's later consumption of ``out`` reads the same
        # checkpointed blocks
        hashed = lines.select(
            "id", "pos", "__line",
            F.when(eligible, h).alias("h"),
            F.when(eligible, h2).alias("h2"),
        ).localCheckpoint(eager=False)

        batch_keys = (
            hashed.where(F.col("h").isNotNull())
            .groupBy("h", "h2")
            .agg(F.count("*").alias("__c"))
        )
        # probe on (band, h) — the state table's bucket columns, so the
        # state side reads Bucketed: true with no Exchange (state rows
        # all carry band 0; the probe side adds the literal)
        seen = (
            self._seen_buckets.select(
                "band", F.col("h"), F.col("id").alias("__sid")
            )
            .join(
                batch_keys.withColumn("band", F.lit(0)).hint("shuffle_merge"),
                on=["band", "h"],
            )
            .join(
                self._seen_shingles.select(
                    F.col("id").alias("__sid"),
                    F.element_at("sh", 1).alias("__h2_seen"),
                ),
                on="__sid",
            )
            .where(F.col("__h2_seen") == F.col("h2"))
            .select("h", "h2")
        )
        drop_keys = (
            batch_keys.where(F.col("__c") >= self.min_count)
            .select("h", "h2")
            .union(seen)
            .distinct()
            .withColumn("__drop", F.lit(True))
        )
        flagged = hashed.join(
            drop_keys.hint("shuffle_merge"), on=["h", "h2"], how="left"
        )
        out = (
            flagged.groupBy("id")
            .agg(
                F.count("*").alias("n_lines"),
                F.sum(
                    F.when(F.col("__drop").isNotNull(), 1).otherwise(0)
                ).alias("n_removed"),
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.when(
                                    F.col("__drop").isNull(),
                                    F.struct(
                                        F.col("pos"),
                                        F.col("__line").alias("line"),
                                    ),
                                )
                            )
                        ),
                        lambda s: s.getField("line"),
                    ),
                    self.sep,
                ).alias(out_col),
            )
            .select(
                F.col("id").alias(self.id_col),
                out_col,
                F.col("n_lines").cast("long").alias("n_lines"),
                F.col("n_removed").cast("long").alias("n_removed"),
            )
        )

        # every distinct eligible hash this batch carries that the state
        # has not recorded becomes seen (kept AND removed occurrences:
        # both are evidence the line exists in the published corpus)
        from pyspark.sql import Observation

        _novel_obs = Observation()
        novel = (
            batch_keys.select("h", "h2")
            .join(seen.hint("shuffle_merge"), on=["h", "h2"], how="left_anti")
            .observe(_novel_obs, F.count(F.lit(1)).alias("n"))
            .localCheckpoint(eager=True)
        )
        new_b = novel.select(
            F.col("h").alias("id"), F.lit(0).alias("band"), "h"
        )
        new_s = novel.select(F.col("h").alias("id"), F.array("h2").alias("sh"))
        if self._state is not None:
            self._state.append(new_b, new_s)
        else:
            # narrow projections of the CHECKPOINTED novel table — no
            # second checkpoint (r13 optimization round)
            self._append_parts(new_b, new_s)
        self.n_seen += int(_novel_obs.get["n"])
        return out

    def compact(self) -> dict:
        """Consolidate persistent state generations (no-op in memory)."""
        if self._state is None:
            return {"generation": None, "files_swept": 0}
        return self._state.compact()
