"""BPE tokenizer training and encoding at corpus scale.

Byte-pair-encoding vocabulary learning (Sennrich et al., ACL 2016 —
the public algorithm behind GPT/LLaMA-family tokenizers): repeatedly
merge the most frequent adjacent symbol pair. The scalable shape is the
classic two-level one:

1. ONE corpus pass aggregates the word-frequency table (the only
   corpus-sized shuffle; at 100 TB the distinct-word table is orders of
   magnitude smaller than the corpus and map-side combine does the
   heavy lifting).
2. Every merge iteration runs on that compact table: a weighted
   adjacent-pair count (explode + sum), a 1-row argmax collect (the
   same driver-scalar fixpoint boundary as pagerank/k_core), and an
   expression-level merge fold — no Python touches per-word data.

The merge fold is a JVM ``aggregate`` over each word's symbol array that
rebuilds the array left-to-right, fusing every non-overlapping (a, b)
occurrence greedily — exactly the reference algorithm's merge semantics,
pinned by the pure-Python cross-check in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from codd_spark.functions.text import tokens

WORD_END = "\x01"  # end-of-word sentinel (a control char no real token contains)


def _word_freq(df: DataFrame, text_col: str) -> DataFrame:
    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
    )


def _symbolize(words: DataFrame) -> DataFrame:
    """word -> array of single-character symbols + end-of-word marker."""
    return words.select(
        F.concat(
            F.split(F.col("w"), "(?!^)(?!$)"),  # chars (exclude the end split point: Spark keeps trailing empties)
            F.array(F.lit(WORD_END)),
        ).alias("syms"),
        "freq",
    )


def _pair_counts(syms: DataFrame) -> DataFrame:
    """Weighted adjacent-pair counts over the symbolized vocab."""
    n = F.size("syms")
    pairs = F.zip_with(
        F.slice("syms", 1, n - 1),
        F.slice("syms", 2, n - 1),
        lambda a, b: F.struct(a.alias("l"), b.alias("r")),
    )
    return (
        syms.filter(n >= 2)
        .select(F.explode(pairs).alias("p"), "freq")
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("freq").alias("cnt"))
    )


def _merge_fold(syms_col, left: str, right: str):
    """Rebuild the symbol array, fusing adjacent (left, right) pairs
    greedily left-to-right (non-overlapping) — one JVM fold, no UDF."""
    merged = left + right
    return F.aggregate(
        syms_col,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(
    df: DataFrame,
    text_col: str,
    *,
    n_merges: int = 50,
    min_pair_count: int = 2,
    checkpoint_every: int = 8,
    driver_vocab_threshold: int = 262_144,
) -> list[tuple[int, str, str, int]]:
    """Learn ``n_merges`` BPE merges from the corpus. Returns the ordered
    merge table as [(step, left, right, pair_count), ...] — the
    tokenizer artifact (apply with ``bpe_encode``). Stops early when the
    best remaining pair occurs fewer than ``min_pair_count`` times.

    Ties break deterministically by (count desc, left, right).

    The corpus is touched ONCE (the word-frequency aggregate — the only
    corpus-sized shuffle); every merge iteration runs on that compact
    vocabulary table. When the vocabulary fits comfortably on the driver
    (<= ``driver_vocab_threshold`` distinct words — the aggregate is
    vocabulary-bounded, not corpus-bounded, which is how production BPE
    trainers operate too), the merge loop folds LOCALLY over the
    collected table: identical merges (the local fold is the same
    greedy-non-overlap semantics, cross-checked in CI against the
    distributed path and the pure-Python reference) without paying ~2
    Spark stages of scheduling latency per merge. Beyond the threshold
    the distributed loop runs with DELTA pair-count maintenance (r6):
    one full-vocabulary pair aggregate up front, then per merge an
    argmax over the maintained pair table plus a recount of only the
    words containing the merged pair (lazy per-step checkpoints keep the
    plan flat; ``checkpoint_every`` is retained for API compatibility).
    Pass ``driver_vocab_threshold=0`` to force the distributed loop."""
    wf = _word_freq(df, text_col)
    if driver_vocab_threshold > 0:
        n_words = wf.count()
        if n_words <= driver_vocab_threshold:
            rows = wf.collect()  # vocabulary-bounded by the gate above
            return _bpe_train_local(
                [(r["w"], int(r["freq"])) for r in rows],
                n_merges=n_merges,
                min_pair_count=min_pair_count,
            )
    # Distributed path with DELTA pair-count maintenance (r6): the pair
    # table is aggregated from the FULL vocabulary exactly once; each
    # merge then (a) argmaxes the maintained pair table (pair-vocabulary
    # sized — no corpus-vocab explode), (b) recounts only the AFFECTED
    # words (those containing an adjacent (l, r)) before and after the
    # fold, and (c) folds the +new/-old delta into the pair table. A
    # word without the merged pair contributes identically before and
    # after, so delta-recounting affected words equals a full recount —
    # no per-occurrence neighbor bookkeeping (whose overlap edge cases
    # are notoriously easy to get wrong) is needed. n_merges full-vocab
    # explode aggregates become one full pass + n_merges affected-only
    # passes; late merges touch a shrinking fraction of the vocabulary.
    syms = _symbolize(wf).localCheckpoint(eager=False)
    # filter(~has_pair) ∪ new_aff would DOUBLE the partition count every
    # merge (checkpointing preserves partitioning: 32 → 64 → ... → 2^k·32
    # near-empty tasks — measured as an exponential per-step stall);
    # coalesce (narrow, no shuffle) pins it to the input's count
    n_parts = syms.rdd.getNumPartitions()
    pc = _pair_counts(syms).localCheckpoint(eager=True)
    merges: list[tuple[int, str, str, int]] = []
    for step in range(1, n_merges + 1):
        best = pc.orderBy(F.desc("cnt"), "l", "r").limit(1).collect()
        if not best or best[0]["cnt"] < min_pair_count:
            break
        l, r, cnt = best[0]["l"], best[0]["r"], int(best[0]["cnt"])
        merges.append((step, l, r, cnt))

        n = F.size("syms")
        adj = F.zip_with(
            F.slice("syms", 1, n - 1),
            F.slice("syms", 2, n - 1),
            lambda a, b: F.struct(a.alias("l"), b.alias("r")),
        )
        has_pair = (n >= 2) & F.exists(
            adj, lambda p: (p["l"] == F.lit(l)) & (p["r"] == F.lit(r))
        )
        aff = syms.filter(has_pair)
        new_aff = aff.select(
            _merge_fold(F.col("syms"), l, r).alias("syms"), "freq"
        )
        delta = _pair_counts(new_aff).unionByName(
            _pair_counts(aff).withColumn("cnt", -F.col("cnt"))
        )
        pc = (
            pc.unionByName(delta)
            .groupBy("l", "r")
            .agg(F.sum("cnt").alias("cnt"))
            .filter(F.col("cnt") > 0)
            .localCheckpoint(eager=True)  # pair-vocabulary sized
        )
        syms = (
            syms.filter(~has_pair)
            .unionByName(new_aff)
            .coalesce(n_parts)
            .localCheckpoint(eager=False)
        )
    return merges


def _bpe_train_local(
    word_freqs: list[tuple[str, int]],
    *,
    n_merges: int,
    min_pair_count: int,
) -> list[tuple[int, str, str, int]]:
    """Driver-local merge loop over an already-aggregated (word, freq)
    table — the same (count desc, left, right) argmax and greedy
    left-to-right non-overlapping fold as the distributed path, merge
    for merge (pinned by tests)."""
    syms = [(list(w) + [WORD_END], f) for w, f in word_freqs]
    merges: list[tuple[int, str, str, int]] = []
    for step in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for s, f in syms:
            for i in range(len(s) - 1):
                p = (s[i], s[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        (l, r), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_pair_count:
            break
        merges.append((step, l, r, cnt))
        merged = l + r
        for idx, (s, f) in enumerate(syms):
            out, i = [], 0
            while i < len(s):
                if i < len(s) - 1 and s[i] == l and s[i + 1] == r:
                    out.append(merged)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[idx] = (out, f)
    return merges


def bpe_merges_df(spark, merges: list[tuple[int, str, str, int]]) -> DataFrame:
    """Merge table as a DataFrame (step, left, right, merged, pair_count)
    — the persistable tokenizer artifact / contract-query surface."""
    return spark.createDataFrame(
        [(s, l, r, l + r, c) for s, l, r, c in merges],
        "step INT, left STRING, right STRING, merged STRING, pair_count LONG",
    )


def bpe_encode(
    df: DataFrame,
    text_col: str,
    merges: list[tuple[int, str, str, int]],
    *,
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Apply a learned merge table: per word, chars + end marker, then
    each merge in training order — an Arrow-batched pandas UDF (the
    per-word loop over ~vocab-rank merges is imperative by nature; the
    merge list is tiny and ships inside the UDF closure). Adds
    ``out_col`` as array<string> of BPE tokens for the whole text."""
    import re

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    ordered = [(l, r) for _, l, r, _ in merges]
    # EXACTLY the whitespace class of functions/text.py::tokens() (Java
    # \s+ = ASCII [ \t\n\x0B\f\r]) — Python str.split() would also break
    # on Unicode whitespace (NBSP, U+2028), segmenting words at encode
    # time that training never saw
    ws = re.compile(r"[ \t\n\x0b\f\r]+")

    def _encode(texts):
        ranks = {pair: i for i, pair in enumerate(ordered)}

        def enc_word(word: str) -> list[str]:
            syms = list(word) + [WORD_END]
            while len(syms) >= 2:
                best_rank, best_i = None, None
                for i in range(len(syms) - 1):
                    rk = ranks.get((syms[i], syms[i + 1]))
                    if rk is not None and (best_rank is None or rk < best_rank):
                        best_rank, best_i = rk, i
                if best_rank is None:
                    break
                l, r = ordered[best_rank]
                out, i = [], 0
                while i < len(syms):
                    if i < len(syms) - 1 and syms[i] == l and syms[i + 1] == r:
                        out.append(l + r)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            return syms

        return texts.map(
            lambda t: [
                tok
                for w in ws.split((t or "").strip(" \t\n\x0b\f\r"))
                if w
                for tok in enc_word(w)
            ]
        )

    # no type annotations: `from __future__ import annotations` stringifies
    # hints, which the pandas_udf signature inspector rejects
    encode = pandas_udf(_encode, "array<string>")
    return df.withColumn(out_col, encode(F.col(text_col)))


def bpe_save(spark, merges: list[tuple[int, str, str, int]], state_dir: str) -> None:
    """Persist a trained merge table (train once, encode for weeks —
    the tokenizer twin of the ANN/bloom artifact stores): the ordered
    merges ride the statefs manifest itself (a merge table is
    vocab-sized — KBs, not data), so the commit IS the publish point
    and any scheme statefs resolves (local, hdfs://, s3a://, viewfs://)
    works. Re-saving moves the manifest pointer atomically."""
    from codd_spark.sources.statefs import resolve_statefs

    fs = resolve_statefs(spark, state_dir)
    if fs.manifest_exists() and fs.read_manifest().get("kind") != "bpe_merges":
        raise ValueError(f"{state_dir} holds non-BPE state — refusing to adopt")
    fs.mkdirs()
    fs.commit_manifest(
        {
            "kind": "bpe_merges",
            "merges": [[int(s), a, b, int(f)] for s, a, b, f in merges],
        }
    )


def bpe_load(spark, state_dir: str) -> list[tuple[int, str, str, int]]:
    """Reload a merge table persisted by :func:`bpe_save` — encode-only
    sessions skip the corpus pass entirely."""
    from codd_spark.sources.statefs import resolve_statefs

    fs = resolve_statefs(spark, state_dir)
    if not fs.manifest_exists():
        raise ValueError(f"no BPE manifest at {state_dir}")
    m = fs.read_manifest()
    if m.get("kind") != "bpe_merges":
        raise ValueError(f"{state_dir} holds {m.get('kind')!r} state, not BPE merges")
    return [(int(s), a, b, int(f)) for s, a, b, f in m["merges"]]
