"""BPE training/encoding cross-checked against a pure-Python reference
implementation of the classic algorithm (count pairs over the word-freq
table, merge the argmax, repeat)."""

import collections

import pytest

from codd_spark.operators.tokenize import (
    WORD_END,
    bpe_encode,
    bpe_merges_df,
    bpe_train,
)


def _ref_bpe(word_freqs, n_merges, min_pair_count=2):
    syms = {tuple(list(w) + [WORD_END]): f for w, f in word_freqs.items()}
    merges = []
    for step in range(1, n_merges + 1):
        counts = collections.Counter()
        for s, f in syms.items():
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] += f
        if not counts:
            break
        # (count desc, left asc, right asc)
        (l, r), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if c < min_pair_count:
            break
        merges.append((step, l, r, c))
        new = {}
        for s, f in syms.items():
            out, i = [], 0
            while i < len(s):
                if i < len(s) - 1 and s[i] == l and s[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            new[tuple(out)] = new.get(tuple(out), 0) + f
        syms = new
    return merges


CORPUS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "widest widest widest",
    "the lowest newest widest low",
]


def test_bpe_train_matches_reference(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(CORPUS)], "id LONG, text STRING")
    got = bpe_train(df, "text", n_merges=12)

    wf = collections.Counter(w for t in CORPUS for w in t.split())
    want = _ref_bpe(wf, 12)
    assert got == want
    assert len(got) >= 8
    # classic corpus: 'est</w>' family merges early
    merged_syms = [l + r for _, l, r, _ in got]
    assert any("est" in m for m in merged_syms)


def test_bpe_encode_roundtrip(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(CORPUS)], "id LONG, text STRING")
    merges = bpe_train(df, "text", n_merges=12)
    enc = bpe_encode(df, "text", merges).collect()
    for r in enc:
        # detokenization invariant: concatenating tokens and splitting on
        # the end-of-word marker reconstructs the original words
        joined = "".join(r.bpe_tokens)
        words = [w for w in joined.split(WORD_END) if w]
        assert words == r.text.split()
    # a trained merge actually fires: some token longer than one char
    assert any(len(t.replace(WORD_END, "")) > 1 for r in enc for t in r.bpe_tokens)


def test_bpe_merges_df_schema(spark):
    df = spark.createDataFrame([(0, "aa aa aa")], "id LONG, text STRING")
    merges = bpe_train(df, "text", n_merges=3, min_pair_count=2)
    mdf = bpe_merges_df(spark, merges)
    assert mdf.columns == ["step", "left", "right", "merged", "pair_count"]
    rows = mdf.collect()
    assert rows[0].merged == rows[0].left + rows[0].right


def test_bpe_encode_whitespace_class_matches_training(spark):
    """ADVICE r4: encode must segment words with the SAME whitespace
    class as training (Java \\s+ = ASCII). A text containing NBSP
    (U+00A0, not ASCII whitespace) is ONE word to tokens(); Python
    str.split() would have split it into two, producing tokens the
    merge table never saw."""
    from codd_spark.operators.tokenize import bpe_encode

    df = spark.createDataFrame([("ab cd ef",)], "text STRING")
    # empty merge table -> pure char+end-marker segmentation exposes the
    # word boundaries directly
    out = bpe_encode(df, "text", []).collect()[0].bpe_tokens
    # two words: 'ab\xa0cd' (NBSP kept inside) and 'ef'
    from codd_spark.operators.tokenize import WORD_END

    assert out.count(WORD_END) == 2, out
    assert "\xa0" in "".join(out), out


def test_bpe_local_and_distributed_paths_identical(spark):
    """The driver-local merge loop (vocab under the threshold) and the
    distributed expression-level fold must produce the SAME merge table,
    merge for merge — on the real testdata corpus."""
    from codd_spark.operators.tokenize import bpe_train

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    local = bpe_train(docs, "text", n_merges=15)
    dist = bpe_train(docs, "text", n_merges=15, driver_vocab_threshold=0)
    assert local == dist
    assert len(local) == 15
