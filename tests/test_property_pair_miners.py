"""Property-based equivalence for the EXACT pair miners: on random
corpora, the pruned plans (prefix-filtered set-similarity, q-gram-blocked
edit distance) must return exactly the brute-force pair sets. Randomized
inputs hunt the regimes fixed-seed tests miss — degenerate repetition,
threshold boundaries where t*|x| is integral, length extremes."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from codd_spark.operators.dedup import (
    edit_distance_pairs,
    ngram_jaccard_pairs,
    set_similarity_join,
)


@pytest.fixture(scope="module")
def sess(spark):
    return spark


words = st.text(alphabet="abc", min_size=1, max_size=4)
docs_strategy = st.lists(
    st.lists(words, min_size=0, max_size=8).map(" ".join),
    min_size=2,
    max_size=14,
)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    texts=docs_strategy,
    threshold=st.sampled_from([0.25, 1 / 3, 0.5, 2 / 3, 0.75, 1.0]),
)
def test_set_similarity_join_equals_brute_force_random(sess, texts, threshold):
    df = sess.createDataFrame(list(enumerate(texts)), "doc_id LONG, text STRING")
    pruned = sorted(
        map(
            tuple,
            set_similarity_join(df, "doc_id", "text", threshold=threshold).collect(),
        )
    )
    brute = sorted(
        map(
            tuple,
            ngram_jaccard_pairs(df, "doc_id", "text", n=1, threshold=threshold).collect(),
        )
    )
    assert pruned == brute


strings = st.text(alphabet="abz", min_size=0, max_size=9)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    names=st.lists(strings, min_size=2, max_size=12),
    d=st.sampled_from([0, 1, 2]),
)
def test_edit_distance_pairs_equals_brute_force_random(sess, names, d):
    df = sess.createDataFrame(list(enumerate(names)), "id LONG, name STRING")
    pruned = sorted(
        (r.id_a, r.id_b, r.distance)
        for r in edit_distance_pairs(df, "id", "name", max_distance=d).collect()
    )
    a = df.selectExpr("id AS id_a", "name AS na")
    b = df.selectExpr("id AS id_b", "name AS nb")
    brute = sorted(
        (r.id_a, r.id_b, r.distance)
        for r in a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("distance", F.levenshtein("na", "nb"))
        .filter(F.col("distance") <= d)
        .collect()
    )
    assert pruned == brute


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    corpus_texts=docs_strategy,
    bench_texts=st.lists(
        st.lists(words, min_size=0, max_size=8).map(" ".join),
        min_size=1,
        max_size=5,
    ),
    n=st.sampled_from([1, 2, 3]),
    min_hits=st.sampled_from([1, 2]),
)
def test_bloom_decontaminate_equals_containment(
    sess, corpus_texts, bench_texts, n, min_hits
):
    """On random corpora/benchmarks, the Bloom-prefiltered route must
    keep EXACTLY the docs method='containment' keeps — the no-false-
    negative guarantee composed with exact verification, fuzzed across
    gram sizes and hit thresholds (degenerate texts included)."""
    from codd_spark.operators.dedup import bloom_decontaminate, decontaminate

    corpus = sess.createDataFrame(
        list(enumerate(corpus_texts)), "doc_id LONG, text STRING"
    )
    bench = sess.createDataFrame(
        [(1000 + i, t) for i, t in enumerate(bench_texts)], "doc_id LONG, text STRING"
    )
    got = sorted(r.doc_id for r in bloom_decontaminate(
        corpus, bench, n=n, min_hits=min_hits
    ).select("doc_id").collect())
    want = sorted(r.doc_id for r in decontaminate(
        corpus, bench, method="containment", min_hits=min_hits, n=n
    ).select("doc_id").collect())
    assert got == want
