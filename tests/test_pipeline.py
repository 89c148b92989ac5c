"""Corpus-curation pipeline tests."""

import pytest
from pyspark.sql import functions as F

from codd_spark.operators.pipeline import (
    corpus_stats,
    curate_corpus,
    normalize_per_group,
)

GOOD = ("this is a perfectly reasonable english document with enough words "
        "to pass the quality filters easily and naturally")


@pytest.fixture()
def corpus(spark):
    rows = [
        (0, GOOD, "en"),
        (1, GOOD, "en"),                      # exact dup of 0 -> dropped
        (2, GOOD + " extended", "en"),
        (3, "x", "en"),                       # too short -> low quality
        (4, GOOD, "zh"),                      # filtered language
        (5, "!!! ??? *** $$$ %%% ### @@@ &&&", "en"),  # punct soup
    ]
    return spark.createDataFrame(rows, "doc_id LONG, text STRING, lang STRING")


def test_curate_corpus_exact(corpus):
    out = curate_corpus(corpus, keep_langs=("en",), min_quality=0.7)
    assert sorted(r.doc_id for r in out.collect()) == [0, 2]


def test_curate_corpus_with_near_dups(corpus, spark):
    distinct = ("completely unrelated prose about distributed query engines "
                "catalyst optimizers and shuffle partitioning strategies")
    rows = [
        (9, GOOD.replace("perfectly", "entirely"), "en"),  # near-dup of 0
        (10, distinct, "en"),
    ]
    bigger = corpus.union(spark.createDataFrame(rows, corpus.schema))
    out = curate_corpus(
        bigger, keep_langs=("en",), min_quality=0.7, near_dup_threshold=0.5
    )
    # docs 2 ("... extended") and 9 (one-word change) are near-dups of 0 ->
    # removed keeping the smaller id; the unrelated doc survives
    assert sorted(r.doc_id for r in out.collect()) == [0, 10]


def test_corpus_stats_shape(corpus):
    row = corpus_stats(corpus).collect()[0]
    assert row.n_docs == 6
    assert row.approx_distinct_contents >= 4
    assert len(row.len_percentiles) == 3


def test_normalize_per_group(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 10.0), ("b", 10.0)],
        "g STRING, v DOUBLE",
    )
    out = normalize_per_group(df, ["g"], "v")
    by_g = {}
    for r in out.collect():
        by_g.setdefault(r.g, []).append(r.z)
    assert sorted(by_g["a"]) == [-1.0, 0.0, 1.0]
    assert by_g["b"] == [None, None]  # zero stddev -> NULL, not inf


def test_train_val_test_split_deterministic(spark):
    from codd_spark.operators.pipeline import train_val_test_split

    df = spark.createDataFrame([(i,) for i in range(2000)], "id LONG")
    for hasher in ("xxhash64", "lcg"):
        out = train_val_test_split(df, "id", hasher=hasher)
        a = {r.id: r.split for r in out.collect()}
        # stable under repartitioning (assignment is a pure function of id)
        b = {r.id: r.split for r in train_val_test_split(df.repartition(7), "id", hasher=hasher).collect()}
        assert a == b
        counts = {s: list(a.values()).count(s) for s in ("train", "val", "test")}
        assert counts["train"] > 1400 and counts["val"] > 100 and counts["test"] > 100, (hasher, counts)
    # projection only: no shuffle in the plan
    plan = train_val_test_split(df, "id")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_train_val_test_split_validates(spark):
    import pytest
    from codd_spark.operators.pipeline import train_val_test_split

    df = spark.createDataFrame([(1,)], "id LONG")
    with pytest.raises(ValueError):
        train_val_test_split(df, "id", val_pct=60, test_pct=40)
    with pytest.raises(ValueError):
        train_val_test_split(df, "id", hasher="md5")
