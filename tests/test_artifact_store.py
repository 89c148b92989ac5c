"""Persisted pipeline artifacts beyond the dedup state and ANN indexes
(r10): decontamination Bloom sketches (GramBloom.save/load — the
benchmark changes rarely, crawls arrive daily) and BPE merge tables
(bpe_save/bpe_load — train once, encode for weeks). Both ride the
statefs manifest protocol, so local paths and HCFS URIs behave the
same and kinds cannot silently adopt each other's directories."""

import itertools
import os

import numpy as np
import pytest

from codd_spark.operators.dedup import (
    GramBloom,
    bloom_decontaminate,
    build_gram_bloom,
)
from codd_spark.operators.tokenize import bpe_encode, bpe_load, bpe_save, bpe_train

_AUTH = itertools.count()


@pytest.fixture(scope="module")
def docs(spark):
    return (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .localCheckpoint(eager=True)
    )


def test_gram_bloom_save_load_roundtrip_and_probe(spark, docs, tmp_path):
    bench = docs.filter("doc_id < 40")
    bloom = build_gram_bloom(bench, n=13)
    d = str(tmp_path / "bloom")
    bloom.save(spark, d)
    back = GramBloom.load(spark, d)
    assert np.array_equal(back.bitmap, bloom.bitmap)
    assert (back.m_bits, back.n_hashes, back.ngram_n, back.n_items) == (
        bloom.m_bits, bloom.n_hashes, bloom.ngram_n, bloom.n_items,
    )
    # a probe with the reloaded sketch keeps exactly what the live one
    # keeps (bloom_decontaminate returns the CLEANED corpus)
    corpus = docs.filter("doc_id >= 40 AND doc_id < 120")
    live = {
        r.doc_id
        for r in bloom_decontaminate(corpus, bench, prebuilt=bloom).collect()
    }
    reloaded = {
        r.doc_id
        for r in bloom_decontaminate(corpus, bench, prebuilt=back).collect()
    }
    assert live == reloaded and live

    # re-save after a benchmark union: pointer moves, content follows
    bloom2 = build_gram_bloom(
        docs.filter("doc_id >= 400 AND doc_id < 420"), n=13, m_bits=bloom.m_bits
    )
    merged = bloom.union(bloom2)
    merged.save(spark, d)
    assert GramBloom.load(spark, d).n_items == merged.n_items

    # idempotent content-addressed blobs: saving the same sketch twice
    # leaves exactly one blob for it
    merged.save(spark, d)
    blobs = [f for f in os.listdir(d) if f.startswith("sketch-")]
    assert len(blobs) == 2  # original + merged


def test_gram_bloom_save_load_on_viewfs(spark, docs, tmp_path):
    auth = f"bloomfs{next(_AUTH)}"
    local = tmp_path / "mount"
    os.makedirs(local, exist_ok=True)
    spark._jsc.hadoopConfiguration().set(
        f"fs.viewfs.mounttable.{auth}.link./state", "file://" + str(local)
    )
    uri = f"viewfs://{auth}/state/bloom"
    bloom = build_gram_bloom(docs.filter("doc_id < 30"), n=13)
    bloom.save(spark, uri)
    back = GramBloom.load(spark, uri)
    assert np.array_equal(back.bitmap, bloom.bitmap)
    names = os.listdir(local / "bloom")
    assert any(n.startswith("manifest-v") for n in names)


def test_bpe_save_load_roundtrip(spark, docs, tmp_path):
    d = str(tmp_path / "bpe")
    merges = bpe_train(docs.filter("doc_id < 60"), "text", n_merges=12)
    assert merges
    bpe_save(spark, merges, d)
    back = bpe_load(spark, d)
    assert back == merges
    # encoding with the reloaded table is identical
    sample = docs.filter("doc_id < 10")
    live = {r.doc_id: r.toks for r in bpe_encode(sample, "text", merges, out_col="toks").collect()}
    re = {r.doc_id: r.toks for r in bpe_encode(sample, "text", back, out_col="toks").collect()}
    assert live == re


def test_artifact_kinds_do_not_adopt_each_other(spark, docs, tmp_path):
    d = str(tmp_path / "mixed")
    bpe_save(spark, [(0, "a", "b", 3)], d)
    bloom = build_gram_bloom(docs.filter("doc_id < 10"), n=13)
    with pytest.raises(ValueError, match="non-GramBloom"):
        bloom.save(spark, d)
    with pytest.raises(ValueError, match="not a GramBloom"):
        GramBloom.load(spark, d)
    d2 = str(tmp_path / "bloomdir")
    bloom.save(spark, d2)
    with pytest.raises(ValueError, match="non-BPE"):
        bpe_save(spark, [(0, "a", "b", 3)], d2)
    with pytest.raises(ValueError, match="not BPE"):
        bpe_load(spark, d2)


def test_nb_model_save_load_scores_identically(spark, tmp_path):
    from codd_spark.operators.classify import (
        nb_linear_score,
        nb_linear_train,
        nb_model_load,
        nb_model_save,
        planted_label_docs,
    )

    labeled = planted_label_docs(spark.range(0, 200).selectExpr("id AS doc_id"))
    model = nb_linear_train(labeled, "y", n_features=512)
    d = str(tmp_path / "clf")
    nb_model_save(spark, model, d, n_features=512)
    back, params = nb_model_load(spark, d)
    assert params == {"n_features": 512, "bigrams": True}

    batch = planted_label_docs(
        spark.range(300, 380).selectExpr("id AS doc_id")
    ).select("doc_id", "text")
    live = {
        (r.doc_id, r.score, r.pred)
        for r in nb_linear_score(batch, model, n_features=512).collect()
    }
    reloaded = {
        (r.doc_id, r.score, r.pred)
        for r in nb_linear_score(batch, back, **params).collect()
    }
    assert live == reloaded and live
    # wrong-kind adoption refused
    from codd_spark.operators.tokenize import bpe_save

    with pytest.raises(ValueError, match="non-BPE"):
        bpe_save(spark, [(0, "a", "b", 1)], d)


def test_nb_multiclass_save_load_scores_identically(spark, tmp_path):
    """Multiclass sibling of the nb_linear round-trip: saved/reloaded
    weights + hyperparams reproduce live preds and scores exactly, and
    the two model families refuse each other's state dirs."""
    from codd_spark.operators.classify import (
        nb_model_load,
        nb_multiclass_load,
        nb_multiclass_save,
        nb_multiclass_score,
        nb_multiclass_train,
        planted_class_docs,
    )

    corpus = planted_class_docs(
        spark.range(0, 150).selectExpr("id AS doc_id"), n_classes=3
    )
    train = corpus.filter("doc_id % 5 != 4")
    test = corpus.filter("doc_id % 5 = 4")
    model = nb_multiclass_train(train, "y", n_features=512)
    live = {
        r.doc_id: (r.pred, r.score)
        for r in nb_multiclass_score(test, model, n_features=512).collect()
    }

    d = str(tmp_path / "mc_model")
    nb_multiclass_save(spark, model, d, n_features=512)
    back, params = nb_multiclass_load(spark, d)
    reloaded = {
        r.doc_id: (r.pred, r.score)
        for r in nb_multiclass_score(test, back, **params).collect()
    }
    assert reloaded == live

    # cross-kind adoption refused in both directions
    import pytest as _pytest

    with _pytest.raises(ValueError, match="nb_linear"):
        nb_model_load(spark, d)
    from codd_spark.operators.classify import nb_model_save

    with _pytest.raises(ValueError, match="non-nb_linear"):
        nb_model_save(spark, model, d, n_features=512)
