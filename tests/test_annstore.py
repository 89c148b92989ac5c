"""Persistent ANN indexes (operators/annstore.py, VERDICT r9 item 5):
train once, persist IVF lists / PQ codebooks+codes with the statefs
versioned-manifest protocol, probe in a later session without
retraining. The probe plan must read only the routed list partitions
and keep the corpus side Exchange-free."""

import itertools
import os

import pytest
from pyspark.sql import functions as F

from codd_spark.operators.annstore import PersistentANNIndex
from codd_spark.operators.similarity import ivf_top_k, pq_top_k, pq_train_encode


@pytest.fixture(scope="module")
def emb(spark):
    return (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .localCheckpoint(eager=True)
    )


@pytest.fixture(scope="module")
def queries(emb):
    return emb.filter("vec_id < 5").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )


_ANN_AUTH = itertools.count()


def _rows(df):
    return {
        (r.query_id, r.neighbor_id, r.cos_sim, r.rank) for r in df.collect()
    }


def test_ivf_build_reopen_probe_equals_live(spark, emb, queries, tmp_path):
    """build -> open (fresh handle, model from the manifest alone) ->
    probe == the live ivf_top_k with identical params, row for row."""
    d = str(tmp_path / "ivf")
    idx = PersistentANNIndex.build_ivf(
        spark, emb, d, n_lists=16, trainer="sq_kmeans"
    )
    want = _rows(
        ivf_top_k(emb, queries, k=5, n_lists=16, n_probe=3, trainer="sq_kmeans")
    )
    assert _rows(idx.top_k(queries, k=5, n_probe=3)) == want

    assert PersistentANNIndex.exists(d)
    reopened = PersistentANNIndex.open(spark, d)
    assert reopened.kind == "ivf" and reopened.params["n_lists"] == 16
    assert _rows(reopened.top_k(queries, k=5, n_probe=3)) == want


def test_ivf_probe_prunes_to_routed_partitions(spark, emb, queries, tmp_path):
    """The scale contract: the probe scan carries a PartitionFilters IN
    over the routed list ids (static pruning — only n_probe directories
    per query batch are read) and the corpus side of the probe join has
    NO Exchange (routed queries are broadcast)."""
    d = str(tmp_path / "ivf_plan")
    idx = PersistentANNIndex.build_ivf(
        spark, emb, d, n_lists=16, trainer="sq_kmeans"
    )
    import re

    out = idx.top_k(queries.limit(1), k=5, n_probe=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    scan = next(
        block for block in plan.split("\n") if "PartitionFilters" in block
    )
    # static IN over the routed ids (n_probe lists for one query)
    m = re.search(r"list_id#\d+ IN \(([\d,]+)\)", scan)
    assert m, scan
    assert len(m.group(1).split(",")) == 3  # n_probe directories read
    # routed queries broadcast against the list scan: the corpus side
    # reaches the join straight from the FileScan with no Exchange
    assert "BroadcastHashJoin" in plan, plan
    corpus_leg = plan.split("BroadcastHashJoin")[1].split("FileScan parquet")[0]
    assert "Exchange" not in corpus_leg, plan
    # the only Exchanges are post-join over scored candidates
    # (distinct + rank window), never over the raw lists
    assert plan.count("Exchange hashpartitioning") == 2, plan


def test_pq_build_reopen_probe_equals_live(spark, emb, queries, tmp_path):
    """PQ: persisted codes + codebooks + rerank corpus reproduce the
    live pipeline's rows after reopen."""
    d = str(tmp_path / "pq")
    idx = PersistentANNIndex.build_pq(
        spark, emb, d, dim=64, m=8, k=16, max_iter=5
    )
    encoded, books = pq_train_encode(emb, dim=64, m=8, k=16, max_iter=5)
    want = _rows(pq_top_k(encoded, books, queries, k=5, rerank=emb))
    got = _rows(
        PersistentANNIndex.open(spark, d).top_k(queries, k=5)
    )
    assert got == want


def test_build_refuses_occupied_or_foreign_dirs(spark, emb, tmp_path):
    d = str(tmp_path / "occupied")
    PersistentANNIndex.build_ivf(spark, emb, d, n_lists=4)
    with pytest.raises(ValueError, match="already holds"):
        PersistentANNIndex.build_ivf(spark, emb, d, n_lists=4)
    f = tmp_path / "foreign"
    f.mkdir()
    (f / "junk.txt").write_text("x")
    with pytest.raises(ValueError, match="foreign"):
        PersistentANNIndex.build_ivf(spark, emb, str(f), n_lists=4)
    with pytest.raises(ValueError, match="no ANN index"):
        PersistentANNIndex.open(spark, str(tmp_path / "nope"))


def test_ivf_add_vectors_grows_index_without_retrain(spark, emb, tmp_path):
    """Crawl growth path: build on half the corpus, append the rest
    against the FROZEN centroids. The grown index must (a) hold every
    vector exactly once, (b) probe identically to a hand-built
    assignment that routes the second half to the same centroids, and
    (c) return an appended vector as its own exact nearest neighbor."""
    from codd_spark.operators.similarity import (
        ivf_probe,
        ivf_train_assign,
        route_queries_to_lists,
    )

    half1 = emb.filter("vec_id % 2 = 0")
    half2 = emb.filter("vec_id % 2 = 1")
    d = str(tmp_path / "grow")
    idx = PersistentANNIndex.build_ivf(
        spark, half1, d, n_lists=8, trainer="sq_kmeans"
    )
    n2 = idx.add_vectors(half2)
    assert n2 == half2.count()

    lists = idx._read_gens("lists")
    assert lists.count() == emb.count()
    assert lists.select("neighbor_id").distinct().count() == emb.count()
    # the append is a committed generation, not an in-place mutation of
    # the build's directory (crash-atomicity depends on this layout)
    assert idx.gens == [0, 1]
    assert PersistentANNIndex.open(spark, d).gens == [0, 1]

    # equivalence vs a manual same-centroid assignment (no persistence)
    assigned1, cents = ivf_train_assign(
        half1, n_lists=8, trainer="sq_kmeans"
    )
    assert cents == idx.model["centroids"]
    routed2 = route_queries_to_lists(
        half2, cents, n_probe=1, query_id_col="vec_id", query_emb_col="embedding"
    ).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("_qemb").alias("_emb"),
        "list_id",
    )
    manual = assigned1.unionByName(routed2)
    queries = emb.filter("vec_id < 4").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    want = {
        (r.query_id, r.neighbor_id, r.cos_sim, r.rank)
        for r in ivf_probe(manual, cents, queries, k=5, n_probe=3).collect()
    }
    got = {
        (r.query_id, r.neighbor_id, r.cos_sim, r.rank)
        for r in idx.top_k(queries, k=5, n_probe=3).collect()
    }
    assert got == want

    # an appended vector's own embedding finds itself at similarity 1
    probe_vec = emb.filter("vec_id = 11").select(
        F.lit(999999).alias("query_id"), F.col("embedding").alias("q_emb")
    )
    top = idx.top_k(probe_vec, k=1, n_probe=1).collect()
    assert top and top[0].neighbor_id == 11 and top[0].cos_sim == 1.0


def test_ivf_add_vectors_crash_matrix(spark, emb, tmp_path):
    """VERDICT r10 item 2: an append that dies between the staged
    parquet write and the manifest commit must be INVISIBLE — probes
    and reopens see only the committed generations — and the retried
    append must sweep the orphan directory and land exactly one copy
    of the batch."""
    half1 = emb.filter("vec_id % 2 = 0")
    half2 = emb.filter("vec_id % 2 = 1")
    d = str(tmp_path / "crash")
    idx = PersistentANNIndex.build_ivf(
        spark, half1, d, n_lists=8, trainer="sq_kmeans"
    )
    n1 = half1.count()

    real_commit = idx.fs.commit_manifest
    idx.fs.commit_manifest = lambda m: (_ for _ in ()).throw(
        IOError("simulated crash before manifest commit")
    )
    with pytest.raises(IOError):
        idx.add_vectors(half2)
    idx.fs.commit_manifest = real_commit

    # the staged-but-uncommitted generation exists on disk...
    assert os.path.isdir(os.path.join(d, "lists_gen1"))
    # ...but no reader sees it: fresh open still holds ONLY the build
    reopened = PersistentANNIndex.open(spark, d)
    assert reopened.gens == [0]
    assert reopened._read_gens("lists").count() == n1

    # retried append sweeps the orphan, reuses its generation number,
    # and publishes exactly one copy of the batch
    n2 = reopened.add_vectors(half2)
    assert n2 == half2.count()
    assert reopened.gens == [0, 1]
    gen1 = spark.read.parquet(reopened._gen_dir("lists", 1))
    assert gen1.count() == n2  # swept + rewritten, not doubled
    lists = reopened._read_gens("lists")
    assert lists.count() == emb.count()
    assert lists.select("neighbor_id").distinct().count() == emb.count()


def test_pq_add_vectors_grows_index(spark, emb, tmp_path):
    """PQ growth path (VERDICT r10 item 2 / missing-gap 3): the batch
    encodes under the FROZEN codebooks — byte-identical to what the
    original build would have produced — and codes + rerank corpus land
    as a committed generation. An appended vector must find itself as
    its own exact nearest neighbor through the rerank."""
    from codd_spark.operators.similarity import pq_encode

    half1 = emb.filter("vec_id % 2 = 0")
    half2 = emb.filter("vec_id % 2 = 1")
    d = str(tmp_path / "pqgrow")
    idx = PersistentANNIndex.build_pq(
        spark, half1, d, dim=64, m=8, k=16, max_iter=5
    )
    n2 = idx.add_vectors(half2)
    assert n2 == half2.count()
    assert idx.gens == [0, 1]

    codes = idx._read_gens("codes")
    corpus = idx._read_gens("corpus")
    assert codes.count() == emb.count() == corpus.count()

    # appended codes == frozen-codebook encoding of the batch
    want = {
        (r.vec_id, tuple(r.codes))
        for r in pq_encode(half2, idx.model["codebooks"]).collect()
    }
    got = {
        (r.vec_id, tuple(r.codes))
        for r in spark.read.parquet(
            idx._gen_dir("codes", 1)
        ).collect()
    }
    assert got == want

    # an appended vector's own embedding reranks to itself at sim 1
    probe_vec = emb.filter("vec_id = 11").select(
        F.lit(999999).alias("query_id"), F.col("embedding").alias("q_emb")
    )
    top = PersistentANNIndex.open(spark, d).top_k(probe_vec, k=1).collect()
    assert top and top[0].neighbor_id == 11 and top[0].cos_sim == 1.0


def test_annstore_on_viewfs(spark, emb, queries, tmp_path):
    """The manifest protocol and the parquet lists both work through a
    non-file Hadoop scheme (same ViewFS vehicle as the dedup state):
    build on viewfs://, reopen from the URI alone, probe."""
    auth = f"annfs{next(_ANN_AUTH)}"
    local = tmp_path / "mount"
    os.makedirs(local, exist_ok=True)
    spark._jsc.hadoopConfiguration().set(
        f"fs.viewfs.mounttable.{auth}.link./state", "file://" + str(local)
    )
    uri = f"viewfs://{auth}/state/ann"
    idx = PersistentANNIndex.build_ivf(
        spark, emb, uri, n_lists=8, trainer="sq_kmeans"
    )
    want = {
        (r.query_id, r.neighbor_id, r.cos_sim, r.rank)
        for r in idx.top_k(queries, k=5).collect()
    }
    assert PersistentANNIndex.exists(uri, spark)
    reopened = PersistentANNIndex.open(spark, uri)
    got = {
        (r.query_id, r.neighbor_id, r.cos_sim, r.rank)
        for r in reopened.top_k(queries, k=5).collect()
    }
    assert got == want
    # versioned write-once manifests on the HCFS backend, not manifest.json
    names = os.listdir(local / "ann")
    assert any(n.startswith("manifest-v") for n in names)
    assert "manifest.json" not in names
