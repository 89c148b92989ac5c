"""Persistent ANN indexes (operators/annstore.py, VERDICT r9 item 5):
train once, persist IVF lists / PQ codebooks+codes with the statefs
versioned-manifest protocol, probe in a later session without
retraining. The probe plan must read only the routed list partitions
and keep the corpus side Exchange-free."""

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
