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


# ---------------------------------------------------------------------------
# generation compaction (round 12, VERDICT r11 item 2)
# ---------------------------------------------------------------------------


def _grown_ivf(spark, emb, d):
    """Build on a third of the corpus, append the other two thirds as
    two generations -> gens [0, 1, 2]."""
    idx = PersistentANNIndex.build_ivf(
        spark, emb.filter("vec_id % 3 = 0"), d, n_lists=8, trainer="sq_kmeans"
    )
    idx.add_vectors(emb.filter("vec_id % 3 = 1"))
    idx.add_vectors(emb.filter("vec_id % 3 = 2"))
    assert idx.gens == [0, 1, 2]
    return idx


def test_ivf_compact_preserves_probes_and_retires_gens(
    spark, emb, queries, tmp_path
):
    """compact() must fold [0,1,2] into one generation with probe
    output IDENTICAL before/after, retire the old directories
    (including gen 0's bare dir), survive reopen, and be a no-op when
    already single-generation."""
    d = str(tmp_path / "ivfcompact")
    idx = _grown_ivf(spark, emb, d)
    want = _rows(idx.top_k(queries, k=5, n_probe=3))
    n_all = idx._read_gens("lists").count()

    res = idx.compact()
    assert res["generation"] == 3 and res["rows"] == {"lists": n_all}
    assert idx.gens == [3]
    assert _rows(idx.top_k(queries, k=5, n_probe=3)) == want
    # old roots are gone: the bare build dir and both append gens
    assert not os.path.exists(os.path.join(d, "lists"))
    assert not os.path.exists(os.path.join(d, "lists_gen1"))
    assert not os.path.exists(os.path.join(d, "lists_gen2"))
    assert os.path.isdir(os.path.join(d, "lists_gen3"))

    reopened = PersistentANNIndex.open(spark, d)
    assert reopened.gens == [3]
    assert _rows(reopened.top_k(queries, k=5, n_probe=3)) == want
    # single-generation compact is a no-op
    assert reopened.compact() == {
        "generation": 3, "dirs_retired": 0, "rows": {},
    }
    # an EMPTY append publishes NOTHING (r12: a file-less generation
    # root would break every later union-read — no schema to infer);
    # probes keep working and real growth continues afterwards
    assert reopened.add_vectors(emb.filter("vec_id < 0")) == 0
    assert reopened.gens == [3]
    assert _rows(reopened.top_k(queries, k=5, n_probe=3)) == want
    assert reopened.add_vectors(
        emb.filter("vec_id = 0").select(
            (F.col("vec_id") + F.lit(5_000_000)).alias("vec_id"), "embedding"
        )
    ) == 1
    assert reopened.gens == [3, 4]
    assert reopened._read_gens("lists").count() == n_all + 1


def test_ivf_compact_keeps_list_partition_pruning(spark, emb, queries, tmp_path):
    """The consolidated generation must re-land partitioned by list_id
    so the probe's static partition pruning survives compaction."""
    d = str(tmp_path / "ivfprune")
    idx = _grown_ivf(spark, emb, d)
    idx.compact()
    gen_dir = idx._gen_dir("lists", 3)
    subdirs = [n for n in os.listdir(gen_dir) if n.startswith("list_id=")]
    assert subdirs, "compacted generation lost its list_id partitioning"
    plan = (
        idx.top_k(queries, k=5, n_probe=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the SPECIFIC static-pruning pattern (ADVICE r12: a bare
    # "list_id#" fallback matched any plan referencing the column, so
    # the test could not fail if compaction lost partition pruning)
    import re

    scan = next(
        block for block in plan.split("\n") if "PartitionFilters" in block
    )
    assert re.search(r"list_id#\d+ IN \([\d,]+\)", scan), scan


def test_pq_compact_preserves_probes(spark, emb, queries, tmp_path):
    """PQ compaction folds codes AND the rerank corpus; probe output is
    identical before/after and from a fresh reopen."""
    d = str(tmp_path / "pqcompact")
    idx = PersistentANNIndex.build_pq(
        spark, emb.filter("vec_id % 2 = 0"), d, dim=64, m=8, k=16, max_iter=5
    )
    idx.add_vectors(emb.filter("vec_id % 2 = 1"))
    want = _rows(idx.top_k(queries, k=5))
    n_all = emb.count()

    res = idx.compact()
    assert res["generation"] == 2
    assert res["rows"] == {"codes": n_all, "corpus": n_all}
    assert idx.gens == [2]
    assert _rows(idx.top_k(queries, k=5)) == want
    for stale in ("codes", "corpus", "codes_gen1", "corpus_gen1"):
        assert not os.path.exists(os.path.join(d, stale))
    reopened = PersistentANNIndex.open(spark, d)
    assert _rows(reopened.top_k(queries, k=5)) == want


def test_ivf_compact_crash_matrix(spark, emb, queries, tmp_path):
    """Interrupting compact() at either side of the publish point must
    leave a correct readable index:

    - crash BEFORE the manifest commit -> old generations still served
      (the staged consolidation is an invisible orphan, swept on the
      next append/compact);
    - crash AFTER the commit but before the retirement deletes -> the
      new generation is served, the stale dirs are invisible and swept
      by the next append/compact."""
    d = str(tmp_path / "compactcrash")
    idx = _grown_ivf(spark, emb, d)
    want = _rows(idx.top_k(queries, k=5, n_probe=3))
    n_all = idx._read_gens("lists").count()

    # -- crash before the publish point --------------------------------
    real_commit = idx.fs.commit_manifest
    idx.fs.commit_manifest = lambda m: (_ for _ in ()).throw(
        IOError("simulated crash before manifest commit")
    )
    with pytest.raises(IOError):
        idx.compact()
    idx.fs.commit_manifest = real_commit
    reopened = PersistentANNIndex.open(spark, d)
    assert reopened.gens == [0, 1, 2]  # old window intact
    assert _rows(reopened.top_k(queries, k=5, n_probe=3)) == want

    # -- crash after the publish point, before retirement --------------
    # (the pre-stage orphan sweep also deletes — only fail deletes that
    # happen AFTER the manifest commit published the consolidation)
    real_delete = reopened.fs.delete_recursive

    def _delete_dies_post_commit(p):
        if reopened.fs.read_manifest()["gens"] == [3]:
            raise IOError("simulated crash during retirement")
        return real_delete(p)

    reopened.fs.delete_recursive = _delete_dies_post_commit
    with pytest.raises(IOError):
        reopened.compact()
    reopened.fs.delete_recursive = real_delete
    # the commit landed: a fresh reader serves ONLY the consolidation
    after = PersistentANNIndex.open(spark, d)
    assert after.gens == [3]
    assert after._read_gens("lists").count() == n_all
    assert _rows(after.top_k(queries, k=5, n_probe=3)) == want
    # stale dirs linger on disk but are invisible...
    assert os.path.exists(os.path.join(d, "lists"))
    # ...and the next writer entry point sweeps them
    after.compact()  # single-gen no-op, but sweeps first
    assert not os.path.exists(os.path.join(d, "lists"))
    assert not os.path.exists(os.path.join(d, "lists_gen1"))
    assert not os.path.exists(os.path.join(d, "lists_gen2"))
    assert _rows(after.top_k(queries, k=5, n_probe=3)) == want


def test_ivf_compact_refuses_short_read(spark, emb, queries, tmp_path):
    """A consolidation whose staged copy comes back with the wrong row
    count must refuse to publish: manifest untouched, staged dir
    deleted, old generations still served."""
    d = str(tmp_path / "shortread")
    idx = _grown_ivf(spark, emb, d)
    want = _rows(idx.top_k(queries, k=5, n_probe=3))

    real_reader = spark.read

    class _ShortReader:
        """Delegates to the real DataFrameReader but truncates the
        verification read of the STAGED generation."""

        def parquet(self, path):
            df = real_reader.parquet(path)
            return df.limit(3) if "_gen3" in path else df

    import unittest.mock as _mock

    with _mock.patch.object(
        type(spark), "read", property(lambda s: _ShortReader())
    ):
        with pytest.raises(RuntimeError, match="row mismatch"):
            idx.compact()

    reopened = PersistentANNIndex.open(spark, d)
    assert reopened.gens == [0, 1, 2]
    assert not os.path.exists(os.path.join(d, "lists_gen3"))
    assert _rows(reopened.top_k(queries, k=5, n_probe=3)) == want


# ---------------------------------------------------------------------------
# semantic arrival decontamination (round 12, VERDICT r11 item 8)
# ---------------------------------------------------------------------------


def test_semantic_decontam_arrival_contract(spark, emb, tmp_path):
    """Earlier-kept-wins through the persisted index: an exact clone of
    an ADMITTED batch-1 vector arriving in batch 2 must be dropped
    against the grown state (cos 1.0 >= any threshold); ordinary
    far-from-corpus arrivals pass with max_sim below threshold."""
    from codd_spark.operators.annstore import IncrementalSemanticDecontaminator

    e2 = emb.select("vec_id", "embedding")
    d = str(tmp_path / "semdecon")
    dec = IncrementalSemanticDecontaminator(
        spark, d, corpus=e2.filter("vec_id % 2 = 0"),
        threshold=0.45, n_probe=3, n_lists=8,
    )
    b1 = e2.filter("vec_id % 4 = 1")
    k1 = dec.add_batch(b1)
    kept1 = {r.vec_id for r in k1.select("vec_id").collect()}
    assert kept1  # something survives at this threshold
    # the index grew by exactly the survivors
    assert dec.index.gens == [0, 1]

    some_kept = min(kept1)
    clone = e2.filter(F.col("vec_id") == some_kept).select(
        (F.col("vec_id") + F.lit(10_000_000)).alias("vec_id"), "embedding"
    )
    k2 = dec.add_batch(e2.filter("vec_id % 4 = 3").unionByName(clone))
    kept2 = {r.vec_id: r.max_sim for r in k2.collect()}
    assert some_kept + 10_000_000 not in kept2  # dropped vs generation 1
    for sim in kept2.values():
        assert sim is None or sim < 0.45
    assert dec.index.gens == [0, 1, 2]


def test_semantic_decontam_reopen_and_validation(spark, emb, tmp_path):
    """Reopening the state dir WITHOUT a corpus resumes the index (the
    arrival machinery's restart contract); passing a corpus over an
    existing index, omitting it on a fresh dir, or a nonsense threshold
    all refuse loudly."""
    from codd_spark.operators.annstore import IncrementalSemanticDecontaminator

    e2 = emb.select("vec_id", "embedding")
    d = str(tmp_path / "semreopen")
    dec = IncrementalSemanticDecontaminator(
        spark, d, corpus=e2.filter("vec_id % 2 = 0"),
        threshold=0.45, n_probe=3, n_lists=8,
    )
    dec.add_batch(e2.filter("vec_id % 4 = 1"))

    resumed = IncrementalSemanticDecontaminator(spark, d, threshold=0.45)
    assert resumed.index.gens == [0, 1]
    k2 = resumed.add_batch(e2.filter("vec_id % 4 = 3"))
    assert k2.count() > 0
    assert resumed.index.gens == [0, 1, 2]

    with pytest.raises(ValueError, match="already holds an index"):
        IncrementalSemanticDecontaminator(spark, d, corpus=e2)
    with pytest.raises(ValueError, match="pass corpus="):
        IncrementalSemanticDecontaminator(spark, str(tmp_path / "fresh"))
    with pytest.raises(ValueError, match="threshold"):
        IncrementalSemanticDecontaminator(
            spark, str(tmp_path / "fresh2"), corpus=e2, threshold=1.5
        )


def test_semantic_decontam_compact_preserves_decisions(spark, emb, tmp_path):
    """compact() between arrivals must not change any admission: the
    folded single generation serves the same probe results."""
    from codd_spark.operators.annstore import IncrementalSemanticDecontaminator

    e2 = emb.select("vec_id", "embedding")
    b2 = e2.filter("vec_id % 4 = 3")

    def run(compact_between):
        d = str(tmp_path / f"semcompact{compact_between}")
        dec = IncrementalSemanticDecontaminator(
            spark, d, corpus=e2.filter("vec_id % 2 = 0"),
            threshold=0.45, n_probe=3, n_lists=8,
        )
        dec.add_batch(e2.filter("vec_id % 4 = 1"))
        if compact_between:
            dec.compact()
            assert len(dec.index.gens) == 1
        return {
            (r.vec_id, r.max_sim) for r in dec.add_batch(b2).collect()
        }

    assert run(False) == run(True)


def test_semantic_decontam_auto_compact(spark, emb, tmp_path):
    """compact_every keeps a long-lived gate's generation count bounded
    while leaving every admission decision identical to the un-compacted
    run."""
    from codd_spark.operators.annstore import IncrementalSemanticDecontaminator

    e2 = emb.select("vec_id", "embedding")
    batches = [e2.filter(f"vec_id % 5 = {g}") for g in range(1, 5)]

    def run(compact_every):
        d = str(tmp_path / f"auto{compact_every}")
        dec = IncrementalSemanticDecontaminator(
            spark, d, corpus=e2.filter("vec_id % 5 = 0"),
            threshold=0.45, n_probe=3, n_lists=8,
            compact_every=compact_every,
        )
        out = [
            frozenset(r.vec_id for r in dec.add_batch(b).collect())
            for b in batches
        ]
        return out, len(dec.index.gens)

    plain, gens_plain = run(None)
    auto, gens_auto = run(2)
    assert auto == plain            # decisions identical
    assert gens_plain == 5          # build + 4 admissions
    assert gens_auto == 1           # folded after every admission
    with pytest.raises(ValueError, match="compact_every"):
        IncrementalSemanticDecontaminator(
            spark, str(tmp_path / "bad"), corpus=e2,
            compact_every=1,
        )


def test_semantic_decontam_compacts_by_default(spark, emb, tmp_path):
    """VERDICT r12 item 7 knob-default sanity: a gate constructed on
    DEFAULTS auto-compacts (compact_every=8), so a long-horizon run
    never accumulates unbounded generations — and the folded run's
    admission decisions are identical to an explicit opt-out run."""
    from codd_spark.operators.annstore import (
        _DEFAULT_COMPACT_EVERY,
        IncrementalSemanticDecontaminator,
    )

    assert _DEFAULT_COMPACT_EVERY == 8
    e2 = emb.select("vec_id", "embedding")
    batches = [e2.filter(f"vec_id % 10 = {g}") for g in range(1, 10)]

    def run(d, **kw):
        dec = IncrementalSemanticDecontaminator(
            spark, str(tmp_path / d), corpus=e2.filter("vec_id % 10 = 0"),
            threshold=0.45, n_probe=3, n_lists=8, **kw,
        )
        gens_seen = []
        out = []
        for b in batches:
            out.append(frozenset(r.vec_id for r in dec.add_batch(b).collect()))
            gens_seen.append(len(dec.index.gens))
        return out, gens_seen, dec.compact_every

    out_def, gens_def, knob = run("defaults")
    assert knob == 8
    # nine admissions on defaults: the count reaches 8 once and folds
    assert max(gens_def) <= 8 and gens_def[-1] < 8
    out_off, gens_off, knob_off = run("optout", compact_every=None)
    assert knob_off is None and gens_off[-1] == 10  # build + 9, unbounded
    assert out_def == out_off  # decisions identical either way
