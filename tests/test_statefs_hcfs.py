"""HCFS-backed persistent dedup state (sources/statefs.py, VERDICT r8
item 1): the _BucketedMinhashState directory works under a non-``file:``
Hadoop filesystem scheme — metadata ops via the JVM FileSystem, manifest
commits as write-once versioned files.

Test vehicle: Hadoop's ViewFS, a genuine non-local scheme shipped in
every Spark distribution, with its mount table pointed at local disk —
so the full crash matrix runs against the REAL Hadoop code path (URI
parsing, FileSystem.get resolution, listStatus/delete/rename through an
FS that adds checksum sidecars) without needing a cluster. Each test
uses a fresh mount-table authority because Hadoop caches FileSystem
instances per (scheme, authority) and would otherwise pin the first
test's mount table forever.
"""

import glob
import itertools
import json
import os

import pytest
from pyspark.sql import functions as F

from codd_spark.operators.dedup import (
    IncrementalDeduplicator,
    _BucketedMinhashState,
)
from codd_spark.sources.statefs import (
    HadoopStateFS,
    PosixStateFS,
    resolve_statefs,
)

PARAMS = dict(num_hashes=120, bands=20, shingle_k=5, threshold=0.5)

_AUTH = itertools.count()


@pytest.fixture(scope="module")
def docs(spark):
    return (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .localCheckpoint(eager=True)
    )


@pytest.fixture()
def viewfs(spark, tmp_path):
    """(uri, local_dir): a viewfs:// state dir mounted onto tmp_path."""
    auth = f"coddfs{next(_AUTH)}"
    local = tmp_path / "mount"
    os.makedirs(local, exist_ok=True)
    spark._jsc.hadoopConfiguration().set(
        f"fs.viewfs.mounttable.{auth}.link./state", "file://" + str(local)
    )
    return f"viewfs://{auth}/state/ded", str(local)


def _restart(spark, state_dir_uri):
    """Simulate a process restart: drop the catalog entries (external
    tables — data survives); a reopen must recover from the URI alone."""
    import hashlib

    tag = hashlib.md5(state_dir_uri.rstrip("/").encode()).hexdigest()[:12]
    spark.sql(f"DROP TABLE IF EXISTS inc_minhash_{tag}_buckets")
    spark.sql(f"DROP TABLE IF EXISTS inc_minhash_{tag}_shingles")


def _manifest_versions(local_dir):
    return sorted(
        os.path.basename(p)
        for p in glob.glob(os.path.join(local_dir, "ded", "manifest-v*.json"))
    )


def test_backend_routing(spark, tmp_path, viewfs):
    uri, _local = viewfs
    assert isinstance(resolve_statefs(spark, str(tmp_path)), PosixStateFS)
    assert isinstance(
        resolve_statefs(spark, "file://" + str(tmp_path)), PosixStateFS
    )
    fs = resolve_statefs(spark, uri)
    assert isinstance(fs, HadoopStateFS) and fs.scheme == "viewfs"
    # unresolvable schemes (no connector on this classpath) fail loud
    # at construction with guidance, not subtly later
    with pytest.raises(ValueError, match="Hadoop FileSystem"):
        resolve_statefs(spark, "s3a://bucket/state")


def test_viewfs_restart_equals_uninterrupted(spark, docs, viewfs):
    """The r8 kill-and-reopen contract, now on a non-file scheme: the
    kept set batch-for-batch equals the in-memory run across a restart,
    and the manifest on disk is the versioned protocol (no
    manifest.json)."""
    uri, local = viewfs
    half = docs.count() // 3
    b1 = docs.filter(F.col("doc_id") < half)
    b2 = docs.filter((F.col("doc_id") >= half) & (F.col("doc_id") < 2 * half))
    b3 = docs.filter(F.col("doc_id") >= 2 * half)

    mem = IncrementalDeduplicator(spark, **PARAMS)
    want = [
        {r.doc_id for r in mem.add_batch(b).collect()} for b in (b1, b2, b3)
    ]

    dd = IncrementalDeduplicator(spark, state_dir=uri, **PARAMS)
    assert isinstance(dd._state.fs, HadoopStateFS)
    got1 = {r.doc_id for r in dd.add_batch(b1).collect()}
    got2 = {r.doc_id for r in dd.add_batch(b2).collect()}
    n_before = dd.n_kept
    del dd
    _restart(spark, uri)

    assert _BucketedMinhashState.exists(uri, spark)
    dd2 = IncrementalDeduplicator.open(spark, uri)
    assert dd2.n_kept == n_before
    got3 = {r.doc_id for r in dd2.add_batch(b3).collect()}
    assert [got1, got2, got3] == want

    versions = _manifest_versions(local)
    assert versions, "versioned manifests expected on the HCFS backend"
    assert not os.path.exists(os.path.join(local, "ded", "manifest.json"))


def test_viewfs_crash_orphan_invisible(spark, docs, viewfs):
    """Crash between the two inserts of one arrival: the orphan
    generation must be swept via the Hadoop delete on the next open and
    never adopted by a later commit."""
    uri, _local = viewfs
    b1 = docs.filter("doc_id < 150")
    b2 = docs.filter("doc_id >= 150 AND doc_id < 300")

    dd = IncrementalDeduplicator(spark, state_dir=uri, **PARAMS)
    kept1 = {r.doc_id for r in dd.add_batch(b1).collect()}
    committed = dd._state.committed
    spark.sql(
        f"INSERT INTO {dd._state._tb} "
        f"SELECT 999999 AS id, 0 AS band, 42 AS h, {committed + 1} AS gen"
    )
    del dd
    _restart(spark, uri)

    dd2 = IncrementalDeduplicator.open(spark, uri)
    assert dd2._state.committed == committed
    assert dd2._kept_buckets.filter("id = 999999").count() == 0
    kept2 = {r.doc_id for r in dd2.add_batch(b2).collect()}
    assert dd2._state.committed == committed + 1
    assert dd2._kept_buckets.filter("id = 999999").count() == 0

    mem = IncrementalDeduplicator(spark, **PARAMS)
    want1 = {r.doc_id for r in mem.add_batch(b1).collect()}
    want2 = {r.doc_id for r in mem.add_batch(b2).collect()}
    assert (kept1, kept2) == (want1, want2)


def test_viewfs_compact_and_zero_exchange_probe(spark, docs, viewfs):
    """compact() consolidates generations through the Hadoop sweep path,
    and the probe join keeps the bucketed zero-Exchange state side on a
    viewfs LOCATION."""
    uri, _local = viewfs
    dd = IncrementalDeduplicator(spark, state_dir=uri, state_buckets=4, **PARAMS)
    for i in range(3):
        dd.add_batch(docs.filter(f"doc_id >= {i * 60} AND doc_id < {(i + 1) * 60}"))
    gens_before = {k for _t, _p, k in dd._state._gen_dirs()}
    assert gens_before == {0, 1, 2}

    out = dd.compact()
    assert out["generation"] is not None and out["files_swept"] > 0
    gens = {}
    for t, _p, k in dd._state._gen_dirs():
        gens.setdefault(t, set()).add(k)
    assert all(len(v) == 1 for v in gens.values()), gens
    # state preserved: re-adding pre-compact docs drops them all
    assert dd.add_batch(docs.filter("doc_id < 180")).count() == 0

    probe = spark.createDataFrame(
        [(7, 3, 123456789)], "id LONG, band INT, h LONG"
    )
    j = dd._kept_buckets.select(
        "band", "h", F.col("id").alias("id_l")
    ).join(
        probe.select("band", "h", F.col("id").alias("id_r")).hint("shuffle_merge"),
        on=["band", "h"],
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "Bucketed: true" in plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_viewfs_manifest_versions_bounded_and_torn_head_falls_back(
    spark, docs, viewfs
):
    """The write-once manifest protocol: the version tail stays bounded
    across many commits, and a torn (half-written) HEAD version — the
    worst crash a store without atomic rename can expose — falls back to
    the previous committed version instead of corrupting the open."""
    uri, local = viewfs
    dd = IncrementalDeduplicator(spark, state_dir=uri, state_buckets=4, **PARAMS)
    for i in range(6):
        dd.add_batch(docs.filter(f"doc_id >= {i * 30} AND doc_id < {(i + 1) * 30}"))
    versions = _manifest_versions(local)
    # 1 create + 6 appends = 7 commits; tail keeps head + 3 predecessors
    assert len(versions) <= 4, versions
    committed = dd._state.committed
    n_kept = dd.n_kept

    # torn head: a higher version exists but is garbage (crash mid-write
    # before close on a store where create is not atomic)
    head = int(versions[-1].split("-v")[1].split(".")[0])
    torn = os.path.join(local, "ded", f"manifest-v{head + 1}.json")
    with open(torn, "w") as f:
        f.write('{"params": {"num_hashes":')  # truncated JSON
    del dd
    _restart(spark, uri)

    dd2 = IncrementalDeduplicator.open(spark, uri)
    assert dd2._state.committed == committed
    assert dd2.n_kept == n_kept
    # and the next commit moves PAST the torn version number, so the
    # recovered lineage can never be shadowed by the garbage file
    dd2.add_batch(docs.filter("doc_id >= 180 AND doc_id < 210"))
    new_head = max(
        int(v.split("-v")[1].split(".")[0]) for v in _manifest_versions(local)
    )
    assert new_head > head + 1
    got = json.loads(
        open(os.path.join(local, "ded", f"manifest-v{new_head}.json")).read()
    )
    assert got["committed_gen"] == dd2._state.committed


def test_exists_requires_spark_for_uris(spark, tmp_path, viewfs):
    uri, _local = viewfs
    with pytest.raises(ValueError, match="SparkSession"):
        _BucketedMinhashState.exists(uri)
    assert _BucketedMinhashState.exists(uri, spark) is False
    assert _BucketedMinhashState.exists(str(tmp_path / "nope")) is False


def test_io_error_reading_head_raises_not_falls_back(spark, viewfs, monkeypatch):
    """ADVICE r9: a TRANSIENT IO error reading the head manifest must
    not masquerade as a torn write. Falling back to an older version
    would regress committed_gen, and the next open's orphan sweep would
    delete generation directories the newer manifest had committed —
    permanent loss from a read blip. Decode errors (truncated content
    read successfully) still fall back; IO errors re-raise after
    bounded retries."""
    uri, _local = viewfs
    fs = resolve_statefs(spark, uri)
    fs.mkdirs()
    fs.commit_manifest({"committed_gen": 1})
    fs.commit_manifest({"committed_gen": 2})
    head = fs._manifest_versions()[-1]

    real = HadoopStateFS._read_text

    def flaky(self, path, _n=[0]):
        if path.endswith(f"manifest-v{head}.json"):
            _n[0] += 1
            raise RuntimeError("simulated transient HDFS read failure")
        return real(self, path)

    monkeypatch.setattr(HadoopStateFS, "_read_text", flaky)
    with pytest.raises(IOError, match="refusing to fall back"):
        fs.read_manifest()

    # transient means transient: fails twice, succeeds on the retry
    calls = {"n": 0}

    def recovers(self, path):
        if path.endswith(f"manifest-v{head}.json") and calls["n"] < 2:
            calls["n"] += 1
            raise RuntimeError("blip")
        return real(self, path)

    monkeypatch.setattr(HadoopStateFS, "_read_text", recovers)
    assert fs.read_manifest()["committed_gen"] == 2


class _ObjectStoreSemantics:
    """Python proxy over the JVM Hadoop FileSystem modeling an S3-class
    object store (VERDICT r9 item 6): rename onto an EXISTING
    destination returns False (no atomic rename-over-existing anywhere;
    S3 "rename" is copy+delete), and listings can be FROZEN to a stale
    snapshot to model list-after-write lag. Everything else delegates to
    the real FS, so data still lands on disk and Spark still reads it —
    only the metadata semantics the versioned-manifest protocol's
    docstring makes claims about are degraded."""

    def __init__(self, jfs):
        self._jfs = jfs
        self._stale = None  # dir-path-str -> captured FileStatus list
        self.rename_over_existing_attempts = 0

    def __getattr__(self, name):  # open/create/delete/mkdirs/exists/...
        return getattr(self._jfs, name)

    def rename(self, src, dst):
        if self._jfs.exists(dst):
            self.rename_over_existing_attempts += 1
            return False
        return self._jfs.rename(src, dst)

    def freeze_listings(self, *paths):
        self._stale = {str(p): list(self._jfs.listStatus(p)) for p in paths}

    def thaw(self):
        self._stale = None

    def listStatus(self, p):  # noqa: N802 — Hadoop method name
        if self._stale is not None and str(p) in self._stale:
            return self._stale[str(p)]
        return self._jfs.listStatus(p)


def _shim(fs: HadoopStateFS) -> _ObjectStoreSemantics:
    shim = _ObjectStoreSemantics(fs._fs)
    fs._fs = shim
    return shim


def test_manifest_protocol_never_renames_over_existing(spark, viewfs):
    """The write-once versioned protocol's core claim: every commit
    renames a tmp to a NEVER-before-used name, so it works on stores
    where rename-over-existing fails — including when a torn head from
    a crashed writer already occupies the next version number."""
    uri, _local = viewfs
    fs = resolve_statefs(spark, uri)
    shim = _shim(fs)
    fs.mkdirs()
    for gen in range(6):
        fs.commit_manifest({"committed_gen": gen})
    assert fs.read_manifest()["committed_gen"] == 5
    assert shim.rename_over_existing_attempts == 0

    # a torn head occupies the next version number (crashed writer on a
    # store where create is not atomic): the next commit must step PAST
    # it without ever attempting an overwrite
    head = fs._manifest_versions()[-1]
    fs._write_text(
        fs.join(fs.state_dir, f"manifest-v{head + 1}.json"), '{"committed_'
    )
    assert fs.read_manifest()["committed_gen"] == 5  # torn head: fallback
    fs.commit_manifest({"committed_gen": 6})
    assert fs.read_manifest()["committed_gen"] == 6
    assert fs._manifest_versions()[-1] > head + 1
    assert shim.rename_over_existing_attempts == 0

    # sanity: the shim actually degrades rename — renaming onto an
    # existing name through it fails where the raw FS would succeed
    a, b = fs.join(fs.state_dir, "x.tmp"), fs.join(fs.state_dir, "y.tmp")
    fs._write_text(a, "1")
    fs._write_text(b, "2")
    assert not fs._fs.rename(fs._jPath(a), fs._jPath(b))
    assert shim.rename_over_existing_attempts == 1


def test_stale_listing_reader_sees_consistent_predecessor(spark, viewfs):
    """List-after-write lag: a reader whose directory listing has not
    caught up to the newest commit must read the PREDECESSOR — a
    complete, committed manifest — never a torn or missing one."""
    uri, _local = viewfs
    fs = resolve_statefs(spark, uri)
    _shim(fs)
    fs.mkdirs()
    for gen in range(3):
        fs.commit_manifest({"committed_gen": gen})
    # freeze the listing as of commit 2, then commit 3 behind its back
    fs._fs.freeze_listings(fs._jPath(fs.state_dir))
    fs.commit_manifest({"committed_gen": 3})
    assert fs.read_manifest()["committed_gen"] == 2  # stale but CONSISTENT
    fs._fs.thaw()
    assert fs.read_manifest()["committed_gen"] == 3


def test_lifecycle_on_object_store_semantics(spark, docs, viewfs, monkeypatch):
    """The full dedup-state lifecycle (create, arrivals, restart,
    recovery) on a store without atomic rename-over-existing: results
    equal the in-memory run batch-for-batch and no step of the protocol
    ever needed an overwriting rename."""
    import codd_spark.operators.dedup as dedup_mod

    shims = []
    real = resolve_statefs

    def wrapped(session, sd):
        fs = real(session, sd)
        if isinstance(fs, HadoopStateFS):
            shims.append(_shim(fs))
        return fs

    monkeypatch.setattr(dedup_mod, "_resolve_statefs", wrapped)
    uri, _local = viewfs
    half = docs.count() // 3
    b1 = docs.filter(F.col("doc_id") < half)
    b2 = docs.filter((F.col("doc_id") >= half) & (F.col("doc_id") < 2 * half))
    b3 = docs.filter(F.col("doc_id") >= 2 * half)

    mem = IncrementalDeduplicator(spark, **PARAMS)
    want = [
        {r.doc_id for r in mem.add_batch(b).collect()} for b in (b1, b2, b3)
    ]

    dd = IncrementalDeduplicator(spark, state_dir=uri, **PARAMS)
    got1 = {r.doc_id for r in dd.add_batch(b1).collect()}
    got2 = {r.doc_id for r in dd.add_batch(b2).collect()}
    n_before = dd.n_kept
    del dd
    _restart(spark, uri)

    dd2 = IncrementalDeduplicator.open(spark, uri)
    assert dd2.n_kept == n_before
    got3 = {r.doc_id for r in dd2.add_batch(b3).collect()}
    assert [got1, got2, got3] == want
    assert shims and all(s.rename_over_existing_attempts == 0 for s in shims)


def test_ann_lifecycle_on_object_store_semantics(spark, viewfs, monkeypatch):
    """VERDICT r10 item 8: the persisted-ANN lifecycle (build, reopen,
    generational add_vectors, probe) under S3-class semantics —
    rename-over-existing refused, listings freezable to a stale
    snapshot. Pins annstore's claim that its manifest protocol works on
    any HCFS: no step may ever attempt an overwriting rename, and a
    grown index must probe identically to the same growth on the raw
    filesystem."""
    import codd_spark.operators.annstore as ann_mod
    from codd_spark.operators.annstore import PersistentANNIndex

    shims = []
    real = resolve_statefs

    def wrapped(session, sd):
        fs = real(session, sd)
        if isinstance(fs, HadoopStateFS):
            shims.append(_shim(fs))
        return fs

    monkeypatch.setattr(ann_mod, "resolve_statefs", wrapped)
    uri, local = viewfs
    uri = uri.rsplit("/", 1)[0] + "/ann"

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    half1 = emb.filter("vec_id % 2 = 0")
    half2 = emb.filter("vec_id % 2 = 1")
    queries = emb.filter("vec_id < 4").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )

    idx = PersistentANNIndex.build_ivf(
        spark, half1, uri, n_lists=8, trainer="sq_kmeans"
    )
    assert idx.add_vectors(half2) == half2.count()
    del idx

    reopened = PersistentANNIndex.open(spark, uri)
    assert reopened.gens == [0, 1]
    got = {
        (r.query_id, r.neighbor_id, r.cos_sim, r.rank)
        for r in reopened.top_k(queries, k=5, n_probe=3).collect()
    }

    # reference run of the identical lifecycle on the raw local FS
    import tempfile

    ref_dir = tempfile.mkdtemp(prefix="codd_ann_ref_")
    ref = PersistentANNIndex.build_ivf(
        spark, half1, ref_dir, n_lists=8, trainer="sq_kmeans"
    )
    ref.add_vectors(half2)
    want = {
        (r.query_id, r.neighbor_id, r.cos_sim, r.rank)
        for r in ref.top_k(queries, k=5, n_probe=3).collect()
    }
    assert got == want
    assert shims and all(s.rename_over_existing_attempts == 0 for s in shims)

    # stale listing across the append: a reader whose listing predates
    # the growth commit sees the BUILD-ONLY index — consistent, never torn
    fs2 = real(spark, uri)
    shim2 = _shim(fs2)
    shim2.freeze_listings(fs2._jPath(fs2.state_dir))
    import json as _json

    stale = _json.loads(
        fs2._read_text(
            fs2.join(fs2.state_dir, f"manifest-v{fs2._manifest_versions()[0]}.json")
        )
    )
    assert stale["gens"] == [0]
