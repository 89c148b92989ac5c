"""Parquet-backed persistent IVM store: stable state and the view catalog
survive a "process restart" (simulated by reopening the storage dir with a
fresh database object). Reference contract being preserved: the
stable/recent/to_add ratchet and semi-naive view maintenance of
core/src/database/instance.rs:97-206 — here with stable sets as appended
parquet batches instead of in-memory sorted runs."""

import pytest

from codd_spark import Relation, UnsupportedExpressionError
from codd_spark.streaming.store import PersistentIncrementalDatabase


def vals(rows):
    out = [tuple(r) for r in rows]
    if out and len(out[0]) == 1:
        return [t[0] for t in out]
    return out


def test_restart_roundtrip(spark, tmp_path):
    d = str(tmp_path / "db")
    db = PersistentIncrementalDatabase(spark, d)
    db.add_relation("nums", "n LONG")
    db.insert("nums", [(1,), (2,), (3,)])
    v = db.store_view(Relation("nums").select("n % 2 = 1"))
    assert vals(db.view_rows(v)) == [1, 3]
    db.insert("nums", [(4,), (5,)])
    db.stabilize()  # flush pending batches to parquet before "exit"

    db2 = PersistentIncrementalDatabase.open(spark, d)
    [v2] = [ref for ref in [v]]  # same id namespace
    assert vals(db2.view_rows(v2)) == [1, 3, 5]
    # incremental maintenance keeps working after reopen
    db2.insert("nums", [(6,), (7,), (7,), (1,)])
    assert vals(db2.view_rows(v2)) == [1, 3, 5, 7]
    assert vals(db2.evaluate(Relation("nums"))) == [1, 2, 3, 4, 5, 6, 7]


def test_restart_views_three_deep(spark, tmp_path):
    d = str(tmp_path / "db")
    db = PersistentIncrementalDatabase(spark, d)
    db.add_relation("nums", "n LONG")
    db.insert("nums", [(1,), (2,), (3,)])
    v1 = db.store_view(Relation("nums").project("n * 10 AS n"))
    v2 = db.store_view(v1.scan().select("n >= 20"))
    v3 = db.store_view(v2.scan().project("n + 1 AS n"))
    assert vals(db.view_rows(v3)) == [21, 31]
    db.stabilize()

    db2 = PersistentIncrementalDatabase.open(spark, d)
    db2.insert("nums", [(4,)])
    assert vals(db2.view_rows(v3)) == [21, 31, 41]
    # a third open sees the state the second process stabilized
    db2.stabilize()
    db3 = PersistentIncrementalDatabase.open(spark, d)
    assert vals(db3.view_rows(v3)) == [21, 31, 41]


def test_unflushed_inserts_are_not_recovered(spark, tmp_path):
    """Lazy-insert contract: batches still on to_add when the process dies
    are lost — only stabilized state is durable."""
    d = str(tmp_path / "db")
    db = PersistentIncrementalDatabase(spark, d)
    db.add_relation("nums", "n LONG")
    db.insert("nums", [(1,)])
    db.stabilize()
    db.insert("nums", [(2,)])  # never stabilized

    db2 = PersistentIncrementalDatabase.open(spark, d)
    assert vals(db2.evaluate(Relation("nums"))) == [1]


def test_non_durable_view_rejected(spark, tmp_path):
    db = PersistentIncrementalDatabase(spark, str(tmp_path / "db"))
    db.add_relation("nums", "n LONG")
    with pytest.raises(UnsupportedExpressionError, match="picklable"):
        db.store_view(Relation("nums").select(lambda df: df["n"] > 1))
    # and nothing half-registered: a durable view still gets id 0
    v = db.store_view(Relation("nums").select("n > 1"))
    assert v.id == 0


def test_compaction_bounds_file_count(spark, tmp_path):
    import os

    from codd_spark.streaming import store as store_mod

    d = str(tmp_path / "db")
    db = PersistentIncrementalDatabase(spark, d)
    db.add_relation("nums", "n LONG")
    v = db.store_view(Relation("nums").select("n >= 0"))
    # force frequent compaction so the test exercises the rewrite+swap
    old = store_mod._COMPACT_FILE_LIMIT
    store_mod._COMPACT_FILE_LIMIT = 6
    try:
        for i in range(10):
            db.insert("nums", [(i,)])
            db.stabilize()
    finally:
        store_mod._COMPACT_FILE_LIMIT = old
    rel_dir = os.path.join(d, "rel", "nums")
    n_files = sum(1 for f in os.listdir(rel_dir) if f.endswith(".parquet"))
    assert n_files <= 10, n_files
    assert vals(db.view_rows(v)) == list(range(10))
    # compacted state survives reopen
    db2 = PersistentIncrementalDatabase.open(spark, d)
    assert vals(db2.view_rows(v)) == list(range(10))


def _force_compact(db, relation="nums", rows=10):
    """Insert row-by-row under a tiny compaction limit so compact() runs."""
    import codd_spark.streaming.store as store_mod

    old = store_mod._COMPACT_FILE_LIMIT
    store_mod._COMPACT_FILE_LIMIT = 6
    try:
        for i in range(rows):
            db.insert(relation, [(i,)])
            db.stabilize()
    finally:
        store_mod._COMPACT_FILE_LIMIT = old


def test_compaction_crash_between_renames_recovers(spark, tmp_path, monkeypatch):
    """Kill-between-steps: os.rename fails once right after the live dir
    was moved aside (the worst window — no dataset at `path`). compact()
    must roll the old generation back in-process, and a subsequent reopen
    must see every row; the manifest/catalog never points at a
    half-written generation."""
    import os as os_mod

    import codd_spark.streaming.store as store_mod

    d = str(tmp_path / "db")
    db = PersistentIncrementalDatabase(spark, d)
    db.add_relation("nums", "n LONG")
    v = db.store_view(Relation("nums").select("n >= 0"))

    real_rename = os_mod.rename
    state = {"armed": False, "fired": False}

    def failing_rename(src, dst):
        # fail exactly once, on the SECOND rename of a compact() swap
        # (tmp -> path), i.e. after the live dir was moved to .old
        if state["armed"] and not state["fired"] and src.endswith(".compacting"):
            state["fired"] = True
            raise OSError("injected crash between compaction renames")
        return real_rename(src, dst)

    monkeypatch.setattr(store_mod.os, "rename", failing_rename)
    state["armed"] = True
    old_limit = store_mod._COMPACT_FILE_LIMIT
    store_mod._COMPACT_FILE_LIMIT = 6
    try:
        for i in range(10):
            db.insert("nums", [(i,)])
            try:
                db.stabilize()
            except OSError:
                # compact re-raised after rolling back; the engine keeps
                # accepting inserts afterwards
                db.stabilize()
    finally:
        store_mod._COMPACT_FILE_LIMIT = old_limit
    assert state["fired"], "the injected failure never triggered"
    # in-process rollback: data intact without reopening
    assert vals(db.view_rows(v)) == list(range(10))

    # and a fresh open (process restart) also sees a complete generation
    monkeypatch.setattr(store_mod.os, "rename", real_rename)
    db2 = PersistentIncrementalDatabase.open(spark, d)
    assert vals(db2.view_rows(v)) == list(range(10))


def test_compaction_hard_crash_repaired_at_open(spark, tmp_path):
    """Simulate a process death inside the rename window (live dir at
    .old, none at path): open() must restore the .old generation."""
    import os
    import shutil

    d = str(tmp_path / "db")
    db = PersistentIncrementalDatabase(spark, d)
    db.add_relation("nums", "n LONG")
    v = db.store_view(Relation("nums").select("n >= 0"))
    db.insert("nums", [(i,) for i in range(5)])
    db.stabilize()

    rel_dir = os.path.join(d, "rel", "nums")
    os.rename(rel_dir, rel_dir + ".old")           # mid-swap state
    shutil.copytree(rel_dir + ".old", rel_dir + ".compacting")

    db2 = PersistentIncrementalDatabase.open(spark, d)
    assert vals(db2.view_rows(v)) == list(range(5))
    assert not os.path.exists(rel_dir + ".old")
    assert not os.path.exists(rel_dir + ".compacting")


def test_persistent_clone_survives_compaction(spark, tmp_path):
    """clone() of a parquet-backed db is decoupled from the live directory:
    compaction rewrites files under the original, the snapshot still reads
    its frozen state (localCheckpoint in _ParquetInstance.snapshot)."""
    d = str(tmp_path / "db")
    db = PersistentIncrementalDatabase(spark, d)
    db.add_relation("nums", "n LONG")
    v = db.store_view(Relation("nums").select("n % 2 = 0"))
    db.insert("nums", [(0,), (1,), (2,)])
    db.stabilize()

    snap = db.clone()
    _force_compact(db, rows=10)  # rewrites the original's directories

    assert vals(snap.view_rows(v)) == [0, 2]
    assert vals(snap.evaluate(Relation("nums"))) == [0, 1, 2]
    assert vals(db.view_rows(v)) == [0, 2, 4, 6, 8]
    # clone is insert-isolated too
    snap.insert("nums", [(100,)])
    assert vals(snap.view_rows(v)) == [0, 2, 100]
    assert vals(db.view_rows(v)) == [0, 2, 4, 6, 8]
