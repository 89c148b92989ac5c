"""Cross-database ViewRef guard + insert schema guard (VERDICT r12
items 5 and 6).

Reference parity: evaluating an expression against the wrong database
is an error in the reference (core/src/database/evaluate.rs:781-787,
the wrong-db relation test), and its statically-typed ``insert``
(core/src/database.rs:203-210) cannot mis-bind a batch. Here ViewRefs
are stamped with a per-view mint token checked at resolution, and
DataFrame inserts are schema-checked before any rows are appended.
"""

import pytest

from codd_spark import (
    Database,
    InstanceNotFoundError,
    Relation,
    SchemaMismatchError,
)
from codd_spark.streaming.incremental import IncrementalDatabase


def _mkdb(spark):
    db = Database(spark)
    db.add_relation("r", "a INT, b STRING")
    db.insert("r", [(1, "x"), (2, "y")])
    return db


# -- cross-database ViewRef guard ---------------------------------------


def test_foreign_viewref_rejected(spark):
    """A ref minted by db1 must not resolve against db2's view of the
    same integer id (both counters start at 0, so ids collide by
    construction)."""
    db1, db2 = _mkdb(spark), _mkdb(spark)
    ref1 = db1.store_view(Relation("r").select("a > 0"))
    ref2 = db2.store_view(Relation("r").select("a > 1"))
    assert ref1.id == ref2.id  # the collision this guard exists for
    db1.view_df(ref1)  # own ref fine
    with pytest.raises(InstanceNotFoundError, match="different database"):
        db2.view_df(ref1)
    with pytest.raises(InstanceNotFoundError, match="different database"):
        db1.view_df(ref2)


def test_preclone_viewref_valid_in_both_copies(spark):
    """clone() snapshots views WITH their mint tokens: a pre-clone ref
    keeps resolving in both copies (it names the same view in each)."""
    db = _mkdb(spark)
    ref = db.store_view(Relation("r").select("a > 0"))
    snap = db.clone()
    assert [r.a for r in db.evaluate(ref.scan())] == [1, 2]
    assert [r.a for r in snap.evaluate(ref.scan())] == [1, 2]


def test_postclone_viewref_rejected_across_fork(spark):
    """Views minted AFTER the fork get fresh tokens, so their refs are
    rejected by the other copy even though the integer ids collide."""
    db = _mkdb(spark)
    snap = db.clone()
    ref_orig = db.store_view(Relation("r").select("a > 0"))
    ref_snap = snap.store_view(Relation("r").select("a > 1"))
    assert ref_orig.id == ref_snap.id
    db.view_df(ref_orig)
    snap.view_df(ref_snap)
    with pytest.raises(InstanceNotFoundError, match="different database"):
        snap.view_df(ref_orig)
    with pytest.raises(InstanceNotFoundError, match="different database"):
        db.view_df(ref_snap)


def test_bare_int_and_legacy_refs_still_resolve(spark):
    """The integer / empty-token paths stay open (internal callers and
    hand-built refs): only a non-empty mismatching token is rejected."""
    from codd_spark.database import ViewRef

    db = _mkdb(spark)
    ref = db.store_view(Relation("r").select("a > 0"))
    assert db.view_df(ref.id).count() == 2
    assert db.view_df(ViewRef(ref.id)).count() == 2  # legacy, no token


def test_incremental_foreign_viewref_rejected(spark):
    def mk():
        idb = IncrementalDatabase(spark)
        idb.add_relation("r", "a INT")
        idb.insert("r", [(1,), (2,)])
        return idb

    db1, db2 = mk(), mk()
    ref1 = db1.store_view(Relation("r").select("a > 0"))
    db2.store_view(Relation("r").select("a > 1"))
    assert db1.view_rows(ref1)
    with pytest.raises(InstanceNotFoundError, match="different database"):
        db2.view_rows(ref1)
    # pre-clone ref valid in the clone; post-clone refs rejected across
    snap = db1.clone()
    assert snap.view_rows(ref1) == db1.view_rows(ref1)
    ref_snap = snap.store_view(Relation("r").select("a > 1"))
    ref_post = db1.store_view(Relation("r").select("a >= 1"))
    assert ref_post.id == ref_snap.id  # counters collide post-fork
    with pytest.raises(InstanceNotFoundError, match="different database"):
        db1.view_rows(ref_snap)
    with pytest.raises(InstanceNotFoundError, match="different database"):
        snap.view_rows(ref_post)


# -- insert schema guard -------------------------------------------------


def test_insert_arity_mismatch_raises(spark):
    db = _mkdb(spark)
    bad = spark.createDataFrame([(3, "z", 9)], "a INT, b STRING, c INT")
    with pytest.raises(SchemaMismatchError, match="expected 2 columns"):
        db.insert("r", bad)


def test_insert_dtype_mismatch_names_the_column(spark):
    db = _mkdb(spark)
    bad = spark.createDataFrame([(3, 9)], "a INT, b INT")
    with pytest.raises(SchemaMismatchError, match="column 'b' expects string"):
        db.insert("r", bad)


def test_insert_permuted_names_rejected(spark):
    """The worst silent mis-bind: right names, wrong order — positional
    union would bind b under a without a whisper."""
    db = Database(spark)
    db.add_relation("t", "a STRING, b STRING")
    swapped = spark.createDataFrame([("bee", "ay")], "b STRING, a STRING")
    with pytest.raises(SchemaMismatchError, match="different order"):
        db.insert("t", swapped)


def test_insert_positional_contract_preserved(spark):
    """Same types under DIFFERENT names still binds positionally (the
    reference's tuples carry no names at all) — and a well-formed batch
    appends as before."""
    db = _mkdb(spark)
    db.insert("r", spark.createDataFrame([(3, "z")], "x INT, y STRING"))
    db.insert("r", spark.createDataFrame([(4, "w")], "a INT, b STRING"))
    assert [r.a for r in db.evaluate(Relation("r"))] == [1, 2, 3, 4]


def test_incremental_insert_schema_checked(spark):
    idb = IncrementalDatabase(spark)
    idb.add_relation("r", "a INT, b STRING")
    with pytest.raises(SchemaMismatchError):
        idb.insert("r", spark.createDataFrame([(1, 2)], "a INT, b INT"))
