"""Incremental view maintenance tests — parity with the reference's IVM
tests (core/src/database/evaluate.rs:1363-1604, database.rs:365-533,
macros.rs:366-380) plus an equivalence check against the recompute engine.
"""

import random

import pytest

from codd_spark import Database, Relation, UnsupportedExpressionError
from codd_spark.streaming.incremental import IncrementalDatabase


def vals(rows):
    out = [tuple(r) for r in rows]
    if out and len(out[0]) == 1:
        return [t[0] for t in out]
    return out


@pytest.fixture()
def idb(spark):
    return IncrementalDatabase(spark)


def test_view_updates_incrementally(idb):
    idb.add_relation("nums", "n LONG")
    idb.insert("nums", [(1,), (2,), (3,)])
    v = idb.store_view(Relation("nums").select("n % 2 = 1"))
    assert vals(idb.view_rows(v)) == [1, 3]
    idb.insert("nums", [(4,), (5,), (5,), (1,)])  # dups must be ignored
    assert vals(idb.view_rows(v)) == [1, 3, 5]


def test_views_three_deep_cascade(idb):
    # reference: evaluate.rs:1374-1391
    idb.add_relation("nums", "n LONG")
    idb.insert("nums", [(1,), (2,), (3,)])
    v1 = idb.store_view(Relation("nums").project("n * 10 AS n"))
    v2 = idb.store_view(v1.scan().select("n >= 20"))
    v3 = idb.store_view(v2.scan().project("n + 1 AS n"))
    assert vals(idb.view_rows(v3)) == [21, 31]
    idb.insert("nums", [(4,)])
    assert vals(idb.view_rows(v3)) == [21, 31, 41]
    # insert a duplicate: no change anywhere
    idb.insert("nums", [(4,)])
    assert vals(idb.view_rows(v3)) == [21, 31, 41]


def test_view_over_join_delta_rules(idb):
    idb.add_relation("l", "k LONG, v STRING")
    idb.add_relation("r", "k LONG, w STRING")
    idb.insert("l", [(1, "a"), (2, "b")])
    idb.insert("r", [(1, "x")])
    v = idb.store_view(
        Relation("l").join(
            Relation("r"), left_key=["k"],
            mapper=lambda l, r: [l["v"].alias("v"), r["w"].alias("w")],
        )
    )
    assert vals(idb.view_rows(v)) == [("a", "x")]
    # ΔR joins stable L
    idb.insert("r", [(2, "y")])
    assert vals(idb.view_rows(v)) == [("a", "x"), ("b", "y")]
    # ΔL joins stable R, and ΔL⋈ΔR when both change in one batch
    idb.insert("l", [(2, "c")])
    idb.insert("r", [(3, "z")])
    idb.insert("l", [(3, "d")])
    assert vals(idb.view_rows(v)) == [("a", "x"), ("b", "y"), ("c", "y"), ("d", "z")]


def test_view_over_intersect_delta(idb):
    idb.add_relation("a", "n LONG")
    idb.add_relation("b", "n LONG")
    idb.insert("a", [(1,), (2,)])
    idb.insert("b", [(2,), (3,)])
    v = idb.store_view(Relation("a").intersect(Relation("b")))
    assert vals(idb.view_rows(v)) == [2]
    idb.insert("a", [(3,)])
    assert vals(idb.view_rows(v)) == [2, 3]
    idb.insert("b", [(1,)])
    assert vals(idb.view_rows(v)) == [1, 2, 3]


def test_view_over_union_and_view_scan_combination(idb):
    idb.add_relation("a", "n LONG")
    idb.add_relation("b", "n LONG")
    idb.insert("a", [(1,)])
    idb.insert("b", [(10,)])
    v_union = idb.store_view(Relation("a").union(Relation("b")))
    v_big = idb.store_view(v_union.scan().select("n >= 10"))
    assert vals(idb.view_rows(v_big)) == [10]
    idb.insert("a", [(20,)])
    idb.insert("b", [(2,)])
    assert vals(idb.view_rows(v_big)) == [10, 20]


def test_difference_view_rejected_but_query_ok(idb):
    idb.add_relation("a", "n LONG")
    idb.add_relation("b", "n LONG")
    idb.insert("a", [(1,), (2,)])
    idb.insert("b", [(2,)])
    with pytest.raises(UnsupportedExpressionError):
        idb.store_view(Relation("a").difference(Relation("b")))
    # ad-hoc difference evaluation is fine
    assert vals(idb.evaluate(Relation("a").difference(Relation("b")))) == [1]


def test_incremental_matches_recompute_randomized(spark, idb):
    """Property: after an arbitrary insert schedule, every view equals the
    recompute engine's answer (the reference uses recompute-style asserts
    in its IVM tests, e.g. evaluate.rs:1420-1460)."""
    rdb = Database(spark)
    for db in (idb, rdb):
        db.add_relation("l", "k LONG, v LONG")
        db.add_relation("r", "k LONG, w LONG")
    expr = (
        Relation("l")
        .join(Relation("r"), left_key=["k"],
              mapper=lambda l, r: [l["k"].alias("k"), (l["v"] + r["w"]).alias("s")])
        .select("s % 2 = 0")
    )
    iv = idb.store_view(expr)
    rv = rdb.store_view(expr)

    rng = random.Random(13)
    for step in range(4):
        for rel in ("l", "r"):
            batch = [(rng.randrange(5), rng.randrange(10)) for _ in range(rng.randrange(1, 6))]
            idb.insert(rel, batch)
            rdb.insert(rel, batch)
        got = vals(idb.view_rows(iv))
        want = vals(rdb.evaluate(rv.scan()))
        assert got == want, f"divergence at step {step}"


def test_join_how_respected_incrementally(idb):
    """Round-4 regression: the incremental evaluator used to ignore
    Join.how entirely — semi/anti/outer joins all silently computed the
    INNER join (ad-hoc and under views). Semi is monotone and must be
    maintained by the binary delta rule; anti/outer are non-monotone and
    must be rejected under views but evaluate correctly ad-hoc."""
    idb.add_relation("l", "n LONG")
    idb.add_relation("r", "n LONG")
    idb.insert("l", [(1,), (2,), (3,)])
    idb.insert("r", [(2,)])

    semi = Relation("l").join(Relation("r"), left_key=["n"], how="semi")
    anti = Relation("l").join(Relation("r"), left_key=["n"], how="anti")
    left = Relation("l").join(
        Relation("r"), left_key=["n"], how="left",
        mapper=lambda l, r: [l["n"].alias("n"), r["n"].alias("m")],
    )
    assert vals(idb.evaluate(semi)) == [2]
    assert vals(idb.evaluate(anti)) == [1, 3]
    assert vals(idb.evaluate(left)) == [(1, None), (2, 2), (3, None)]

    v = idb.store_view(semi)
    assert vals(idb.view_rows(v)) == [2]
    # ΔR joins stable L; ΔL joins stable R; dup inserts are no-ops
    idb.insert("r", [(3,), (3,)])
    assert vals(idb.view_rows(v)) == [2, 3]
    idb.insert("l", [(5,)])
    idb.insert("r", [(5,)])
    assert vals(idb.view_rows(v)) == [2, 3, 5]

    for bad in (anti, left):
        with pytest.raises(UnsupportedExpressionError):
            idb.store_view(bad)


def test_incremental_range_join_view(spark):
    """RangeJoin is monotone -> allowed under IVM views and maintained by
    the standard binary delta rule as both sides grow."""
    from codd_spark.plans.ast import Relation
    from codd_spark.streaming.incremental import IncrementalDatabase

    db = IncrementalDatabase(spark)
    db.add_relation("points", "p DOUBLE")
    db.add_relation("bands", "s DOUBLE, e DOUBLE, name STRING")
    db.insert("points", [(5.0,), (25.0,)])
    db.insert("bands", [(0.0, 10.0, "low")])
    ref = db.store_view(
        Relation("points").range_join(
            Relation("bands"), "p", "s", "e", bucket_width=10.0
        ).project("p", "name")
    )
    assert [(r.p, r.name) for r in db.view_rows(ref)] == [(5.0, "low")]
    # growing either side flows through the delta rules
    db.insert("bands", [(20.0, 30.0, "mid")])
    db.insert("points", [(7.0,)])
    got = sorted((r.p, r.name) for r in db.view_rows(ref))
    assert got == [(5.0, "low"), (7.0, "low"), (25.0, "mid")]


def test_incremental_clone_snapshot_isolation(idb):
    """IVM twin of test_clone_snapshot_isolation (reference:
    core/src/database.rs:345-363, test database.rs:410-441): the clone
    carries the maintained view STATE (no recompute), and inserts into
    either copy leave the other's relations AND views untouched."""
    idb.add_relation("nums", "n LONG")
    idb.insert("nums", [(1,), (2,), (3,)])
    v = idb.store_view(Relation("nums").select("n % 2 = 1"))
    assert vals(idb.view_rows(v)) == [1, 3]

    snap = idb.clone()

    # insert into the ORIGINAL: clone's relation and view stay frozen
    idb.insert("nums", [(5,)])
    assert vals(idb.view_rows(v)) == [1, 3, 5]
    assert vals(snap.view_rows(v)) == [1, 3]
    assert vals(snap.evaluate(Relation("nums"))) == [1, 2, 3]

    # insert into the CLONE: its views maintain incrementally, original
    # unaffected (including the row the original already took)
    snap.insert("nums", [(7,)])
    assert vals(snap.view_rows(v)) == [1, 3, 7]
    assert vals(idb.view_rows(v)) == [1, 3, 5]
    assert vals(idb.evaluate(Relation("nums"))) == [1, 2, 3, 5]


def test_incremental_clone_carries_pending_batches(idb):
    """Batches queued on to_add at clone time belong to the snapshot:
    both copies see them after their own next stabilize, independently."""
    idb.add_relation("nums", "n LONG")
    idb.insert("nums", [(1,), (2,)])
    v = idb.store_view(Relation("nums").project("n * 10 AS n"))
    idb.insert("nums", [(3,)])          # pending, not yet stabilized
    snap = idb.clone()
    assert vals(snap.view_rows(v)) == [10, 20, 30]
    assert vals(idb.view_rows(v)) == [10, 20, 30]
    snap.insert("nums", [(4,)])
    assert vals(snap.view_rows(v)) == [10, 20, 30, 40]
    assert vals(idb.view_rows(v)) == [10, 20, 30]
