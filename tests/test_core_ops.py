"""Per-operator unit tests on tiny literal relations — mirrors the
reference's test strategy (core/src/database/evaluate.rs:742-1604): each
operator on empty input, populated input, chained on itself, and error
cases. Golden outputs are sorted distinct vectors (canonical order)."""

import pytest
from pyspark.sql import functions as F

from codd_spark import (
    Database,
    Difference,
    Empty,
    Full,
    Relation,
    Singleton,
    UnsupportedExpressionError,
    InstanceExistsError,
    InstanceNotFoundError,
)


def vals(rows):
    """Rows -> list of plain tuples (single-col rows -> scalars)."""
    out = [tuple(r) for r in rows]
    if out and len(out[0]) == 1:
        return [t[0] for t in out]
    return out


@pytest.fixture()
def nums(db):
    db.add_relation("nums", "n LONG")
    db.insert("nums", [(4,), (2,), (1,), (3,), (2,)])  # dup on purpose
    return db


# -- leaves ---------------------------------------------------------------

def test_relation_scan(nums):
    # reference: evaluate.rs:773-787
    assert vals(nums.evaluate(Relation("nums"))) == [1, 2, 3, 4]


def test_relation_missing(db):
    with pytest.raises(InstanceNotFoundError):
        db.evaluate(Relation("ghost"))


def test_add_relation_twice(db):
    db.add_relation("r", "n LONG")
    with pytest.raises(InstanceExistsError):
        db.add_relation("r", "n LONG")


def test_empty(db):
    # reference: evaluate.rs:755-762
    assert nums_eval(db, Empty("n LONG")) == []


def nums_eval(db, expr):
    return vals(db.evaluate(expr))


def test_singleton(db):
    # reference: evaluate.rs:764-771
    assert nums_eval(db, Singleton({"n": 42})) == [42]


def test_full_errors(db):
    # reference: evaluate.rs:747-753 — Full always errors
    with pytest.raises(UnsupportedExpressionError):
        db.evaluate(Full())
    with pytest.raises(UnsupportedExpressionError):
        db.evaluate(Full().select("true"))


# -- unary ----------------------------------------------------------------

def test_select(nums):
    # reference: evaluate.rs:828-872
    assert nums_eval(nums, Relation("nums").select("n % 2 = 0")) == [2, 4]
    # select-of-select (evaluate.rs:855-864)
    assert nums_eval(nums, Relation("nums").select("n > 1").select("n < 4")) == [2, 3]
    # Column-callable predicate (codd closure analogue)
    assert nums_eval(nums, Relation("nums").select(lambda df: df["n"] >= 3)) == [3, 4]


def test_project_computes(nums):
    # reference: evaluate.rs:790-826 — project maps, e.g. x10 then +1
    e = Relation("nums").project("n * 10 AS n").project("n + 1 AS n")
    assert nums_eval(nums, e) == [11, 21, 31, 41]


def test_project_collapses_to_set(nums):
    # projection can collapse rows; set semantics dedups
    assert nums_eval(nums, Relation("nums").project("n % 2 AS parity")) == [0, 1]


# -- binary set ops -------------------------------------------------------

@pytest.fixture()
def two_sets(db):
    db.add_relation("a", "n LONG")
    db.add_relation("b", "n LONG")
    db.insert("a", [(1,), (2,), (3,)])
    db.insert("b", [(2,), (3,), (4,), (4,)])
    return db


def test_union_set_semantics(two_sets):
    # reference: macros.rs:304-329 — duplicates collapse
    e = Relation("a").union(Relation("b"))
    assert nums_eval(two_sets, e) == [1, 2, 3, 4]


def test_intersect(two_sets):
    assert nums_eval(two_sets, Relation("a").intersect(Relation("b"))) == [2, 3]


def test_difference(two_sets):
    assert nums_eval(two_sets, Relation("a").difference(Relation("b"))) == [1]
    assert nums_eval(two_sets, Relation("b").difference(Relation("a"))) == [4]


def test_binary_with_empty(two_sets):
    empty = Empty("n LONG")
    assert nums_eval(two_sets, Relation("a").union(empty)) == [1, 2, 3]
    assert nums_eval(two_sets, Relation("a").intersect(empty)) == []
    assert nums_eval(two_sets, Relation("a").difference(empty)) == [1, 2, 3]
    assert nums_eval(two_sets, empty.difference(Relation("a"))) == []


# -- product & join -------------------------------------------------------

def test_product_mapper(two_sets):
    # reference: evaluate.rs:874-959 — product with fused sum mapper
    e = Relation("a").product(
        Relation("b"), mapper=lambda l, r: [(l["n"] + r["n"]).alias("s")]
    )
    assert nums_eval(two_sets, e) == [3, 4, 5, 6, 7]


def test_product_default_columns(two_sets):
    e = Relation("a").product(Relation("b"))
    rows = two_sets.evaluate(e)
    assert rows[0].__fields__ == ["n", "n_r"]
    assert len(rows) == 9  # 3 x 3 distinct


@pytest.fixture()
def kv(db):
    db.add_relation("kv_l", "k LONG, v STRING")
    db.add_relation("kv_r", "k LONG, w STRING")
    db.insert("kv_l", [(1, "a"), (1, "b"), (2, "c"), (9, "z")])
    db.insert("kv_r", [(1, "x"), (2, "y"), (2, "y2"), (7, "q")])
    return db


def test_join_many_to_many(kv):
    # reference: evaluate.rs:961-1102, dup keys macros.rs:286-292
    e = Relation("kv_l").join(
        Relation("kv_r"),
        left_key=["k"],
        mapper=lambda l, r: [l["v"].alias("v"), r["w"].alias("w")],
    )
    assert nums_eval(kv, e) == [
        ("a", "x"), ("b", "x"), ("c", "y"), ("c", "y2"),
    ]


def test_join_builder_chain(kv):
    # builder parity: l.with_key(k).join(r.with_key(k)).on(mapper)
    e = (
        Relation("kv_l")
        .with_key("k")
        .join(Relation("kv_r").with_key("k"))
        .on(lambda l, r: [l["k"].alias("k"), r["w"].alias("w")])
    )
    assert nums_eval(kv, e) == [(1, "x"), (2, "y"), (2, "y2")]


def test_join_null_safe_keys(db):
    # codd joins Option keys where None == None matches
    # (core/examples/music.rs:165-167)
    db.add_relation("l", "k STRING, v LONG")
    db.add_relation("r", "k STRING, w LONG")
    db.insert("l", [("a", 1), (None, 2)])
    db.insert("r", [("a", 10), (None, 20)])
    e = Relation("l").join(
        Relation("r"), left_key=["k"],
        mapper=lambda l, r: [(l["v"] + r["w"]).alias("s")],
    )
    assert nums_eval(db, e) == [11, 22]
    # and with null_safe=False NULLs drop (SQL semantics)
    e2 = Relation("l").join(
        Relation("r"), left_key=["k"], null_safe=False,
        mapper=lambda l, r: [(l["v"] + r["w"]).alias("s")],
    )
    assert nums_eval(db, e2) == [11]


def test_join_chained_select_project(kv):
    e = (
        Relation("kv_l")
        .join(Relation("kv_r"), left_key=["k"])
        .select("k < 2")
        .project("v")
    )
    assert nums_eval(kv, e) == ["a", "b"]


# -- extensions beyond the reference: join types -------------------------

def test_semi_anti_join(kv):
    semi = Relation("kv_l").join(Relation("kv_r"), left_key=["k"], how="semi")
    assert nums_eval(kv, semi) == [(1, "a"), (1, "b"), (2, "c")]
    anti = Relation("kv_l").join(Relation("kv_r"), left_key=["k"], how="anti")
    assert nums_eval(kv, anti) == [(9, "z")]


# -- set semantics after insert ------------------------------------------

def test_insert_duplicate_ignored(nums):
    nums.insert("nums", [(1,), (5,)])
    assert nums_eval(nums, Relation("nums")) == [1, 2, 3, 4, 5]


def test_clone_snapshot_isolation(nums):
    # reference: database.rs:410-441
    snap = nums.clone()
    nums.insert("nums", [(99,)])
    assert nums_eval(snap, Relation("nums")) == [1, 2, 3, 4]
    assert nums_eval(nums, Relation("nums")) == [1, 2, 3, 4, 99]


def test_asof_range_ast_nodes(spark, db):
    """Extension joins as algebra nodes: compose with σ/π, compile through
    the same recursion, and respect view-safety (as-of is non-monotone)."""
    import datetime

    import pytest as _pytest
    from pyspark.sql import functions as F

    from codd_spark.errors import UnsupportedExpressionError
    from codd_spark.plans.ast import Relation

    TS = datetime.datetime.fromisoformat
    db.register("trades", spark.createDataFrame(
        [(1, TS("2024-01-01 10:00:10"), 100)], "k LONG, ts TIMESTAMP, qty LONG"))
    db.register("quotes", spark.createDataFrame(
        [(1, TS("2024-01-01 10:00:00"), 9.0)], "k LONG, ts TIMESTAMP, px DOUBLE"))

    e = Relation("trades").asof_join(Relation("quotes"), on=["k"], left_ts="ts", right_ts="ts")
    rows = db.evaluate(e.select("px IS NOT NULL"))
    assert len(rows) == 1 and rows[0].px == 9.0

    # non-monotone -> rejected under stored views, like Difference
    with _pytest.raises(UnsupportedExpressionError, match="AsofJoin"):
        db.store_view(e)

    db.register("points", spark.createDataFrame([(5.0,), (50.0,)], "p DOUBLE"))
    db.register("bands", spark.createDataFrame(
        [(0.0, 10.0, "low")], "s DOUBLE, e DOUBLE, name STRING"))
    r = Relation("points").range_join(Relation("bands"), "p", "s", "e", bucket_width=10.0)
    got = db.evaluate(r.project("p", "name"))
    assert [(x.p, x.name) for x in got] == [(5.0, "low")]
    # monotone -> view-safe
    ref = db.store_view(r)
    assert len(db.view_df(ref).collect()) == 1
