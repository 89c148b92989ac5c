"""Materialized-view tests — parity with the reference's view/IVM tests
(core/src/database/evaluate.rs:1363-1604; core/src/database.rs:463-524):
views stay consistent as base relations grow, views stack 3-deep, views
over Difference are rejected."""

import pytest

from codd_spark import Relation, UnsupportedExpressionError, InstanceNotFoundError


def vals(rows):
    out = [tuple(r) for r in rows]
    if out and len(out[0]) == 1:
        return [t[0] for t in out]
    return out


@pytest.fixture()
def nums(db):
    db.add_relation("nums", "n LONG")
    db.insert("nums", [(1,), (2,), (3,)])
    return db


def test_view_basic_and_updates(nums):
    v = nums.store_view(Relation("nums").select("n % 2 = 1"))
    assert vals(nums.evaluate(v.scan())) == [1, 3]
    nums.insert("nums", [(4,), (5,)])
    assert vals(nums.evaluate(v.scan())) == [1, 3, 5]


def test_views_stack_three_deep(nums):
    # reference: evaluate.rs:1374-1391
    v1 = nums.store_view(Relation("nums").project("n * 10 AS n"))
    v2 = nums.store_view(v1.scan().select("n >= 20"))
    v3 = nums.store_view(v2.scan().project("n + 1 AS n"))
    assert vals(nums.evaluate(v3.scan())) == [21, 31]
    nums.insert("nums", [(4,)])
    assert vals(nums.evaluate(v3.scan())) == [21, 31, 41]


def test_view_over_join_updates(db):
    db.add_relation("l", "k LONG, v STRING")
    db.add_relation("r", "k LONG, w STRING")
    db.insert("l", [(1, "a"), (2, "b")])
    db.insert("r", [(1, "x")])
    v = db.store_view(
        Relation("l").join(
            Relation("r"), left_key=["k"],
            mapper=lambda l, r: [l["v"].alias("v"), r["w"].alias("w")],
        )
    )
    assert vals(db.evaluate(v.scan())) == [("a", "x")]
    db.insert("r", [(2, "y")])
    assert vals(db.evaluate(v.scan())) == [("a", "x"), ("b", "y")]


def test_view_over_difference_rejected(db):
    # reference: validate.rs:21-33, view.rs:43-45
    db.add_relation("a", "n LONG")
    db.add_relation("b", "n LONG")
    with pytest.raises(UnsupportedExpressionError):
        db.store_view(Relation("a").difference(Relation("b")))


def test_view_missing_relation_rejected(db):
    with pytest.raises(InstanceNotFoundError):
        db.store_view(Relation("ghost").select("true"))


def test_view_duplicate_inserts_ignored(nums):
    # set semantics through views (reference: macros.rs:366-380)
    v = nums.store_view(Relation("nums").select("n > 0"))
    nums.insert("nums", [(1,), (1,), (9,)])
    assert vals(nums.evaluate(v.scan())) == [1, 2, 3, 9]


def test_database_to_sql_renders_with_catalog_schemas(spark, db):
    """Database.to_sql supplies relation schemas from the catalog, so the
    schema-dependent AsofJoin node renders without a manual schema dict
    and the rendered SQL agrees with the engine's evaluation via DuckDB."""
    import duckdb
    import pandas as pd

    from codd_spark.plans.ast import Relation

    lrows = [(1, 10, 5), (1, 20, 6), (2, 15, 7)]
    rrows = [(1, 9, 100), (1, 15, 200), (2, 1, 300)]
    db.register("tosql_l", spark.createDataFrame(lrows, "k LONG, lts LONG, v LONG"), replace=True)
    db.register("tosql_r", spark.createDataFrame(rrows, "k LONG, rts LONG, v LONG"), replace=True)
    expr = Relation("tosql_l").asof_join(Relation("tosql_r"), ["k"], "lts", "rts")
    sql = db.to_sql(expr)

    got = sorted(tuple(r) for r in db.evaluate(expr))
    con = duckdb.connect()
    con.register("tosql_l", pd.DataFrame(lrows, columns=["k", "lts", "v"]))
    con.register("tosql_r", pd.DataFrame(rrows, columns=["k", "rts", "v"]))
    want = sorted(
        tuple(r)
        for r in con.execute(f"SELECT DISTINCT * FROM ({sql})").fetchall()
    )
    assert got == want
