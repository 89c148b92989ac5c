"""DSL + SQL surface tests — mirrors the reference's macro tests
(core/src/macros.rs:112-382): each DSL form produces the same results as
the builder API, plus full Spark SQL over the catalog."""

import pytest

from codd_spark import Relation, UnsupportedExpressionError


def vals(rows):
    out = [tuple(r) for r in rows]
    if out and len(out[0]) == 1:
        return [t[0] for t in out]
    return out


@pytest.fixture()
def db2(db):
    db.execute('create relation "nums":<n LONG>')
    db.execute("insert into (nums) values [4, 2, 1, 3, 2]")
    db.execute('create relation "kv_l":<k LONG, v STRING>')
    db.execute("insert into (kv_l) values [(1, 'a'), (2, 'b'), (9, 'z')]")
    db.execute('create relation "kv_r":<k LONG, w STRING>')
    db.execute("insert into (kv_r) values [(1, 'x'), (2, 'y')]")
    return db


def test_create_insert_scan(db2):
    assert vals(db2.execute("select [*] from (nums)")) == [1, 2, 3, 4]


def test_select_where_project(db2):
    # macros.rs: relexp!(select [proj] from (r) where [pred])
    assert vals(db2.execute("select [n * 10 AS n] from (nums) where [n % 2 = 0]")) == [20, 40]


def test_union_intersect_minus(db2):
    db2.execute('create relation "other":<n LONG>')
    db2.execute("insert into (other) values [3, 4, 5]")
    assert vals(db2.execute("(nums) union (other)")) == [1, 2, 3, 4, 5]
    assert vals(db2.execute("(nums) intersect (other)")) == [3, 4]
    assert vals(db2.execute("(nums) minus (other)")) == [1, 2]


def test_join_with_mapper(db2):
    # macros.rs: (l) join (r) on [lk; rk] with [m]
    got = db2.execute("(kv_l) join (kv_r) on [k; k] with [l.v AS v, r.w AS w]")
    assert vals(got) == [("a", "x"), ("b", "y")]


def test_cross_with_mapper(db2):
    db2.execute('create relation "small":<m LONG>')
    db2.execute("insert into (small) values [10, 20]")
    got = db2.execute("(nums) cross (small) on [l.n + r.m AS s]")
    assert vals(got) == [11, 12, 13, 14, 21, 22, 23, 24]


def test_nested_expression(db2):
    got = db2.execute(
        "select [v] from ((kv_l) join (kv_r) on [k; k] with [l.k AS k, l.v AS v]) where [k = 1]"
    )
    assert vals(got) == ["a"]


def test_singleton_and_empty(db2):
    assert vals(db2.execute("singleton [{'n': 7}]")) == [7]
    assert vals(db2.execute("empty <n LONG>")) == []


def test_parse_errors(db2):
    with pytest.raises(UnsupportedExpressionError):
        db2.execute("select [n from (nums)")  # unbalanced
    with pytest.raises(UnsupportedExpressionError):
        db2.execute("(nums) frobnicate (nums) trailing")


def test_dsl_matches_builder(db2):
    dsl_rows = db2.execute("select [n] from (nums) where [n > 1]")
    builder_rows = db2.evaluate(Relation("nums").select("n > 1").project("n"))
    assert vals(dsl_rows) == vals(builder_rows)


def test_sql_surface(db2):
    got = db2.sql(
        "SELECT v, w FROM kv_l JOIN kv_r USING (k) ORDER BY v"
    ).collect()
    assert [(r.v, r.w) for r in got] == [("a", "x"), ("b", "y")]


def test_sql_sees_views(db2):
    v = db2.store_view(Relation("nums").select("n >= 3"))
    got = db2.sql(f"SELECT n FROM view_{v.id} ORDER BY n").collect()
    assert [r.n for r in got] == [3, 4]


def test_visitor_counts_nodes():
    """Visitor parity with the reference trait (core/src/expression.rs:
    96-211): visit_<node> overrides fire per node type, unhandled nodes
    fall through to the child walk."""
    from codd_spark.plans.ast import Relation, Visitor, walk

    e = (
        Relation("a")
        .select("x > 1")
        .union(Relation("b").project("y"))
        .difference(Relation("c"))
    )

    class Collect(Visitor):
        def __init__(self):
            self.relations = []
            self.others = 0

        def visit_relation(self, node):
            self.relations.append(node.name)

        def generic_visit(self, node):
            self.others += 1
            super().generic_visit(node)

    v = Collect()
    e.accept(v)
    assert sorted(v.relations) == ["a", "b", "c"]
    assert v.others == 4  # Difference, Union, Select, Project

    # walk(): pre-order generator over the same tree
    names = [type(n).__name__ for n in walk(e)]
    assert names == [
        "Difference", "Union", "Select", "Relation", "Project",
        "Relation", "Relation",
    ]


def test_visitor_override_replaces_walk():
    """Like the reference's walk_* functions, an override REPLACES the
    descent — a visit_select that does not call generic_visit stops
    recursion below the Select."""
    from codd_spark.plans.ast import Relation, Visitor

    e = Relation("a").select("x > 1").project("y")

    class StopAtSelect(Visitor):
        def __init__(self):
            self.seen = []

        def visit_select(self, node):
            self.seen.append("Select")  # no generic_visit: prune here

        def generic_visit(self, node):
            self.seen.append(type(node).__name__)
            super().generic_visit(node)

    v = StopAtSelect()
    v.visit(e)
    assert v.seen == ["Project", "Select"]  # Relation pruned
