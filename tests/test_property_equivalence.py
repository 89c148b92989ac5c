"""Property-based equivalence: random expression trees evaluated by the
engine must match DuckDB running the AST's SQL rendering on the same data.

This is the randomized analogue of the reference's hand-written golden
tests — it exercises arbitrary operator compositions (the reference tests
each operator chained on itself; we test random chains of all of them).
"""

import duckdb
import pytest
from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st

from codd_spark import Database
from codd_spark.plans import ast
from codd_spark.plans.to_sql import to_sql

A_ROWS = [3, 1, 4, 1, 5, 9, 2, 6]
B_ROWS = [2, 7, 1, 8, 2, 8, 1]

PREDICATES = ["n % 2 = 0", "n > 2", "n <= 5", "n <> 4"]
PROJECTIONS = [["n"], ["n + 1 AS n"], ["n * 2 AS n"], ["n % 3 AS n"]]
PRODUCT_MAPPERS = [["l.n + r.n AS n"], ["l.n * 10 + r.n AS n"]]
JOIN_MAPPERS = [["l.n AS n"], ["l.n + r.n AS n"]]
# single-key, multi-column expression keys, and outer-join variants; outer
# joins need a null-tolerant mapper (coalesce) so the result stays one
# LONG column `n` and the grammar remains closed under composition
JOIN_KEYS = [(["n"], ["n"]), (["n % 3", "n % 2"], ["n % 3", "n % 2"])]
OUTER_MAPPERS = [["coalesce(l.n, r.n) AS n"], ["coalesce(l.n, 0) + coalesce(r.n, 0) AS n"]]


def _asof_wrap(child):
    """AsofJoin composed into the single-column grammar: attach the latest
    t_b value <= n (global, keyless), then fold it back into one LONG n.
    Tie-safety: the attached payload IS the as-of key itself, so equal-ts
    ties pick identical values in every engine."""
    right = ast.Project(ast.Relation("t_b"), ["n AS m"])
    aj = child.asof_join(right, [], "n", "m")
    return ast.Project(aj, ["n + coalesce(m, 0) AS n"])


def _range_wrap(child):
    """Keyless RangeJoin composed into the grammar: points fall into
    [lo, lo+3] bands built from t_b, folded back into one LONG n."""
    right = ast.Project(ast.Relation("t_b"), ["n AS lo", "n + 3 AS hi"])
    rj = child.range_join(right, "n", "lo", "hi", bucket_width=2.0)
    return ast.Project(rj, ["n + lo + hi AS n"])


def exprs():
    # leaves include the constant relations, so random trees exercise
    # Empty/Singleton composition (e.g. Union(Select(t_a), Singleton))
    leaves = st.sampled_from(
        [
            ast.Relation("t_a"),
            ast.Relation("t_b"),
            ast.Empty("n LONG"),
            ast.Singleton({"n": 7}),
            ast.Singleton({"n": 3}),
        ]
    )

    def extend(children):
        unary = st.one_of(
            st.builds(ast.Select, children, st.sampled_from(PREDICATES)),
            st.builds(ast.Project, children, st.sampled_from(PROJECTIONS)),
            st.builds(_asof_wrap, children),
            st.builds(_range_wrap, children),
        )
        binary = st.one_of(
            st.builds(ast.Union, children, children),
            st.builds(ast.Intersect, children, children),
            st.builds(ast.Difference, children, children),
            st.builds(
                ast.Product, children, children, st.sampled_from(PRODUCT_MAPPERS)
            ),
            st.builds(
                lambda l, r, keys, m: ast.Join(l, r, keys[0], keys[1], m),
                children, children,
                st.sampled_from(JOIN_KEYS), st.sampled_from(JOIN_MAPPERS),
            ),
            st.builds(
                lambda l, r, how, m: ast.Join(l, r, ["n"], ["n"], m, how),
                children, children,
                st.sampled_from(["left", "right", "full"]),
                st.sampled_from(OUTER_MAPPERS),
            ),
            st.builds(
                lambda l, r, how: ast.Join(l, r, ["n"], ["n"], None, how),
                children, children, st.sampled_from(["semi", "anti"]),
            ),
        )
        return st.one_of(unary, binary)

    return st.recursive(leaves, extend, max_leaves=6)


def monotone_exprs():
    """The view-safe (monotone) subset of the grammar: no Difference, no
    AsofJoin, no outer/anti joins — exactly what assert_view_safe admits.
    Random trees drawn from this are stored as INCREMENTAL views and
    maintained across random insert batches."""
    leaves = st.sampled_from(
        [
            ast.Relation("t_a"),
            ast.Relation("t_b"),
            ast.Empty("n LONG"),
            ast.Singleton({"n": 7}),
        ]
    )

    def extend(children):
        unary = st.one_of(
            st.builds(ast.Select, children, st.sampled_from(PREDICATES)),
            st.builds(ast.Project, children, st.sampled_from(PROJECTIONS)),
            st.builds(_range_wrap, children),
        )
        binary = st.one_of(
            st.builds(ast.Union, children, children),
            st.builds(ast.Intersect, children, children),
            st.builds(
                ast.Product, children, children, st.sampled_from(PRODUCT_MAPPERS)
            ),
            st.builds(
                lambda l, r, keys, m: ast.Join(l, r, keys[0], keys[1], m),
                children, children,
                st.sampled_from(JOIN_KEYS), st.sampled_from(JOIN_MAPPERS),
            ),
            st.builds(
                lambda l, r: ast.Join(l, r, ["n"], ["n"], None, "semi"),
                children, children,
            ),
        )
        return st.one_of(unary, binary)

    return st.recursive(leaves, extend, max_leaves=4)


@pytest.fixture(scope="module")
def setup(spark):
    db = Database(spark)
    db.add_relation("t_a", "n LONG")
    db.add_relation("t_b", "n LONG")
    db.insert("t_a", [(n,) for n in A_ROWS])
    db.insert("t_b", [(n,) for n in B_ROWS])
    con = duckdb.connect()
    con.execute("CREATE TABLE t_a AS SELECT * FROM (VALUES %s) AS t(n)"
                % ", ".join(f"({n})" for n in A_ROWS))
    con.execute("CREATE TABLE t_b AS SELECT * FROM (VALUES %s) AS t(n)"
                % ", ".join(f"({n})" for n in B_ROWS))
    return db, con


SCHEMAS = {"t_a": ["n"], "t_b": ["n"]}


@settings(
    max_examples=110,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(expr=exprs())
def test_random_expression_matches_duckdb(setup, expr):
    db, con = setup
    got = [r.n for r in db.evaluate(expr)]
    # NULLS FIRST matches Spark's ascending null ordering (outer joins can
    # produce null n even though the base tables are null-free)
    sql = f"SELECT DISTINCT * FROM ({to_sql(expr, SCHEMAS)}) ORDER BY n NULLS FIRST"
    want = [r[0] for r in con.execute(sql).fetchall()]
    assert got == want, f"divergence for {to_sql(expr, SCHEMAS)}"


@settings(
    # 60 trees x a 1-3-batch schedule each = ~180 maintained-view checks
    # per run (each step asserts); 110 trees measured 8.9 min — 60 keeps
    # the suite's budget while clearing the 100-case bar
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    expr=monotone_exprs(),
    init_a=st.lists(st.integers(0, 9), max_size=5),
    init_b=st.lists(st.integers(0, 9), max_size=5),
    schedule=st.lists(
        st.tuples(
            st.sampled_from(["t_a", "t_b"]),
            st.lists(st.integers(0, 9), min_size=1, max_size=3),
        ),
        min_size=1,
        max_size=3,
    ),
)
# regression: null-safe SEMI self-join of the same filtered relation —
# its delta union stacked on an unpromoted stable set crashed Catalyst's
# InferFiltersFromConstraints (NoSuchElementException in
# Union.rewriteConstraints); fixed by scoping constraint propagation off
# around the engine's materialization actions (incremental.py)
@example(
    expr=ast.Join(
        left=ast.Select(child=ast.Relation(name="t_b"), predicate="n % 2 = 0"),
        right=ast.Select(child=ast.Relation(name="t_b"), predicate="n % 2 = 0"),
        left_key=["n"],
        right_key=["n"],
        mapper=None,
        how="semi",
        null_safe=True,
    ),
    init_a=[],
    init_b=[0],
    schedule=[("t_b", [1])],
)
def test_random_monotone_view_maintained_incrementally(
    spark, expr, init_a, init_b, schedule
):
    """The reference's core IVM invariant (evaluate.rs:1363-1604),
    fuzzed: a view over ANY monotone expression, maintained purely by
    delta propagation across an arbitrary insert schedule, must equal a
    one-shot recompute of the same expression on the final data. DuckDB
    runs the recompute (via the AST's SQL rendering), so the check does
    not share code with either engine path — the round-4 Join.how bug
    (semi/outer/anti silently treated as inner by BOTH the delta and the
    'all' evaluator) is exactly the class a same-engine compare misses."""
    from codd_spark.streaming.incremental import IncrementalDatabase

    idb = IncrementalDatabase(spark)
    idb.add_relation("t_a", "n LONG")
    idb.add_relation("t_b", "n LONG")
    if init_a:
        idb.insert("t_a", [(n,) for n in init_a])
    if init_b:
        idb.insert("t_b", [(n,) for n in init_b])
    view = idb.store_view(expr)

    con = duckdb.connect()
    con.execute("CREATE TABLE t_a(n BIGINT); CREATE TABLE t_b(n BIGINT)")
    if init_a:
        con.executemany("INSERT INTO t_a VALUES (?)", [(n,) for n in init_a])
    if init_b:
        con.executemany("INSERT INTO t_b VALUES (?)", [(n,) for n in init_b])

    sql = f"SELECT DISTINCT * FROM ({to_sql(expr, SCHEMAS)}) ORDER BY n NULLS FIRST"
    for step, (rel, batch) in enumerate([(None, None)] + schedule):
        if rel is not None:
            idb.insert(rel, [(n,) for n in batch])
            con.executemany(f"INSERT INTO {rel} VALUES (?)", [(n,) for n in batch])
        got = [r.n for r in idb.view_rows(view)]
        want = [r[0] for r in con.execute(sql).fetchall()]
        assert got == want, (
            f"IVM divergence at step {step} for {to_sql(expr, SCHEMAS)}"
        )
    con.close()


KEYS = [0, 1, 2]


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    left=st.lists(
        st.tuples(st.sampled_from(KEYS), st.integers(-20, 50)), max_size=12
    ),
    # unique (k, ts) on the right: with duplicate as-of timestamps the
    # chosen payload is implementation-defined in both engines
    right=st.lists(
        st.tuples(st.sampled_from(KEYS), st.integers(-20, 50)),
        unique=True,
        max_size=12,
    ),
)
def test_asof_join_matches_duckdb(spark, left, right):
    from codd_spark.operators.joins import asof_join

    l = spark.createDataFrame(
        [(k, ts, k * 1000 + ts) for k, ts in left], "k LONG, lts LONG, lv LONG"
    )
    r = spark.createDataFrame(
        [(k, ts, k * 100 + ts) for k, ts in right], "k LONG, rts LONG, rv LONG"
    )
    got = sorted(
        (row.k, row.lts, row.lv, row.rv, row.rts)
        for row in asof_join(l, r, ["k"], "lts", "rts").collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE l(k BIGINT, lts BIGINT, lv BIGINT); "
        "CREATE TABLE r(k BIGINT, rts BIGINT, rv BIGINT)"
    )
    if left:
        con.executemany("INSERT INTO l VALUES (?,?,?)",
                        [(k, ts, k * 1000 + ts) for k, ts in left])
    if right:
        con.executemany("INSERT INTO r VALUES (?,?,?)",
                        [(k, ts, k * 100 + ts) for k, ts in right])
    want = sorted(
        tuple(row)
        for row in con.execute(
            "SELECT l.k, l.lts, l.lv, r.rv, r.rts FROM l "
            "ASOF LEFT JOIN r ON l.k = r.k AND l.lts >= r.rts"
        ).fetchall()
    )
    assert got == want


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    points=st.lists(
        st.tuples(st.sampled_from(KEYS), st.integers(-20, 50)), max_size=10
    ),
    spans=st.lists(
        st.tuples(st.sampled_from(KEYS), st.integers(-20, 50), st.integers(0, 15)),
        max_size=8,
    ),
    bucket_width=st.sampled_from([1.0, 2.5, 7.0]),
    keyed=st.booleans(),
)
def test_range_join_matches_duckdb(spark, points, spans, bucket_width, keyed):
    from codd_spark.operators.joins import range_join

    l = spark.createDataFrame(points or [], "k LONG, p LONG")
    r = spark.createDataFrame(
        [(k, lo, lo + w) for k, lo, w in spans] or [], "k2 LONG, lo LONG, hi LONG"
    )
    if keyed:
        r2 = r.withColumnRenamed("k2", "k")
        out = range_join(l, r2, "p", "lo", "hi", on=["k"])
        got = sorted((row.k, row.p, row.lo, row.hi) for row in out.collect())
        join_sql = "SELECT l.k, l.p, r.lo, r.hi FROM l JOIN r ON l.k = r.k2 AND l.p BETWEEN r.lo AND r.hi"
    else:
        out = range_join(l, r, "p", "lo", "hi", bucket_width=bucket_width)
        got = sorted((row.k, row.p, row.k2, row.lo, row.hi) for row in out.collect())
        join_sql = "SELECT l.k, l.p, r.k2, r.lo, r.hi FROM l JOIN r ON l.p BETWEEN r.lo AND r.hi"
    con = duckdb.connect()
    con.execute("CREATE TABLE l(k BIGINT, p BIGINT); CREATE TABLE r(k2 BIGINT, lo BIGINT, hi BIGINT)")
    if points:
        con.executemany("INSERT INTO l VALUES (?,?)", points)
    if spans:
        con.executemany("INSERT INTO r VALUES (?,?,?)", [(k, lo, lo + w) for k, lo, w in spans])
    want = sorted(tuple(row) for row in con.execute(join_sql).fetchall())
    assert got == want


def test_semi_anti_render_match_duckdb(setup):
    from codd_spark.plans import ast as A

    db, con = setup
    for how in ("semi", "anti"):
        expr = A.Join(
            A.Relation("t_a").select("n > 1"),
            A.Relation("t_b"),
            ["n"], ["n"], None, how,
        )
        got = [r.n for r in db.evaluate(expr)]
        sql = f"SELECT DISTINCT * FROM ({to_sql(expr)}) ORDER BY n"
        want = [r[0] for r in con.execute(sql).fetchall()]
        assert got == want, how


def test_range_join_to_sql_matches_duckdb(spark, db):
    """RangeJoin AST node: the engine's bucketed/keyed physical strategies
    must agree with DuckDB running the node's SQL rendering."""
    import duckdb as _duck

    from codd_spark.plans.ast import Relation
    from codd_spark.plans.to_sql import to_sql

    points = [(float(i), i % 3) for i in range(40)]
    bands = [(float(s), float(s + 7), s % 3, f"b{s}") for s in range(0, 40, 5)]
    db.register("pts", spark.createDataFrame(points, "p DOUBLE, k LONG"))
    db.register("bnd", spark.createDataFrame(bands, "s DOUBLE, e DOUBLE, k LONG, name STRING"))

    import pandas as _pd

    con = _duck.connect()
    con.register("pts", _pd.DataFrame(points, columns=["p", "k"]))
    con.register("bnd", _pd.DataFrame(bands, columns=["s", "e", "k", "name"]))

    # compare by column NAME (key-column position differs between Spark's
    # join(on=...) and SQL USING — same relation, different ordering)
    for expr in (
        Relation("pts").range_join(Relation("bnd"), "p", "s", "e", on=["k"]),
        # global form: project the shared key away so * yields unique names
        Relation("pts").project("p").range_join(
            Relation("bnd").project("s", "e", "name"),
            "p", "s", "e", bucket_width=5.0,
        ),
    ):
        got = sorted(
            tuple(sorted(r.asDict().items())) for r in db.evaluate(expr)
        )
        cur = con.execute(f"SELECT DISTINCT * FROM ({to_sql(expr)})")
        names = [d[0] for d in cur.description]
        want = sorted(
            tuple(sorted(zip(names, row))) for row in cur.fetchall()
        )
        assert got == want


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    left=st.lists(
        st.tuples(st.sampled_from(KEYS), st.integers(-20, 50)), max_size=12
    ),
    # unique (k, ts) on the right: duplicate as-of timestamps make the
    # chosen payload implementation-defined in both engines
    right=st.lists(
        st.tuples(st.sampled_from(KEYS), st.integers(-20, 50)),
        unique=True,
        max_size=12,
    ),
    with_select=st.booleans(),
)
def test_asof_join_to_sql_matches_duckdb(spark, db, left, right, with_select):
    """AsofJoin AST node rendered to ANSI SQL (LEFT JOIN + ROW_NUMBER over
    the full left tuple) must agree with the engine's union+carry-forward
    plan — including the collision-rename rule: both sides carry a column
    named `v`, so the attached right value must come out as `v_r`."""
    import pandas as _pd

    from codd_spark.plans.ast import Relation
    from codd_spark.plans.to_sql import output_columns, to_sql

    lrows = [(k, ts, k * 1000 + ts) for k, ts in left]
    rrows = [(k, ts, k * 100 + ts) for k, ts in right]
    db.register("asof_l", spark.createDataFrame(lrows or [], "k LONG, lts LONG, v LONG"), replace=True)
    db.register("asof_r", spark.createDataFrame(rrows or [], "k LONG, rts LONG, v LONG"), replace=True)
    schemas = {"asof_l": ["k", "lts", "v"], "asof_r": ["k", "rts", "v"]}

    expr = Relation("asof_l").asof_join(Relation("asof_r"), ["k"], "lts", "rts")
    if with_select:
        expr = expr.select("lts > 0")
    assert output_columns(expr, schemas) == ["k", "v", "lts", "v_r", "rts"]

    got = sorted(tuple(r) for r in db.evaluate(expr))

    con = duckdb.connect()
    con.register("asof_l", _pd.DataFrame(lrows, columns=["k", "lts", "v"]))
    con.register("asof_r", _pd.DataFrame(rrows, columns=["k", "rts", "v"]))
    cur = con.execute(
        f"SELECT DISTINCT * FROM ({to_sql(expr, schemas)}) "
        "ORDER BY ALL NULLS FIRST"
    )
    assert [d[0] for d in cur.description] == ["k", "v", "lts", "v_r", "rts"]
    want = [tuple(r) for r in cur.fetchall()]
    assert got == want


@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(expr=exprs())
def test_view_safety_gate_matches_monotonicity(spark, expr):
    """Complement of the IVM fuzz above: over the FULL grammar (which
    includes Difference, AsofJoin, and outer/anti Join.how — all
    non-monotone), store_view must accept an expression IFF every node
    in its tree has an insert-only delta rule. A silently-accepted
    AsofJoin view is exactly the class of bug the Join.how fuzz caught
    in round 4 (reference: core/src/database/validate.rs:21-48; AsofJoin
    is non-monotone because a later-inserted right row can re-match an
    already-joined left row)."""
    from codd_spark.errors import UnsupportedExpressionError
    from codd_spark.plans.validate import _MONOTONE_JOIN_HOWS, walk
    from codd_spark.streaming.incremental import IncrementalDatabase

    def monotone(e):
        for node in walk(e):
            if isinstance(node, (ast.Difference, ast.AsofJoin, ast.Full)):
                return False
            if isinstance(node, ast.Join) and (
                node.how or "inner"
            ).lower() not in _MONOTONE_JOIN_HOWS:
                return False
        return True

    idb = IncrementalDatabase(spark)
    idb.add_relation("t_a", "n LONG")
    idb.add_relation("t_b", "n LONG")
    idb.insert("t_a", [(1,), (2,)])
    idb.insert("t_b", [(2,), (3,)])

    if monotone(expr):
        ref = idb.store_view(expr)  # must not raise
        idb.view_rows(ref)          # and must evaluate
    else:
        with pytest.raises(UnsupportedExpressionError):
            idb.store_view(expr)
