"""Render an Expression tree to ANSI SQL (the SQL-expressible subset).

Works for expressions whose predicates / projections / keys are SQL
fragment strings (the DSL path). Callable/Column specs are opaque to the
renderer and raise. Used by the property-based equivalence tests to check
the Spark evaluation of random expression trees against DuckDB running the
rendered SQL — and handy as a debugging artifact (`print(to_sql(expr))`).
"""

from __future__ import annotations

from codd_spark.errors import UnsupportedExpressionError
from codd_spark.plans import ast


def _frag(spec) -> str:
    if not isinstance(spec, str):
        raise UnsupportedExpressionError(
            "to_sql only supports SQL-string specs (got a callable/Column)"
        )
    return spec


def to_sql(expr: ast.Expression) -> str:
    """SQL string computing the expression's *bag* of tuples; wrap with
    SELECT DISTINCT ... for codd's set semantics (Database.evaluate does)."""
    if isinstance(expr, ast.Relation):
        return f"SELECT * FROM {expr.name}"

    if isinstance(expr, ast.Empty):
        cols = ", ".join(
            f"CAST(NULL AS {f.split()[1]}) AS {f.split()[0]}"
            for f in expr.schema.split(",")
        )
        return f"SELECT {cols} WHERE 1 = 0"

    if isinstance(expr, ast.Singleton):
        if isinstance(expr.row, dict):
            cols = ", ".join(f"{_sql_lit(v)} AS {k}" for k, v in expr.row.items())
        elif isinstance(expr.row, (tuple, list)) and expr.schema:
            names = [f.split()[0] for f in expr.schema.split(",")]
            if len(names) != len(expr.row):
                raise UnsupportedExpressionError(
                    f"to_sql Singleton: {len(expr.row)} values vs {len(names)} schema fields"
                )
            cols = ", ".join(
                f"{_sql_lit(v)} AS {k}" for k, v in zip(names, expr.row)
            )
        else:
            raise UnsupportedExpressionError(
                "to_sql Singleton needs a dict row or a tuple/list row with a schema"
            )
        return f"SELECT {cols}"

    if isinstance(expr, ast.Full):
        raise UnsupportedExpressionError("Full cannot be rendered")

    if isinstance(expr, ast.Select):
        return f"SELECT * FROM ({to_sql(expr.child)}) WHERE {_frag(expr.predicate)}"

    if isinstance(expr, ast.Project):
        cols = ", ".join(_frag(c) for c in expr.cols)
        return f"SELECT {cols} FROM ({to_sql(expr.child)})"

    if isinstance(expr, ast.Union):
        # positional set union with left names: UNION dedups, which is fine
        # under the final DISTINCT boundary
        return f"({to_sql(expr.left)}) UNION ({to_sql(expr.right)})"

    if isinstance(expr, ast.Intersect):
        return f"({to_sql(expr.left)}) INTERSECT ({to_sql(expr.right)})"

    if isinstance(expr, ast.Difference):
        return f"({to_sql(expr.left)}) EXCEPT ({to_sql(expr.right)})"

    if isinstance(expr, ast.Product):
        if expr.mapper is not None and not isinstance(expr.mapper, list):
            raise UnsupportedExpressionError(
                "to_sql Product supports no mapper or a list of SQL fragments"
            )
        cols = ", ".join(expr.mapper) if expr.mapper else "*"
        return (
            f"SELECT {cols} FROM ({to_sql(expr.left)}) l CROSS JOIN "
            f"({to_sql(expr.right)}) r"
        )

    if isinstance(expr, ast.Join):
        if expr.mapper is not None and not isinstance(expr.mapper, list):
            raise UnsupportedExpressionError(
                "to_sql Join supports no mapper or a list of SQL fragments"
            )
        conds = []
        for lk, rk in zip(expr.left_key, expr.right_key):
            op = "IS NOT DISTINCT FROM" if expr.null_safe else "="
            conds.append(f"(l.{_frag(lk)}) {op} (r.{_frag(rk)})")
        cond_sql = " AND ".join(conds)
        if expr.how in ("semi", "left_semi", "leftsemi", "anti", "left_anti", "leftanti"):
            neg = "NOT " if "anti" in expr.how else ""
            return (
                f"SELECT * FROM ({to_sql(expr.left)}) l WHERE {neg}EXISTS "
                f"(SELECT 1 FROM ({to_sql(expr.right)}) r WHERE {cond_sql})"
            )
        cols = ", ".join(expr.mapper) if expr.mapper else "*"
        how = {"inner": "JOIN", "left": "LEFT JOIN", "right": "RIGHT JOIN",
               "full": "FULL JOIN"}.get(expr.how)
        if how is None:
            raise UnsupportedExpressionError(f"to_sql join how={expr.how!r}")
        return (
            f"SELECT {cols} FROM ({to_sql(expr.left)}) l {how} "
            f"({to_sql(expr.right)}) r ON {cond_sql}"
        )

    if isinstance(expr, ast.RangeJoin):
        # bag-equivalent to the compiled plan: keyed -> equi-join USING the
        # keys + BETWEEN filter; global -> inequality join (the engine's
        # bucketed-explode is a physical strategy, not a semantic change;
        # its internal dedup is absorbed by the evaluation-boundary
        # DISTINCT). AsofJoin is deliberately NOT rendered: its output
        # renames right columns on collision, which needs schema knowledge
        # this renderer doesn't track — it is property-tested directly
        # against DuckDB's native ASOF JOIN instead.
        between = (
            f"(l.{expr.left_point}) BETWEEN (r.{expr.right_start}) "
            f"AND (r.{expr.right_end})"
        )
        if expr.on:
            using = ", ".join(expr.on)
            return (
                f"SELECT * FROM ({to_sql(expr.left)}) l JOIN "
                f"({to_sql(expr.right)}) r USING ({using}) WHERE {between}"
            )
        return (
            f"SELECT * FROM ({to_sql(expr.left)}) l JOIN "
            f"({to_sql(expr.right)}) r ON {between}"
        )

    raise UnsupportedExpressionError(f"to_sql: unknown node {type(expr).__name__}")


def _sql_lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    return "'" + str(v).replace("'", "''") + "'"
