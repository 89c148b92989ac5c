"""Render an Expression tree to ANSI SQL (the SQL-expressible subset).

Works for expressions whose predicates / projections / keys are SQL
fragment strings (the DSL path). Callable/Column specs are opaque to the
renderer and raise. Used by the property-based equivalence tests to check
the Spark evaluation of random expression trees against DuckDB running the
rendered SQL — and handy as a debugging artifact (`print(to_sql(expr))`).
"""

from __future__ import annotations

import re

from codd_spark.errors import UnsupportedExpressionError
from codd_spark.plans import ast

_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def _frag(spec) -> str:
    if not isinstance(spec, str):
        raise UnsupportedExpressionError(
            "to_sql only supports SQL-string specs (got a callable/Column)"
        )
    return spec


def _frag_name(spec) -> str:
    """Output column name of a SELECT-list fragment: either an explicit
    ``... AS name`` alias or a bare identifier."""
    s = _frag(spec).strip()
    m = re.search(r"\s+AS\s+([A-Za-z_][A-Za-z0-9_]*)\s*$", s, re.IGNORECASE)
    if m:
        return m.group(1)
    bare = s.split(".")[-1]
    if _IDENT.match(bare):
        return bare
    raise UnsupportedExpressionError(
        f"cannot infer output column name of fragment {s!r} (add AS <name>)"
    )


def output_columns(expr: ast.Expression, schemas: dict[str, list[str]]) -> list[str]:
    """Output column names of an expression, propagated through the tree.

    ``schemas`` maps relation name -> column names. This is the schema
    knowledge the AsofJoin renderer needs to reproduce the engine's
    collision-rename rule (right columns that collide with a left column
    gain the suffix); see ``asof_join`` in operators/joins.py."""
    if isinstance(expr, ast.Relation):
        if expr.name not in schemas:
            raise UnsupportedExpressionError(
                f"output_columns: no schema registered for relation {expr.name!r}"
            )
        return list(schemas[expr.name])
    if isinstance(expr, ast.Empty):
        return [f.split()[0] for f in expr.schema.split(",")]
    if isinstance(expr, ast.Singleton):
        if isinstance(expr.row, dict):
            return list(expr.row)
        if expr.schema:
            return [f.split()[0] for f in expr.schema.split(",")]
        raise UnsupportedExpressionError("Singleton without schema")
    if isinstance(expr, ast.Select):
        return output_columns(expr.child, schemas)
    if isinstance(expr, ast.Project):
        return [_frag_name(c) for c in expr.cols]
    if isinstance(expr, (ast.Union, ast.Intersect, ast.Difference)):
        return output_columns(expr.left, schemas)
    if isinstance(expr, ast.Product):
        if expr.mapper is not None:
            return [_frag_name(c) for c in expr.mapper]
        return output_columns(expr.left, schemas) + output_columns(expr.right, schemas)
    if isinstance(expr, ast.Join):
        if expr.how in ("semi", "left_semi", "leftsemi", "anti", "left_anti", "leftanti"):
            return output_columns(expr.left, schemas)
        if expr.mapper is not None:
            return [_frag_name(c) for c in expr.mapper]
        return output_columns(expr.left, schemas) + output_columns(expr.right, schemas)
    if isinstance(expr, ast.RangeJoin):
        left = output_columns(expr.left, schemas)
        right = output_columns(expr.right, schemas)
        if expr.on:
            return left + [c for c in right if c not in expr.on]
        return left + right
    if isinstance(expr, ast.AsofJoin):
        left = output_columns(expr.left, schemas)
        right = output_columns(expr.right, schemas)
        on = list(expr.on)
        right_cols = (
            list(expr.right_cols)
            if expr.right_cols is not None
            else [c for c in right if c not in on and c != expr.right_ts]
        )
        payload = right_cols + [expr.right_ts]
        renamed = [c + expr.suffix if c in left else c for c in payload]
        return (
            on
            + [c for c in left if c not in on and c != expr.left_ts]
            + [expr.left_ts]
            + renamed
        )
    raise UnsupportedExpressionError(
        f"output_columns: unknown node {type(expr).__name__}"
    )


def to_sql(expr: ast.Expression, schemas: dict[str, list[str]] | None = None) -> str:
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
        return f"SELECT * FROM ({to_sql(expr.child, schemas)}) WHERE {_frag(expr.predicate)}"

    if isinstance(expr, ast.Project):
        cols = ", ".join(_frag(c) for c in expr.cols)
        return f"SELECT {cols} FROM ({to_sql(expr.child, schemas)})"

    if isinstance(expr, ast.Union):
        # positional set union with left names: UNION dedups, which is fine
        # under the final DISTINCT boundary
        return f"({to_sql(expr.left, schemas)}) UNION ({to_sql(expr.right, schemas)})"

    if isinstance(expr, ast.Intersect):
        return f"({to_sql(expr.left, schemas)}) INTERSECT ({to_sql(expr.right, schemas)})"

    if isinstance(expr, ast.Difference):
        return f"({to_sql(expr.left, schemas)}) EXCEPT ({to_sql(expr.right, schemas)})"

    if isinstance(expr, ast.Product):
        if expr.mapper is not None and not isinstance(expr.mapper, list):
            raise UnsupportedExpressionError(
                "to_sql Product supports no mapper or a list of SQL fragments"
            )
        cols = ", ".join(expr.mapper) if expr.mapper else "*"
        return (
            f"SELECT {cols} FROM ({to_sql(expr.left, schemas)}) l CROSS JOIN "
            f"({to_sql(expr.right, schemas)}) r"
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
                f"SELECT * FROM ({to_sql(expr.left, schemas)}) l WHERE {neg}EXISTS "
                f"(SELECT 1 FROM ({to_sql(expr.right, schemas)}) r WHERE {cond_sql})"
            )
        cols = ", ".join(expr.mapper) if expr.mapper else "*"
        how = {"inner": "JOIN", "left": "LEFT JOIN", "right": "RIGHT JOIN",
               "full": "FULL JOIN"}.get(expr.how)
        if how is None:
            raise UnsupportedExpressionError(f"to_sql join how={expr.how!r}")
        return (
            f"SELECT {cols} FROM ({to_sql(expr.left, schemas)}) l {how} "
            f"({to_sql(expr.right, schemas)}) r ON {cond_sql}"
        )

    if isinstance(expr, ast.AsofJoin):
        # Backward as-of join in ANSI SQL: LEFT JOIN every right row with
        # right_ts <= left_ts (null-safe on the keys, matching the
        # engine's Window.partitionBy grouping of NULL keys), then keep
        # only the latest right row per left row via ROW_NUMBER. The
        # "per left row" identity is the full left tuple — sound under
        # codd's set semantics, where duplicate left rows collapse at the
        # evaluation-boundary DISTINCT anyway. Output columns reproduce
        # the engine's collision-rename rule via output_columns(), which
        # is why this node alone needs the ``schemas`` argument.
        if schemas is None:
            raise UnsupportedExpressionError(
                "to_sql(AsofJoin) needs relation schemas to reproduce the "
                "collision-rename rule; pass schemas={relation: [cols]}"
            )
        lcols = output_columns(expr.left, schemas)
        rcols_all = output_columns(expr.right, schemas)
        on = list(expr.on)
        right_cols = (
            list(expr.right_cols)
            if expr.right_cols is not None
            else [c for c in rcols_all if c not in on and c != expr.right_ts]
        )
        payload = right_cols + [expr.right_ts]
        out_names = {
            c: (c + expr.suffix if c in lcols else c) for c in payload
        }
        key_conds = [f"(l.{k}) IS NOT DISTINCT FROM (r.{k})" for k in on]
        cond = " AND ".join(key_conds + [f"(r.{expr.right_ts}) <= (l.{expr.left_ts})"])
        inner_sel = ", ".join(
            [f"l.{c} AS {c}" for c in lcols]
            + [f"r.{c} AS __codd_p{i}" for i, c in enumerate(payload)]
        )
        part = ", ".join(f"l.{c}" for c in lcols)
        outer_sel = ", ".join(
            on
            + [c for c in lcols if c not in on and c != expr.left_ts]
            + [expr.left_ts]
            + [f"__codd_p{i} AS {out_names[c]}" for i, c in enumerate(payload)]
        )
        return (
            f"SELECT {outer_sel} FROM ("
            f"SELECT {inner_sel}, ROW_NUMBER() OVER ("
            f"PARTITION BY {part} ORDER BY (r.{expr.right_ts}) DESC"
            f") AS __codd_rn "
            f"FROM ({to_sql(expr.left, schemas)}) l LEFT JOIN "
            f"({to_sql(expr.right, schemas)}) r ON {cond}"
            f") WHERE __codd_rn = 1"
        )

    if isinstance(expr, ast.RangeJoin):
        # bag-equivalent to the compiled plan: keyed -> equi-join USING the
        # keys + BETWEEN filter; global -> inequality join (the engine's
        # bucketed-explode is a physical strategy, not a semantic change;
        # its internal dedup is absorbed by the evaluation-boundary
        # DISTINCT).
        between = (
            f"(l.{expr.left_point}) BETWEEN (r.{expr.right_start}) "
            f"AND (r.{expr.right_end})"
        )
        if expr.on:
            using = ", ".join(expr.on)
            return (
                f"SELECT * FROM ({to_sql(expr.left, schemas)}) l JOIN "
                f"({to_sql(expr.right, schemas)}) r USING ({using}) WHERE {between}"
            )
        return (
            f"SELECT * FROM ({to_sql(expr.left, schemas)}) l JOIN "
            f"({to_sql(expr.right, schemas)}) r ON {between}"
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
