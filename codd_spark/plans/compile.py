"""Compile an Expression tree to a Spark DataFrame.

This is the analogue of the reference's recursive evaluator
(core/src/database/evaluate.rs:489-740), except nothing is interpreted:
each node becomes a declarative DataFrame transformation, so Catalyst owns
pushdown, pruning, join selection, codegen and AQE. Set semantics are applied
once at the evaluation boundary (see plans/ast.py docstring for why that is
equivalent), not per node.
"""

from __future__ import annotations

import functools
from typing import TYPE_CHECKING

from pyspark.sql import Column, DataFrame, functions as F

from codd_spark.errors import UnsupportedExpressionError
from codd_spark.plans import ast

if TYPE_CHECKING:
    from codd_spark.database import Database


def _resolve_predicate(spec, df: DataFrame) -> Column:
    if callable(spec) and not isinstance(spec, Column):
        return spec(df)
    if isinstance(spec, str):
        return F.expr(spec)
    return spec


def _resolve_cols(specs, df: DataFrame) -> list[Column]:
    out: list[Column] = []
    for spec in specs:
        if callable(spec) and not isinstance(spec, Column):
            res = spec(df)
            out.extend(res if isinstance(res, (list, tuple)) else [res])
        elif isinstance(spec, str):
            out.append(F.expr(spec))
        else:
            out.append(spec)
    return out


def _apply_mapper(mapper, left: DataFrame, right: DataFrame) -> list[Column]:
    """Binary-op mapper: a callable (left_df, right_df) -> cols, or a list
    of SQL fragments referencing the sides as ``l.col`` / ``r.col``."""
    if mapper is None:
        return _dedup_names(left, right)
    if isinstance(mapper, (list, tuple)):
        return [F.expr(s) for s in mapper]
    return mapper(left, right)


def _dedup_names(left: DataFrame, right: DataFrame) -> list[Column]:
    """Default mapper for product/join: all left columns then all right
    columns, right-side name collisions suffixed ``_r``."""
    lcols = [c for c in left.columns if not c.startswith("__codd_")]
    rcols = [c for c in right.columns if not c.startswith("__codd_")]
    taken = set(lcols)
    cols = [left[c] for c in lcols]
    for c in rcols:
        if c in taken:
            cols.append(right[c].alias(f"{c}_r"))
        else:
            cols.append(right[c])
            taken.add(c)
    return cols


def to_df(expr: ast.Expression, db: "Database") -> DataFrame:
    """Structural recursion over the AST; returns a (bag-semantics)
    DataFrame. Callers wanting the reference's set semantics apply
    ``.distinct()`` once on the result (``Database.df`` does)."""
    if isinstance(expr, ast.Relation):
        return db.relation(expr.name)

    if isinstance(expr, ast.ViewScan):
        return db.view_df(expr.ref)

    if isinstance(expr, ast.Empty):
        return db.spark.createDataFrame(
            db.spark.sparkContext.emptyRDD(), schema=expr.schema
        )  # 0 partitions, not defaultParallelism empties (r14)

    if isinstance(expr, ast.Singleton):
        row = expr.row
        if isinstance(row, dict):
            if expr.schema:
                return db.spark.createDataFrame([tuple(row.values())], schema=expr.schema)
            return db.spark.createDataFrame([row])
        return db.spark.createDataFrame([row], schema=expr.schema)

    if isinstance(expr, ast.Full):
        # Reference: evaluation of Full is always an error
        # (core/src/database/evaluate.rs:25-34, core/src/lib.rs:22-24).
        raise UnsupportedExpressionError("Full is not range-restricted and cannot be evaluated")

    if isinstance(expr, ast.Select):
        child = to_df(expr.child, db)
        return child.filter(_resolve_predicate(expr.predicate, child))

    if isinstance(expr, ast.Project):
        child = to_df(expr.child, db)
        return child.select(*_resolve_cols(expr.cols, child))

    if isinstance(expr, ast.Union):
        # Positional union, left names win — reference unions by type
        # position (core/src/expression/union.rs:23-77). Dedup happens at
        # the evaluation boundary.
        return to_df(expr.left, db).union(to_df(expr.right, db))

    if isinstance(expr, ast.Intersect):
        # Spark INTERSECT is already set-semantics.
        return to_df(expr.left, db).intersect(to_df(expr.right, db))

    if isinstance(expr, ast.Difference):
        # Spark EXCEPT (subtract) is already set-semantics.
        return to_df(expr.left, db).subtract(to_df(expr.right, db))

    if isinstance(expr, ast.Product):
        left = to_df(expr.left, db).alias("l")
        right = to_df(expr.right, db).alias("r")
        joined = left.crossJoin(right)
        return joined.select(*_apply_mapper(expr.mapper, left, right))

    if isinstance(expr, ast.Join):
        # Key closures become computed key columns materialized on each side
        # BEFORE the join (resolves expression strings unambiguously in the
        # side's own scope); Catalyst then sees plain attribute equi-join
        # keys and can pick broadcast/sort-merge freely.
        lbase = to_df(expr.left, db)
        rbase = to_df(expr.right, db)
        lkeys = _resolve_cols(expr.left_key, lbase)
        rkeys = _resolve_cols(expr.right_key, rbase)
        if len(lkeys) != len(rkeys):
            raise UnsupportedExpressionError(
                f"join key arity mismatch: {len(lkeys)} vs {len(rkeys)}"
            )
        left = lbase.select(
            "*", *[k.alias(f"__codd_k{i}") for i, k in enumerate(lkeys)]
        ).alias("l")
        right = rbase.select(
            "*", *[k.alias(f"__codd_k{i}") for i, k in enumerate(rkeys)]
        ).alias("r")
        pairs = [
            left[f"__codd_k{i}"].eqNullSafe(right[f"__codd_k{i}"])
            if expr.null_safe
            else left[f"__codd_k{i}"] == right[f"__codd_k{i}"]
            for i in range(len(lkeys))
        ]
        cond = functools.reduce(lambda a, b: a & b, pairs)
        joined = left.join(right, on=cond, how=expr.how)
        if expr.how in ("semi", "left_semi", "leftsemi", "anti", "left_anti", "leftanti"):
            return joined.drop(*[f"__codd_k{i}" for i in range(len(lkeys))])
        return joined.select(*_apply_mapper(expr.mapper, left, right))

    if isinstance(expr, ast.AsofJoin):
        from codd_spark.operators.joins import asof_join

        return asof_join(
            to_df(expr.left, db),
            to_df(expr.right, db),
            on=list(expr.on),
            left_ts=expr.left_ts,
            right_ts=expr.right_ts,
            right_cols=list(expr.right_cols) if expr.right_cols is not None else None,
            suffix=expr.suffix,
        )

    if isinstance(expr, ast.RangeJoin):
        from codd_spark.operators.joins import range_join

        return range_join(
            to_df(expr.left, db),
            to_df(expr.right, db),
            left_point=expr.left_point,
            right_start=expr.right_start,
            right_end=expr.right_end,
            on=list(expr.on) if expr.on else None,
            bucket_width=expr.bucket_width,
        )

    raise UnsupportedExpressionError(f"unknown expression node: {type(expr).__name__}")
