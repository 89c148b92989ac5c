"""Logical expression layer: the AST (ast.py), its validation (validate.py)
and compilation to Spark DataFrames (compile.py)."""

from codd_spark.plans.ast import (
    Difference,
    Empty,
    Expression,
    Full,
    Intersect,
    Join,
    Product,
    Project,
    Relation,
    Select,
    Singleton,
    Union,
    ViewScan,
    Visitor,
    walk,
)
from codd_spark.plans.compile import to_df
from codd_spark.plans.validate import assert_view_safe, dependencies

__all__ = [
    "Difference",
    "Empty",
    "Expression",
    "Full",
    "Intersect",
    "Join",
    "Product",
    "Project",
    "Relation",
    "Select",
    "Singleton",
    "Union",
    "ViewScan",
    "Visitor",
    "assert_view_safe",
    "dependencies",
    "to_df",
    "walk",
]
