"""Views as streams: apply a monotone algebra Expression to a streaming
relation.

The reference's insert-only monotone regime (core/src/database.rs:1-5) is
exactly Structured Streaming's model: a relation is an append-only stream,
and a monotone view (σ/π/∪ — no Difference, no Full) over it is a
stateless streaming query whose output stream IS the view's delta feed.
This is the third execution mode for views, next to recompute-on-read
(Database) and batch delta propagation (IncrementalDatabase).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from codd_spark.errors import UnsupportedExpressionError
from codd_spark.plans import ast
from codd_spark.plans.compile import _resolve_cols, _resolve_predicate
from codd_spark.plans.validate import walk


def assert_streamable(expr: ast.Expression) -> None:
    """Stateless-streamable subset: Relation / Select / Project / Union.
    Joins and intersects need state management (watermarks) — use the
    structured.py helpers for those shapes."""
    for node in walk(expr):
        if not isinstance(node, (ast.Relation, ast.Select, ast.Project, ast.Union)):
            raise UnsupportedExpressionError(
                f"{type(node).__name__} is not stateless-streamable; "
                "only Select/Project/Union views can run as pure streams"
            )


def streaming_view(expr: ast.Expression, sources: dict[str, DataFrame]) -> DataFrame:
    """Compile a monotone expression against streaming DataFrames (one per
    relation name). The result is a streaming DataFrame emitting exactly
    the view's new tuples per micro-batch — the streaming rendition of the
    IncrementalDatabase delta feed (dedup across batches, if required,
    is `dropDuplicates` with a watermark — state-bounded)."""
    assert_streamable(expr)

    def build(node: ast.Expression) -> DataFrame:
        if isinstance(node, ast.Relation):
            try:
                return sources[node.name]
            except KeyError:
                raise UnsupportedExpressionError(
                    f"no streaming source bound for relation {node.name!r}"
                ) from None
        if isinstance(node, ast.Select):
            child = build(node.child)
            return child.filter(_resolve_predicate(node.predicate, child))
        if isinstance(node, ast.Project):
            child = build(node.child)
            return child.select(*_resolve_cols(node.cols, child))
        if isinstance(node, ast.Union):
            return build(node.left).union(build(node.right))
        raise UnsupportedExpressionError(type(node).__name__)

    return build(expr)
