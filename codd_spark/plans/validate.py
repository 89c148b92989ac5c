"""Expression validation + dependency extraction.

Reference: core/src/database/validate.rs:21-48 (reject Difference under a
view — IVM is insert-only/monotone, difference is non-monotone) and
core/src/expression/dependency.rs:9-55 (collect referenced relations/views).
"""

from __future__ import annotations

from codd_spark.errors import UnsupportedExpressionError
from codd_spark.plans.ast import (
    AsofJoin,
    Difference,
    Expression,
    Full,
    Join,
    Relation,
    ViewScan,
)

# join variants with an insert-only (monotone) delta rule; everything else
# is non-monotone under set-semantics IVM: a new right row can REMOVE an
# anti-join match or supersede an outer join's null-padded row
_MONOTONE_JOIN_HOWS = frozenset({"inner", "semi", "left_semi", "leftsemi"})


def walk(expr: Expression):
    """Yield every node in the tree, pre-order."""
    yield expr
    for child in expr.children():
        yield from walk(child)


def dependencies(expr: Expression) -> tuple[set[str], set[int]]:
    """(relation names, view ids) read by this expression.
    Reference: core/src/expression/dependency.rs:46-55."""
    rels: set[str] = set()
    views: set[int] = set()
    for node in walk(expr):
        if isinstance(node, Relation):
            rels.add(node.name)
        elif isinstance(node, ViewScan):
            views.add(node.ref.id)
    return rels, views


def assert_view_safe(expr: Expression) -> None:
    """Reject expressions that cannot back a materialized view.

    Difference is non-monotone, so insert-only delta maintenance would be
    wrong (reference: core/src/database/validate.rs:21-33, enforced at
    core/src/database.rs:236-237). Full is never evaluable.
    """
    for node in walk(expr):
        if isinstance(node, Difference):
            raise UnsupportedExpressionError(
                "views over Difference are not supported (non-monotone)"
            )
        if isinstance(node, AsofJoin):
            # a right row inserted between two existing ones rewrites
            # earlier matches — non-monotone, same class as Difference
            raise UnsupportedExpressionError(
                "views over AsofJoin are not supported (non-monotone)"
            )
        if isinstance(node, Full):
            raise UnsupportedExpressionError("views over Full are not supported")
        if isinstance(node, Join) and (node.how or "inner").lower() not in _MONOTONE_JOIN_HOWS:
            raise UnsupportedExpressionError(
                f"views over Join(how={node.how!r}) are not supported "
                "(non-monotone: only inner and semi joins have an "
                "insert-only delta)"
            )
