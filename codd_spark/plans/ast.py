"""Expression AST — the 12 operator node types of the reference algebra.

Reference: core/src/expression.rs:35-45 defines Relation / Select / Project /
Join / Product / Union / Intersect / Difference / Singleton / Empty / Full /
View; core/src/expression/builder.rs:36-349 defines the fluent builder
(`.select(..).project(..).with_key(..).join(..).on(..)`). Both are mirrored
here. The reference's ``Mono`` (core/src/expression/mono.rs:10-26) — a
homogeneous dynamically-composable AST — needs no counterpart: this AST is
already untyped and dynamically composable.

Where the reference takes opaque Rust closures for predicates / projections /
join keys (core/src/expression/select.rs:34, project.rs:35, join.rs:53-54),
this engine takes *column specs*, each one of:

- a SQL expression string (parsed by Spark — fast path, stays in codegen),
- a ``pyspark.sql.Column``,
- a callable ``DataFrame -> Column`` (or ``-> list[Column]`` for
  projections), which lets callers reference the child's columns late-bound,
  exactly like a closure over the tuple.

Truly opaque Python logic can still be used by passing a Column built from a
``pandas_udf`` — the vectorized slow path.

Set semantics (reference: core/src/database/instance.rs:21-28 — every
relation is a sorted deduplicated set) are enforced once at evaluation
boundaries by ``Database.evaluate`` / ``Database.df``; for this algebra a
single top-level DISTINCT is equivalent to per-node dedup (presence of an
output tuple depends only on presence of input tuples for every operator
here) and saves one shuffle per operator at scale.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Sequence, Union as TyUnion

# A column spec: SQL string | Column | callable(df) -> Column(s).
ColSpec = Any


class Expression:
    """Base class. Fluent builder methods mirror the reference builder
    (core/src/expression/builder.rs:36-227)."""

    # -- builder surface -------------------------------------------------
    def select(self, predicate: ColSpec) -> "Select":
        """Filter rows (σ). Reference: core/src/expression/select.rs:28-101."""
        return Select(self, predicate)

    def project(self, *cols: ColSpec) -> "Project":
        """Generalized projection (π) — may compute new columns.
        Reference: core/src/expression/project.rs:28-104."""
        return Project(self, list(cols))

    def union(self, other: "Expression") -> "Union":
        return Union(self, other)

    def intersect(self, other: "Expression") -> "Intersect":
        return Intersect(self, other)

    def difference(self, other: "Expression") -> "Difference":
        return Difference(self, other)

    def product(self, other: "Expression", mapper: Callable | None = None) -> "Product":
        """Cartesian product with an optional fused row mapper.
        Reference: core/src/expression/product.rs:27-120."""
        return Product(self, other, mapper)

    def with_key(self, *key: ColSpec) -> "WithKey":
        """Start a join: ``l.with_key(k).join(r.with_key(k2)).on(mapper)``.
        Reference: core/src/expression/builder.rs:283-349."""
        return WithKey(self, list(key))

    def join(
        self,
        other: "Expression",
        left_key: Sequence[ColSpec],
        right_key: Sequence[ColSpec] | None = None,
        mapper: Callable | None = None,
        how: str = "inner",
        null_safe: bool = True,
    ) -> "Join":
        """Equi-join on computed keys. The reference supports inner only
        (core/src/expression/join.rs:42-148); ``how`` extends to
        left/right/full/semi/anti as engine extensions."""
        if right_key is None:
            right_key = left_key
        return Join(self, other, list(left_key), list(right_key), mapper, how, null_safe)

    def asof_join(
        self,
        other: "Expression",
        on: Sequence[str],
        left_ts: str,
        right_ts: str,
        right_cols: Sequence[str] | None = None,
        suffix: str = "_r",
    ) -> "AsofJoin":
        """Backward as-of join as an algebra node (engine extension — the
        reference has only inner equi-join, SURVEY.md §2.2); compiles to
        operators/joins.py::asof_join (union + carry-forward, one shuffle)."""
        return AsofJoin(
            self, other, list(on), left_ts, right_ts,
            list(right_cols) if right_cols is not None else None, suffix,
        )

    def range_join(
        self,
        other: "Expression",
        left_point: str,
        right_start: str,
        right_end: str,
        on: Sequence[str] | None = None,
        bucket_width: float | None = None,
    ) -> "RangeJoin":
        """Point-in-interval join as an algebra node; compiles to
        operators/joins.py::range_join (keyed equi+filter, or global
        bucketed-explode — never a cross product)."""
        return RangeJoin(
            self, other, left_point, right_start, right_end,
            list(on) if on else None, bucket_width,
        )

    def children(self) -> list["Expression"]:
        return []


@dataclass(frozen=True)
class Relation(Expression):
    """Named base-table scan. Reference: core/src/expression/relation.rs:20-57."""

    name: str

    def __post_init__(self):
        if not self.name:
            raise ValueError("relation name must be non-empty")


@dataclass(frozen=True)
class Empty(Expression):
    """Constant empty relation. Reference: core/src/expression/empty.rs:17-46.

    ``schema`` is a DDL string, e.g. ``"n LONG"``.
    """

    schema: str


@dataclass(frozen=True)
class Singleton(Expression):
    """Constant one-row relation. Reference: core/src/expression/singleton.rs:16-49.

    ``row`` is a dict of column -> python value; ``schema`` optionally pins
    the DDL (otherwise inferred).
    """

    row: Any
    schema: str | None = None

    def __hash__(self):  # dict rows are unhashable; identity is fine for AST nodes
        return id(self)


@dataclass(frozen=True)
class Full(Expression):
    """The infinite relation of all values — never evaluable; kept for
    algebraic completeness. Evaluation raises UnsupportedExpressionError
    (reference: core/src/expression/full.rs:5-58, core/src/lib.rs:22-24)."""


@dataclass(frozen=True)
class Select(Expression):
    """σ — filter by predicate spec. Reference: core/src/expression/select.rs:28-101."""

    child: Expression
    predicate: ColSpec

    def children(self):
        return [self.child]


@dataclass(frozen=True)
class Project(Expression):
    """π (generalized) — list of column specs, or a single callable returning
    the full projection list. Reference: core/src/expression/project.rs:28-104."""

    child: Expression
    cols: list

    def children(self):
        return [self.child]


@dataclass(frozen=True)
class Union(Expression):
    """∪ with set semantics (duplicates collapse at evaluation).
    Reference: core/src/expression/union.rs:23-77. Positional (by column
    position), left side's names win — matching the reference's by-type
    union."""

    left: Expression
    right: Expression

    def children(self):
        return [self.left, self.right]


@dataclass(frozen=True)
class Intersect(Expression):
    """∩. Reference: core/src/expression/intersect.rs:23-105."""

    left: Expression
    right: Expression

    def children(self):
        return [self.left, self.right]


@dataclass(frozen=True)
class Difference(Expression):
    """l − r (set difference). Views over Difference are rejected because
    incremental maintenance is insert-only/monotone (reference:
    core/src/database/validate.rs:21-48)."""

    left: Expression
    right: Expression

    def children(self):
        return [self.left, self.right]


@dataclass(frozen=True)
class Product(Expression):
    """× with a fused mapper ``(left_df, right_df) -> list[Column]``.
    Reference: core/src/expression/product.rs:27-120; the mapper fusion is
    projection-after-cross-join, which Catalyst collapses into the join."""

    left: Expression
    right: Expression
    mapper: Callable | None = None

    def children(self):
        return [self.left, self.right]


@dataclass(frozen=True)
class Join(Expression):
    """Equi-join on computed keys with a fused mapper.
    Reference: core/src/expression/join.rs:42-148.

    ``null_safe=True`` uses ``<=>`` so NULL keys match NULL keys — the
    reference joins on ``Option`` keys where ``None == None``
    (core/examples/music.rs:165-167); plain SQL equi-join would drop them.
    """

    left: Expression
    right: Expression
    left_key: list
    right_key: list
    mapper: Callable | None = None
    how: str = "inner"
    null_safe: bool = True

    def children(self):
        return [self.left, self.right]


@dataclass(frozen=True)
class AsofJoin(Expression):
    """Backward as-of join node (engine extension). NOT view-safe: a right
    row inserted between two existing ones rewrites earlier matches, so
    the operator is non-monotone under the insert-only IVM regime — it is
    rejected under stored views exactly like Difference."""

    left: Expression
    right: Expression
    on: list
    left_ts: str
    right_ts: str
    right_cols: list | None = None
    suffix: str = "_r"

    def __hash__(self):
        return id(self)

    def children(self):
        return [self.left, self.right]


@dataclass(frozen=True)
class RangeJoin(Expression):
    """Point-in-interval join node (engine extension). Monotone (inner
    join on a fixed condition: new rows only add outputs), so it IS
    view-safe."""

    left: Expression
    right: Expression
    left_point: str
    right_start: str
    right_end: str
    on: list | None = None
    bucket_width: float | None = None

    def __hash__(self):
        return id(self)

    def children(self):
        return [self.left, self.right]


@dataclass(frozen=True)
class ViewScan(Expression):
    """Scan of a stored materialized view by reference.
    Reference: core/src/expression/view.rs:48-96."""

    ref: "ViewRefLike"


class ViewRefLike:
    """Protocol-ish marker: anything with an integer ``.id``."""

    id: int


@dataclass
class WithKey:
    """Builder intermediate for the join chain
    (reference: core/src/expression/builder.rs:283-349)."""

    expr: Expression
    key: list

    def join(self, other: "WithKey | Expression", how: str = "inner", null_safe: bool = True) -> "JoinBuilder":
        if isinstance(other, WithKey):
            return JoinBuilder(self.expr, other.expr, self.key, other.key, how, null_safe)
        return JoinBuilder(self.expr, other, self.key, self.key, how, null_safe)


@dataclass
class JoinBuilder:
    left: Expression
    right: Expression
    left_key: list
    right_key: list
    how: str = "inner"
    null_safe: bool = True

    def on(self, mapper: Callable | None = None) -> Join:
        return Join(self.left, self.right, self.left_key, self.right_key, mapper, self.how, self.null_safe)

    def build(self) -> Join:
        return self.on(None)


class Visitor:
    """Structural visitor over the expression AST — the public analysis
    surface mirroring the reference's ``Visitor`` trait
    (core/src/expression.rs:96-211, walk_* defaults at 213-305): derive
    and override ``visit_<nodename>`` (lower-case class name:
    ``visit_relation``, ``visit_select``, ``visit_join``, ...) for the
    nodes you care about; unhandled nodes fall through to
    ``generic_visit``, which recurses into ``children()`` exactly like
    the reference's walk functions. Call ``visit(expr)`` (or
    ``expr.accept(visitor)``) to run.

    Like the reference, an override REPLACES the walk for that node —
    call ``self.generic_visit(node)`` inside it to keep descending."""

    def visit(self, node: Expression):
        meth = getattr(
            self, f"visit_{type(node).__name__.lower()}", self.generic_visit
        )
        return meth(node)

    def generic_visit(self, node: Expression):
        for child in node.children():
            self.visit(child)


def walk(expr: Expression):
    """Pre-order generator over every node of an expression tree — the
    five-line walker a quick analysis pass wants when a full Visitor
    subclass is overkill. ``[type(n).__name__ for n in walk(e)]`` lists
    the plan shape."""
    yield expr
    for child in expr.children():
        yield from walk(child)


def _accept(self, visitor: "Visitor"):
    """Reference parity: ``expr.accept(v)`` ≡ ``v.visit(expr)``
    (core/src/expression.rs Visitor dispatch)."""
    return visitor.visit(self)


Expression.accept = _accept
