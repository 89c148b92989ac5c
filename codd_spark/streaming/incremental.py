"""Incremental materialized-view maintenance — semi-naive delta propagation.

This is the DataFrame re-expression of the reference's distinguishing
feature (datafrog-style IVM): every instance keeps three tuple sets —
``stable`` (already reflected in dependent views), ``recent`` (being
propagated), ``to_add`` (pending batches) — and views are updated by
evaluating only the *delta* of their expression, never recomputed.

Reference parity map:
- Instance stable/recent/to_add ratchet -> _Instance / _Instance.changed
  (core/src/database/instance.rs:97-206)
- recent-only expression evaluation (IncrementalCollector) -> _recent_eval
  (core/src/database/evaluate.rs:11-250); delta rule for binary ops, e.g.
  join: ΔL⋈S(R) ∪ S(L)⋈ΔR ∪ ΔL⋈ΔR (evaluate.rs:235-247)
- stabilize cascade with cycle guards -> _stabilize_relation/_stabilize_view
  (core/src/database.rs:287-336)
- monotonicity: insert-only, Difference rejected under views
  (core/src/database/validate.rs:21-48)

Execution model: the fixpoint loop is a *driver-side control loop* over
fully distributed DataFrame operations — iteration count is bounded by the
view-DAG depth, not by data size. Stable sets are cached and periodically
lineage-truncated (localCheckpoint), mirroring the reference's geometric
batch merging (instance.rs:174-188) which solves the same
unbounded-recursion problem for sorted runs.

When to use which engine: ``Database`` (recompute-on-read) gives identical
observable semantics and is the right default — Spark's lazy DAG makes
"always current" free. ``IncrementalDatabase`` wins when views are far
smaller than their inputs and inserts are frequent relative to reads —
each insert costs O(Δ ⋈ stable), not O(full recompute).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Row, SparkSession

from codd_spark.errors import InstanceExistsError, InstanceNotFoundError
from codd_spark.plans import ast
from codd_spark.plans.compile import (
    _apply_mapper,
    _dedup_names,
    _resolve_cols,
    _resolve_predicate,
)
from codd_spark.plans.validate import assert_view_safe, dependencies
from codd_spark.database import ViewRef

import contextlib
import functools

# Truncate DataFrame lineage after this many merges into a stable set; keeps
# the logical plan bounded across long insert/stabilize histories.
_CHECKPOINT_EVERY = 8


@contextlib.contextmanager
def _no_constraint_propagation(spark: SparkSession):
    """Catalyst's InferFiltersFromConstraints crashes with
    ``NoSuchElementException: key not found: <attr>`` (in
    Union.rewriteConstraints) on the plan shape semi-naive maintenance
    builds for self-joins: a union of semi-join delta branches whose
    subtrees share leaf attributes, stacked on an unpromoted stable set
    that embeds earlier deltas of the same shape (caught by the IVM fuzz
    on a semi(σ(t) ⋉ σ(t)) view). Constraint propagation buys nothing on
    these short, checkpoint-bounded internal plans, so it is switched off
    strictly around the engine's OWN materialization actions and restored
    after — user-facing plans keep the session default."""
    key = "spark.sql.constraintPropagation.enabled"
    try:
        prev = spark.conf.get(key)
    except Exception:
        prev = "true"
    spark.conf.set(key, "false")
    try:
        yield
    finally:
        spark.conf.set(key, prev)


class _Instance:
    """stable/recent/to_add tuple sets for one relation or view
    (reference: core/src/database/instance.rs:97-113)."""

    __slots__ = ("stable", "recent", "to_add", "merges")

    def __init__(self, empty: DataFrame):
        self.stable = empty
        self.recent = empty
        self.to_add: list[DataFrame] = []
        self.merges = 0

    def insert(self, df: DataFrame) -> None:
        self.to_add.append(df)

    def seed_stable(self, df: DataFrame) -> None:
        """Install an initial stable set (view seeding)."""
        with _no_constraint_propagation(df.sparkSession):
            self.stable = df.localCheckpoint(eager=True)

    def promote(self) -> None:
        """Merge the nonempty recent set into stable."""
        # recent is disjoint from stable by construction -> plain union
        self.stable = self.stable.union(self.recent)
        self.merges += 1
        if self.merges % _CHECKPOINT_EVERY == 0:
            with _no_constraint_propagation(self.stable.sparkSession):
                self.stable = self.stable.localCheckpoint(eager=True)

    def changed(self) -> bool:
        """Promote recent->stable, then (to_add minus stable)->recent.
        Returns True iff there is a new nonempty recent to propagate.
        Reference: core/src/database/instance.rs:173-206."""
        with _no_constraint_propagation(self.stable.sparkSession):
            if not self.recent.isEmpty():
                self.promote()
            self.recent = self.recent.limit(0)
            if self.to_add:
                pending = self.to_add[0]
                for b in self.to_add[1:]:
                    pending = pending.union(b)
                self.to_add = []
                # checkpoint BEFORE the emptiness probe: recent is read
                # several times (emptiness, delta eval per dependent view,
                # promotion next round) and each read would otherwise
                # recompute the full distinct-minus-stable pipeline
                fresh = (
                    pending.distinct()
                    .subtract(self.stable)
                    .localCheckpoint(eager=True)
                )
                if not fresh.isEmpty():
                    self.recent = fresh
                    return True
        return False

    def all_df(self) -> DataFrame:
        return self.stable.union(self.recent)

    def snapshot(self) -> "_Instance":
        """Independent copy of this instance's state. DataFrames are
        immutable, so sharing them is safe; the mutable containers
        (to_add list) are copied. Subclasses whose stable set reads live
        external storage must decouple it (see _ParquetInstance)."""
        inst = _Instance(self.stable.limit(0))
        inst.stable = self.stable
        inst.recent = self.recent
        inst.to_add = list(self.to_add)
        inst.merges = self.merges
        return inst


class _ViewEntry:
    __slots__ = ("expr", "instance", "dependents", "stabilizing", "token")

    def __init__(self, expr: ast.Expression, instance: _Instance, token: str = ""):
        self.expr = expr
        self.instance = instance
        self.dependents: set[int] = set()
        self.stabilizing = False
        self.token = token


class _RelEntry:
    __slots__ = ("instance", "dependents")

    def __init__(self, instance: _Instance):
        self.instance = instance
        self.dependents: set[int] = set()


class IncrementalDatabase:
    """Insert-only database whose stored views are maintained by delta
    propagation (reference: core/src/database.rs:162-336)."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._relations: dict[str, _RelEntry] = {}
        self._views: dict[int, _ViewEntry] = {}
        self._view_counter = 0

    # -- relations -------------------------------------------------------
    def add_relation(self, name: str, schema) -> None:
        if name in self._relations:
            raise InstanceExistsError(f"relation {name!r} already exists")
        empty = self.spark.createDataFrame(
            self.spark.sparkContext.emptyRDD(), schema=schema
        )  # 0 partitions, not defaultParallelism empties (r14)
        self._relations[name] = _RelEntry(self._new_instance(empty, "rel", name))
        self._on_relation_added(name, empty)

    def _new_instance(self, empty: DataFrame, kind: str, key) -> _Instance:
        """Storage hook — subclasses may back instances differently."""
        return _Instance(empty)

    def _on_relation_added(self, name: str, empty: DataFrame) -> None:
        """Catalog hook — subclasses persist the relation definition."""

    def insert(self, name: str, rows: DataFrame | list) -> None:
        """Lazy: batches queue on to_add; propagation happens at the next
        evaluate/stabilize (reference: core/src/database.rs:203-210)."""
        entry = self._relations.get(name)
        if entry is None:
            raise InstanceNotFoundError(f"relation {name!r} not found")
        if isinstance(rows, DataFrame):
            from codd_spark.database import check_insert_schema

            check_insert_schema(name, entry.instance.stable.schema, rows.schema)
            df = rows
        else:
            rows = list(rows)
            if not rows:
                return
            df = self.spark.createDataFrame(rows, schema=entry.instance.stable.schema)
        entry.instance.insert(df)

    # -- views -----------------------------------------------------------
    def store_view(self, expr: ast.Expression) -> ViewRef:
        """Validate monotonicity, register DAG edges, seed from the current
        stable tuples (reference: core/src/database.rs:229-266,
        instance.rs:274-282)."""
        assert_view_safe(expr)
        dep_rels, dep_views = dependencies(expr)
        for rel in dep_rels:
            if rel not in self._relations:
                raise InstanceNotFoundError(f"relation {rel!r} not found")
        for vid in dep_views:
            if vid not in self._views:
                raise InstanceNotFoundError(f"view #{vid} not found")
        seed = self._eval(expr, which="stable").distinct()
        import uuid as _uuid

        ref = ViewRef(self._view_counter, token=_uuid.uuid4().hex)
        self._view_counter += 1
        inst = self._new_instance(seed.limit(0), "view", ref.id)
        inst.seed_stable(seed)
        entry = _ViewEntry(expr, inst, token=ref.token)
        self._views[ref.id] = entry
        for rel in dep_rels:
            self._relations[rel].dependents.add(ref.id)
        for vid in dep_views:
            self._views[vid].dependents.add(ref.id)
        self._on_view_stored(ref.id, expr)
        return ref

    def _on_view_stored(self, vid: int, expr: ast.Expression) -> None:
        """Catalog hook — subclasses persist the view definition."""

    # -- stabilization (the semi-naive fixpoint) ---------------------------
    def stabilize(self) -> None:
        for name in sorted(self._relations):
            self._stabilize_relation(name)

    def _stabilize_relation(self, name: str) -> None:
        # reference: core/src/database.rs:317-336
        entry = self._relations[name]
        while entry.instance.changed():
            for vid in sorted(entry.dependents):
                self._update_view(vid)
                self._stabilize_view(vid)

    def _stabilize_view(self, vid: int) -> None:
        # reference: core/src/database.rs:287-313 (cycle guard included)
        entry = self._views[vid]
        if entry.stabilizing:
            return
        entry.stabilizing = True
        try:
            while entry.instance.changed():
                for dep_vid in sorted(entry.dependents):
                    self._update_view(dep_vid)
                    self._stabilize_view(dep_vid)
        finally:
            entry.stabilizing = False

    def _update_view(self, vid: int) -> None:
        """Evaluate the view expression's *recent-derivable* tuples only and
        queue them (reference: ViewInstance::stabilize, instance.rs:284-290)."""
        entry = self._views[vid]
        delta = self._eval(entry.expr, which="recent")
        entry.instance.insert(delta)

    # -- snapshots ---------------------------------------------------------
    def clone(self) -> "IncrementalDatabase":
        """Snapshot copy with isolation, INCLUDING materialized view state:
        later inserts into either copy do not affect the other's views
        (reference: core/src/database.rs:345-363, isolation test
        database.rs:410-441). Cheap — DataFrames are immutable, so only
        the instance containers and the view DAG are copied; no view is
        recomputed. Persistent subclasses return an in-memory snapshot
        fork (the clone does not write to the original's storage_dir)."""
        other = IncrementalDatabase(self.spark)
        for name, entry in self._relations.items():
            rel = _RelEntry(entry.instance.snapshot())
            rel.dependents = set(entry.dependents)
            other._relations[name] = rel
        for vid, view in self._views.items():
            # token shared: pre-clone refs stay valid in both copies
            ve = _ViewEntry(view.expr, view.instance.snapshot(), token=view.token)
            ve.dependents = set(view.dependents)
            other._views[vid] = ve
        other._view_counter = self._view_counter
        return other

    # -- evaluation --------------------------------------------------------
    def df(self, expr: ast.Expression) -> DataFrame:
        """Stabilize affected state, then return the (set-semantics)
        DataFrame of the expression over it."""
        self._stabilize_for(expr)
        return self._eval(expr, which="all").distinct()

    def _stabilize_for(self, expr: ast.Expression) -> None:
        dep_rels, dep_views = dependencies(expr)
        seen_rels = set(dep_rels)
        stack = list(dep_views)
        while stack:
            vid = stack.pop()
            if vid not in self._views:
                raise InstanceNotFoundError(f"view #{vid} not found")
            r, v = dependencies(self._views[vid].expr)
            seen_rels |= r
            stack.extend(v)
        for name in sorted(seen_rels):
            if name not in self._relations:
                raise InstanceNotFoundError(f"relation {name!r} not found")
            self._stabilize_relation(name)

    def evaluate(self, expr: ast.Expression) -> list[Row]:
        """Stabilize affected state, then return sorted deduplicated tuples
        (reference: core/src/database.rs:179-185 + evaluate.rs:541-546)."""
        out = self.df(expr)
        # the "all" plan can embed the same self-join union shapes the
        # maintenance actions guard against — same Catalyst workaround
        with _no_constraint_propagation(self.spark):
            return out.orderBy(*out.columns).collect()

    def view_rows(self, ref: ViewRef) -> list[Row]:
        return self.evaluate(ref.scan())

    # -- recursive (stable, recent, all) evaluation ------------------------
    def _eval(self, expr: ast.Expression, which: str) -> DataFrame:
        """Evaluate an expression over stable tuples only, recent-derivable
        tuples only (the semi-naive delta), or everything.

        The delta rules mirror the reference's IncrementalCollector
        (core/src/database/evaluate.rs:11-250): unary ops distribute over Δ;
        for binary joins/products/intersects the delta is
        ΔL op S(R) ∪ S(L) op ΔR ∪ ΔL op ΔR.
        """
        if isinstance(expr, ast.Relation):
            inst = self._rel_instance(expr.name)
            return self._pick(inst, which)

        if isinstance(expr, ast.ViewScan):
            entry = self._views.get(expr.ref.id)
            if entry is None:
                raise InstanceNotFoundError(f"view #{expr.ref.id} not found")
            ref = expr.ref
            if (
                isinstance(ref, ViewRef)
                and ref.token
                and entry.token
                and ref.token != entry.token
            ):
                # wrong-database ref: same integer id, different mint
                # (reference: core/src/database/evaluate.rs:781-787)
                raise InstanceNotFoundError(
                    f"view #{ref.id} was created by a different database "
                    "(ViewRef token mismatch)"
                )
            return self._pick(entry.instance, which)

        if isinstance(expr, (ast.Empty, ast.Singleton)):
            from codd_spark.plans.compile import to_df

            const = to_df(expr, self)  # type: ignore[arg-type]
            # constants are "stable from the start": their delta is empty
            return const if which in ("stable", "all") else const.limit(0)

        if isinstance(expr, ast.Full):
            from codd_spark.errors import UnsupportedExpressionError

            raise UnsupportedExpressionError("Full cannot be evaluated")

        if isinstance(expr, ast.Select):
            child = self._eval(expr.child, which)
            return child.filter(_resolve_predicate(expr.predicate, child))

        if isinstance(expr, ast.Project):
            child = self._eval(expr.child, which)
            return child.select(*_resolve_cols(expr.cols, child))

        if isinstance(expr, ast.Union):
            return self._eval(expr.left, which).union(self._eval(expr.right, which))

        if isinstance(expr, ast.Intersect):
            if which in ("stable", "all"):
                return self._eval(expr.left, which).intersect(self._eval(expr.right, which))
            # Δ(L∩R) = ΔL∩all(R) ∪ all(L)∩ΔR  (reference: evaluate.rs:110-117)
            dl = self._eval(expr.left, "recent").intersect(self._eval(expr.right, "all"))
            dr = self._eval(expr.left, "all").intersect(self._eval(expr.right, "recent"))
            return dl.union(dr)

        if isinstance(expr, ast.Difference):
            # non-monotone: only valid outside views; delta reads full state
            # (reference: evaluate.rs:121-146 — correct only because views
            # over Difference are rejected)
            if which in ("stable", "all"):
                return self._eval(expr.left, which).subtract(self._eval(expr.right, "all"))
            return self._eval(expr.left, "recent").subtract(self._eval(expr.right, "all"))

        if isinstance(expr, ast.Product):
            return self._delta_binary(
                expr, which, lambda l, r: (l.crossJoin(r), None), expr.mapper
            )

        if isinstance(expr, ast.Join):
            how = (expr.how or "inner").lower()

            def keyed(l: DataFrame, r: DataFrame, right_keys_only: bool = False):
                lkeys = _resolve_cols(expr.left_key, l)
                rkeys = _resolve_cols(expr.right_key, r)
                lk = l.select("*", *[k.alias(f"__codd_k{i}") for i, k in enumerate(lkeys)]).alias("l")
                if right_keys_only:
                    # semi/anti output carries no right columns, so project
                    # the probe side down to freshly-aliased keys only.
                    # Besides narrowing the build side, the fresh exprIds
                    # break the leaf-attribute sharing a self-join's delta
                    # branches otherwise have — unioning those branches
                    # crashes Catalyst's Union constraint rewriting
                    # (NoSuchElementException at localCheckpoint; caught by
                    # the IVM fuzz on semi(σ(t) ⋉ σ(t)))
                    rk = r.select(
                        *[k.alias(f"__codd_k{i}") for i, k in enumerate(rkeys)]
                    ).alias("r")
                else:
                    rk = r.select("*", *[k.alias(f"__codd_k{i}") for i, k in enumerate(rkeys)]).alias("r")
                pairs = [
                    lk[f"__codd_k{i}"].eqNullSafe(rk[f"__codd_k{i}"])
                    if expr.null_safe
                    else lk[f"__codd_k{i}"] == rk[f"__codd_k{i}"]
                    for i in range(len(lkeys))
                ]
                cond = functools.reduce(lambda a, b: a & b, pairs)
                return lk, rk, cond, len(lkeys)

            if how == "inner":
                def do_join(l: DataFrame, r: DataFrame):
                    lk, rk, cond, _ = keyed(l, r)
                    return lk.join(rk, on=cond, how="inner"), (lk, rk)

                return self._delta_binary(expr, which, do_join, expr.mapper)

            def run_how(l: DataFrame, r: DataFrame) -> DataFrame:
                # mirror compile.py's batch semantics exactly
                keys_only = how in (
                    "semi", "left_semi", "leftsemi", "anti", "left_anti", "leftanti"
                )
                lk, rk, cond, nk = keyed(l, r, right_keys_only=keys_only)
                joined = lk.join(rk, on=cond, how=how)
                if keys_only:
                    return joined.drop(*[f"__codd_k{i}" for i in range(nk)])
                return joined.select(*_apply_mapper(expr.mapper, lk, rk))

            if how in ("semi", "left_semi", "leftsemi"):
                # semi join is monotone in BOTH inputs (it distributes over
                # union on each side), so the standard binary delta rule
                # applies: Δ(L⋉R) = ΔL⋉S(R) ∪ S(L)⋉ΔR ∪ ΔL⋉ΔR
                if which in ("stable", "all"):
                    return run_how(self._eval(expr.left, which), self._eval(expr.right, which))
                sl = self._eval(expr.left, "stable")
                sr = self._eval(expr.right, "stable")
                dl = self._eval(expr.left, "recent")
                dr = self._eval(expr.right, "recent")
                return run_how(dl, sr).union(run_how(sl, dr)).union(run_how(dl, dr))

            # anti / outer joins: non-monotone (a new right row can REMOVE
            # an anti match or supersede an outer join's null padding), so
            # there is no insert-only delta — fine ad-hoc, rejected under
            # views by assert_view_safe (same class as Difference/AsofJoin)
            if which == "recent":
                from codd_spark.errors import UnsupportedExpressionError

                raise UnsupportedExpressionError(
                    f"Join(how={how!r}) has no monotone delta "
                    "(views over it are rejected)"
                )
            return run_how(self._eval(expr.left, which), self._eval(expr.right, which))

        if isinstance(expr, ast.RangeJoin):
            # monotone inner join -> the standard binary delta rule applies:
            # Δ(L⋈R) = ΔL⋈S(R) ∪ S(L)⋈ΔR ∪ ΔL⋈ΔR
            from codd_spark.operators.joins import range_join

            def rj(l: DataFrame, r: DataFrame) -> DataFrame:
                return range_join(
                    l, r, expr.left_point, expr.right_start, expr.right_end,
                    on=list(expr.on) if expr.on else None,
                    bucket_width=expr.bucket_width,
                )

            if which in ("stable", "all"):
                return rj(self._eval(expr.left, which), self._eval(expr.right, which))
            sl = self._eval(expr.left, "stable")
            sr = self._eval(expr.right, "stable")
            dl = self._eval(expr.left, "recent")
            dr = self._eval(expr.right, "recent")
            return rj(dl, sr).union(rj(sl, dr)).union(rj(dl, dr))

        if isinstance(expr, ast.AsofJoin):
            # non-monotone: fine ad-hoc (which='all'), no delta form —
            # assert_view_safe already rejects it under stored views
            if which == "recent":
                from codd_spark.errors import UnsupportedExpressionError

                raise UnsupportedExpressionError(
                    "AsofJoin has no monotone delta (views over it are rejected)"
                )
            from codd_spark.operators.joins import asof_join

            return asof_join(
                self._eval(expr.left, which),
                self._eval(expr.right, which),
                on=list(expr.on),
                left_ts=expr.left_ts,
                right_ts=expr.right_ts,
                right_cols=list(expr.right_cols) if expr.right_cols is not None else None,
                suffix=expr.suffix,
            )

        raise InstanceNotFoundError(f"unknown expression node {type(expr).__name__}")

    def _delta_binary(self, expr, which: str, combine, mapper) -> DataFrame:
        """Shared delta logic for Product/Join.
        stable  = S(L) op S(R)
        recent  = ΔL op S(R) ∪ S(L) op ΔR ∪ ΔL op ΔR
        all     = all(L) op all(R)
        (reference: evaluate.rs:184-193 product, 235-247 join)"""

        def run(l: DataFrame, r: DataFrame) -> DataFrame:
            joined, aliased = combine(l, r)
            if aliased is None:
                la, ra = l.alias("l"), r.alias("r")
                joined = la.crossJoin(ra)
            else:
                la, ra = aliased
            return joined.select(*_apply_mapper(mapper, la, ra))

        if which == "all":
            return run(self._eval(expr.left, "all"), self._eval(expr.right, "all"))
        if which == "stable":
            return run(self._eval(expr.left, "stable"), self._eval(expr.right, "stable"))
        sl = self._eval(expr.left, "stable")
        sr = self._eval(expr.right, "stable")
        dl = self._eval(expr.left, "recent")
        dr = self._eval(expr.right, "recent")
        return run(dl, sr).union(run(sl, dr)).union(run(dl, dr))

    # -- helpers -----------------------------------------------------------
    def _rel_instance(self, name: str) -> _Instance:
        entry = self._relations.get(name)
        if entry is None:
            raise InstanceNotFoundError(f"relation {name!r} not found")
        return entry.instance

    @staticmethod
    def _pick(inst: _Instance, which: str) -> DataFrame:
        if which == "stable":
            return inst.stable
        if which == "recent":
            return inst.recent
        return inst.all_df()
