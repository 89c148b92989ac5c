"""Database — the catalog: named relations, inserts, evaluation, views.

Reference: core/src/database.rs:162-363. The reference stores relations as
sorted/deduplicated tuple vectors with a stable/recent/to_add ratchet
(core/src/database/instance.rs:97-113) and maintains views by semi-naive
delta propagation. Here relations are immutable DataFrames (inserts build a
union lineage that spills to immutable parquet generations, delta-only
writes with a file-count-triggered full rewrite — see _spill/_rewrite),
views are derived DataFrames recomputed-on-read with a cache
that is invalidated when a dependency changes — observationally identical to
the reference (always-current views, set semantics, snapshot clone) while
letting Catalyst own the physical plan. The genuinely incremental
delta-propagation path lives in codd_spark.streaming.incremental.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid
from dataclasses import dataclass, field
from functools import reduce
from typing import Any, Iterable

from pyspark.sql import DataFrame, Row, SparkSession

from codd_spark.errors import (
    InstanceExistsError,
    InstanceNotFoundError,
    SchemaMismatchError,
)
from codd_spark.plans import ast
from codd_spark.plans.compile import to_df
from codd_spark.plans.validate import assert_view_safe, dependencies


@dataclass(frozen=True)
class ViewRef:
    """Handle to a stored view (reference: core/src/expression/view.rs:7).

    ``token`` stamps the ref with the identity of the view it was minted
    for, so a ref from one database cannot silently resolve against
    another database's view that happens to share the integer id (the
    reference errors on wrong-database evaluation,
    core/src/database/evaluate.rs:781-787). Clones share tokens for the
    views that existed at clone time — a pre-clone ref stays valid in
    both copies — while views minted after the fork get fresh tokens, so
    post-fork refs are rejected across the boundary even though the
    integer ids collide by construction. An empty token (hand-built or
    legacy refs) skips the check."""

    id: int
    token: str = ""

    def scan(self) -> ast.ViewScan:
        """Use this view as a scannable relation in a larger expression."""
        return ast.ViewScan(self)


class _ViewEntry:
    """Reference: core/src/database.rs:70-91 — view + dependency DAG edges."""

    __slots__ = ("expr", "dep_rels", "dep_views", "dependents", "cached", "token")

    def __init__(
        self,
        expr: ast.Expression,
        dep_rels: set[str],
        dep_views: set[int],
        token: str = "",
    ):
        self.expr = expr
        self.dep_rels = dep_rels
        self.dep_views = dep_views
        self.dependents: set[int] = set()
        self.cached: DataFrame | None = None
        self.token = token


class _RelationEntry:
    """Reference: core/src/database.rs:26-36.

    A relation is ``base`` (the registered DataFrame unioned with the
    spilled insert generations) plus ``pending`` (DataFrames inserted
    since the last spill). ``df`` is the lazy union of both."""

    __slots__ = ("base", "pending", "gens", "dependents", "insert_count", "_df")

    def __init__(self, df: DataFrame):
        self.base = df
        self.pending: list[DataFrame] = []
        self.gens: list[str] = []  # spilled generation dirs, oldest first
        self.dependents: set[int] = set()
        self.insert_count = 0
        self._df: DataFrame | None = None

    @property
    def df(self) -> DataFrame:
        if self._df is None:
            self._df = reduce(DataFrame.union, self.pending, self.base)
        return self._df

    @df.setter
    def df(self, value: DataFrame) -> None:
        self.base, self.pending, self._df = value, [], None


# Spill pending inserts to a parquet generation every N inserts, so
# repeated small inserts don't grow the logical plan unboundedly (the
# reference's geometric batch merging, core/src/database/instance.rs:174-188,
# solves the same problem for sorted runs). Each spill writes ONLY the
# delta (cheap, latency stays flat); once a relation fragments past
# _GEN_FILE_LIMIT generations the whole relation is rewritten as one
# generation — the same file-count-triggered rewrite as the persistent
# view store (streaming/store.py).
_COMPACT_EVERY = 64
_GEN_FILE_LIMIT = 16


def check_insert_schema(name: str, base, new) -> None:
    """Verify an inserted DataFrame binds cleanly to the relation schema.

    Inserts are POSITIONAL (``DataFrame.union`` semantics, matching the
    reference's typed tuples, core/src/database.rs:203-210), so three
    silent mis-binds are possible that the reference's static typing
    rules out: arity drift (Spark errors, but late and cryptically),
    per-position type drift (Spark position-matches and miscasts), and
    the worst one — a frame whose columns are the RIGHT names in the
    WRONG order (Spark would bind name 'b' under column 'a' without a
    whisper). Raise :class:`SchemaMismatchError` naming the offending
    column before any rows are appended."""
    bf, nf = base.fields, new.fields
    if len(bf) != len(nf):
        raise SchemaMismatchError(
            f"insert into {name!r}: expected {len(bf)} columns "
            f"{[f.name for f in bf]}, got {len(nf)} {[f.name for f in nf]}"
        )
    base_names = [f.name.lower() for f in bf]
    new_names = [f.name.lower() for f in nf]
    if sorted(base_names) == sorted(new_names) and base_names != new_names:
        raise SchemaMismatchError(
            f"insert into {name!r}: columns are the relation's names in a "
            f"different order ({[f.name for f in nf]} vs "
            f"{[f.name for f in bf]}) — positional union would mis-bind; "
            "reorder with .select() first"
        )
    for b, n in zip(bf, nf):
        if b.dataType != n.dataType:
            raise SchemaMismatchError(
                f"insert into {name!r}: column {b.name!r} expects "
                f"{b.dataType.simpleString()}, got {n.dataType.simpleString()} "
                f"(from inserted column {n.name!r})"
            )


class Database:
    """A catalog of named relations + materialized views over a SparkSession.

    Reference API parity (core/src/database.rs:170-266): ``add_relation``,
    ``insert``, ``evaluate``, ``store_view``, plus ``clone`` for snapshot
    isolation (core/src/database.rs:345-363).
    """

    def __init__(self, spark: SparkSession, spill_dir: str | None = None):
        self.spark = spark
        self._relations: dict[str, _RelationEntry] = {}
        self._views: dict[int, _ViewEntry] = {}
        self._view_counter = 0
        # insert-spill storage; auto-created under the system temp dir on
        # first use. Generation files are immutable once written, which is
        # what keeps clone() snapshots valid (they scan old generations).
        self._spill_dir = spill_dir
        self._gen_counter = 0
        # once a clone exists, compaction must not delete superseded
        # generation dirs — the other copy may still scan them
        self._has_clones = False

    # -- relations -------------------------------------------------------
    def add_relation(self, name: str, schema: Any) -> None:
        """Create an empty relation with the given schema (DDL string or
        StructType). Reference: core/src/database.rs:189-200."""
        if name in self._relations:
            raise InstanceExistsError(f"relation {name!r} already exists")
        # emptyRDD: a [] literal parallelizes into defaultParallelism
        # EMPTY partitions that every consumer scans as tasks (r14)
        self._relations[name] = _RelationEntry(
            self.spark.createDataFrame(
                self.spark.sparkContext.emptyRDD(), schema=schema
            )
        )

    def register(self, name: str, df: DataFrame, replace: bool = False) -> None:
        """Bind an existing DataFrame (e.g. a parquet scan) as a relation."""
        if name in self._relations and not replace:
            raise InstanceExistsError(f"relation {name!r} already exists")
        self._relations[name] = _RelationEntry(df)
        self._invalidate_relation(name)

    def register_parquet(self, name: str, path: str, replace: bool = False) -> None:
        self.register(name, self.spark.read.parquet(path), replace=replace)

    def relation(self, name: str) -> DataFrame:
        try:
            return self._relations[name].df
        except KeyError:
            raise InstanceNotFoundError(f"relation {name!r} not found") from None

    def relations(self) -> list[str]:
        return sorted(self._relations)

    def insert(self, name: str, rows: DataFrame | Iterable[Any]) -> None:
        """Append rows (positional union against the relation schema);
        set-semantics dedup happens at evaluation. Reference:
        core/src/database.rs:203-210 (also lazy: work deferred)."""
        entry = self._relations.get(name)
        if entry is None:
            raise InstanceNotFoundError(f"relation {name!r} not found")
        if isinstance(rows, DataFrame):
            check_insert_schema(name, entry.base.schema, rows.schema)
            new_df = rows
        else:
            rows = list(rows)
            if not rows:
                return
            new_df = self.spark.createDataFrame(rows, schema=entry.base.schema)
        entry.pending.append(new_df)
        entry._df = None
        entry.insert_count += 1
        if len(entry.pending) >= _COMPACT_EVERY:
            self._spill(name, entry)
        self._invalidate_relation(name)

    # -- insert spill / compaction ----------------------------------------
    def _spill_path(self, name: str) -> str:
        if self._spill_dir is None:
            self._spill_dir = tempfile.mkdtemp(prefix="codd-spark-spill-")
        self._gen_counter += 1
        # uuid component: clones share the spill dir but must never reuse
        # a generation path the other copy wrote
        return os.path.join(
            self._spill_dir, name, f"gen-{self._gen_counter:06d}-{uuid.uuid4().hex[:8]}"
        )

    def _spill(self, name: str, entry: _RelationEntry) -> None:
        """Write the pending inserts (the DELTA only — cheap and flat in
        relation size) as one parquet generation and fold the scan into
        base; plan depth resets to #generations + 0 pending. Past
        _GEN_FILE_LIMIT generations, rewrite the whole relation as one."""
        path = self._spill_path(name)
        delta = reduce(DataFrame.union, entry.pending)
        delta.write.mode("overwrite").parquet(path)
        entry.base = entry.base.union(
            self.spark.read.schema(entry.base.schema).parquet(path)
        )
        entry.gens.append(path)
        entry.pending, entry._df = [], None
        if len(entry.gens) > _GEN_FILE_LIMIT:
            self._rewrite(name, entry)

    def _rewrite(self, name: str, entry: _RelationEntry) -> None:
        """Full rewrite: materialize the relation as a single generation
        (the file-count-triggered compaction of streaming/store.py).
        Superseded generations are removed unless a clone might scan them."""
        path = self._spill_path(name)
        entry.base.write.mode("overwrite").parquet(path)
        old = entry.gens
        entry.base = self.spark.read.schema(entry.base.schema).parquet(path)
        entry.gens = [path]
        entry._df = None
        if not self._has_clones:
            for g in old:
                shutil.rmtree(g, ignore_errors=True)

    # -- evaluation ------------------------------------------------------
    def df(self, expr: ast.Expression | DataFrame, distinct: bool = True) -> DataFrame:
        """Compile an expression to a DataFrame; ``distinct=True`` applies
        the reference's set semantics once at this boundary."""
        out = expr if isinstance(expr, DataFrame) else to_df(expr, self)
        return out.distinct() if distinct else out

    def evaluate(self, expr: ast.Expression | DataFrame) -> list[Row]:
        """Materialize as the reference does: sorted, deduplicated tuples
        (core/src/database/instance.rs:21-28; results are canonical-order
        vectors). Sorting happens only here, at collect time."""
        out = self.df(expr, distinct=True)
        return out.orderBy(*out.columns).collect()

    # -- SQL surface ------------------------------------------------------
    def sql(self, query: str) -> DataFrame:
        """Run Spark SQL over the catalog: every relation is visible as a
        temp view under its name, every stored view as ``view_<id>``. A
        strict superset of the reference's macro DSL (see codd_spark.dsl);
        the reference itself has no SQL parser (SURVEY.md §2.1)."""
        for name, entry in self._relations.items():
            entry.df.createOrReplaceTempView(name)
        for vid in self._views:
            self.view_df(vid).createOrReplaceTempView(f"view_{vid}")
        return self.spark.sql(query)

    def execute(self, command: str):
        """Execute one codd-DSL command (create relation / insert / query).
        See codd_spark.dsl for the grammar."""
        from codd_spark import dsl

        return dsl.execute(self, command)

    def to_sql(self, expr: ast.Expression) -> str:
        """Render an expression to ANSI SQL against this catalog's
        relation names — the catalog supplies the relation schemas the
        renderer needs for schema-dependent nodes (AsofJoin's
        collision-rename rule). SQL-string-spec expressions only; see
        plans/to_sql.py."""
        from codd_spark.plans.to_sql import to_sql as _render

        schemas = {name: entry.df.columns for name, entry in self._relations.items()}
        return _render(expr, schemas)

    # -- views -----------------------------------------------------------
    def store_view(self, expr: ast.Expression) -> ViewRef:
        """Materialize a view; it stays consistent as base relations grow.
        Reference: core/src/database.rs:229-266."""
        assert_view_safe(expr)
        dep_rels, dep_views = dependencies(expr)
        for rel in dep_rels:
            if rel not in self._relations:
                raise InstanceNotFoundError(f"relation {rel!r} not found")
        for vid in dep_views:
            if vid not in self._views:
                raise InstanceNotFoundError(f"view #{vid} not found")
        ref = ViewRef(self._view_counter, token=uuid.uuid4().hex)
        self._view_counter += 1
        entry = _ViewEntry(expr, dep_rels, dep_views, token=ref.token)
        self._views[ref.id] = entry
        for rel in dep_rels:
            self._relations[rel].dependents.add(ref.id)
        for vid in dep_views:
            self._views[vid].dependents.add(ref.id)
        return ref

    def view_df(self, ref: ViewRef | int) -> DataFrame:
        vid = ref.id if isinstance(ref, ViewRef) else ref
        entry = self._views.get(vid)
        if entry is None:
            raise InstanceNotFoundError(f"view #{vid} not found")
        if (
            isinstance(ref, ViewRef)
            and ref.token
            and entry.token
            and ref.token != entry.token
        ):
            # same integer id, different mint: the ref belongs to another
            # database (or to a view created after a clone fork). The
            # reference errors here rather than resolving to the
            # colliding view (core/src/database/evaluate.rs:781-787).
            raise InstanceNotFoundError(
                f"view #{vid} was created by a different database "
                "(ViewRef token mismatch)"
            )
        if entry.cached is None:
            entry.cached = to_df(entry.expr, self).distinct()
        return entry.cached

    def _invalidate_relation(self, name: str) -> None:
        entry = self._relations.get(name)
        if entry is None:
            return
        seen: set[int] = set()
        stack = list(entry.dependents)
        while stack:
            vid = stack.pop()
            if vid in seen:
                continue
            seen.add(vid)
            view = self._views[vid]
            view.cached = None
            stack.extend(view.dependents)

    # -- snapshots -------------------------------------------------------
    def clone(self) -> "Database":
        """Snapshot copy with isolation: later inserts into either copy do
        not affect the other (reference: core/src/database.rs:345-363,
        test 410-441). Cheap here — DataFrames are immutable."""
        self._has_clones = True
        other = Database(self.spark, spill_dir=self._spill_dir)
        other._has_clones = True  # shares this instance's generation files
        for name, entry in self._relations.items():
            clone_entry = _RelationEntry(entry.base)
            clone_entry.pending = list(entry.pending)
            clone_entry.gens = list(entry.gens)
            clone_entry.dependents = set(entry.dependents)
            clone_entry.insert_count = entry.insert_count
            other._relations[name] = clone_entry
        for vid, view in self._views.items():
            # token is shared: a pre-clone ViewRef stays valid in both
            # copies (views minted after the fork get fresh tokens, so
            # post-fork refs cannot cross the boundary)
            clone_view = _ViewEntry(
                view.expr, set(view.dep_rels), set(view.dep_views), token=view.token
            )
            clone_view.dependents = set(view.dependents)
            clone_view.cached = view.cached
            other._views[vid] = clone_view
        other._view_counter = self._view_counter
        return other
