"""Restart-surviving incremental database: parquet-backed view store.

``IncrementalDatabase`` (streaming/incremental.py) keeps its
stable/recent/to_add sets as in-memory DataFrames whose lineage is
truncated by localCheckpoint — state dies with the process. This module
persists the same machinery: every instance's **stable** set lives as
appended parquet batches under ``storage_dir``, and a JSON manifest
records the catalog (relations + schemas, views + pickled expression
ASTs), so ``PersistentIncrementalDatabase.open`` restores the database
in a fresh process and delta propagation resumes where it left off.

Design notes (scale-first):
- stable == ``spark.read.parquet(dir)``: promotion is an append write of
  the recent delta, so lineage is trivially bounded (no checkpoint
  chain), reads get parquet pushdown/pruning, and batches are exactly
  the reference's sorted-run batches (core/src/database/instance.rs:99-101,
  the ``Vec<Tuples<T>>`` of stable batches — ours are parquet files).
- recent/to_add stay in memory: they are pre-promotion working state;
  call ``stabilize()`` before shutdown to flush (the reference has the
  same lazy contract, core/src/database.rs:203-210).
- The manifest pickles view ASTs — valid only for string-form
  predicates/projections (the DSL's own output). Column objects or
  Python callables in an AST are rejected at store_view time with a
  clear error, matching the "SQL strings are the durable surface" rule.

The durable layout is one directory per instance:
    {storage_dir}/manifest.json
    {storage_dir}/rel/{name}/part-*.parquet
    {storage_dir}/view/{id}/part-*.parquet
"""

from __future__ import annotations

import base64
import json
import os
import pickle

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from codd_spark.errors import UnsupportedExpressionError
from codd_spark.plans import ast
from codd_spark.streaming.incremental import IncrementalDatabase, _Instance

# Append deltas coalesced to few files (deltas are small relative to
# stable); rewrite the directory once it fragments past the limit — the
# parquet analogue of the reference's geometric batch merge
# (core/src/database/instance.rs:174-188).
_APPEND_FILES = 4
_COMPACT_FILE_LIMIT = 64


class _ParquetInstance(_Instance):
    """An _Instance whose stable set is an appended parquet directory."""

    __slots__ = ("path", "spark", "schema")

    def __init__(self, empty: DataFrame, path: str):
        super().__init__(empty)
        self.path = path
        self.spark = empty.sparkSession
        self.schema = empty.schema
        self._recover_interrupted_compaction()
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            # seed the directory so reads always succeed with the schema
            empty.write.mode("overwrite").parquet(path)
        self.stable = self._read()

    def _recover_interrupted_compaction(self) -> None:
        """Crash recovery: if the process died inside compact()'s rename
        window (live dir moved to .old, replacement not yet renamed in),
        the previous generation at .old is complete — restore it. The
        .compacting dir is never trusted as the only copy and is always
        discarded (compaction is a pure rewrite, so no data is lost)."""
        import shutil

        old = self.path + ".old"
        if (not os.path.exists(os.path.join(self.path, "_SUCCESS"))
                and os.path.exists(os.path.join(old, "_SUCCESS"))):
            shutil.rmtree(self.path, ignore_errors=True)
            os.rename(old, self.path)
        shutil.rmtree(self.path + ".compacting", ignore_errors=True)
        shutil.rmtree(old, ignore_errors=True)

    def _read(self) -> DataFrame:
        return self.spark.read.schema(self.schema).parquet(self.path)

    def seed_stable(self, df: DataFrame) -> None:
        df.write.mode("append").parquet(self.path)
        self.stable = self._read()

    def promote(self) -> None:
        self.recent.coalesce(_APPEND_FILES).write.mode("append").parquet(self.path)
        self.merges += 1
        if self._file_count() > _COMPACT_FILE_LIMIT:
            self.compact()
        self.stable = self._read()

    def _file_count(self) -> int:
        return sum(1 for f in os.listdir(self.path) if f.endswith(".parquet"))

    def snapshot(self) -> _Instance:
        """Snapshot for clone(): the live stable reads this directory, which
        compact() rewrites in place — decouple the copy via an eager
        localCheckpoint so the clone survives later compactions."""
        inst = super().snapshot()
        inst.stable = self.stable.localCheckpoint(eager=True)
        return inst

    def compact(self) -> None:
        """Rewrite the fragmented directory as few files. Crash-safe: the
        new directory is fully written beside the old one before the swap;
        a failure between the two renames rolls the old generation back
        into place, and a hard crash there is repaired at open time by
        _recover_interrupted_compaction (the .old dir is complete until
        the swap finishes). Tested by the kill-between-steps test in
        tests/test_persistent_store.py."""
        import shutil

        tmp, old = self.path + ".compacting", self.path + ".old"
        shutil.rmtree(tmp, ignore_errors=True)
        self._read().coalesce(_APPEND_FILES).write.mode("overwrite").parquet(tmp)
        shutil.rmtree(old, ignore_errors=True)
        os.rename(self.path, old)
        try:
            os.rename(tmp, self.path)
        except OSError:
            os.rename(old, self.path)  # roll back: old generation is intact
            shutil.rmtree(tmp, ignore_errors=True)
            self.stable = self._read()
            raise
        shutil.rmtree(old, ignore_errors=True)
        self.stable = self._read()


def _pickle_expr(expr: ast.Expression) -> str:
    try:
        return base64.b64encode(pickle.dumps(expr)).decode("ascii")
    except Exception as exc:  # Column / lambda predicates aren't durable
        raise UnsupportedExpressionError(
            "persistent views require string-form predicates/projections "
            f"(expression is not picklable: {exc})"
        ) from exc


class PersistentIncrementalDatabase(IncrementalDatabase):
    """IncrementalDatabase whose stable state and catalog survive process
    restarts. Create fresh with ``PersistentIncrementalDatabase(spark,
    storage_dir)``; reopen with ``PersistentIncrementalDatabase.open``."""

    def __init__(self, spark: SparkSession, storage_dir: str):
        super().__init__(spark)
        self.storage_dir = storage_dir
        os.makedirs(storage_dir, exist_ok=True)
        self._manifest_path = os.path.join(storage_dir, "manifest.json")
        if not os.path.exists(self._manifest_path):
            self._write_manifest({"relations": {}, "views": []})

    # -- storage hooks ----------------------------------------------------
    def _new_instance(self, empty: DataFrame, kind: str, key) -> _Instance:
        return _ParquetInstance(
            empty, os.path.join(self.storage_dir, kind, str(key))
        )

    def _on_relation_added(self, name: str, empty: DataFrame) -> None:
        m = self._read_manifest()
        m["relations"][name] = empty.schema.json()
        self._write_manifest(m)

    def _on_view_stored(self, vid: int, expr: ast.Expression) -> None:
        m = self._read_manifest()
        m["views"].append({"id": vid, "expr": _pickle_expr(expr)})
        self._write_manifest(m)

    def store_view(self, expr: ast.Expression):
        _pickle_expr(expr)  # reject non-durable expressions BEFORE seeding
        return super().store_view(expr)

    # -- reopen -----------------------------------------------------------
    @classmethod
    def open(cls, spark: SparkSession, storage_dir: str) -> "PersistentIncrementalDatabase":
        """Restore catalog + stable state written by a previous process.
        Views re-attach to their existing parquet state — no recompute, no
        re-seed. Un-flushed recent/to_add batches (no stabilize() before
        exit) are not recovered — same lazy-insert contract as the
        reference."""
        db = cls(spark, storage_dir)
        m = db._read_manifest()
        for name, schema_json in m["relations"].items():
            schema = StructType.fromJson(json.loads(schema_json))
            db.add_relation(name, schema)
        for v in sorted(m["views"], key=lambda v: v["id"]):
            db._restore_view(v["id"], pickle.loads(base64.b64decode(v["expr"])))
        return db

    def _restore_view(self, vid: int, expr: ast.Expression) -> None:
        """Attach a view entry to its already-materialized parquet state
        (store_view minus validation-seeding; the manifest already has it)."""
        from codd_spark.plans.validate import dependencies
        from codd_spark.streaming.incremental import _ViewEntry

        path = os.path.join(self.storage_dir, "view", str(vid))
        empty = self.spark.read.parquet(path).limit(0)
        inst = self._new_instance(empty, "view", vid)
        self._views[vid] = _ViewEntry(expr, inst)
        self._view_counter = max(self._view_counter, vid + 1)
        dep_rels, dep_views = dependencies(expr)
        for rel in dep_rels:
            self._relations[rel].dependents.add(vid)
        for dv in dep_views:
            self._views[dv].dependents.add(vid)

    # -- manifest ----------------------------------------------------------
    def _read_manifest(self) -> dict:
        with open(self._manifest_path) as f:
            return json.load(f)

    def _write_manifest(self, m: dict) -> None:
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f, indent=1)
        os.replace(tmp, self._manifest_path)
