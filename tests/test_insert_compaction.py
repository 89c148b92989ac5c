"""Insert-lineage compaction: 1k tiny inserts must keep the logical plan
bounded (spill to parquet generations + file-count-triggered rewrite) and
keep insert latency flat — the in-session analogue of the persistent
store's compaction (streaming/store.py)."""

import statistics
import time

from codd_spark.database import Database, _COMPACT_EVERY, _GEN_FILE_LIMIT


def _plan_depth(df) -> int:
    return df._jdf.queryExecution().analyzed().toString().count("Union")


def test_thousand_tiny_inserts_bounded_and_correct(spark, tmp_path):
    db = Database(spark, spill_dir=str(tmp_path))
    db.add_relation("t", "k LONG, v STRING")

    lat = []
    for i in range(1000):
        t0 = time.perf_counter()
        db.insert("t", [(i, f"v{i}")])
        lat.append(time.perf_counter() - t0)

    # plan depth bounded: never more than one pending window + the
    # generation scans (a naive union lineage would hold 1000 Unions)
    assert _plan_depth(db.relation("t")) <= _COMPACT_EVERY + _GEN_FILE_LIMIT + 2

    # correctness: nothing lost across spills and the full rewrite
    rows = db.evaluate(db.relation("t"))
    assert len(rows) == 1000
    assert rows[0].k == 0 and rows[-1].k == 999

    # latency stays flat: the steady-state insert (plan-building only)
    # must not degrade as history accumulates. Compare medians of the
    # first and last quarter; medians skip the periodic spill ticks.
    first, last = lat[: len(lat) // 4], lat[-len(lat) // 4 :]
    assert statistics.median(last) < 10 * statistics.median(first) + 0.01


def test_insert_spill_preserves_clone_isolation(spark, tmp_path, monkeypatch):
    """A clone taken mid-history stays frozen while the original keeps
    inserting through spills and a full rewrite (reference snapshot test:
    core/src/database.rs:410-441). Compaction thresholds are shrunk so the
    rewrite path triggers cheaply."""
    import codd_spark.database as dbmod

    monkeypatch.setattr(dbmod, "_COMPACT_EVERY", 4)
    monkeypatch.setattr(dbmod, "_GEN_FILE_LIMIT", 3)
    db = Database(spark, spill_dir=str(tmp_path))
    db.add_relation("t", "k LONG")
    for i in range(10):
        db.insert("t", [(i,)])
    snap = db.clone()
    for i in range(10, 10 + 4 * 5):
        db.insert("t", [(i,)])  # forces spills AND the full rewrite
    assert len(snap.evaluate(snap.relation("t"))) == 10
    assert len(db.evaluate(db.relation("t"))) == 30
