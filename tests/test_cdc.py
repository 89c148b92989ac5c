"""CDC operators: merge_upsert (MERGE INTO semantics as anti join +
union) and scd2_history (type-2 interval construction)."""

from datetime import datetime

import pytest


def test_merge_upsert_update_insert_delete(spark):
    from codd_spark.operators.cdc import merge_upsert

    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id BIGINT, status STRING, amount DOUBLE",
    )
    source = spark.createDataFrame(
        [
            (2, "B", 21.0, False),  # update
            (4, "d", 40.0, False),  # insert
            (3, "c", 30.0, True),   # delete
        ],
        "id BIGINT, status STRING, amount DOUBLE, is_deleted BOOLEAN",
    )
    got = {
        r["id"]: (r["status"], r["amount"])
        for r in merge_upsert(target, source, ["id"], delete_col="is_deleted").collect()
    }
    assert got == {1: ("a", 10.0), 2: ("B", 21.0), 4: ("d", 40.0)}


def test_merge_upsert_no_delete_col_and_validation(spark):
    from codd_spark.operators.cdc import merge_upsert

    t = spark.createDataFrame([(1, "a")], "id BIGINT, v STRING")
    s = spark.createDataFrame([(1, "A"), (2, "B")], "id BIGINT, v STRING")
    got = {r["id"]: r["v"] for r in merge_upsert(t, s, ["id"]).collect()}
    assert got == {1: "A", 2: "B"}
    with pytest.raises(ValueError, match="non-empty"):
        merge_upsert(t, s, [])
    with pytest.raises(ValueError, match="missing"):
        merge_upsert(t, s, ["nope"])


def test_scd2_collapses_and_builds_intervals(spark):
    from codd_spark.operators.cdc import scd2_history

    def ts(h):
        return datetime(2024, 1, 1, h)

    rows = [
        (1, ts(0), "bronze", 100),
        (1, ts(1), "bronze", 101),  # no change -> collapsed
        (1, ts(2), "gold", 102),
        (1, ts(3), "gold", 103),    # no change -> collapsed
        (1, ts(4), "silver", 104),
        (2, ts(5), "gold", 105),
    ]
    df = spark.createDataFrame(rows, "k BIGINT, ts TIMESTAMP, tier STRING, eid BIGINT")
    hist = scd2_history(df, ["k"], ["tier"], "ts", tiebreak_cols=["eid"]).collect()
    by_ver = {(r["k"], r["version"]): r for r in hist}
    assert len(hist) == 4
    assert by_ver[(1, 1)]["tier"] == "bronze"
    assert by_ver[(1, 1)]["valid_from"] == ts(0)
    assert by_ver[(1, 1)]["valid_to"] == ts(2)  # closed by the gold row
    assert not by_ver[(1, 1)]["is_current"]
    assert by_ver[(1, 2)]["tier"] == "gold"
    assert by_ver[(1, 3)]["tier"] == "silver"
    assert by_ver[(1, 3)]["valid_to"] is None and by_ver[(1, 3)]["is_current"]
    assert by_ver[(2, 1)]["is_current"]


def test_scd2_null_attrs_are_nullsafe(spark):
    from codd_spark.operators.cdc import scd2_history

    def ts(h):
        return datetime(2024, 1, 1, h)

    # NULL -> NULL is "no change"; NULL -> value opens a version
    rows = [(1, ts(0), None, 1), (1, ts(1), None, 2), (1, ts(2), "x", 3)]
    df = spark.createDataFrame(rows, "k BIGINT, ts TIMESTAMP, a STRING, eid BIGINT")
    hist = sorted(
        scd2_history(df, ["k"], ["a"], "ts", tiebreak_cols=["eid"]).collect(),
        key=lambda r: r["version"],
    )
    assert [(r["a"], r["version"]) for r in hist] == [(None, 1), ("x", 2)]


def test_snapshot_at_reconstructs_state(spark):
    from codd_spark.operators.cdc import scd2_history, snapshot_at

    def ts(h):
        return datetime(2024, 1, 1, h)

    rows = [
        (1, ts(0), "bronze", 1),
        (1, ts(2), "gold", 2),
        (1, ts(4), "silver", 3),
        (2, ts(1), "gold", 4),
    ]
    df = spark.createDataFrame(rows, "k BIGINT, ts TIMESTAMP, tier STRING, eid BIGINT")
    hist = scd2_history(df, ["k"], ["tier"], "ts", tiebreak_cols=["eid"])

    # at hour 3: key 1 is gold (silver not yet), key 2 is gold
    snap = {r["k"]: r["tier"] for r in snapshot_at(hist, ts(3)).collect()}
    assert snap == {1: "gold", 2: "gold"}
    # before any change for key 2
    snap0 = {r["k"]: r["tier"] for r in snapshot_at(hist, ts(0)).collect()}
    assert snap0 == {1: "bronze"}
    # far future: current versions
    snap9 = {r["k"]: r["tier"] for r in snapshot_at(hist, ts(23)).collect()}
    assert snap9 == {1: "silver", 2: "gold"}
