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


def test_scd2_random_streams_match_reference_model(spark):
    """200 random per-(case,key) change streams — including timestamp
    collisions and immediate repeats — batched into ONE scd2_history
    call; compared against an independent pure-Python interval model."""
    import random
    from collections import defaultdict
    from datetime import timedelta

    from codd_spark.operators.cdc import scd2_history

    rng = random.Random(42)
    rows = []
    for case in range(200):
        for _ in range(rng.randint(1, 12)):
            rows.append(
                (
                    case,
                    rng.randint(0, 2),
                    datetime(2024, 1, 1) + timedelta(hours=rng.randint(0, 8)),
                    rng.choice(["a", "b", "c"]),
                    len(rows),
                )
            )
    df = spark.createDataFrame(
        rows, "case BIGINT, k BIGINT, ts TIMESTAMP, attr STRING, eid BIGINT"
    )
    got = {
        (r["case"], r["k"], r["version"]): (
            r["attr"], r["valid_from"], r["valid_to"], r["is_current"]
        )
        for r in scd2_history(
            df, ["case", "k"], ["attr"], "ts", tiebreak_cols=["eid"]
        ).collect()
    }

    groups = defaultdict(list)
    for case, k, ts, attr, eid in rows:
        groups[(case, k)].append((ts, eid, attr))
    expect = {}
    for (case, k), evs in groups.items():
        evs.sort()
        versions = []
        prev = object()
        for ts, _eid, attr in evs:
            if attr != prev:
                versions.append([ts, None, attr])
                prev = attr
        for i in range(len(versions) - 1):
            versions[i][1] = versions[i + 1][0]
        for v, (f, t, attr) in enumerate(versions, 1):
            expect[(case, k, v)] = (attr, f, t, t is None)
    assert got == expect


def test_merge_upsert_random_batches_match_reference_model(spark):
    """100 random (target, source) cases in one merge_upsert call,
    compared against a dict-based MERGE model (update/insert/delete)."""
    import random
    from collections import defaultdict

    from codd_spark.operators.cdc import merge_upsert

    rng = random.Random(7)
    tgt_rows, src_rows, cases = [], [], range(100)
    for case in cases:
        for k in rng.sample(range(20), rng.randint(0, 10)):
            tgt_rows.append((case, k, f"t{case}_{k}"))
        for k in rng.sample(range(25), rng.randint(0, 10)):
            src_rows.append((case, k, f"s{case}_{k}", rng.random() < 0.3))
    target = spark.createDataFrame(tgt_rows, "case BIGINT, k BIGINT, v STRING")
    source = spark.createDataFrame(
        src_rows, "case BIGINT, k BIGINT, v STRING, del BOOLEAN"
    )
    got = defaultdict(dict)
    for r in merge_upsert(target, source, ["case", "k"], delete_col="del").collect():
        got[r["case"]][r["k"]] = r["v"]

    expect = defaultdict(dict)
    for case, k, v in tgt_rows:
        expect[case][k] = v
    for case, k, v, dele in src_rows:
        if dele:
            expect[case].pop(k, None)
        else:
            expect[case][k] = v
    expect = {c: d for c, d in expect.items() if d}
    assert dict(got) == expect


def test_dataset_diff_statuses(spark):
    from codd_spark.operators.cdc import dataset_diff

    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", None), (4, "d", 4.0)],
        "id LONG, s STRING, v DOUBLE",
    )
    new = spark.createDataFrame(
        [(2, "b", 2.0), (3, "c", None), (4, "D", 4.0), (5, "e", 5.0)],
        "id LONG, s STRING, v DOUBLE",
    )
    got = {r.id: r.status for r in dataset_diff(old, new, ["id"]).collect()}
    assert got == {
        1: "removed",
        2: "unchanged",
        3: "unchanged",  # NULL == NULL is null-safe
        4: "changed",
        5: "added",
    }
    # compare_cols subset: value-only comparison ignores the s change
    got_v = {r.id: r.status for r in dataset_diff(old, new, ["id"], compare_cols=["v"]).collect()}
    assert got_v[4] == "unchanged"
    import pytest as _pytest

    with _pytest.raises(ValueError, match="key_cols"):
        dataset_diff(old, new, [])
