"""Resample/gap-fill: the dense grid, LOCF semantics, and deterministic
last-in-bucket picks (operators/timeseries.py)."""

from datetime import datetime

import pytest


def _ts(day, hour, minute=0):
    return datetime(2024, 1, day, hour, minute)


def test_resample_ffill_semantics(spark):
    from codd_spark.operators.timeseries import resample

    rows = [
        # user 1: observations at hours 0, 1 and 4 -> gaps at 2, 3
        (1, _ts(1, 0, 5), 10.0),
        (1, _ts(1, 1, 0), 20.0),
        (1, _ts(1, 1, 30), 30.0),  # later in the same bucket wins
        (1, _ts(1, 4, 59), 40.0),
        # user 2: single observation -> one-row grid, no gaps
        (2, _ts(1, 7, 0), 7.0),
    ]
    df = spark.createDataFrame(rows, "user_id BIGINT, ts TIMESTAMP, value DOUBLE")
    got = {
        (r["user_id"], r["bucket"].hour): r
        for r in resample(df, "ts", "value", key_col="user_id", unit="hour").collect()
    }

    assert len(got) == 6  # user 1 hours 0..4 + user 2 hour 7
    assert got[(1, 0)]["value"] == 10.0 and not got[(1, 0)]["is_gap"]
    assert got[(1, 1)]["value"] == 30.0  # last observation in the bucket
    assert got[(1, 1)]["n_events"] == 2
    for h in (2, 3):  # forward-filled gaps
        assert got[(1, h)]["is_gap"]
        assert got[(1, h)]["n_events"] == 0
        assert got[(1, h)]["value"] == 30.0
    assert got[(1, 4)]["value"] == 40.0 and not got[(1, 4)]["is_gap"]
    assert got[(2, 7)]["value"] == 7.0 and got[(2, 7)]["n_events"] == 1


def test_resample_tie_on_timestamp_is_deterministic(spark):
    from codd_spark.operators.timeseries import resample

    # two events at the IDENTICAL timestamp: the larger value wins
    rows = [(1, _ts(1, 0), 5.0), (1, _ts(1, 0), 9.0), (1, _ts(1, 0), 2.0)]
    df = spark.createDataFrame(rows, "user_id BIGINT, ts TIMESTAMP, value DOUBLE")
    out = resample(df, "ts", "value", key_col="user_id", unit="hour").collect()
    assert len(out) == 1 and out[0]["value"] == 9.0


def test_resample_day_unit_and_no_key(spark):
    from codd_spark.operators.timeseries import resample

    rows = [(_ts(1, 3), 1.0), (_ts(4, 12), 4.0)]
    df = spark.createDataFrame(rows, "ts TIMESTAMP, value DOUBLE")
    out = sorted(
        resample(df, "ts", "value", unit="day").collect(), key=lambda r: r["bucket"]
    )
    assert [r["bucket"].day for r in out] == [1, 2, 3, 4]
    assert [r["value"] for r in out] == [1.0, 1.0, 1.0, 4.0]
    assert [r["is_gap"] for r in out] == [False, True, True, False]


def test_resample_rejects_unknown_unit(spark):
    from codd_spark.operators.timeseries import resample

    df = spark.createDataFrame([(1, _ts(1, 0), 1.0)], "u BIGINT, ts TIMESTAMP, value DOUBLE")
    with pytest.raises(ValueError, match="unit"):
        resample(df, "ts", "value", key_col="u", unit="fortnight")


def test_resample_empty_input(spark):
    from codd_spark.operators.timeseries import resample

    df = spark.createDataFrame([], "user_id BIGINT, ts TIMESTAMP, value DOUBLE")
    assert resample(df, "ts", "value", key_col="user_id").count() == 0


def test_resample_random_streams_match_reference_model(spark):
    """150 random irregular streams (duplicate timestamps, long gaps,
    single-point series) batched through ONE resample call via the key
    column; compared against an independent pure-Python LOCF model."""
    import random
    from collections import defaultdict
    from datetime import timedelta

    from codd_spark.operators.timeseries import resample

    rng = random.Random(11)
    rows = []
    for key in range(150):
        for _ in range(rng.randint(1, 10)):
            rows.append(
                (
                    key,
                    datetime(2024, 1, 1) + timedelta(minutes=rng.randint(0, 600)),
                    float(rng.randint(0, 50)),
                )
            )
    df = spark.createDataFrame(rows, "user_id BIGINT, ts TIMESTAMP, value DOUBLE")
    got = {
        (r["user_id"], r["bucket"]): (r["n_events"], r["value"], r["is_gap"])
        for r in resample(df, "ts", "value", key_col="user_id", unit="hour").collect()
    }

    groups = defaultdict(list)
    for k, ts, v in rows:
        groups[k].append((ts, v))
    expect = {}
    for k, evs in groups.items():
        buckets = defaultdict(list)
        for ts, v in evs:
            buckets[ts.replace(minute=0, second=0, microsecond=0)].append((ts, v))
        lo, hi = min(buckets), max(buckets)
        carry = None
        b = lo
        while b <= hi:
            if b in buckets:
                # deterministic last-in-bucket: max by (ts, value)
                carry = max(buckets[b])[1]
                expect[(k, b)] = (len(buckets[b]), carry, False)
            else:
                expect[(k, b)] = (0, carry, True)
            b += timedelta(hours=1)
    assert got == expect


def test_cohort_retention_matrix(spark):
    import datetime

    from codd_spark.operators.timeseries import cohort_retention

    w0 = datetime.datetime(2024, 1, 1)  # a Monday
    rows = []
    # cohort A (week 0): users 1,2,3 — 1,2 return week 1; 1 returns week 2
    for u in (1, 2, 3):
        rows.append((u, w0 + datetime.timedelta(days=u)))
    for u in (1, 2):
        rows.append((u, w0 + datetime.timedelta(days=8)))
    rows.append((1, w0 + datetime.timedelta(days=15)))
    # cohort B (week 1): user 4
    rows.append((4, w0 + datetime.timedelta(days=9)))
    df = spark.createDataFrame(rows, "user_id LONG, ts TIMESTAMP_NTZ")
    got = {
        (r.cohort_epoch, r.period): r.n_users
        for r in cohort_retention(df, "user_id", "ts", unit="week").collect()
    }
    e0 = int(w0.replace(tzinfo=datetime.timezone.utc).timestamp())
    wk = 7 * 86400
    assert got == {
        (e0, 0): 3,
        (e0, 1): 2,
        (e0, 2): 1,
        (e0 + wk, 0): 1,
    }
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unit"):
        cohort_retention(df, "user_id", "ts", unit="month")


def test_cohort_retention_dst_day_periods(spark):
    """ADVICE r4: with a DST session timezone, day buckets from
    date_trunc are 23/25h apart — epoch-second division would yield
    (24d - 1h)/86400 -> period off-by-one. Calendar arithmetic
    (datediff) must index periods correctly across the 2024-03-10 US
    spring-forward transition."""
    import datetime

    from codd_spark.operators.timeseries import cohort_retention

    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        rows = [
            (1, datetime.datetime(2024, 3, 9, 12, 0)),   # cohort day
            (1, datetime.datetime(2024, 3, 10, 12, 0)),  # 23h day (DST)
            (1, datetime.datetime(2024, 3, 12, 12, 0)),
        ]
        df = spark.createDataFrame(rows, "user_id LONG, ts TIMESTAMP")
        got = sorted(
            r.period
            for r in cohort_retention(df, "user_id", "ts", unit="day").collect()
        )
        assert got == [0, 1, 3], got
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
