"""Tests for the extension joins: as-of, range, and salted."""

import datetime

import pytest
from pyspark.sql import functions as F

from codd_spark.operators.joins import (
    asof_join,
    interval_join,
    range_join,
    salted_join,
)

TS = lambda s: datetime.datetime.fromisoformat(s)


@pytest.fixture()
def quotes_trades(spark):
    trades = spark.createDataFrame(
        [
            (1, TS("2024-01-01 10:00:10"), 100),
            (1, TS("2024-01-01 10:00:30"), 200),
            (2, TS("2024-01-01 10:00:05"), 300),
            (3, TS("2024-01-01 10:00:20"), 400),  # no quotes for key 3
        ],
        "k LONG, ts TIMESTAMP, qty LONG",
    )
    quotes = spark.createDataFrame(
        [
            (1, TS("2024-01-01 10:00:00"), 9.0),
            (1, TS("2024-01-01 10:00:30"), 11.0),  # tie with trade -> matches
            (1, TS("2024-01-01 10:00:45"), 12.0),  # later than all trades
            (2, TS("2024-01-01 10:00:04"), 20.0),
        ],
        "k LONG, ts TIMESTAMP, px DOUBLE",
    )
    return trades, quotes


def test_asof_backward_inclusive(quotes_trades):
    trades, quotes = quotes_trades
    out = asof_join(trades, quotes, on=["k"], left_ts="ts", right_ts="ts")
    got = {(r.k, r.qty): r.px for r in out.collect()}
    assert got == {
        (1, 100): 9.0,     # 10:00:10 -> quote at 10:00:00
        (1, 200): 11.0,    # 10:00:30 -> tie matches (inclusive)
        (2, 300): 20.0,
        (3, 400): None,    # no quote for key
    }
    # row count preserved (left join semantics)
    assert out.count() == trades.count()


def test_asof_matches_duckdb(spark, quotes_trades):
    import duckdb

    trades, quotes = quotes_trades
    out = asof_join(trades, quotes, on=["k"], left_ts="ts", right_ts="ts")
    got = sorted((r.k, r.qty, r.px) for r in out.collect())

    con = duckdb.connect()
    con.register("trades", trades.toPandas())
    con.register("quotes", quotes.toPandas())
    want = sorted(
        map(
            tuple,
            con.execute(
                """
        SELECT t.k, t.qty, q.px FROM trades t
        ASOF LEFT JOIN quotes q ON t.k = q.k AND t.ts >= q.ts
        """
            ).fetchall(),
        )
    )
    assert got == want


@pytest.fixture()
def points_intervals(spark):
    # points 0..29; intervals of assorted widths, some overlapping, one
    # spanning many buckets, one empty
    points = spark.createDataFrame([(i, float(i)) for i in range(30)], "pid LONG, x DOUBLE")
    intervals = spark.createDataFrame(
        [
            ("a", 0.0, 4.0),
            ("b", 3.0, 3.5),      # nested inside a
            ("c", 10.0, 25.0),    # spans many width-4 buckets
            ("d", 28.5, 28.9),    # contains no integer point
            ("e", 29.0, 100.0),   # extends past the data
        ],
        "tag STRING, lo DOUBLE, hi DOUBLE",
    )
    return points, intervals


def test_range_join_global_equals_cross_filter(spark, points_intervals):
    points, intervals = points_intervals
    got = sorted(
        (r.pid, r.tag)
        for r in range_join(points, intervals, "x", "lo", "hi", bucket_width=4.0).collect()
    )
    want = sorted(
        (r.pid, r.tag)
        for r in points.crossJoin(intervals)
        .where(F.col("x").between(F.col("lo"), F.col("hi")))
        .collect()
    )
    assert got == want
    # no duplicate pairs from multi-bucket intervals
    assert len(got) == len(set(got))


def test_range_join_keyed_timestamps(spark):
    events = spark.createDataFrame(
        [
            (1, TS("2024-01-01 10:00:00")),
            (1, TS("2024-01-01 11:00:00")),
            (2, TS("2024-01-01 10:30:00")),
        ],
        "k LONG, ts TIMESTAMP",
    )
    windows = spark.createDataFrame(
        [
            (1, TS("2024-01-01 09:00:00"), TS("2024-01-01 10:00:00"), "w1"),  # inclusive end hit
            (1, TS("2024-01-01 10:59:00"), TS("2024-01-01 11:59:00"), "w2"),
            (2, TS("2024-01-01 11:00:00"), TS("2024-01-01 12:00:00"), "w3"),  # no match
        ],
        "k LONG, s TIMESTAMP, e TIMESTAMP, tag STRING",
    )
    got = sorted((r.k, r.tag) for r in range_join(events, windows, "ts", "s", "e", on=["k"]).collect())
    assert got == [(1, "w1"), (1, "w2")]


def test_range_join_global_needs_bucket_width(spark, points_intervals):
    points, intervals = points_intervals
    with pytest.raises(ValueError):
        range_join(points, intervals, "x", "lo", "hi")
    with pytest.raises(ValueError):
        range_join(points, intervals, "x", "lo", "hi", bucket_width=4.0, how="left")


def test_salted_join_equals_plain_join(spark):
    left = spark.createDataFrame(
        [(i % 3, i) for i in range(100)], "k LONG, v LONG"
    )
    right = spark.createDataFrame([(0, "a"), (1, "b"), (5, "c")], "k LONG, tag STRING")
    plain = sorted(tuple(r) for r in left.join(right, on=["k"]).collect())
    salted = sorted(tuple(r) for r in salted_join(left, right, on=["k"], n_salts=8).collect())
    assert salted == plain
    # left join keeps unmatched rows
    plain_l = sorted(
        tuple(r) for r in left.join(right, on=["k"], how="left").collect()
    )
    salted_l = sorted(
        tuple(r) for r in salted_join(left, right, on=["k"], n_salts=8, how="left").collect()
    )
    assert salted_l == plain_l


def test_salted_join_rejects_right_outer(spark):
    df = spark.createDataFrame([(1, 2)], "k LONG, v LONG")
    with pytest.raises(ValueError):
        salted_join(df, df, on=["k"], how="right")


def test_asof_null_payload_stays_atomic(spark):
    """A matched right row with a NULL payload field must NOT have that
    field backfilled from an older right row: the attached payload always
    comes from exactly one right row."""
    left = spark.createDataFrame(
        [(1, TS("2024-01-01 10:00:20"))], "k LONG, ts TIMESTAMP"
    )
    right = spark.createDataFrame(
        [
            (1, TS("2024-01-01 10:00:00"), 9.0, "venue_a"),
            (1, TS("2024-01-01 10:00:10"), None, "venue_b"),  # latest match
        ],
        "k LONG, ts TIMESTAMP, px DOUBLE, venue STRING",
    )
    row = asof_join(left, right, on=["k"], left_ts="ts", right_ts="ts").collect()[0]
    # latest right row wins as a unit: px stays NULL, not 9.0 from venue_a
    assert row.venue == "venue_b"
    assert row.px is None


def test_interval_join_keyed_and_global(spark):
    left = spark.createDataFrame(
        [(1, 0.0, 10.0, "a"), (1, 20.0, 30.0, "b"), (2, 5.0, 6.0, "c")],
        "k LONG, ls DOUBLE, le DOUBLE, lname STRING",
    )
    right = spark.createDataFrame(
        [(1, 9.0, 21.0, "x"), (1, 31.0, 40.0, "y"), (2, 6.0, 7.0, "z")],
        "k LONG, rs DOUBLE, re DOUBLE, rname STRING",
    )
    keyed = interval_join(left, right, "ls", "le", "rs", "re", on=["k"])
    got = sorted((r.lname, r.rname) for r in keyed.collect())
    # a[0,10] ∩ x[9,21] at 9-10; b[20,30] ∩ x at 20-21; c[5,6] ∩ z[6,7] at 6
    assert got == [("a", "x"), ("b", "x"), ("c", "z")]

    # global (no key): same pairs plus cross-key overlaps
    g = interval_join(
        left.drop("k"), right.drop("k"), "ls", "le", "rs", "re", bucket_width=5.0
    )
    got_g = sorted((r.lname, r.rname) for r in g.collect())
    # brute-force oracle
    import itertools
    lrows = left.collect()
    rrows = right.collect()
    want = sorted(
        (l.lname, r.rname)
        for l, r in itertools.product(lrows, rrows)
        if l.ls <= r.re and r.rs <= l.le
    )
    assert got_g == want
