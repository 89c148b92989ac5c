"""Incremental aggregate view: batch-split maintenance must equal the
one-shot aggregate (monoid merge is order/batching-independent)."""

from pyspark.sql import functions as F

from codd_spark.streaming.agg_view import IncrementalAggregateView


def _mk(spark):
    return spark.createDataFrame(
        [(i % 4, float(i), i % 7) for i in range(100)], "g LONG, v DOUBLE, m LONG"
    )


def test_batched_equals_oneshot(spark):
    df = _mk(spark)
    inc = IncrementalAggregateView(spark, ["g"], sum_cols=("v",), minmax_cols=("m",))
    for i in range(5):
        inc.insert(df.where(F.col("v") % 5 == i))
    one = IncrementalAggregateView(spark, ["g"], sum_cols=("v",), minmax_cols=("m",))
    one.insert(df)
    assert [tuple(r) for r in inc.rows()] == [tuple(r) for r in one.rows()]

    want = {
        (r.g): (r.cnt, float(r.s), r.mn, r.mx)
        for r in df.groupBy("g")
        .agg(F.count("*").alias("cnt"), F.sum("v").alias("s"),
             F.min("m").alias("mn"), F.max("m").alias("mx"))
        .collect()
    }
    got = {r.g: (r.cnt, float(r.sum_v), r.min_m, r.max_m) for r in inc.rows()}
    assert got == want


def test_many_batches_bounded_plan(spark):
    df = _mk(spark)
    inc = IncrementalAggregateView(spark, ["g"], sum_cols=("v",))
    for i in range(30):
        inc.insert(df)
    plan = inc.df()._jdf.queryExecution().analyzed().toString()
    # checkpoint every 8 merges -> plan holds at most ~8 merge layers
    assert plan.count("Aggregate") <= 20
    assert inc.df().count() == 4


def test_incremental_distinct_via_sketch(spark):
    """distinct_cols: HLL-sketch state merges as a monoid across inserts.
    At small per-group cardinality the sketch is in sparse (exact) mode,
    so the incrementally-maintained estimate EQUALS the exact distinct
    count regardless of how the inserts were batched."""
    import random

    from codd_spark.streaming.agg_view import IncrementalAggregateView

    rng = random.Random(83)
    rows = [("g%d" % (i % 3), rng.randint(0, 400)) for i in range(3000)]
    schema = "g STRING, uid LONG"

    view = IncrementalAggregateView(spark, ["g"], distinct_cols=("uid",))
    for start in range(0, 3000, 700):  # uneven batches
        view.insert(spark.createDataFrame(rows[start : start + 700], schema))
    got = {r.g: (r.cnt, r.n_distinct_uid) for r in view.df().collect()}

    from collections import defaultdict

    exact = defaultdict(set)
    cnt = defaultdict(int)
    for g, u in rows:
        exact[g].add(u)
        cnt[g] += 1
    for g in exact:
        assert got[g] == (cnt[g], len(exact[g]))
