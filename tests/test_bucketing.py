"""Bucketed co-located joins: same-key same-count bucketed tables must
join without an Exchange — the pay-once clustering that amortizes fact-
to-fact join shuffles at scale."""

import pytest
from pyspark.sql import functions as F

from codd_spark.sources.readers import read_table
from codd_spark.sources.sinks import write_bucketed


@pytest.fixture()
def bucketed_tables(spark):
    orders = read_table(spark, "/root/testdata/sf0.001", "orders")
    lineitem = read_table(spark, "/root/testdata/sf0.001", "lineitem")
    write_bucketed(orders, "b_orders", ["o_orderkey"], n_buckets=8,
                   sort_by=["o_orderkey"])
    write_bucketed(lineitem, "b_lineitem", ["l_orderkey"], n_buckets=8,
                   sort_by=["l_orderkey"])
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    t_orders, t_li = bucketed_tables
    # disable broadcast so the join strategy actually uses the bucketing
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(t_li).join(
            spark.table(t_orders),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: no shuffle on either side
        # correctness unchanged vs the unbucketed join
        li = read_table(spark, "/root/testdata/sf0.001", "lineitem")
        od = read_table(spark, "/root/testdata/sf0.001", "orders")
        want = li.join(od, li.l_orderkey == od.o_orderkey).count()
        assert joined.count() == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_bucketed_single_table_agg_avoids_shuffle(spark, bucketed_tables):
    _, t_li = bucketed_tables
    agg = spark.table(t_li).groupBy("l_orderkey").agg(F.sum("l_quantity"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # grouping key == bucket key
