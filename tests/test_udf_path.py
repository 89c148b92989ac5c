"""The slow path: genuinely opaque Python predicates/mappers as vectorized
pandas UDFs — the analogue of the reference's arbitrary Rust closures
(core/src/expression/select.rs:34, project.rs:35) when a Column expression
can't express the logic. Fast path (Column exprs) is everywhere else."""

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from codd_spark import Relation


@pytest.fixture()
def nums(db):
    db.add_relation("nums", "n LONG")
    db.insert("nums", [(i,) for i in range(20)])
    return db


def test_pandas_udf_predicate(nums):
    @pandas_udf("boolean")
    def is_fib(n: pd.Series) -> pd.Series:
        fibs = {0, 1, 2, 3, 5, 8, 13}
        return n.isin(fibs)

    e = Relation("nums").select(lambda df: is_fib(df["n"]))
    got = [r.n for r in nums.evaluate(e)]
    assert got == [0, 1, 2, 3, 5, 8, 13]


def test_pandas_udf_mapper(nums):
    @pandas_udf("long")
    def collatz_step(n: pd.Series) -> pd.Series:
        return n.where(n % 2 == 0, 3 * n + 1) // pd.Series(2, index=n.index).where(n % 2 == 0, 1)

    e = Relation("nums").select("n IN (3, 4)").project(
        lambda df: [collatz_step(df["n"]).alias("next")]
    )
    assert sorted(r.next for r in nums.evaluate(e)) == [2, 10]


def test_pandas_udf_join_key(nums, db):
    db.add_relation("buckets", "b LONG, label STRING")
    db.insert("buckets", [(0, "low"), (1, "high")])

    @pandas_udf("long")
    def bucket_of(n: pd.Series) -> pd.Series:
        return (n >= 10).astype("int64")

    e = Relation("nums").join(
        Relation("buckets"),
        left_key=[lambda df: bucket_of(df["n"])],
        right_key=["b"],
        mapper=lambda l, r: [l["n"].alias("n"), r["label"].alias("label")],
    )
    rows = nums.evaluate(e)
    assert all(r.label == ("high" if r.n >= 10 else "low") for r in rows)
    assert len(rows) == 20


def test_pandas_udaf_weighted_mean(spark):
    from codd_spark.functions.pyfuncs import weighted_mean

    df = spark.createDataFrame(
        [("a", 10.0, 1.0), ("a", 20.0, 3.0), ("b", 5.0, 2.0)],
        "g STRING, v DOUBLE, w DOUBLE",
    )
    wm = weighted_mean()
    got = {r.g: r.m for r in df.groupBy("g").agg(wm("v", "w").alias("m")).collect()}
    assert got == {"a": (10 + 60) / 4.0, "b": 5.0}


def test_python_udtf_sentence_split(spark):
    from codd_spark.functions.pyfuncs import sentence_splitter

    spark.udtf.register("t_sentence_split", sentence_splitter())
    spark.createDataFrame(
        [(1, "One. Two. Three"), (2, "")], "doc_id LONG, text STRING"
    ).createOrReplaceTempView("t_docs")
    rows = spark.sql(
        "SELECT d.doc_id, s.idx, s.sentence FROM t_docs d, LATERAL t_sentence_split(d.text) s"
    ).collect()
    got = sorted((r.doc_id, r.idx, r.sentence) for r in rows)
    assert got == [(1, 0, "One"), (1, 1, "Two"), (1, 2, "Three"), (2, 0, "")]
