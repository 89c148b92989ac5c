"""Record linkage: attribute similarities and blocked scoring against
hand-computed references."""

import pytest
from pyspark.sql import functions as F

from codd_spark.operators.linkage import attribute_similarity, record_linkage


def test_attribute_similarity_methods(spark):
    df = spark.createDataFrame(
        [("smith", "smith", "a b c", "a b d"), ("kitten", "sitting", "x", None)],
        "a STRING, b STRING, c STRING, d STRING",
    )
    out = df.select(
        attribute_similarity("exact", F.col("a"), F.col("b")).alias("ex"),
        attribute_similarity("levenshtein", F.col("a"), F.col("b")).alias("lev"),
        attribute_similarity("jaccard", F.col("c"), F.col("d")).alias("jac"),
    ).collect()
    assert (out[0].ex, out[0].lev) == (1.0, 1.0)
    assert out[0].jac == pytest.approx(2 / 4)  # {a,b,c} vs {a,b,d}
    assert out[1].ex == 0.0
    assert out[1].lev == pytest.approx(1 - 3 / 7)  # classic kitten/sitting = 3
    assert out[1].jac == 0.0  # null side
    with pytest.raises(ValueError, match="method"):
        attribute_similarity("soundex", F.col("a"), F.col("b"))


def test_record_linkage_scoring(spark):
    df = spark.createDataFrame(
        [
            (1, "B1", "john smith", "42 oak street"),
            (2, "B1", "jon smith", "42 oak st"),
            (3, "B1", "alice jones", "9 elm road"),
            (4, "B2", "john smith", "42 oak street"),  # other block: never paired
        ],
        "id LONG, blk STRING, name STRING, addr STRING",
    )
    out = {
        (r.id_a, r.id_b): r
        for r in record_linkage(
            df,
            "id",
            block_on="blk",
            attrs=[("name", "levenshtein", 0.6), ("addr", "jaccard", 0.4)],
            threshold=0.0,
        ).collect()
    }
    assert set(out) == {(1, 2), (1, 3), (2, 3)}  # block B2 isolated
    r12 = out[(1, 2)]
    lev = 1 - 1 / 10  # john smith vs jon smith
    jac = 2 / 4  # {42,oak,street} vs {42,oak,st}
    assert r12.sim_name == pytest.approx(round(lev, 6))
    assert r12.sim_addr == pytest.approx(round(jac, 6))
    assert r12.score == pytest.approx(round(0.6 * lev + 0.4 * jac, 6))
    # thresholding keeps only the true match
    kept = record_linkage(
        df, "id", block_on="blk",
        attrs=[("name", "levenshtein", 0.6), ("addr", "jaccard", 0.4)],
        threshold=0.6,
    ).collect()
    assert [(r.id_a, r.id_b) for r in kept] == [(1, 2)]
    with pytest.raises(ValueError, match="attrs"):
        record_linkage(df, "id", block_on="blk", attrs=[])


def test_global_rank_matches_single_window(spark):
    import random

    from codd_spark.operators.linkage import global_rank

    rng = random.Random(31)
    rows = [(i, rng.randint(0, 50)) for i in range(500)]
    df = spark.createDataFrame(rows, "id LONG, k LONG").repartition(8)
    got = {r.id: r.rank for r in global_rank(df, ["k", "id"]).collect()}
    want = {
        i: r + 1
        for r, (i, _) in enumerate(sorted(rows, key=lambda t: (t[1], t[0])))
    }
    assert got == want


def test_sorted_neighborhood_pairs(spark):
    from codd_spark.operators.linkage import sorted_neighborhood_pairs

    rows = [(10, 1.0), (20, 1.1), (30, 5.0), (40, 5.05), (50, 99.0)]
    df = spark.createDataFrame(rows, "id LONG, score DOUBLE")
    got = sorted(
        (r.id_a, r.id_b, r.gap)
        for r in sorted_neighborhood_pairs(df, "id", "score", window=2).collect()
    )
    # window=2: only adjacent-in-rank pairs
    assert got == [(10, 20, 1), (20, 30, 1), (30, 40, 1), (40, 50, 1)]
    got3 = {
        (r.id_a, r.id_b)
        for r in sorted_neighborhood_pairs(df, "id", "score", window=3).collect()
    }
    assert (10, 30) in got3 and (30, 50) in got3 and len(got3) == 7
    with pytest.raises(ValueError, match="window"):
        sorted_neighborhood_pairs(df, "id", "score", window=1)
