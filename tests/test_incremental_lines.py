"""IncrementalLineDeduplicator — arrival-order CCNet line dedup
(round 13). Semantics: the arrival-causal projection of batch
line_dedup over the concatenated corpus; state = one row per distinct
seen line hash in the shared bucketed store."""

import pytest
from pyspark.sql import functions as F

from codd_spark.operators.dedup import (
    IncrementalLineDeduplicator,
    line_dedup,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


B1 = [
    (0, "unique alpha content\nSubscribe now!\nmore alpha text"),
    (1, "Subscribe now!\nunique beta content"),
    (2, "only gamma here\n\nshort kept"),
]
B2 = [
    # "Subscribe now!" was seen in batch 1 -> drops immediately even
    # though batch 2 carries it once; "fresh delta" is new and unique.
    (10, "Subscribe now!\nfresh delta line"),
    # a NEW boilerplate line repeating within batch 2 -> both drop
    (11, "cookie banner text\nreal content eleven"),
    (12, "cookie banner text\nreal content twelve"),
    # a line kept (unique) in batch 1 reappearing -> drops now
    (13, "unique beta content\nnovel thirteen"),
]


def _out(df):
    return {
        r.doc_id: (r.cleaned_text, r.n_lines, r.n_removed)
        for r in df.collect()
    }


def test_two_batch_semantics(spark):
    d = IncrementalLineDeduplicator(spark)
    o1 = _out(d.add_batch(_docs(spark, B1)))
    # batch 1 == batch line_dedup on batch 1 (same min_count rule)
    want1 = _out(line_dedup(_docs(spark, B1), min_count=2))
    assert o1 == want1
    assert o1[0] == ("unique alpha content\nmore alpha text", 3, 1)
    assert o1[2] == ("only gamma here\n\nshort kept", 3, 0)  # blank kept

    o2 = _out(d.add_batch(_docs(spark, B2)))
    assert o2[10] == ("fresh delta line", 2, 1)       # seen in b1 drops
    assert o2[11] == ("real content eleven", 2, 1)    # in-batch repeat
    assert o2[12] == ("real content twelve", 2, 1)
    assert o2[13] == ("novel thirteen", 2, 1)         # kept-in-b1 drops

    # third arrival: batch-2 novel lines are now seen
    o3 = _out(d.add_batch(_docs(spark, [(20, "fresh delta line\nnew tail")])))
    assert o3[20] == ("new tail", 2, 1)


def test_short_lines_never_match_or_enter_state(spark):
    d = IncrementalLineDeduplicator(spark, min_line_chars=6)
    _ = d.add_batch(_docs(spark, [(0, "short\nlong enough line")]))
    n0 = d.n_seen
    o = _out(d.add_batch(_docs(spark, [(1, "short\nshort\nother long line")])))
    # "short" is ineligible: repeats and prior sightings never drop it
    assert o[1] == ("short\nshort\nother long line", 3, 0)
    assert d.n_seen == n0 + 1  # only "other long line" was novel


def test_normalization_collapses_whitespace_variants(spark):
    d = IncrementalLineDeduplicator(spark)
    d.add_batch(_docs(spark, [(0, "Subscribe   now!\nbody a")]))
    o = _out(d.add_batch(_docs(spark, [(1, "Subscribe now!\nbody b")])))
    assert o[1] == ("body b", 2, 1)


def test_md5_60_matches_xxhash64_decisions(spark):
    a = IncrementalLineDeduplicator(spark, hash_fn="xxhash64")
    b = IncrementalLineDeduplicator(spark, hash_fn="md5_60")
    for batch in (B1, B2):
        assert _out(a.add_batch(_docs(spark, batch))) == _out(
            b.add_batch(_docs(spark, batch))
        )


def test_persistent_state_survives_reopen(spark, tmp_path):
    d = str(tmp_path / "linestate")
    dd = IncrementalLineDeduplicator(
        spark, hash_fn="md5_60", state_dir=d, state_buckets=4
    )
    o1 = _out(dd.add_batch(_docs(spark, B1)))
    n_seen = dd.n_seen
    del dd

    re = IncrementalLineDeduplicator.open(spark, d)
    assert re.n_seen == n_seen
    assert re.hash_fn == "md5_60" and re.min_count == 2
    o2 = _out(re.add_batch(_docs(spark, B2)))

    # equivalence with an uninterrupted in-memory run
    mem = IncrementalLineDeduplicator(spark, hash_fn="md5_60")
    assert _out(mem.add_batch(_docs(spark, B1))) == o1
    assert _out(mem.add_batch(_docs(spark, B2))) == o2

    res = re.compact()
    assert res["generation"] is not None
    o3 = _out(re.add_batch(_docs(spark, [(30, "Subscribe now!\ntail x")])))
    assert o3[30] == ("tail x", 2, 1)  # decisions survive compaction


def test_open_refuses_wrong_kind_and_validation(spark, tmp_path):
    from codd_spark.operators.dedup import IncrementalExactDeduplicator

    d = str(tmp_path / "exactstate")
    IncrementalExactDeduplicator(spark, state_dir=d)
    with pytest.raises(ValueError, match="not line_dedup"):
        IncrementalLineDeduplicator.open(spark, d)
    with pytest.raises(ValueError, match="no incremental line-dedup"):
        IncrementalLineDeduplicator.open(spark, str(tmp_path / "nope"))
    with pytest.raises(ValueError, match="min_count"):
        IncrementalLineDeduplicator(spark, min_count=1)
    with pytest.raises(ValueError, match="hash_fn"):
        IncrementalLineDeduplicator(spark, hash_fn="sha1")


def test_state_probe_stays_zero_exchange_on_state_side(spark, tmp_path):
    """The scale contract shared with the other incremental dedupers
    (same assertion shape as test_incremental_dedup.py): the persistent
    state side of the probe join reads Bucketed: true with NO Exchange
    — only the O(batch) side shuffles."""
    d = str(tmp_path / "planstate")
    dd = IncrementalLineDeduplicator(spark, state_dir=d, state_buckets=4)
    dd.add_batch(_docs(spark, B1))
    probe = spark.createDataFrame(
        [(0, 123456789, 987654321)], "band INT, h LONG, h2 LONG"
    )
    j = dd._seen_buckets.select(
        "band", "h", F.col("id").alias("__sid")
    ).join(probe.hint("shuffle_merge"), on=["band", "h"])
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "Bucketed: true" in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan
