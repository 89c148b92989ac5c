"""Invariant properties of the round-10 curation operators.

- canonical_url is IDEMPOTENT: canonicalizing a canonical form changes
  nothing (the fixed-point property URL-keyed state stores depend on —
  re-canonicalizing previously-stored keys must not move them), and it
  never nulls a non-null input.
- line_dedup is IDEMPOTENT at the same min_count: surviving lines had
  corpus frequency < min_count, and removal can only lower frequencies,
  so a second pass removes nothing.
- IncrementalExactDeduplicator's kept KEY set is BATCHING-INDEPENDENT
  (exact-key dedup has no cross-batch chain effects — unlike the fuzzy
  members, any split of the same rows keeps the same key set).
- dsir_select is ORDER-INDEPENDENT: repartitioning/reordering the raw
  pool changes neither scores nor the selected set.

Hypothesis drives the STRING/structure generation; each property runs a
bounded number of Spark jobs (driver-side generation, small frames).
"""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from codd_spark.operators.dedup import IncrementalExactDeduplicator, line_dedup


# --- URL generation: component-wise, so most cases are URL-shaped but
# messy (ports, userinfo, params in odd orders, fragments, stray dots)
_scheme = st.sampled_from(["http", "HTTP", "https", "HTTPS", "ftp", ""])
_host = st.sampled_from(
    ["Example.COM", "www.example.com", "EXAMPLE.com.", "news.site.org", "a.b.c"]
)
_user = st.sampled_from(["", "u@", "user:pw@"])
_port = st.sampled_from(["", ":80", ":443", ":8080"])
_path = st.sampled_from(["", "/", "/a", "/a/b/", "/a//b///"])
_params = st.lists(
    st.sampled_from(
        ["id=3", "z=1", "a=2", "utm_source=x", "utm_campaign=c", "gclid=g",
         "ref=tw", "q", "", "a=2"]
    ),
    max_size=5,
)
_frag = st.sampled_from(["", "#x", "#sec2"])


@st.composite
def urls(draw):
    s = draw(_scheme)
    base = (
        (s + "://" if s else "")
        + draw(_user)
        + draw(_host)
        + draw(_port)
        + draw(_path)
    )
    ps = draw(_params)
    if ps:
        base += "?" + "&".join(ps)
    return base + draw(_frag)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(urls(), min_size=1, max_size=40))
def test_canonical_url_idempotent(spark, raw_urls):
    from codd_spark.functions.url import canonical_url

    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(raw_urls)], "i long, url string"
    )
    out = df.select(
        "i",
        canonical_url(F.col("url")).alias("c1"),
        canonical_url(canonical_url(F.col("url"))).alias("c2"),
    ).collect()
    for r in out:
        assert r.c1 is not None
        assert r.c1 == r.c2, f"not a fixed point: {raw_urls[r.i]!r} -> {r.c1!r} -> {r.c2!r}"


def test_line_dedup_idempotent(spark):
    docs = [
        (i, "\n".join(
            (["boiler plate line"] if i % 2 == 0 else [])
            + [f"unique {i} {j}" for j in range(3)]
            + (["shared tail"] if i % 3 == 0 else [])
        ))
        for i in range(30)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    once = line_dedup(df, min_count=3)
    twice = line_dedup(
        once.select("doc_id", F.col("cleaned_text").alias("text")), min_count=3
    )
    a = {r.doc_id: r.cleaned_text for r in once.collect()}
    b = {r.doc_id: (r.cleaned_text, r.n_removed) for r in twice.collect()}
    assert all(n == 0 for _, n in b.values())
    assert {k: v for k, v in a.items()} == {k: t for k, (t, _) in b.items()}


@pytest.mark.parametrize("split", [[7], [3, 11], [1, 2, 4, 8]])
def test_exact_dedup_key_set_batching_independent(spark, split):
    rows = [(i, f"u{(i * 13) % 9}") for i in range(24)]
    # one-shot kept keys
    ref = IncrementalExactDeduplicator(spark, key_col="url")
    ref.add_batch(spark.createDataFrame(rows, "doc_id long, url string"))
    want_keys = {u for _, u in rows}
    assert ref.n_kept == len(want_keys)

    d = IncrementalExactDeduplicator(spark, key_col="url")
    kept = []
    bounds = [0] + [sum(split[: i + 1]) for i in range(len(split))] + [len(rows)]
    for lo, hi in zip(bounds, bounds[1:]):
        if lo < hi:
            kept += d.add_batch(
                spark.createDataFrame(rows[lo:hi], "doc_id long, url string")
            ).collect()
    assert {r.url for r in kept} == want_keys
    assert d.n_kept == len(want_keys)


def test_dsir_order_independent(spark):
    from codd_spark.operators.classify import planted_label_docs
    from codd_spark.operators.pipeline import dsir_select

    corpus = planted_label_docs(spark.range(0, 120).selectExpr("id AS doc_id"))
    target = corpus.filter("doc_id % 6 = 1").select("doc_id", "text")
    raw = corpus.filter("doc_id % 6 != 1").select("doc_id", "text")
    a = dsir_select(raw, target, k=25, n_features=512)
    shuffled = raw.orderBy(F.rand(7)).repartition(7)
    b = dsir_select(shuffled, target, k=25, n_features=512)
    ra = sorted((r.doc_id, r.log_weight) for r in a.collect())
    rb = sorted((r.doc_id, r.log_weight) for r in b.collect())
    a.release_cache(), b.release_cache()
    assert ra == rb
