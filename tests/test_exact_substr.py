"""ExactSubstr-style character-span dedup: planted-duplicate cases plus
a brute-force cross-check on real testdata."""

import pytest

from codd_spark.operators.dedup import exact_substring_spans, remove_exact_substrings


def _brute_spans(docs, min_len, min_count):
    """Pure-Python reference: count every length-L window across the
    corpus, flag positions whose window repeats, merge overlapping or
    touching [off, off+L) intervals per doc."""
    L = min_len
    counts = {}
    for _id, t in docs:
        for i in range(len(t) - L + 1):
            s = t[i : i + L]
            counts[s] = counts.get(s, 0) + 1
    out = []
    for _id, t in docs:
        seeds = [
            i for i in range(len(t) - L + 1) if counts[t[i : i + L]] >= min_count
        ]
        spans = []
        for i in seeds:
            if spans and i <= spans[-1][1]:
                spans[-1][1] = i + L
                spans[-1][2] += 1
            else:
                spans.append([i, i + L, 1])
        out.extend((_id, a, b, n) for a, b, n in spans)
    return sorted(out)


def _spark_spans(spark, docs, **kw):
    df = spark.createDataFrame(docs, "doc_id LONG, text STRING")
    rows = exact_substring_spans(df, **kw).collect()
    return sorted(
        (r["doc_id"], r["span_start"], r["span_end"], r["n_windows"]) for r in rows
    )


def test_planted_shared_passage(spark):
    shared = "x" * 0 + "the quick brown fox jumps over the lazy dog once more"
    docs = [
        (1, "AAAA " + shared + " BBBB"),
        (2, "unrelated prefix text here :: " + shared),
        (3, "completely different content with no repeats at all"),
    ]
    got = _spark_spans(spark, docs, min_len=30)
    assert got == _brute_spans(docs, 30, 2)
    # both occurrences flagged; the maximal span is " " + shared (both
    # docs precede the passage with a space, so it extends left by one)
    by_id = {g[0]: g for g in got}
    assert set(by_id) == {1, 2}
    s1, e1 = by_id[1][1], by_id[1][2]
    s2, e2 = by_id[2][1], by_id[2][2]
    assert docs[0][1][s1:e1] == docs[1][1][s2:e2] == " " + shared


def test_self_repeat_within_one_doc(spark):
    block = "0123456789abcdefghijklmnopqrstuvwxyz"  # 36 chars
    docs = [(7, block + " middle filler words " + block)]
    got = _spark_spans(spark, docs, min_len=36)
    assert got == _brute_spans(docs, 36, 2)
    assert len(got) == 2  # both occurrences, not merged across the gap


def test_variable_length_superstring_merges(spark):
    # a 100-char duplicated passage at L=40 must come back as ONE
    # merged span of the full 100 chars (61 seed windows), not 61 rows
    passage = ("abcdefghij" * 10)[:100]
    docs = [(1, "L-" + passage + "-R"), (2, "Q?" + passage + "!Z")]
    got = _spark_spans(spark, docs, min_len=40)
    assert got == _brute_spans(docs, 40, 2)
    for _id, a, b, n in got:
        assert b - a == 100 and n == 61


def test_min_count_three(spark):
    shared = "this exact sentence appears in several documents verbatim"
    docs = [
        (1, shared + " one"),
        (2, shared + " two"),
        (3, "nothing shared here with anyone else in this corpus at all"),
    ]
    # two occurrences < min_count=3 -> nothing flagged
    assert _spark_spans(spark, docs, min_len=30, min_count=3) == []
    docs.append((4, shared + " three"))
    got = _spark_spans(spark, docs, min_len=30, min_count=3)
    assert got == _brute_spans(docs, 30, 3)
    assert {g[0] for g in got} == {1, 2, 4}


def test_short_docs_contribute_nothing(spark):
    docs = [(1, "tiny"), (2, ""), (3, "also tiny")]
    assert _spark_spans(spark, docs, min_len=40) == []


def test_min_len_validation(spark):
    df = spark.createDataFrame([(1, "abc")], "doc_id LONG, text STRING")
    with pytest.raises(ValueError):
        exact_substring_spans(df, min_len=1)


def test_brute_force_on_testdata(spark):
    docs = [
        (r["doc_id"], r["text"])
        for r in spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .collect()
    ]
    got = _spark_spans(spark, docs, min_len=30)
    want = _brute_spans(docs, 30, 2)
    assert got == want and len(got) > 0


def test_removal_cuts_exactly_the_spans(spark):
    shared = "the quick brown fox jumps over the lazy dog once more"
    docs = [
        (1, "AAAA " + shared + " BBBB"),
        (2, shared),  # whole doc duplicated -> cleaned to empty
        (3, "no duplicate content lives in this particular document"),
    ]
    df = spark.createDataFrame(docs, "doc_id LONG, text STRING")
    spans = exact_substring_spans(df, min_len=30)
    out = {
        r["doc_id"]: r
        for r in remove_exact_substrings(df, spans).collect()
    }
    assert out[1]["cleaned_text"] == "AAAA  BBBB"
    assert out[2]["cleaned_text"] == ""
    assert out[3]["cleaned_text"] == docs[2][1]  # verbatim passthrough
    for _id, t in docs:
        assert out[_id]["n_chars_orig"] == len(t)
        assert out[_id]["n_chars_kept"] == len(out[_id]["cleaned_text"])


def test_removal_multiple_spans_one_doc(spark):
    a = "first duplicated passage shared across documents!"
    b = "second duplicated passage also shared across docs"
    docs = [
        (1, a + " <gap gap gap gap gap gap gap gap> " + b),
        (2, "x " + a + " y"),
        (3, "p " + b + " q"),
    ]
    df = spark.createDataFrame(docs, "doc_id LONG, text STRING")
    spans = exact_substring_spans(df, min_len=30)
    out = {r["doc_id"]: r["cleaned_text"] for r in remove_exact_substrings(df, spans).collect()}

    # reference cut from the brute-force span mask
    want = {}
    spans_by_id = {}
    for _id, s, e, _n in _brute_spans(docs, 30, 2):
        spans_by_id.setdefault(_id, []).append((s, e))
    for _id, t in docs:
        kept, cur = [], 0
        for s, e in spans_by_id.get(_id, []):
            kept.append(t[cur:s])
            cur = e
        kept.append(t[cur:])
        want[_id] = "".join(kept)
    assert out == want
    # the duplicated passages themselves are gone everywhere
    for _id in (1, 2, 3):
        assert a not in out[_id] and b not in out[_id]
    assert "<gap" in out[1] and out[2].startswith("x") and out[3].startswith("p")


def test_saturation_fallback_matches_bloom_path(spark, monkeypatch):
    """Forcing the capped sketch to 'saturate' must route through the
    precise hash-join fallback and produce the identical span set. The
    small-corpus gate is disabled so both runs exercise the LARGE-corpus
    paths (bloom vs saturation) this test exists to compare."""
    import codd_spark.operators.dedup as dd

    monkeypatch.setattr(dd, "_EXACT_SUBSTR_SMALL_DOCS", -1)
    docs = [
        (r["doc_id"], r["text"])
        for r in spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .limit(120)
        .collect()
    ]
    bloom = _spark_spans(spark, docs, min_len=30)
    monkeypatch.setattr(dd, "_EXACT_SUBSTR_BLOOM_CAP_BITS", -1)
    fallback = _spark_spans(spark, docs, min_len=30)
    assert fallback == bloom and len(bloom) > 0


def test_small_gate_matches_bloom_path(spark, monkeypatch):
    """The round-8 small-corpus gate (engaged by default at this scale)
    must produce byte-identical spans to the bloom path."""
    import codd_spark.operators.dedup as dd

    docs = [
        (r["doc_id"], r["text"])
        for r in spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .limit(120)
        .collect()
    ]
    small = _spark_spans(spark, docs, min_len=30)  # gate engages: tiny corpus
    monkeypatch.setattr(dd, "_EXACT_SUBSTR_SMALL_DOCS", -1)
    bloom = _spark_spans(spark, docs, min_len=30)
    assert small == bloom and len(small) > 0


def test_bloom_path_plan_has_no_position_exchange(spark, monkeypatch):
    """The r7 exchange cut, pinned on the executed plan: candidate
    filtering is a BroadcastHashJoin (zero exchange on the corpus
    position stream) and the only shuffle exchanges left are the
    substring-verify window and the per-doc span merge — the r6 plan's
    full (id, off, h) shuffle and text re-join are gone. Small gate
    disabled: this pins the LARGE-corpus plan."""
    import codd_spark.operators.dedup as dd

    monkeypatch.setattr(dd, "_EXACT_SUBSTR_SMALL_DOCS", -1)
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    spans = exact_substring_spans(df, min_len=30)
    spans.collect()
    plan = spans._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    import re

    # The sketch moved to persist (r9, releasable cache), so the executed
    # plan now INLINES the cached sketch's one-time build plan under its
    # InMemoryRelation node — that subtree contains bounded word/h
    # exchanges that run once at sketch build, not per corpus scan.
    # Scope the shuffle-key assertion to the runtime plan: printed
    # top-down, every main-plan exchange appears BEFORE the first
    # InMemoryRelation (the sketch is the deepest subtree — the
    # broadcast build side of the candidate join), so cut there. This
    # also drops AQE's trailing "== Initial Plan ==" echo, which repeats
    # the same pre-AQE exchanges.
    runtime = plan.split("InMemoryRelation", 1)[0]
    assert "BroadcastHashJoin" in runtime
    shuffles = re.findall(r"Exchange hashpartitioning\(([^,]+)", runtime)
    keys = {s.split("#")[0] for s in shuffles}
    assert keys <= {"s", "id"}, f"unexpected shuffle keys: {keys} in\n{plan}"
