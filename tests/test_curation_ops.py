"""Round-10 curation operators: corpus-wide line-level dedup
(dedup.line_dedup — CCNet/RefinedWeb boilerplate-line removal), DSIR
importance selection (pipeline.dsir_select), and URL canonicalization +
URL-level dedup (functions/url.py, dedup.url_dedup). Each is checked
against a from-scratch pure-Python reference on the same inputs, plus
the edge cases the contract rows don't reach (empty docs, short lines,
schemeless URLs, gumbel-vs-topk modes)."""

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from codd_spark.operators.dedup import line_dedup, url_dedup
from codd_spark.operators.pipeline import dsir_select


# ---------------------------------------------------------------------------
# line_dedup
# ---------------------------------------------------------------------------

DOCS = [
    (1, "unique one\nSubscribe to our newsletter\nreal content here\n\ncopyright 2020 corp"),
    (2, "subscribe to  our newsletter\nanother unique line\ncopyright 2020 corp"),
    (3, "totally distinct\n\ncopyright 2020 corp"),
    (4, None),
    (5, ""),
    (6, "subscribe TO our Newsletter"),  # whole doc is one boilerplate line
]


def _norm(line):
    return " ".join(line.lower().split())


def _py_line_dedup(rows, min_count=2, min_line_chars=1):
    split = {
        i: ([""] if t is None or t == "" else t.split("\n")) for i, t in rows
    }
    freq = Counter(
        _norm(l)
        for ls in split.values()
        for l in ls
        if len(l.strip()) >= min_line_chars
    )
    out = {}
    for i, ls in split.items():
        dup = [
            len(l.strip()) >= min_line_chars and freq[_norm(l)] >= min_count
            for l in ls
        ]
        kept = [l for l, d in zip(ls, dup) if not d]
        out[i] = ("\n".join(kept), len(ls), sum(dup))
    return out


@pytest.mark.parametrize("hash_fn", ["xxhash64", "md5_60"])
def test_line_dedup_matches_python_reference(spark, hash_fn):
    df = spark.createDataFrame(
        [(i, t) for i, t in DOCS], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.cleaned_text, r.n_lines, r.n_removed)
        for r in line_dedup(df, min_count=2, hash_fn=hash_fn).collect()
    }
    # None text splits to a single null line; the reference models it as ""
    want = _py_line_dedup([(i, t) for i, t in DOCS])
    assert got == want


def test_line_dedup_all_lines_removed_keeps_row(spark):
    df = spark.createDataFrame(
        [(1, "same line"), (2, "same line"), (3, "same line")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in line_dedup(df).collect()}
    assert set(rows) == {1, 2, 3}
    assert all(r.cleaned_text == "" and r.n_removed == 1 for r in rows.values())


def test_line_dedup_min_line_chars_protects_short_lines(spark):
    df = spark.createDataFrame(
        [(1, "ok\nlong duplicated line"), (2, "ok\nlong duplicated line")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in line_dedup(df, min_line_chars=5).collect()}
    # "ok" repeats but is under the length floor; the long line is removed
    assert rows[1].cleaned_text == "ok" and rows[1].n_removed == 1


def test_line_dedup_bad_hash_fn(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="hash_fn"):
        line_dedup(df, hash_fn="sha1")


# ---------------------------------------------------------------------------
# dsir_select
# ---------------------------------------------------------------------------


def _py_dsir_scores(raw, target, n_features=256, alpha=1.0):
    import hashlib

    def feats(text):
        toks = [t for t in text.lower().split() if t]
        grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        return Counter(
            int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % n_features
            for g in grams
        )

    cr, ct = Counter(), Counter()
    for _, t in raw:
        cr.update(feats(t))
    for _, t in target:
        ct.update(feats(t))
    Cr, Ct = sum(cr.values()), sum(ct.values())
    aD = alpha * n_features
    out = {}
    for i, t in raw:
        s = sum(
            x
            * (
                math.log(ct.get(f, 0) + alpha)
                - math.log(Ct + aD)
                - math.log(cr[f] + alpha)
                + math.log(Cr + aD)
            )
            for f, x in feats(t).items()
        )
        out[i] = round(s, 6)
    return out


def test_dsir_scores_match_python_reference(spark):
    from codd_spark.operators.classify import planted_label_docs

    corpus = planted_label_docs(spark.range(0, 80).selectExpr("id AS doc_id"))
    rows = [(r.doc_id, r.text, r.y) for r in corpus.collect()]
    target = [(i, t) for i, t, y in rows if y == 1 and i % 4 == 1]
    raw = [(i, t) for i, t, y in rows if i % 4 != 1]

    target_df = spark.createDataFrame(target, "doc_id long, text string")
    raw_df = spark.createDataFrame(raw, "doc_id long, text string")
    got = {
        r.doc_id: r.log_weight
        for r in dsir_select(
            raw_df, target_df, k=len(raw), n_features=256
        ).collect()
    }
    want = _py_dsir_scores(raw, target, n_features=256)
    assert len(got) == len(raw)
    for i, w in want.items():
        assert got[i] == pytest.approx(w, abs=2e-6)


def test_dsir_topk_selects_target_like_docs(spark):
    from codd_spark.operators.classify import planted_label_docs

    corpus = planted_label_docs(spark.range(0, 400).selectExpr("id AS doc_id"))
    target = corpus.filter("doc_id % 5 = 0 AND y = 1").select("doc_id", "text")
    raw = corpus.filter("doc_id % 5 != 0").select("doc_id", "text")
    sel = dsir_select(raw, target, k=80, n_features=2048)
    got = sel.join(corpus.select("doc_id", "y"), on="doc_id").collect()
    assert len(got) == 80
    # planted signal: the target-like class dominates the selection
    assert sum(r.y for r in got) >= 76


def test_dsir_gumbel_is_deterministic_and_biased_to_target(spark):
    from codd_spark.operators.classify import planted_label_docs

    corpus = planted_label_docs(spark.range(0, 400).selectExpr("id AS doc_id"))
    target = corpus.filter("doc_id % 5 = 0 AND y = 1").select("doc_id", "text")
    raw = corpus.filter("doc_id % 5 != 0").select("doc_id", "text")
    a = dsir_select(raw, target, k=60, n_features=2048, mode="gumbel")
    b = dsir_select(raw, target, k=60, n_features=2048, mode="gumbel")
    ids_a = sorted(r.doc_id for r in a.collect())
    ids_b = sorted(r.doc_id for r in b.collect())
    assert ids_a == ids_b  # LCG noise, not RNG
    got = (
        spark.createDataFrame([(i,) for i in ids_a], "doc_id long")
        .join(corpus.select("doc_id", "y"), on="doc_id")
        .collect()
    )
    assert sum(r.y for r in got) >= 50


def test_dsir_empty_doc_scores_zero(spark):
    raw = spark.createDataFrame(
        [(1, "alpha beta"), (2, "   ")], "doc_id long, text string"
    )
    target = spark.createDataFrame([(9, "alpha alpha")], "doc_id long, text string")
    got = {r.doc_id: r.log_weight for r in dsir_select(raw, target, k=2).collect()}
    assert got[2] == 0.0


def test_dsir_arg_validation(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="mode"):
        dsir_select(df, df, k=1, mode="uniform")
    with pytest.raises(ValueError, match="k"):
        dsir_select(df, df, k=0)
    with pytest.raises(ValueError, match="empty"):
        dsir_select(df, df.filter("doc_id < 0"), k=1)


# ---------------------------------------------------------------------------
# canonical_url / url_dedup
# ---------------------------------------------------------------------------

URL_CASES = [
    # (raw, canonical)
    ("HTTPS://WWW.Example.COM:443/a/b/?utm_source=f&id=3#x", "https://example.com/a/b?id=3"),
    ("https://example.com/a/b?id=3", "https://example.com/a/b?id=3"),
    ("https://user:pw@example.com./a/b?id=3&ref=tw", "https://example.com/a/b?id=3"),
    ("http://example.com:80/", "http://example.com"),
    ("http://example.com:8080/x", "http://example.com:8080/x"),
    ("https://example.com/a?z=1&a=2", "https://example.com/a?a=2&z=1"),
    ("https://example.com/a?gclid=1&fbclid=2&msclkid=3&ref=r", "https://example.com/a"),
    ("https://example.com/a?utm_campaign=c&utm_source=s", "https://example.com/a"),
    ("  https://example.com/a  ", "https://example.com/a"),
    ("ftp://Files.Example.org/pub/", "ftp://files.example.org/pub"),
    ("no scheme here", "no scheme here"),
    ("/relative/path?utm_source=x", "/relative/path?utm_source=x"),
]


def test_canonical_url_cases(spark):
    from codd_spark.functions.url import canonical_url

    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(URL_CASES)], "i long, url string"
    )
    got = {
        r.i: r.c
        for r in df.select("i", canonical_url(F.col("url")).alias("c")).collect()
    }
    for i, (_, want) in enumerate(URL_CASES):
        assert got[i] == want, f"case {i}: {URL_CASES[i][0]!r}"


def test_canonical_url_ipv6_passthrough_and_literal_sep(spark):
    """IPv6-literal hosts pass through unchanged (the host:port regex
    split cannot canonicalize them correctly), and line_dedup's sep is
    a LITERAL separator, not a regex."""
    from codd_spark.functions.url import canonical_url, url_host

    df = spark.createDataFrame(
        [(1, "http://[::1]:8080/a?utm_source=x"), (2, "https://user@[2001:db8::1]/b")],
        "i long, url string",
    )
    got = {
        r.i: (r.c, r.h)
        for r in df.select(
            "i",
            canonical_url(F.col("url")).alias("c"),
            url_host(F.col("url")).alias("h"),
        ).collect()
    }
    assert got[1] == ("http://[::1]:8080/a?utm_source=x", "[::1]")
    assert got[2] == ("https://user@[2001:db8::1]/b", "[2001:db8::1]")

    # literal "." separator: a regex split would explode every char away
    docs = spark.createDataFrame(
        [(1, "dup.unique one.tail"), (2, "dup.unique two.tail")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in line_dedup(docs, sep=".", min_count=2).collect()}
    assert rows[1].cleaned_text == "unique one" and rows[1].n_removed == 2
    with pytest.raises(ValueError, match="sep"):
        line_dedup(docs, sep="x\\Ey")


def test_url_host(spark):
    from codd_spark.functions.url import url_host

    df = spark.createDataFrame(
        [(1, "HTTPS://WWW.News.Site.ORG.:8443/x"), (2, "nope")],
        "i long, url string",
    )
    got = {r.i: r.h for r in df.select("i", url_host(F.col("url")).alias("h")).collect()}
    assert got[1] == "news.site.org"
    assert got[2] == ""


def test_url_dedup_groups_and_keeper(spark):
    rows = [
        (1, "HTTPS://WWW.Example.COM:443/a/b/?utm_source=feed&id=3#frag"),
        (2, "https://example.com/a/b?id=3"),
        (3, "https://example.com/a/b?id=3&gclid=xyz"),
        (4, "http://example.com:80/a/b?id=3"),
        (5, "https://user:pw@example.com./a/b?id=3&ref=tw"),
        (6, "https://example.com/a/b?z=1&a=2"),
        (7, "https://example.com/a/b?a=2&z=1"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {r.canonical_url: r for r in url_dedup(df).collect()}
    g = got["https://example.com/a/b?id=3"]
    assert g.doc_id == 1 and g.n_dups == 4
    assert got["http://example.com/a/b?id=3"].n_dups == 1  # scheme differs
    assert got["https://example.com/a/b?a=2&z=1"].n_dups == 2


def test_url_dedup_null_urls_never_collapse(spark):
    """ADVICE r10: documents without a URL are not duplicates of each
    other — every NULL-url row passes through as its own keeper with
    n_dups=1, matching IncrementalExactDeduplicator's NULL contract."""
    rows = [
        (1, "https://example.com/a"),
        (2, None),
        (3, None),
        (4, None),
        (5, "https://example.com/a/"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = url_dedup(df).collect()
    null_rows = [r for r in out if r.canonical_url is None]
    assert sorted(r.doc_id for r in null_rows) == [2, 3, 4]
    assert all(r.n_dups == 1 for r in null_rows)
    kept = {r.canonical_url: r for r in out if r.canonical_url is not None}
    assert kept["https://example.com/a"].doc_id == 1
    assert kept["https://example.com/a"].n_dups == 2


def test_url_query_splits_at_first_question_mark(spark):
    """ADVICE r10: a URL containing two '?' must canonicalize by the
    FIRST one (the second is query content), matching the oracle CTE."""
    from codd_spark.functions.url import canonical_url

    df = spark.createDataFrame(
        [(1, "https://example.com/a?q=what?&utm_source=x")],
        "doc_id long, url string",
    )
    got = df.select(canonical_url(F.col("url")).alias("c")).head().c
    assert got == "https://example.com/a?q=what?"


# ---------------------------------------------------------------------------
# unicode_normalize_udf
# ---------------------------------------------------------------------------


def test_unicode_normalize_forms(spark):
    import unicodedata

    from codd_spark.functions.text import unicode_normalize_udf

    rows = [
        (1, "caf\u00e9"),          # composed
        (2, "cafe\u0301"),         # decomposed
        (3, None),
        (4, "\ufb01ne"),           # fi ligature
        (5, "A\u030a"),            # A + combining ring
    ]
    df = spark.createDataFrame(rows, "i long, t string")
    for form in ("NFC", "NFD", "NFKC", "NFKD"):
        udf = unicode_normalize_udf(form)
        got = {r.i: r.n for r in df.select("i", udf(F.col("t")).alias("n")).collect()}
        for i, t in rows:
            want = None if t is None else unicodedata.normalize(form, t)
            assert got[i] == want, (form, i)
    # composed == decomposed under NFC; ligature folds only under NFK*
    nfc = unicode_normalize_udf("NFC")
    out = {r.i: r.n for r in df.select("i", nfc(F.col("t")).alias("n")).collect()}
    assert out[1] == out[2] == "café"
    assert out[4] == "ﬁne"
    import pytest as _pytest

    with _pytest.raises(ValueError, match="form"):
        unicode_normalize_udf("NFX")


def test_unicode_normalize_matches_duckdb_nfc(spark):
    """The cross-engine contract the unicode_dedup_docs oracle rests on:
    Python unicodedata NFC == DuckDB nfc_normalize on mixed-form text."""
    import duckdb

    from codd_spark.functions.text import unicode_normalize_udf

    texts = [
        "caf\u00e9 cafe\u0301",
        "A\u030aA\u00c5",
        "n\u0303 vs \u00f1",
        "plain ascii",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, t string")
    nfc = unicode_normalize_udf("NFC")
    got = {r.i: r.n for r in df.select("i", nfc(F.col("t")).alias("n")).collect()}
    con = duckdb.connect()
    for i, t in enumerate(texts):
        want = con.execute("SELECT nfc_normalize(?)", [t]).fetchone()[0]
        assert got[i] == want


# ---------------------------------------------------------------------------
# html_to_text
# ---------------------------------------------------------------------------


def test_html_to_text_extraction(spark):
    from codd_spark.functions.text import html_to_text

    cases = [
        # (html, expected)
        ("<p>plain</p>", "plain"),
        ("<script>var x = '<p>no</p>';</script>yes", "yes"),
        ("<STYLE>p{}</STYLE>text", "text"),
        ("a<!-- hidden -->b", "ab"),
        ("one<br/>two</p>three", "one\ntwo\nthree"),
        ("<h1>H</h1><ul><li>i1</li><li>i2</li></ul>", "H\ni1\ni2"),
        ("A &amp; B &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;end",
         'A & B <tag> "q" \'s\' end'),
        # &amp; decodes LAST: &amp;lt; -> &lt; (one decode, not <)
        ("&amp;lt;", "&lt;"),
        ("  spaced\t\tout  \n\n\n  lines  ", "spaced out\nlines"),
        ("", ""),
        (None, None),
    ]
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(cases)], "i long, h string"
    )
    got = {r.i: r.t for r in df.select("i", html_to_text(F.col("h")).alias("t")).collect()}
    for i, (h, want) in enumerate(cases):
        assert got[i] == want, f"case {i}: {h!r} -> {got[i]!r}, want {want!r}"


def test_html_to_text_feeds_line_dedup(spark):
    """The intended composition: extraction preserves block structure as
    lines, so template chrome dedups away downstream."""
    from codd_spark.functions.text import html_to_text

    pages = [
        (i, f"<div>Cookie banner</div><p>content {i}</p><div>(c) site</div>")
        for i in range(6)
    ]
    df = spark.createDataFrame(pages, "doc_id long, h string").select(
        "doc_id", html_to_text(F.col("h")).alias("text")
    )
    out = {r.doc_id: r for r in line_dedup(df, min_count=4).collect()}
    assert all(r.cleaned_text == f"content {i}" for i, r in out.items())


# ---------------------------------------------------------------------------
# farthest_point_sample
# ---------------------------------------------------------------------------


def test_fps_matches_python_reference(spark):
    """The whole greedy chain vs a from-scratch reference on the same
    quantized codes (codes fetched FROM the engine so the reference
    checks the selection logic, not the quantizer — the quantizer has
    its own oracle row)."""
    from codd_spark.operators.similarity import (
        farthest_point_sample,
        sq_train_encode,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").where(
        "vec_id < 120"
    )
    encoded, _ = sq_train_encode(emb, dim=64)
    codes = {r.vec_id: list(r.codes) for r in encoded.collect()}

    k = 6
    got = [
        (r.rank, r.vec_id, r.d2)
        for r in farthest_point_sample(emb, k, dim=64).orderBy("rank").collect()
    ]

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    sel = min(codes)
    want = [(1, sel, None)]
    mind = {i: d2(codes[i], codes[sel]) for i in codes if i != sel}
    for r in range(2, k + 1):
        nxt = max(mind, key=lambda i: (mind[i], -i))
        want.append((r, nxt, mind[nxt]))
        c = codes[nxt]
        del mind[nxt]
        for i in mind:
            mind[i] = min(mind[i], d2(codes[i], c))
    assert got == want
    d2s = [d for _, _, d in got if d is not None]
    assert d2s == sorted(d2s, reverse=True)  # radius curve non-increasing


def test_fps_k_exceeds_corpus(spark):
    from codd_spark.operators.similarity import farthest_point_sample

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").where(
        "vec_id < 3"
    )
    out = farthest_point_sample(emb, 10, dim=64).collect()
    assert len(out) == 3  # returns what exists, no error


def test_fps_validation(spark):
    from codd_spark.operators.similarity import farthest_point_sample

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    with pytest.raises(ValueError, match="k must be"):
        farthest_point_sample(emb, 0, dim=64)
    with pytest.raises(ValueError, match="empty"):
        farthest_point_sample(emb.where("vec_id < 0"), 3, dim=64)


# ---------------------------------------------------------------------------
# html_to_text tree tier (VERDICT r10 item 4)
# ---------------------------------------------------------------------------


def _tree_extract(spark, pages):
    from codd_spark.functions.text import html_to_text_tree_udf

    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(pages)], "i long, html string"
    )
    out = df.select("i", html_to_text_tree_udf()(F.col("html")).alias("t"))
    return [r.t for r in out.orderBy("i").collect()]


def test_html_tree_tier_matches_regex_tier_on_easy_pages(spark):
    """Pages without spec-hard constructs must extract IDENTICALLY
    through either tier — the router can take either path for them."""
    from codd_spark.functions.text import html_to_text

    pages = [
        "<html><head><title>T</title><script>var x=1;</script></head>"
        "<body><h1>Head &amp; tail</h1><p>one two</p><p>three</p>"
        "<div>footer&nbsp;block</div><!-- c --></body></html>",
        "<p>a<br>b</p><ul><li>x</li><li>y</li></ul>",
    ]
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(pages)], "i long, html string"
    )
    regex_out = [
        r.t
        for r in df.select("i", html_to_text(F.col("html")).alias("t"))
        .orderBy("i")
        .collect()
    ]
    assert _tree_extract(spark, pages) == regex_out


def test_html_tree_tier_attr_gt_cdata_tables(spark):
    """The three constructs the tree tier exists for: '>' inside a
    quoted attribute value, CDATA payloads, and table cell/row
    structure."""
    got = _tree_extract(
        spark,
        [
            '<p><a title="a > b">link</a> text</p>',
            "<p>before</p><![CDATA[ secret <b>payload</b> ]]><p>after</p>",
            "<table><tr><td>a1</td><td>b1</td></tr>"
            "<tr><td>a2</td><td>b2</td></tr></table>",
            "<script>if (1 > 0) { s = '<div>'; }</script><p>kept</p>",
        ],
    )
    assert got[0] == "link text"
    assert got[1] == "before\nafter"          # CDATA dropped whole
    assert got[2] == "a1 b1\na2 b2"           # cells spaced, rows lined
    assert got[3] == "kept"                   # script content-mode skip


def test_html_routing_sends_only_hard_pages_to_python(spark):
    """html_extract_routed: the predicate routes spec-hard pages to the
    tree tier and everything else through the codegen regex chain; the
    union holds every row exactly once with the right text."""
    from codd_spark.functions.text import (
        html_extract_routed,
        html_needs_tree_tier,
    )

    rows = [
        (1, "<p>easy page</p>"),
        (2, '<p><a title="a > b">hard</a></p>'),
        (3, "x<![CDATA[y]]><p>z</p>"),
        (4, "<table><tr><td>c</td></tr></table>"),
        # single-quoted attributes are legal HTML and equally break the
        # regex tier's tag-strip — they must route too (ADVICE r11)
        (5, "<p><a title='a > b'>squote</a> text</p>"),
        # PRECISION (r12): ordinary quoted attributes WITHOUT '>' must
        # NOT route — real pages are full of them, and over-routing
        # sends the whole corpus through the Python tier
        (6, '<p><a href="page.html" title="hello">benign dq</a></p>'),
        (7, "<p><a title='hello'>benign sq</a></p>"),
        (8, '<p><a title="it\'s fine">apostrophe inside dq</a></p>'),
        # multi-attribute tag where a LATER attr holds the '>': routes
        (9, '<p><a href="x" title="a > b">later attr</a></p>'),
    ]
    df = spark.createDataFrame(rows, "doc_id long, html string")
    flags = {
        r.doc_id: r.h
        for r in df.select(
            "doc_id", html_needs_tree_tier(F.col("html")).alias("h")
        ).collect()
    }
    assert flags == {
        1: False, 2: True, 3: True, 4: True, 5: True,
        6: False, 7: False, 8: False, 9: True,
    }
    got = {
        r.doc_id: r.text for r in html_extract_routed(df).collect()
    }
    assert got[1] == "easy page" and got[2] == "hard" and got[4] == "c"
    # CDATA dropped whole; no break (both tiers break on CLOSERS only)
    assert got[3] == "xz"
    # through the tree tier the single-quoted '>' never truncates the tag
    assert got[5] == "squote text"


# ---------------------------------------------------------------------------
# batched farthest-point sampling (round 11, VERDICT r10 item 7)
# ---------------------------------------------------------------------------


def test_batched_fps_equals_sequential(spark):
    """The exactness claim: batched FPS returns the IDENTICAL (rank,
    id, d2) sequence as the one-pick-per-job variant, across batch
    sizes that force single-accept and multi-accept rounds."""
    from codd_spark.operators.similarity import (
        farthest_point_sample,
        farthest_point_sample_batched,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    want = [
        (r.rank, r.vec_id, r.d2)
        for r in farthest_point_sample(emb, 12, dim=64).orderBy("rank").collect()
    ]
    for m in (2, 4, 32):
        got = [
            (r.rank, r.vec_id, r.d2)
            for r in farthest_point_sample_batched(emb, 12, dim=64, m=m)
            .orderBy("rank")
            .collect()
        ]
        assert got == want, f"m={m}"


def test_batched_fps_sublinear_rounds(spark):
    """The scale claim: k picks complete in far fewer candidate-collect
    rounds than k (each round is O(1) Spark jobs; sequential FPS is
    exactly k-1 of them)."""
    from codd_spark.operators.similarity import farthest_point_sample_batched

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    stats = {}
    out = farthest_point_sample_batched(emb, 64, dim=64, m=32, _stats=stats)
    assert out.count() == 64
    assert stats["rounds"] <= 16  # >= 4 accepted picks per round on average


def test_batched_fps_validation_and_small_corpus(spark):
    from codd_spark.operators.similarity import (
        farthest_point_sample,
        farthest_point_sample_batched,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    with pytest.raises(ValueError, match="m must"):
        farthest_point_sample_batched(emb, 4, dim=64, m=1)
    # k larger than the corpus: returns every vector, same as sequential
    small = emb.filter("vec_id < 6")
    want = [
        (r.rank, r.vec_id, r.d2)
        for r in farthest_point_sample(small, 10, dim=64).orderBy("rank").collect()
    ]
    got = [
        (r.rank, r.vec_id, r.d2)
        for r in farthest_point_sample_batched(small, 10, dim=64, m=4)
        .orderBy("rank")
        .collect()
    ]
    assert got == want and len(got) == 6


# ---------------------------------------------------------------------------
# perplexity_buckets + host_cap (round 11)
# ---------------------------------------------------------------------------


def test_perplexity_buckets_closed_form_equals_ntile(spark):
    """The scale claim: the closed-form NTILE (scalable rank + per-lang
    bases) equals F.ntile over a window, across uneven language sizes
    and bucket counts that exercise the remainder logic."""
    from pyspark.sql.window import Window

    from codd_spark.operators.classify import planted_lang_docs
    from codd_spark.operators.text import bigram_surprisal, perplexity_buckets

    corpus = planted_lang_docs(
        spark.range(0, 121).selectExpr("id AS doc_id")  # 121 % 4 != 0
    )
    for nb in (2, 3, 5):
        got = {
            (r.doc_id, r.bucket)
            for r in perplexity_buckets(corpus, lang_col="y", n_buckets=nb).collect()
        }
        ms = bigram_surprisal(corpus).join(
            corpus.select("doc_id", "y"), on="doc_id"
        )
        w = Window.partitionBy("y").orderBy("mean_surprisal", "doc_id")
        want = {
            (r.doc_id, r.bucket)
            for r in ms.withColumn("bucket", F.ntile(nb).over(w)).collect()
        }
        assert got == want, f"n_buckets={nb}"


def test_perplexity_buckets_tiers_and_validation(spark):
    from codd_spark.operators.classify import planted_lang_docs
    from codd_spark.operators.text import perplexity_buckets

    corpus = planted_lang_docs(spark.range(0, 40).selectExpr("id AS doc_id"))
    out = perplexity_buckets(corpus, lang_col="y").collect()
    tiers = {r.bucket: r.tier for r in out}
    assert tiers == {1: "head", 2: "middle", 3: "tail"}
    four = perplexity_buckets(corpus, lang_col="y", n_buckets=4).collect()
    assert all(r.tier is None for r in four)
    with pytest.raises(ValueError, match="n_buckets"):
        perplexity_buckets(corpus, lang_col="y", n_buckets=1)


def test_perplexity_buckets_null_lang_passthrough(spark):
    """NULL-language documents (an abstaining LID gate) pass through
    scored but with NULL bucket/tier — the url_dedup/host_cap NULL-key
    contract (ADVICE r11: they previously vanished via the inner join
    on the language key)."""
    from codd_spark.operators.classify import planted_lang_docs
    from codd_spark.operators.text import perplexity_buckets

    corpus = planted_lang_docs(
        spark.range(0, 30).selectExpr("id AS doc_id")
    ).withColumn("y", F.when(F.col("doc_id") % 5 == 0, None).otherwise(F.col("y")))
    out = perplexity_buckets(corpus, lang_col="y").collect()
    assert len(out) == 30  # nothing dropped
    nulls = [r for r in out if r.y is None]
    assert len(nulls) == 6
    for r in nulls:
        assert r.bucket is None and r.tier is None
        assert r.mean_surprisal is not None  # still scored by the LM
    for r in out:
        if r.y is not None:
            assert r.bucket in (1, 2, 3) and r.tier is not None


def test_host_cap_matches_window_reference_and_nulls(spark):
    """Two-phase min-N aggregate == per-host window row_number <= N;
    NULL/unparseable-host docs bypass the cap (NULL-key contract)."""
    from codd_spark.operators.pipeline import host_cap

    rows = [
        (i, f"https://site{i % 3}.org/p/{i}") for i in range(30)
    ] + [(100, None), (101, None), (102, "not a url")]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = host_cap(df, max_per_host=4).collect()
    kept = {(r.doc_id, r.host, r.host_rank) for r in out if r.host is not None}
    # per host: lowest 4 ids, ranked 1..4
    want = {
        (h * 1 + i * 3 + h, f"site{h}.org", i + 1)
        for h in range(3)
        for i in range(4)
    }
    want = {
        (sorted(j for j in range(30) if j % 3 == h)[i], f"site{h}.org", i + 1)
        for h in range(3)
        for i in range(4)
    }
    assert kept == want
    passthru = {r.doc_id for r in out if r.host is None}
    assert passthru == {100, 101, 102}
    assert all(r.host_rank is None for r in out if r.host is None)
    with pytest.raises(ValueError, match="max_per_host"):
        host_cap(df, max_per_host=0)


def test_host_cap_skewed_host_stays_bounded(spark):
    """A single dominant host (the 10^9-page scenario in miniature):
    every per-(host, salt) partial is capped at max_per_host, and the
    final set is exactly the N lowest ids."""
    from codd_spark.operators.pipeline import host_cap

    df = spark.createDataFrame(
        [(i, "https://megafarm.com/x") for i in range(500)]
        + [(1000, "https://tiny.org/a")],
        "doc_id long, url string",
    )
    out = host_cap(df, max_per_host=7, n_salts=8).collect()
    mega = sorted(
        (r.host_rank, r.doc_id) for r in out if r.host == "megafarm.com"
    )
    assert mega == [(i + 1, i) for i in range(7)]
    assert [r.doc_id for r in out if r.host == "tiny.org"] == [1000]


def test_line_dedup_paragraph_mode(spark):
    """sep="\\n\\n" turns line dedup into PARAGRAPH dedup (the coarser
    CCNet variant): repeated whole paragraphs vanish corpus-wide,
    documents reassemble with the paragraph separator intact."""
    boiler = "Subscribe now.\nGet our app."
    rows = [
        (1, f"unique intro\n\n{boiler}\n\nreal body one"),
        (2, f"{boiler}\n\nreal body two"),
        (3, "totally original\n\nnothing shared"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.cleaned_text, r.n_lines, r.n_removed)
        for r in line_dedup(df, min_count=2, sep="\n\n").collect()
    }
    assert got[1] == ("unique intro\n\nreal body one", 3, 1)
    assert got[2] == ("real body two", 2, 1)
    assert got[3] == ("totally original\n\nnothing shared", 2, 0)
