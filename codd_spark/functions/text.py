"""Text column functions (JVM-side; no Python UDFs in the hot path)."""

from __future__ import annotations

from pyspark.sql import Column, functions as F

_WS = r"\s+"


def normalize_ws(c: Column) -> Column:
    """Lowercase + collapse whitespace runs to single spaces + trim."""
    return F.trim(F.regexp_replace(F.lower(c), _WS, " "))


def tokens(c: Column) -> Column:
    """Whitespace tokenization of trimmed text -> array<string>."""
    return F.split(F.trim(c), _WS)


def token_count(c: Column) -> Column:
    return F.size(tokens(c))


def punct_ratio(c: Column) -> Column:
    """Fraction of characters that are not word chars or whitespace."""
    clen = F.length(c)
    stripped = F.length(F.regexp_replace(c, r"[\w\s]", ""))
    return F.when(clen > 0, stripped.cast("double") / clen.cast("double")).otherwise(0.0)


def fingerprint_md5(c: Column) -> Column:
    """Document fingerprint: md5 of the whitespace-normalized lowercase text
    — the exact-dup key for content-level dedup."""
    return F.md5(normalize_ws(c))


def unicode_normalize_udf(form: str = "NFC"):
    """Arrow-batched Unicode normalizer (string -> string): returns a
    vectorized pandas UDF applying ``unicodedata.normalize(form, s)``.

    Why a UDF at all (the repo's hot paths are expression-only): Spark
    SQL has NO Unicode-normalization expression, and dedup keys are
    wrong without it — "café" arrives from the web both composed
    (U+00E9) and decomposed (e + U+0301), different byte strings that
    every hash-based dedup treats as distinct documents. This is the
    same justified-Python class as the media decode kernels: no column-
    expression form exists, so it ships as a stateless Arrow-batched
    scalar UDF (map-only, no shuffle, scales with executor count).

    Cross-engine contract: NFC/NFD/NFKC/NFKD are defined by Unicode
    UAX #15 — Python's unicodedata and DuckDB's nfc_normalize agree by
    specification, so normalized keys are oracle-replayable.

    NULL passes through as NULL.
    """
    import unicodedata

    from pyspark.sql.functions import pandas_udf

    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"form must be NFC/NFD/NFKC/NFKD, got {form!r}")

    def _norm(s):
        return s.map(lambda x: unicodedata.normalize(form, x), na_action="ignore")

    return pandas_udf(_norm, "string")


def html_to_text(c: Column) -> Column:
    """Crude-but-deterministic HTML -> text extraction — the fetch-side
    step every crawl pipeline runs before line dedup and quality
    scoring. Pure expression tree (chained regexp_replace, all RE2-safe:
    inline (?is) flags + lazy quantifiers, no lookarounds), so it runs
    in codegen at scan speed and a SQL oracle replays the extraction
    character for character.

    Not a spec HTML5 parser (that class needs a real tree builder);
    this is the regex tier real pipelines use for the bulk pass:

    - <script>/<style> blocks and <!-- comments --> dropped whole
    - block-level closers (</p> </div> </li> </h1-6> </tr>) and <br>
      become NEWLINES, so downstream line_dedup sees the page's block
      structure
    - every remaining tag stripped
    - the six ubiquitous entities decoded (&nbsp; &lt; &gt; &quot;
      &#39; then &amp; LAST so &amp;lt; decodes exactly once)
    - horizontal whitespace collapsed, blank lines squeezed, trimmed
    """
    t = F.regexp_replace(c, r"(?is)<script[^>]*>.*?</script>", "")
    t = F.regexp_replace(t, r"(?is)<style[^>]*>.*?</style>", "")
    t = F.regexp_replace(t, r"(?s)<!--.*?-->", "")
    t = F.regexp_replace(t, r"(?i)<(?:br|/p|/div|/li|/h[1-6]|/tr)[^>]*>", "\n")
    t = F.regexp_replace(t, r"(?s)<[^>]*>", "")
    for ent, rep in (
        ("&nbsp;", " "),
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
        ("&amp;", "&"),
    ):
        t = F.replace(t, F.lit(ent), F.lit(rep))
    t = F.regexp_replace(t, r"[ \t\r]+", " ")
    t = F.regexp_replace(t, r" ?\n ?", "\n")
    t = F.regexp_replace(t, r"\n+", "\n")
    return F.trim(F.regexp_replace(t, r"^\n|\n$", ""))
