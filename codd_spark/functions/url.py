"""URL canonicalization — expression-only column functions for crawl
curation: the same page arrives as ``HTTPS://WWW.Example.COM:443/a/``,
``https://example.com/a?utm_source=feed`` and ``https://example.com/a``,
and URL-level dedup / host-level rollups are meaningless until those
collapse to one key. Every step is a built-in string/array expression
(regexp_extract, filter, array_sort, concat) — whole-stage codegen, no
UDF, and every regex is RE2-safe (no lookarounds, no backreferences) so
a SQL oracle replays the canonical form character for character.

Canonicalization applied (the conservative, widely-agreed subset — no
path re-encoding, no case-folding of paths, nothing lossy):

- scheme lowercased
- userinfo dropped; host lowercased, leading ``www.`` and trailing dot
  stripped
- default ports removed (``:80`` for http, ``:443`` for https)
- trailing slashes stripped from the path (``/a/`` == ``/a``, ``/`` ==
  empty)
- fragment dropped
- tracking parameters removed (``utm_*`` prefixes and the exact names
  in ``TRACKING_PARAMS``), remaining params sorted byte-lexicographic

Inputs without a ``scheme://`` are returned trimmed but otherwise
untouched (relative references have no authority to normalize).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

TRACKING_PARAMS = ("gclid", "fbclid", "msclkid", "ref")

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_REST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://(.*)$"


def _parts(u: Column) -> tuple[Column, Column, Column, Column, Column]:
    """(scheme, host, port, path, query) of a trimmed absolute URL —
    empty strings where a component is absent (regexp_extract returns
    '' on no-match, which composes cleanly below)."""
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    rest = F.regexp_extract(u, _REST_RE, 1)
    auth = F.regexp_extract(rest, r"^([^/?#]*)", 1)
    hostport = F.regexp_extract(auth, r"([^@]*)$", 1)
    host = F.lower(F.regexp_extract(hostport, r"^([^:]*)", 1))
    port = F.regexp_extract(hostport, r":([0-9]+)$", 1)
    path = F.regexp_extract(rest, r"^[^/?#]*([^?#]*)", 1)
    query = F.regexp_extract(rest, r"^[^?#]*\?([^#]*)", 1)
    return scheme, host, port, path, query


def url_host(c: Column, *, strip_www: bool = True) -> Column:
    """Canonical host of an absolute URL: lowercased, userinfo/port
    dropped, trailing dot stripped, leading ``www.`` stripped (the
    host-level rollup key — per-site document counts, domain caps,
    robots policy joins). '' when the input has no ``scheme://``."""
    u = F.trim(c)
    _, host, _, _, _ = _parts(u)
    host = F.regexp_replace(host, r"\.$", "")
    if strip_www:
        host = F.regexp_replace(host, r"^www\.", "")
    # IPv6 literals: return the whole bracketed host, not its prefix
    hostport = F.regexp_extract(
        F.regexp_extract(F.regexp_extract(u, _REST_RE, 1), r"^([^/?#]*)", 1),
        r"([^@]*)$",
        1,
    )
    return F.when(
        hostport.startswith("["),
        F.lower(F.regexp_extract(hostport, r"^(\[[^\]]*\])", 1)),
    ).otherwise(host)


def canonical_url(
    c: Column,
    *,
    strip_www: bool = True,
    tracking_params: tuple[str, ...] = TRACKING_PARAMS,
) -> Column:
    """Canonical form of an absolute URL (see module docstring for the
    exact normalization set). Pure expression tree — safe in the hot
    path of a 100 TB crawl scan."""
    u = F.trim(c)
    scheme, host, port, path, query = _parts(u)
    host = F.regexp_replace(host, r"\.$", "")
    if strip_www:
        host = F.regexp_replace(host, r"^www\.", "")
    default_port = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    portpart = F.when(
        (port != "") & ~default_port, F.concat(F.lit(":"), port)
    ).otherwise(F.lit(""))
    path = F.regexp_replace(path, r"/+$", "")

    params = F.filter(
        F.split(query, "&"),
        lambda x: (x != "")
        & ~F.split_part(x, F.lit("="), F.lit(1)).startswith("utm_")
        & ~F.split_part(x, F.lit("="), F.lit(1)).isin(*tracking_params),
    )
    qpart = F.when(
        F.size(params) > 0,
        F.concat(F.lit("?"), F.array_join(F.array_sort(params), "&")),
    ).otherwise(F.lit(""))

    # IPv6 literal hosts ([::1]:8080) don't fit the host:port split —
    # pass them through untouched rather than canonicalize them wrong
    hostport = F.regexp_extract(
        F.regexp_extract(u, _REST_RE, 1), r"^([^/?#]*)", 1
    )
    bracketed = F.regexp_extract(hostport, r"([^@]*)$", 1).startswith("[")
    return F.when(
        (scheme == "") | bracketed, u
    ).otherwise(F.concat(scheme, F.lit("://"), host, portpart, path, qpart))
