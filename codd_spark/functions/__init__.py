from codd_spark.functions.vector import (
    cosine_similarity,
    dot,
    l2_norm,
    vector_digest,
)
from codd_spark.functions.url import canonical_url, url_host
from codd_spark.functions.text import (
    fingerprint_md5,
    html_to_text,
    unicode_normalize_udf,
    normalize_ws,
    punct_ratio,
    token_count,
    tokens,
)

__all__ = [
    "canonical_url",
    "html_to_text",
    "cosine_similarity",
    "dot",
    "fingerprint_md5",
    "l2_norm",
    "normalize_ws",
    "punct_ratio",
    "token_count",
    "tokens",
    "unicode_normalize_udf",
    "url_host",
    "vector_digest",
]
