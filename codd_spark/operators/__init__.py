"""Engine operators beyond the reference algebra (SURVEY.md §2.2 gaps +
the LLM-data-pipeline operator set): aggregation/top-k, dedup families,
similarity search, text analysis, multimodal plumbing."""

from codd_spark.operators.aggregates import grouped_top_k, top_k
from codd_spark.operators.dedup import (
    dedup_exact,
    minhash_near_duplicates,
    minhash_signature,
    ngram_jaccard_pairs,
    simhash64,
    simhash_near_duplicates,
)
from codd_spark.operators.similarity import (
    brute_force_top_k,
    embedding_near_duplicates,
    lsh_top_k,
)
from codd_spark.operators.text import (
    add_text_features,
    lang_id,
    quality_score,
    winnowing_fingerprints,
)

__all__ = [
    "add_text_features",
    "brute_force_top_k",
    "dedup_exact",
    "embedding_near_duplicates",
    "grouped_top_k",
    "lang_id",
    "lsh_top_k",
    "minhash_near_duplicates",
    "minhash_signature",
    "ngram_jaccard_pairs",
    "quality_score",
    "simhash64",
    "simhash_near_duplicates",
    "top_k",
    "winnowing_fingerprints",
]
