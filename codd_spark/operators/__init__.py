"""Engine operators beyond the reference algebra (SURVEY.md §2.2 gaps +
the LLM-data-pipeline operator set): aggregation/top-k, dedup families,
decontamination, similarity search, text analysis, graph, pipeline
assembly, multimodal plumbing."""

from codd_spark.operators.aggregates import histogram, grouped_top_k, top_k
from codd_spark.operators.dedup import (
    cross_near_duplicates,
    decontaminate,
    IncrementalDecontaminator,
    dedup_exact,
    duplicate_spans,
    minhash_near_duplicates,
    minhash_signature,
    ngram_containment_matches,
    ngram_jaccard_pairs,
    remove_spans,
    simhash64,
    simhash_near_duplicates,
)
from codd_spark.operators.graph import (
    connected_components,
    dedup_clusters,
    pagerank,
    triangle_counts,
)
from codd_spark.operators.pipeline import (
    chunk_documents,
    cluster_safe_split,
    curate_corpus,
    pack_sequences,
    robust_outliers,
    shuffle_shards,
    train_val_test_split,
)
from codd_spark.operators.similarity import (
    brute_force_top_k,
    embedding_near_duplicates,
    ivf_top_k,
    lsh_top_k,
    pq_top_k,
    pq_train_encode,
    hard_negatives,
    semantic_dedup,
    sq_top_k,
    sq_train_encode,
)
from codd_spark.operators.cdc import merge_upsert, scd2_history, snapshot_at
from codd_spark.operators.timeseries import resample
from codd_spark.operators.text import (
    add_text_features,
    bm25_top_k,
    lang_id,
    quality_score,
    winnowing_fingerprints,
)

__all__ = [
    "add_text_features",
    "bm25_top_k",
    "brute_force_top_k",
    "chunk_documents",
    "cluster_safe_split",
    "connected_components",
    "cross_near_duplicates",
    "IncrementalDecontaminator",
    "curate_corpus",
    "decontaminate",
    "dedup_clusters",
    "dedup_exact",
    "duplicate_spans",
    "embedding_near_duplicates",
    "grouped_top_k",
    "hard_negatives",
    "histogram",
    "ivf_top_k",
    "lang_id",
    "lsh_top_k",
    "merge_upsert",
    "minhash_near_duplicates",
    "minhash_signature",
    "ngram_containment_matches",
    "ngram_jaccard_pairs",
    "pack_sequences",
    "pagerank",
    "pq_top_k",
    "resample",
    "triangle_counts",
    "pq_train_encode",
    "quality_score",
    "remove_spans",
    "robust_outliers",
    "scd2_history",
    "semantic_dedup",
    "shuffle_shards",
    "simhash64",
    "simhash_near_duplicates",
    "snapshot_at",
    "sq_top_k",
    "sq_train_encode",
    "top_k",
    "train_val_test_split",
    "winnowing_fingerprints",
]
