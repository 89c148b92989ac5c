"""Streaming Bloom decontamination: the map-only GramBloom probe applied
to a file-source stream, validated against the batch operator.

Two equivalences are the contract:
- sketch-only: streaming survivor set == batch ``bloom_decontaminate``
  with ``exact_verify=False`` (the probe is per-document and stateless,
  so micro-batching cannot change any decision), and
- exact: the foreachBatch wrapper (``bloom_decontaminate_batch_fn``)
  accumulates exactly the batch ``exact_verify=True`` survivor set —
  i.e. exactly the containment rule's survivors.
"""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from codd_spark.operators.dedup import (
    bloom_decontaminate,
    bloom_probe,
    build_gram_bloom,
)
from codd_spark.streaming.structured import (
    bloom_decontaminate_batch_fn,
    stream_from_directory,
    streaming_bloom_decontaminate,
)

SCHEMA = "doc_id LONG, text STRING"

CONTAMINANTS = [
    (100, "the quick brown fox jumps over the lazy dog"),
    (101, "pack my box with five dozen liquor jugs"),
]

DOCS = [
    # clean
    (1, "spark shuffles keyed data between stages"),
    (2, "parquet files store columnar row groups"),
    # contains a full contaminant 3-gram run (dirty at min_hits>=1)
    (3, "intro text the quick brown fox jumps outro text"),
    # contains a different contaminant's grams
    (4, "please pack my box with five dozen items"),
    # shares only single words, never a 3-gram
    (5, "the dog and the fox are friends"),
    (6, "five jugs of liquor stand alone"),
    # second micro-batch worth of docs
    (7, "jumps over the lazy dog said the narrator"),
    (8, "broadcast joins avoid shuffling the big side"),
]


@pytest.fixture()
def docs_dir(spark):
    d = tempfile.mkdtemp(prefix="codd_bloom_stream_")
    # two files -> two micro-batches with maxFilesPerTrigger=1
    spark.createDataFrame(DOCS[:4], SCHEMA).coalesce(1).write.mode("append").parquet(d)
    spark.createDataFrame(DOCS[4:], SCHEMA).coalesce(1).write.mode("append").parquet(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _contaminants(spark):
    return spark.createDataFrame(CONTAMINANTS, SCHEMA)


def _drain(q, timeout=120):
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(timeout)


def test_streaming_sketch_only_equals_batch(spark, docs_dir):
    import uuid

    cont = _contaminants(spark)
    bloom = build_gram_bloom(cont, "doc_id", "text", n=3)
    batch_docs = spark.read.schema(SCHEMA).parquet(docs_dir)

    want = sorted(
        r.doc_id
        for r in bloom_decontaminate(
            batch_docs, cont, n=3, min_hits=1, exact_verify=False
        ).collect()
    )

    sdf = stream_from_directory(spark, docs_dir, SCHEMA)
    name = f"bloom_clean_{uuid.uuid4().hex[:8]}"
    q = (
        streaming_bloom_decontaminate(sdf, bloom, min_hits=1)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    _drain(q)
    got = sorted(r.doc_id for r in spark.table(name).collect())
    assert got == want
    # and the schema is untouched (helper column dropped)
    assert spark.table(name).columns == ["doc_id", "text"]


def test_streaming_probe_no_false_negatives(spark, docs_dir):
    """Every doc the exact containment rule removes is bloom-flagged on
    the stream: survivors of the sketch-only stream are a SUBSET of the
    exact batch survivors."""
    cont = _contaminants(spark)
    bloom = build_gram_bloom(cont, "doc_id", "text", n=3)
    batch_docs = spark.read.schema(SCHEMA).parquet(docs_dir)

    exact_survivors = {
        r.doc_id
        for r in bloom_decontaminate(
            batch_docs, cont, n=3, min_hits=1, exact_verify=True
        ).collect()
    }
    sketch_survivors = {
        r.doc_id
        for r in bloom_probe(batch_docs, bloom)
        .filter(F.col("bloom_hits") < 1)
        .collect()
    }
    assert sketch_survivors <= exact_survivors


def test_foreach_batch_exact_equals_batch(spark, docs_dir):
    cont = _contaminants(spark)
    bloom = build_gram_bloom(cont, "doc_id", "text", n=3)
    batch_docs = spark.read.schema(SCHEMA).parquet(docs_dir)

    want = sorted(
        r.doc_id
        for r in bloom_decontaminate(
            batch_docs, cont, n=3, min_hits=1, exact_verify=True
        ).collect()
    )

    got_ids = []

    def sink(df, epoch_id):
        got_ids.extend(r.doc_id for r in df.collect())

    sdf = stream_from_directory(spark, docs_dir, SCHEMA)
    q = (
        sdf.writeStream.foreachBatch(
            bloom_decontaminate_batch_fn(cont, bloom, sink, min_hits=1)
        )
        .outputMode("append")
        .start()
    )
    _drain(q)
    assert sorted(got_ids) == want
    # sanity: the exact pass keeps the single-word-overlap docs the
    # sketch pass also keeps, and drops the gram-run docs
    assert 3 not in got_ids and 4 not in got_ids
    assert {1, 2, 5, 6, 8} <= set(got_ids)
