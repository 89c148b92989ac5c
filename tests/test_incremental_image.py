"""IncrementalImageDeduplicator: arrival-order perceptual image dedup
with the shared bucketed persistent state.

Contract under test (mirrors test_incremental_dedup.py for text):
- ONE batch == image_near_duplicates pairs -> closure -> min-id keepers;
- a later arrival that near-dups an already-kept image is dropped,
  novel images are kept;
- persistent state survives a catalog-drop restart via .open() and
  keeps the bucketed zero-Exchange probe shape after compact();
- scoring-knob drift on reopen is rejected.
"""

import hashlib
import shutil

import pytest
from pyspark.sql import functions as F

from codd_spark.operators.graph import dedup_clusters
from codd_spark.operators.multimodal import (
    IncrementalImageDeduplicator,
    gradient_png_media_from_ids,
    image_near_duplicates,
)


@pytest.fixture(scope="module")
def media(spark):
    ids = spark.range(0, 150).selectExpr("id AS media_id")
    return gradient_png_media_from_ids(ids).localCheckpoint(eager=True)


def _restart(spark, d):
    tag = hashlib.md5(d.encode()).hexdigest()[:12]
    spark.sql(f"DROP TABLE IF EXISTS inc_minhash_{tag}_buckets")
    spark.sql(f"DROP TABLE IF EXISTS inc_minhash_{tag}_shingles")


def test_one_batch_equals_batch_pipeline(spark, media):
    dd = IncrementalImageDeduplicator(spark, max_hamming=2)
    kept = {r.media_id for r in dd.add_batch(media).collect()}
    pairs = image_near_duplicates(media, max_hamming=2)
    want = {
        r.media_id
        for r in dedup_clusters(
            media.select("media_id"), pairs, "media_id", "id_a", "id_b"
        )
        .filter("is_keeper")
        .collect()
    }
    assert kept == want and len(kept) == 50  # one keeper per id%50 base


def test_later_near_dup_dropped_novel_kept(spark, media):
    b1 = media.filter("media_id < 50")
    b2 = media.filter("media_id >= 50 AND media_id < 120")
    dd = IncrementalImageDeduplicator(spark, max_hamming=2)
    k1 = {r.media_id for r in dd.add_batch(b1).collect()}
    k2 = {r.media_id for r in dd.add_batch(b2).collect()}
    assert k1 == set(range(50))
    # every batch-2 image is a 1-bit-flipped copy of a batch-1 keeper
    assert k2 == set() and dd.n_kept == 50


def test_persistent_restart_and_compact(spark, media, tmp_path):
    d = str(tmp_path / "img_state")
    b1 = media.filter("media_id < 50")
    b2 = media.filter("media_id >= 50 AND media_id < 120")
    dd = IncrementalImageDeduplicator(
        spark, state_dir=d, state_buckets=4, max_hamming=2
    )
    assert {r.media_id for r in dd.add_batch(b1).collect()} == set(range(50))
    del dd
    _restart(spark, d)

    dd2 = IncrementalImageDeduplicator.open(spark, d)
    assert dd2.n_kept == 50 and dd2.max_hamming == 2
    assert dd2.add_batch(b2).count() == 0
    out = dd2.compact()
    assert out["generation"] is not None
    # bucketed zero-Exchange probe survives compaction
    probe = spark.createDataFrame([(7, 3, 123)], "id LONG, band INT, h LONG")
    j = dd2._kept_buckets.select("band", "h", F.col("id").alias("l")).join(
        probe.select("band", "h", F.col("id").alias("r")).hint("shuffle_merge"),
        on=["band", "h"],
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "Bucketed: true" in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_reopen_rejects_knob_drift(spark, media, tmp_path):
    d = str(tmp_path / "drift_img_state")
    IncrementalImageDeduplicator(spark, state_dir=d, max_hamming=2).add_batch(
        media.filter("media_id < 20")
    ).count()
    with pytest.raises(ValueError, match="max_hamming"):
        IncrementalImageDeduplicator(spark, state_dir=d, max_hamming=3)
    with pytest.raises(ValueError, match="params"):
        IncrementalImageDeduplicator(spark, state_dir=d, n_chunks=8, max_hamming=2)
