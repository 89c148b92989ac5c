"""Similarity search over embedding columns (array<float>).

Two paths:
- brute_force_top_k: exact cosine top-k — the baseline. Broadcast the
  (small) query side; scoring is a JVM expression, ranking is a window.
- lsh_top_k: random-hyperplane LSH buckets + multi-probe — the scale path.
  Buckets co-locate candidates so the join touches a small fraction of the
  corpus; recall is tuned by n_planes / probe radius.

Plus embedding_near_duplicates: cosine>=threshold pair mining via the same
buckets (embedding near-dup dedup for training corpora).
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

from codd_spark.functions.vector import cosine_similarity


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def _lit_vec(v: list[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in v])


def _plane_dot(emb: Column, plane: list[float]) -> Column:
    return F.aggregate(
        F.zip_with(emb, _lit_vec(plane), lambda x, p: x.cast("double") * p),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def hyperplane_bucket(emb: Column, planes: list[list[float]]) -> Column:
    """Sign-of-projection bit bucket: int in [0, 2^n_planes)."""
    bits = [
        F.when(_plane_dot(emb, plane) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i, plane in enumerate(planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


def brute_force_top_k(
    df: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    query_id_col: str = "query_id",
    query_emb_col: str = "q_emb",
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k per query. Query side is broadcast (no shuffle of
    the corpus); one window per query partition ranks candidates. Norms
    are hoisted out of the pair stage (computed once per corpus vector /
    query vector), so the per-pair expression is a single dot-product
    fold — bit-identical doubles, ~5x less interpreted HOF work."""
    from codd_spark.functions.vector import dot, l2_norm

    corpus = df.select(
        F.col(id_col), F.col(emb_col), l2_norm(F.col(emb_col)).alias("__cn")
    )
    qn = queries.withColumn("__qn", l2_norm(F.col(query_emb_col)))
    pairs = corpus.join(F.broadcast(qn), F.col(id_col) != F.col(query_id_col))
    denom = F.col("__qn") * F.col("__cn")
    cos = F.when(denom != 0, dot(F.col(query_emb_col), F.col(emb_col)) / denom)
    scored = pairs.select(
        F.col(query_id_col),
        F.col(id_col).alias("neighbor_id"),
        F.round(cos, 6).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def lsh_top_k(
    df: DataFrame,
    queries: DataFrame,
    *,
    dim: int,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    query_id_col: str = "query_id",
    query_emb_col: str = "q_emb",
    k: int = 10,
    n_planes: int = 8,
    probe_hamming: int = 1,
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k: bucket corpus and queries by hyperplane
    signs, probe the query's bucket plus all buckets within Hamming distance
    ``probe_hamming`` (multi-probe LSH — recovers most of the recall lost to
    boundary effects), then exact-rerank within the probed buckets.

    At 100 TB the corpus side is bucketed once (can be persisted bucketed by
    ``bucket``), and each query joins only ~(1+n_planes) buckets instead of
    the full corpus."""
    from codd_spark.functions.vector import dot, l2_norm

    planes = _hyperplanes(dim, n_planes, seed)
    corpus = df.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(emb_col).alias("_emb"),
        l2_norm(F.col(emb_col)).alias("__cn"),
        hyperplane_bucket(F.col(emb_col), planes).alias("bucket"),
    )
    qb = queries.select(
        F.col(query_id_col),
        F.col(query_emb_col).alias("_qemb"),
        l2_norm(F.col(query_emb_col)).alias("__qn"),
        hyperplane_bucket(F.col(query_emb_col), planes).alias("qbucket"),
    )
    # multi-probe: expand each query to its bucket + hamming-<=r neighbors
    probes = [F.col("qbucket")]
    if probe_hamming >= 1:
        probes += [F.col("qbucket").bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)]
    if probe_hamming >= 2:
        probes += [
            F.col("qbucket").bitwiseXOR(F.lit((1 << i) | (1 << j)))
            for i in range(n_planes)
            for j in range(i + 1, n_planes)
        ]
    qx = qb.select(
        query_id_col, "_qemb", "__qn", F.explode(F.array(*probes)).alias("bucket")
    )
    joined = corpus.join(F.broadcast(qx), on="bucket").filter(
        F.col("neighbor_id") != F.col(query_id_col)
    )
    denom = F.col("__qn") * F.col("__cn")
    cos = F.when(denom != 0, dot(F.col("_qemb"), F.col("_emb")) / denom)
    scored = joined.select(
        F.col(query_id_col),
        "neighbor_id",
        F.round(cos, 6).alias("cos_sim"),
    ).distinct()
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


_IVF_INLINE_CENTROID_LIMIT = 64


def route_queries_to_lists(
    queries: DataFrame,
    centroids: list[list[float]],
    *,
    n_probe: int,
    query_id_col: str = "query_id",
    query_emb_col: str = "q_emb",
    inline_limit: int = _IVF_INLINE_CENTROID_LIMIT,
) -> DataFrame:
    """Assign each query its ``n_probe`` nearest centroid list_ids.

    Two physical strategies with identical semantics:

    - **inline** (n_lists <= inline_limit): the per-centroid squared
      distances are one array expression — zero extra joins, whole-stage
      codegen. But the expression tree grows linearly with n_lists
      (each centroid is a literal array), so at n_lists ≈ 1000+ the plan
      itself becomes megabytes and codegen falls over.
    - **centroid table** (n_lists > inline_limit): centroids become a tiny
      broadcast DataFrame; queries cross-join it (BroadcastNestedLoop over
      ~n_lists rows), distances are ONE expression evaluated per
      (query, centroid) row, and a per-query window keeps the n_probe
      nearest. Plan size is constant in n_lists — this is the 4k-list
      configuration a 100 TB corpus needs.
    """
    out_cols = (query_id_col, "_qemb", "list_id")
    if len(centroids) <= inline_limit:
        def nearest_lists(emb: Column) -> Column:
            dists = F.array(
                *[
                    F.struct(
                        F.aggregate(
                            F.zip_with(emb, _lit_vec(c), lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)),
                            F.lit(0.0),
                            lambda acc, v: acc + v,
                        ).alias("d"),
                        F.lit(i).alias("list_id"),
                    )
                    for i, c in enumerate(centroids)
                ]
            )
            return F.slice(F.array_sort(dists), 1, n_probe)

        return queries.select(
            F.col(query_id_col),
            F.col(query_emb_col).alias("_qemb"),
            F.explode(nearest_lists(F.col(query_emb_col))).alias("nl"),
        ).select(query_id_col, "_qemb", F.col("nl.list_id").alias("list_id"))

    spark = queries.sparkSession
    cent = spark.createDataFrame(
        [(i, list(map(float, c))) for i, c in enumerate(centroids)],
        "list_id INT, _cent ARRAY<DOUBLE>",
    )
    qc = queries.select(
        F.col(query_id_col), F.col(query_emb_col).alias("_qemb")
    ).crossJoin(F.broadcast(cent))
    dist = F.aggregate(
        F.zip_with(
            F.col("_qemb"),
            F.col("_cent"),
            lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    wq = Window.partitionBy(query_id_col).orderBy(F.asc("_d"), F.asc("list_id"))
    return (
        qc.withColumn("_d", dist)
        .withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= n_probe)
        .select(*out_cols)
    )


def ivf_top_k(
    df: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    query_id_col: str = "query_id",
    query_emb_col: str = "q_emb",
    k: int = 10,
    n_lists: int = 16,
    n_probe: int = 3,
    seed: int = 42,
    trainer: str = "mllib",
) -> DataFrame:
    """IVF-style approximate top-k: cluster the corpus with KMeans
    (the 'inverted lists'), assign each vector to its nearest centroid,
    and search each query only in its ``n_probe`` nearest lists.

    Compared to hyperplane LSH this adapts to the data distribution
    (centroids follow density), at the cost of a training pass. The
    centroid set is tiny and broadcast; the corpus is scanned once for
    assignment (persist the assigned table for repeated query batches at
    scale). Query->list routing switches physical strategy on n_lists —
    see route_queries_to_lists.

    ``trainer`` picks the clustering pass: ``"mllib"`` (Spark ML KMeans,
    k-means||-seeded) or ``"sq_kmeans"`` (``kmeans_quantized`` — the
    exact-integer-state Lloyd's in this module: deterministic list
    assignment with no MLlib dependency, replayable end to end; list
    geometry is computed on the quantized codes, routing centroids are
    the float means of each list)."""
    assigned, centroids = ivf_train_assign(
        df,
        id_col=id_col,
        emb_col=emb_col,
        n_lists=n_lists,
        seed=seed,
        trainer=trainer,
    )
    return ivf_probe(
        assigned,
        centroids,
        queries,
        k=k,
        n_probe=n_probe,
        query_id_col=query_id_col,
        query_emb_col=query_emb_col,
    )


def ivf_train_assign(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    n_lists: int = 16,
    seed: int = 42,
    trainer: str = "mllib",
) -> tuple[DataFrame, list[list[float]]]:
    """The TRAINING half of :func:`ivf_top_k`, exposed so a trained
    index can be persisted (operators/annstore.py) and probed in later
    sessions without retraining: returns ``(assigned, centroids)`` —
    ``assigned`` is (neighbor_id, _emb, list_id) with list ids dense in
    [0, len(centroids)), ``centroids`` the routing vectors indexed by
    list id."""
    corpus_base = df.select(
        F.col(id_col).alias("neighbor_id"), F.col(emb_col).alias("_emb")
    )
    if trainer == "sq_kmeans":
        probe = df.select(emb_col).first()
        if probe is None:
            raise ValueError(
                "ivf_top_k(trainer='sq_kmeans'): corpus is empty — "
                "cannot infer embedding dim or train centroids"
            )
        dim = len(probe[0])
        assign = kmeans_quantized(
            df, dim=dim, k=n_lists, n_iter=5, id_col=id_col, emb_col=emb_col
        ).withColumnRenamed(id_col, "neighbor_id")
        assigned = corpus_base.join(assign, on="neighbor_id").withColumnRenamed(
            "cluster", "list_id"
        )
        cent_rows = (
            assigned.select(
                "list_id", F.posexplode(F.col("_emb").cast("array<double>")).alias("pos", "v")
            )
            .groupBy("list_id", "pos")
            .agg(F.avg("v").alias("m"))
            .groupBy("list_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda st: st["m"],
                ).alias("centroid")
            )
            .orderBy("list_id")
            .collect()
        )
        # clusters can be fewer than n_lists (empty lists dropped);
        # routing indexes must match list_id values, so densify by
        # remapping list ids to the centroid row order
        remap = {r.list_id: i for i, r in enumerate(cent_rows)}
        centroids = [list(map(float, r.centroid)) for r in cent_rows]
        mapping = F.create_map(
            *[F.lit(x) for kv in remap.items() for x in kv]
        )
        assigned = assigned.withColumn("list_id", mapping[F.col("list_id")])
    elif trainer == "mllib":
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        corpus_vec = corpus_base.withColumn(
            "features", array_to_vector(F.col("_emb").cast("array<double>"))
        )
        km = KMeans(k=n_lists, seed=seed, maxIter=20)
        model = km.fit(corpus_vec.select("features"))
        assigned = model.transform(corpus_vec).select(
            "neighbor_id", "_emb", F.col("prediction").alias("list_id")
        )
        centroids = [list(map(float, c)) for c in model.clusterCenters()]
    else:
        raise ValueError(f"trainer must be 'mllib' or 'sq_kmeans', got {trainer!r}")
    return assigned, centroids


def ivf_probe(
    assigned: DataFrame,
    centroids: list[list[float]],
    queries: DataFrame,
    *,
    k: int = 10,
    n_probe: int = 3,
    query_id_col: str = "query_id",
    query_emb_col: str = "q_emb",
    prune_lists: bool = False,
) -> DataFrame:
    """The PROBE half of :func:`ivf_top_k`: route each query to its
    ``n_probe`` nearest lists, broadcast the routed queries against the
    assigned corpus (the big side never shuffles), score by rounded
    cosine, window-rank to top ``k``. ``assigned`` may be a live
    training result or a reloaded persistent index table.

    ``prune_lists=True`` collects the routed list ids (bounded by
    n_lists, never by corpus or query count) and filters ``assigned``
    with a literal IN — when the index is stored PARTITIONED BY
    list_id (operators/annstore.py), the scan statically prunes to the
    probed directories instead of reading the whole corpus."""
    qx = route_queries_to_lists(
        queries,
        centroids,
        n_probe=n_probe,
        query_id_col=query_id_col,
        query_emb_col=query_emb_col,
    )
    if prune_lists:
        # ONE bounded collect serves BOTH the pruning literal and the
        # probe's broadcast side (r14, VERDICT r13 item 3): the former
        # list_id-only collect ran the routing once for the literal and
        # then a SECOND time inside the broadcast build of the probe
        # job. The routed rows are bounded by design (the probe
        # broadcasts them anyway — same driver-memory class); they are
        # re-created as a 1-partition local relation so downstream
        # stages do not scan defaultParallelism near-empty slices, and
        # values round-trip exactly (doubles through py4j are lossless,
        # and the broadcast arithmetic consumes the same values it
        # would have computed).
        spark = queries.sparkSession
        rows = qx.collect()
        probed = sorted({r["list_id"] for r in rows})
        assigned = assigned.filter(F.col("list_id").isin(probed))
        qx = spark.createDataFrame(
            spark.sparkContext.parallelize(rows, 1) if rows
            else spark.sparkContext.emptyRDD(),
            qx.schema,
        )

    joined = assigned.join(F.broadcast(qx), on="list_id").filter(
        F.col("neighbor_id") != F.col(query_id_col)
    )
    scored = joined.select(
        F.col(query_id_col),
        "neighbor_id",
        F.round(cosine_similarity(F.col("_qemb"), F.col("_emb")), 6).alias("cos_sim"),
    ).distinct()
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def embedding_near_duplicates(
    df: DataFrame,
    *,
    dim: int,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int | str = 8,
    seed: int = 42,
    exact: bool = False,
    bands: int | str = 1,
    probe_hamming: int = 0,
    target_occupancy: int = 32,
    target_recall: float = 0.9,
) -> DataFrame:
    """Pairs (id_a < id_b) with cosine >= threshold.

    ``exact=False`` (default, the scale path): hyperplane-bucket self-join —
    a pair at angle theta collides in one band of ``n_planes`` planes with
    probability (1 - theta/pi)^n_planes. With ``bands`` > 1, ``bands``
    INDEPENDENT plane groups are drawn and a pair is a candidate if it
    collides in ANY band — minhash-style amplification,
    1 - (1 - p^r)^b, which closes the recall gap the single-bucket path
    has on mid-threshold (non-separable) corpora. ``probe_hamming=1``
    additionally probes, per band, every bucket at Hamming distance 1
    from one side's bucket (multi-probe LSH: boundary pairs that one
    plane splits are recovered without more bands). ``exact=True``: full
    O(n^2) cross join for bounded subsets / verification.

    100-TB design: candidates shuffle on (band, bucket) — the explode
    costs bands*(1 + probes) rows per vector, NOT per pair — then the
    distinct pair set (usually orders of magnitude smaller than raw
    collisions) is verified against the embeddings via two pinned
    shuffle joins. Norms are computed ONCE PER VECTOR before the pair
    stage, so the per-pair expression is a single dot-product fold
    (hoisting measured ~5x on the candidate stage; doubles are
    bit-identical — the fold order inside each aggregate is unchanged).

    SCALE THE PLANES WITH THE CORPUS: bucket occupancy is n/2^n_planes
    and the per-bucket pair stage is quadratic in occupancy, so a FIXED
    n_planes turns superlinear as the corpus grows (measured: 8 planes
    on 200k vectors = 2.5x the per-vector cost of 20k). Pass
    ``n_planes="auto"`` to size planes from the corpus count so that
    occupancy stays ~``target_occupancy`` (one cheap count() at plan
    time, clamped to [8, 24]); combine with ``bands="auto"`` to pick the
    band count that keeps expected recall at threshold above
    ``target_recall`` for the chosen plane count
    (B = ceil(ln(1-target)/ln(1-p^P)), p = 1 - acos(t)/pi — the
    standard LSH amplification identity). Auto planes WITHOUT auto bands
    silently lowers recall; the pairing is the supported scale mode.
    """
    import math

    from codd_spark.functions.vector import dot, l2_norm

    if n_planes == "auto":
        n_vecs = max(df.count(), 1)
        n_planes = min(24, max(8, math.ceil(math.log2(max(n_vecs / target_occupancy, 2.0)))))
        if bands == "auto":
            p = 1.0 - math.acos(min(max(threshold, -1.0), 1.0)) / math.pi
            p_band = max(p ** n_planes, 1e-12)
            if probe_hamming == 1:
                # a probe recovers any pair that exactly one plane of the
                # band splits: collision prob rises to p^P + P*p^(P-1)(1-p)
                p_band = min(1.0, p_band + n_planes * (p ** (n_planes - 1)) * (1.0 - p))
            bands = min(64, max(1, math.ceil(
                math.log(max(1.0 - target_recall, 1e-12))
                / math.log(max(1.0 - p_band, 1e-12))
            )))
        # NOTE: plain bands (probe_hamming=0) are usually the cheaper way
        # to buy recall at auto plane counts — per vector, B bands cost
        # B bucket rows per side, while Hamming-1 probing costs (1+P)*B
        # probe rows, and candidates scale with probe rows x occupancy.
    elif bands == "auto":
        raise ValueError('bands="auto" requires n_planes="auto"')

    a = df.select(
        F.col(id_col).alias("id_a"),
        F.col(emb_col).alias("emb_a"),
        l2_norm(F.col(emb_col)).alias("__na"),
    )
    b = df.select(
        F.col(id_col).alias("id_b"),
        F.col(emb_col).alias("emb_b"),
        l2_norm(F.col(emb_col)).alias("__nb"),
    )
    denom = F.col("__na") * F.col("__nb")
    cos = F.when(denom != 0, dot(F.col("emb_a"), F.col("emb_b")) / denom)
    if exact:
        pairs = a.join(b, F.col("id_a") < F.col("id_b"))
        return (
            pairs.withColumn("cos_sim", F.round(cos, 6))
            .filter(F.col("cos_sim") >= threshold)
            .select("id_a", "id_b", "cos_sim")
            .distinct()
        )
    if probe_hamming not in (0, 1):
        raise ValueError("probe_hamming must be 0 or 1 (higher radii are combinatorial)")
    plane_groups = [
        _hyperplanes(dim, n_planes, seed + 1000003 * i) for i in range(bands)
    ]

    def band_buckets(emb: Column, probe: bool) -> Column:
        """array<struct<band,bkt>> — per band, the vector's bucket, plus
        (probe side only) every bucket one bit-flip away."""
        structs = []
        for i, planes in enumerate(plane_groups):
            bkt = hyperplane_bucket(emb, planes)
            structs.append(F.struct(F.lit(i).alias("band"), bkt.alias("bkt")))
            if probe:
                for j in range(n_planes):
                    structs.append(
                        F.struct(
                            F.lit(i).alias("band"),
                            bkt.bitwiseXOR(F.lit(1 << j)).alias("bkt"),
                        )
                    )
        return F.array(*structs)

    ab = df.select(
        F.col(id_col).alias("id_a"),
        F.explode(band_buckets(F.col(emb_col), probe_hamming == 1)).alias("bb"),
    ).select("id_a", F.col("bb.band").alias("band"), F.col("bb.bkt").alias("bkt"))
    bb = df.select(
        F.col(id_col).alias("id_b"),
        F.explode(band_buckets(F.col(emb_col), False)).alias("bb"),
    ).select("id_b", F.col("bb.band").alias("band"), F.col("bb.bkt").alias("bkt"))
    # unbounded self-join: force a shuffle join so corpus growth can
    # never turn the build side into a driver-sized broadcast
    cands = (
        ab.join(bb.hint("shuffle_merge"), on=["band", "bkt"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    return (
        cands.hint("shuffle_merge")
        .join(a, "id_a")
        .hint("shuffle_merge")
        .join(b, "id_b")
        .withColumn("cos_sim", F.round(cos, 6))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def group_centroids(
    df: DataFrame,
    group_col: str,
    emb_col: str = "embedding",
    *,
    round_to: int | None = 6,
) -> DataFrame:
    """Per-group mean embedding in LONG form: (group, pos, centroid,
    n_vectors) — one row per (group, dimension).

    The building block for IVF list seeding, class prototypes, and
    per-source drift monitoring. posexplode turns each vector into
    (group, pos, val) rows; one groupBy(group, pos) with map-side partial
    aggregation computes every centroid component in a single shuffle
    whose width is #groups x dim — independent of corpus size. Sums run
    in exact DECIMAL (order-insensitive) and divide as double at the end.
    Long form rather than re-assembled arrays: downstream joins on
    (group, pos) stay columnar, and flat rows hash cleanly for result
    comparison.
    """
    pos = df.select(
        F.col(group_col).alias("grp"), F.posexplode(emb_col).alias("pos", "val")
    )
    centroid = F.sum(F.col("val").cast("decimal(25,10)")).cast("double") / F.count("*")
    if round_to is not None:
        centroid = F.round(centroid, round_to)
    return pos.groupBy("grp", "pos").agg(
        centroid.alias("centroid"), F.count("*").alias("n_vectors")
    ).select(F.col("grp").alias(group_col), "pos", "centroid", "n_vectors")


# ---------------------------------------------------------------------------
# Scalar quantization (SQ, int8-style)
# ---------------------------------------------------------------------------

def sq_train_encode(
    df: DataFrame,
    *,
    dim: int,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    levels: int = 255,
) -> tuple[DataFrame, list[tuple[float, float]]]:
    """Per-dimension scalar quantization of an embedding corpus.

    Training is ONE aggregate computing each dimension's (min, max) over
    the corpus: posexplode -> groupBy(pos) MIN/MAX with map-side
    partials — a single scan whose only exchange carries dim rows per
    map partition (the 2·dim-column wide-agg form computed the same
    thing but its 128-expression codegen cost ~4× more wall clock at
    every scale tested); encoding maps dimension i
    to ``round((x - lo_i) / (hi_i - lo_i) * levels)`` — an integer in
    [0, levels]. At levels=255 a 64-dim float32 vector compresses 4× (one
    byte per dim). Unlike PQ's codebook lookup, SQ keeps per-dimension
    resolution, dequantizes with two constants per dim, and its codes are
    a CLOSED FORM of the corpus — which makes the encoding exactly
    replayable by a SQL oracle, not just engine-tested.

    Returns (encoded, scales): ``encoded`` is (id, codes array<int>),
    ``scales[i]`` is (lo_i, hi_i). Constant dimensions (hi == lo) encode
    as 0 and dequantize to lo exactly.
    """
    emb = F.col(emb_col).cast("array<double>")
    stat_rows = (
        df.select(F.posexplode(emb).alias("pos", "v"))
        .groupBy("pos")
        .agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
        .collect()  # bounded: dim rows
    )
    by_pos = {r.pos: (r.lo, r.hi) for r in stat_rows}
    for i in range(dim):
        lo, hi = by_pos.get(i, (None, None))
        if lo is None or hi is None:
            raise ValueError(
                f"sq_train_encode: dimension {i} has no non-null values "
                "(empty corpus or all-NULL dimension) — cannot train scales"
            )
    scales = [(float(by_pos[i][0]), float(by_pos[i][1])) for i in range(dim)]
    for i, (lo, hi) in enumerate(scales):
        # the scales become repr() string literals in the SQL below;
        # 'inf'/'nan' would round-trip through Spark's string->double
        # parse with engine-defined semantics (ADVICE r6) — reject here
        if not (math.isfinite(lo) and math.isfinite(hi)):
            raise ValueError(
                f"sq_train_encode: dimension {i} has non-finite range "
                f"[{lo}, {hi}] — clean the corpus before quantizing"
            )

    # ONE parsed SQL expression for the whole codes array: building it
    # as dim separate Column objects costs ~8 py4j round-trips per
    # dimension (~1 s of driver time at dim=64 — measured), while a
    # single expr string parses in milliseconds and codegens to the
    # identical plan. repr() round-trips doubles exactly and Spark's
    # string->double cast parses shortest-repr exactly, so the literal
    # values are bit-identical to the F.lit form.
    tmp = "__embd"
    while tmp in df.columns:  # collision-safe temp name (ADVICE r6)
        tmp += "_"

    def code_sql(i: int) -> str:
        lo, hi = scales[i]
        if hi == lo:
            return "0"
        return (
            f"CAST(round((element_at({tmp}, {i + 1}) - "
            f"CAST('{lo!r}' AS DOUBLE)) / CAST('{(hi - lo)!r}' AS DOUBLE) "
            f"* {levels}, 0) AS INT)"
        )

    codes = F.expr("array(" + ",".join(code_sql(i) for i in range(dim)) + ")")
    encoded = (
        df.withColumn(tmp, emb)
        .select(id_col, codes.alias("codes"))
    )
    return encoded, scales


def sq_model_save(
    spark,
    encoded: DataFrame,
    scales: list[tuple[float, float]],
    state_dir: str,
    *,
    levels: int = 255,
) -> None:
    """Persist a trained SQ model — codes table + per-dimension scales
    (VERDICT r12 item 3): train once, probe for months, the same
    artifact-store discipline as the NB classifier / BPE merges /
    persisted ANN indexes. The codes go to parquet under ``state_dir``;
    the scales and ``levels`` ride the statefs manifest (scoring with
    the wrong scales silently mis-dequantizes every code, so they
    travel WITH the codes; JSON round-trips Python floats via repr, so
    the reloaded literals are bit-identical). Any statefs scheme works;
    the manifest commit is the publish point."""
    from codd_spark.sources.statefs import resolve_statefs

    fs = resolve_statefs(spark, state_dir)
    if fs.manifest_exists() and fs.read_manifest().get("kind") != "sq_model":
        raise ValueError(f"{state_dir} holds non-sq_model state — refusing to adopt")
    fs.mkdirs()
    encoded.write.mode("overwrite").parquet(fs.table_location("codes"))
    fs.commit_manifest(
        {
            "kind": "sq_model",
            "levels": int(levels),
            "scales": [[lo, hi] for lo, hi in scales],
        }
    )


def sq_model_load(
    spark, state_dir: str
) -> tuple[DataFrame, list[tuple[float, float]], int]:
    """Reload a model persisted by :func:`sq_model_save`. Returns
    ``(encoded, scales, levels)`` ready for :func:`sq_top_k` — the
    probe-only path reads ONLY the bounded manifest plus the codes
    parquet; no corpus scan, no training aggregate."""
    from codd_spark.sources.statefs import resolve_statefs

    fs = resolve_statefs(spark, state_dir)
    if not fs.manifest_exists():
        raise ValueError(f"no sq_model manifest at {state_dir}")
    m = fs.read_manifest()
    if m.get("kind") != "sq_model":
        raise ValueError(f"{state_dir} holds {m.get('kind')!r} state, not sq_model")
    encoded = spark.read.parquet(fs.table_location("codes"))
    scales = [(float(lo), float(hi)) for lo, hi in m["scales"]]
    return encoded, scales, int(m["levels"])


def sq_top_k(
    encoded: DataFrame,
    scales: list[tuple[float, float]],
    queries: DataFrame,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    query_emb_col: str = "q_emb",
    levels: int = 255,
    rerank: DataFrame | None = None,
    emb_col: str = "embedding",
    rerank_factor: int = 5,
) -> DataFrame:
    """Approximate cosine top-k over scalar-quantized codes.

    Scoring dequantizes each code with its dimension's two constants
    (lo + code·step — literals folded into the expression, no lookup
    table) and computes cosine against the broadcast query side. The win
    over brute force is the 4× smaller corpus table (at 100 TB of
    embeddings, the difference between an in-memory scan and a spilling
    one); per-pair FLOPs stay O(dim). Pass ``rerank`` (the original
    embedding table) to exact-rerank the top rerank_factor·k quantized
    candidates — one extra candidates-only join, same pattern as pq_top_k.
    """
    dim = len(scales)
    steps = [
        ((hi - lo) / levels if hi != lo else 0.0, lo) for lo, hi in scales
    ]
    dequant = F.array(
        *[
            (F.element_at(F.col("codes"), i + 1).cast("double") * F.lit(steps[i][0])
             + F.lit(steps[i][1]))
            for i in range(dim)
        ]
    )
    # a small encoded table often arrives as one partition; the dequantize-
    # and-score expression is the CPU cost, so spread it — conditional, so
    # a corpus that is already well-partitioned never pays an extra shuffle
    par = encoded.sparkSession.sparkContext.defaultParallelism
    if encoded.rdd.getNumPartitions() < par:
        encoded = encoded.repartition(par)
    scored = (
        encoded.join(F.broadcast(queries), F.col(id_col) != F.col(query_id_col))
        .select(
            F.col(query_id_col),
            F.col(id_col).alias("neighbor_id"),
            cosine_similarity(dequant, F.col(query_emb_col).cast("array<double>")).alias("sim"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("sim"), F.asc("neighbor_id"))
    if rerank is None:
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(query_id_col, "neighbor_id", F.round("sim", 6).alias("sim"), "rank")
        )
    cands = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k * rerank_factor)
        .select(query_id_col, "neighbor_id")
    )
    qside = queries.select(F.col(query_id_col), F.col(query_emb_col).alias("_qemb"))
    exact = (
        cands.join(
            rerank.select(F.col(id_col).alias("neighbor_id"), F.col(emb_col).alias("_emb")),
            on="neighbor_id",
        )
        .join(F.broadcast(qside), on=query_id_col)
        .select(
            query_id_col,
            "neighbor_id",
            cosine_similarity(
                F.col("_emb").cast("array<double>"), F.col("_qemb").cast("array<double>")
            ).alias("sim"),
        )
    )
    w2 = Window.partitionBy(query_id_col).orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", F.round("sim", 6).alias("sim"), "rank")
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ)
# ---------------------------------------------------------------------------

def pq_train_encode(
    df: DataFrame,
    *,
    dim: int,
    m: int = 8,
    k: int = 16,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 10,
) -> tuple[DataFrame, list[list[list[float]]]]:
    """Train product-quantization codebooks and encode the corpus.

    Splits each vector into ``m`` subvectors of dim/m and KMeans-quantizes
    each subspace to ``k`` centroids, so a vector compresses from dim·4
    bytes of float to m codes (m bytes at k<=256) — at 100 TB of
    embeddings this is the difference between an ANN candidate table that
    fits in cluster memory and one that doesn't (64-dim float -> 8 bytes
    is 32×). Returns (encoded, codebooks): ``encoded`` is
    (id, codes array<int>); ``codebooks[j][c]`` is centroid c of
    subspace j. Training is m KMeans fits over one persisted projection
    of the corpus (sample the input for the fit at scale — encoding uses
    the model, not the training set); encoding is a pure expression:
    per subspace, argmin over k literal centroids (k·m structs in the
    plan — bounded by config, not data)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    base = df.select(id_col, F.col(emb_col).cast("array<double>").alias("_emb"))
    base = base.persist()
    codebooks: list[list[list[float]]] = []
    for j in range(m):
        feats = base.select(
            array_to_vector(F.slice(F.col("_emb"), j * sub + 1, sub)).alias("features")
        )
        model = KMeans(k=k, seed=seed + j, maxIter=max_iter).fit(feats)
        codebooks.append([list(map(float, c)) for c in model.clusterCenters()])

    encoded = base.select(
        id_col, _pq_codes_expr(F.col("_emb"), codebooks).alias("codes")
    )
    encoded = encoded.localCheckpoint(eager=True)
    base.unpersist()
    return encoded, codebooks


def _pq_codes_expr(
    emb: Column, codebooks: list[list[list[float]]]
) -> Column:
    """PQ encoding as a pure column expression over FROZEN codebooks:
    per subspace, argmin squared distance over the k literal centroids.
    Shared by training-time encoding and the persisted-index growth
    path (annstore.add_vectors), so an appended batch encodes exactly
    as the original build did."""
    m = len(codebooks)
    sub = len(codebooks[0][0])

    def code_for(j: int) -> Column:
        subvec = F.slice(emb, j * sub + 1, sub)
        dists = F.array(
            *[
                F.struct(
                    F.aggregate(
                        F.zip_with(
                            subvec,
                            _lit_vec(codebooks[j][c]),
                            lambda x, y: (x - y) * (x - y),
                        ),
                        F.lit(0.0),
                        lambda acc, v: acc + v,
                    ).alias("d"),
                    F.lit(c).alias("code"),
                )
                for c in range(len(codebooks[j]))
            ]
        )
        return F.array_sort(dists)[0]["code"]

    return F.array(*[code_for(j) for j in range(m)])


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Encode vectors with FROZEN codebooks (no training pass): the
    crawl-growth path of a persisted PQ index — new corpus batches
    compress under the exact model the index was built with. Pure
    expression, map-only."""
    return df.select(
        id_col,
        _pq_codes_expr(
            F.col(emb_col).cast("array<double>"), codebooks
        ).alias("codes"),
    )


def pq_top_k(
    encoded: DataFrame,
    codebooks: list[list[list[float]]],
    queries: DataFrame,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    query_emb_col: str = "q_emb",
    rerank: DataFrame | None = None,
    emb_col: str = "embedding",
    rerank_factor: int = 5,
) -> DataFrame:
    """Asymmetric-distance (ADC) approximate top-k over PQ codes.

    The distance lookup table — d(query_subvector, centroid) for every
    (subspace, code) — is computed ONCE per query as DATA, not as an
    expression tree: the codebooks become a tiny broadcast DataFrame of
    (subspace j, code c, centroid) rows, each query cross-joins it
    (m·k_cb rows per query), one small distance expression scores every
    row, and a per-query aggregate reassembles the m×k_cb table sorted
    by (j, c). Per-element arithmetic — zip_with of the query's
    j-th slice against the centroid, (x−y)² folded left from 0.0 — is
    identical to evaluating one aggregate per centroid inline, so the
    LUT values are bitwise unchanged; what changes is the PLAN: the old
    inline form built m·k_cb aggregate subtrees (128 at the default
    8×16), thousands of py4j calls and a plan the analyzer chewed on
    for seconds per run (guide §7.3 "gigantic expression trees in
    loops"), and it grew with k_cb — this form is constant-size at any
    codebook size. The corpus join then costs m array-lookups + adds
    per pair instead of a dim-length dot product: per-pair work drops
    from O(dim) to O(m), on a corpus table 32× smaller than the raw
    embeddings. Pass ``rerank`` (the original embedding table) to
    exact-rerank the top rerank_factor·k ADC candidates per query —
    recovers most quantization-loss recall for one extra
    (candidates-only) join.
    """
    m = len(codebooks)
    k_cb = len(codebooks[0])
    sub = len(codebooks[0][0])
    if any(len(b) != k_cb or any(len(c) != sub for c in b) for b in codebooks):
        raise ValueError("pq_top_k: ragged codebooks (uniform m x k x sub expected)")

    spark = queries.sparkSession
    cbdf = spark.createDataFrame(
        [
            (j, c, [float(x) for x in book[c]])
            for j, book in enumerate(codebooks)
            for c in range(k_cb)
        ],
        "j INT, c INT, _cent ARRAY<DOUBLE>",
    )
    d_expr = F.aggregate(
        F.zip_with(
            F.slice(F.col("_q"), F.col("j") * sub + 1, sub),
            F.col("_cent"),
            lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    # (j, c) is unique per row, so the struct sort is deterministic and
    # the flat array lands in row-major (j, c) order; slicing it back
    # into m chunks reproduces lut[j][c] exactly
    qlut = (
        queries.select(
            F.col(query_id_col), F.col(query_emb_col).alias("_q")
        )
        .crossJoin(F.broadcast(cbdf))
        .select(F.col(query_id_col), "_q", "j", "c", d_expr.alias("_d"))
        .groupBy(query_id_col)
        .agg(
            F.first("_q").alias("_qemb"),  # all rows of a query carry it
            F.transform(
                F.array_sort(F.collect_list(F.struct("j", "c", "_d"))),
                lambda s: s["_d"],
            ).alias("_flat"),
        )
        .select(
            F.col(query_id_col),
            "_qemb",
            F.transform(
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda j: F.slice("_flat", j * k_cb + 1, k_cb),
            ).alias("_lut"),
        )
    )
    joined = encoded.join(
        F.broadcast(qlut), F.col(id_col) != F.col(query_id_col)
    )
    adc = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0.0),
        lambda acc, j: acc
        + F.element_at(F.element_at("_lut", j + F.lit(1)), F.element_at("codes", j + F.lit(1)) + F.lit(1)),
    )
    scored = joined.select(
        F.col(query_id_col),
        F.col(id_col).alias("neighbor_id"),
        F.col("_qemb"),
        adc.alias("adc_dist"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.asc("adc_dist"), F.asc("neighbor_id"))
    if rerank is None:
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(query_id_col, "neighbor_id", F.round("adc_dist", 6).alias("adc_dist"), "rank")
        )
    cands = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k * rerank_factor)
        .select(query_id_col, "neighbor_id", "_qemb")
    )
    exact = cands.join(
        rerank.select(F.col(id_col).alias("neighbor_id"), F.col(emb_col).alias("_emb")),
        on="neighbor_id",
    ).select(
        query_id_col,
        "neighbor_id",
        F.round(cosine_similarity(F.col("_qemb"), F.col("_emb")), 6).alias("cos_sim"),
    )
    w2 = Window.partitionBy(query_id_col).orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return exact.withColumn("rank", F.row_number().over(w2)).filter(F.col("rank") <= k)


def semantic_dedup(
    df: DataFrame,
    *,
    dim: int,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int | str = 8,
    seed: int = 42,
    exact: bool = False,
    bands: int | str = 1,
    probe_hamming: int = 0,
) -> DataFrame:
    """End-to-end embedding-space dedup (the SemDeDup recipe, Abbas et
    al. 2023, arXiv:2303.09540): mine cosine-similar pairs, close them
    transitively into clusters, and elect one keeper per cluster ->
    (id, cluster_id, cluster_size, is_keeper).

    Pair mining is ``embedding_near_duplicates`` (hyperplane-LSH bucket
    self-join on the scale path, exact all-pairs for bounded subsets /
    verification); clustering is the min-label-propagation connected
    components of operators/graph.py, so chained near-dups ("A~B~C" with
    cos(A,C) below threshold) still collapse to ONE surviving document —
    the property pairwise filtering alone cannot give. Keeper = smallest
    id in the cluster (deterministic, seed-free); filter
    ``is_keeper`` to materialize the deduplicated corpus.
    """
    from codd_spark.operators.graph import dedup_clusters

    pairs = embedding_near_duplicates(
        df,
        dim=dim,
        id_col=id_col,
        emb_col=emb_col,
        threshold=threshold,
        n_planes=n_planes,
        seed=seed,
        exact=exact,
        bands=bands,
        probe_hamming=probe_hamming,
    )
    return dedup_clusters(df, pairs, id_col, "id_a", "id_b")


def hard_negatives(
    df: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    label_col: str = "label",
    query_id_col: str = "query_id",
    query_emb_col: str = "q_emb",
    query_label_col: str = "q_label",
    k: int = 10,
) -> DataFrame:
    """Per query: the k most cosine-similar corpus vectors with a
    DIFFERENT label — the hard-negative mining step of contrastive /
    embedding training (high-similarity wrong-class examples carry the
    gradient signal; random negatives are trivially separable).

    Same shape as ``brute_force_top_k``: the (small) query side is
    broadcast with its norms precomputed, the corpus streams — one
    broadcast join, one dot-product fold per surviving pair, one
    per-query window. The label inequality is part of the join
    condition, so same-class candidates are dropped before any scoring
    work. For corpus-scale query sets, swap the broadcast for the
    bucketed ``lsh_top_k`` candidate stage; the scoring/ranking tail is
    identical.
    """
    from codd_spark.functions.vector import dot, l2_norm

    corpus = df.select(
        F.col(id_col), F.col(emb_col), F.col(label_col),
        l2_norm(F.col(emb_col)).alias("__cn"),
    )
    qn = queries.withColumn("__qn", l2_norm(F.col(query_emb_col)))
    pairs = corpus.join(
        F.broadcast(qn),
        (F.col(id_col) != F.col(query_id_col))
        & (F.col(label_col) != F.col(query_label_col)),
    )
    denom = F.col("__qn") * F.col("__cn")
    cos = F.when(denom != 0, dot(F.col(query_emb_col), F.col(emb_col)) / denom)
    scored = pairs.select(
        F.col(query_id_col),
        F.col(id_col).alias("negative_id"),
        F.col(label_col).alias("negative_label"),
        F.round(cos, 6).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos_sim"), F.asc("negative_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def farthest_point_sample(
    df: DataFrame,
    k: int,
    *,
    dim: int,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    levels: int = 255,
) -> DataFrame:
    """k-center / farthest-point diversity sampling over an embedding
    column: greedily pick the vector farthest from everything selected
    so far, k times — the classic 2-approximation to the k-center
    cover, and the curation move behind "give me a maximally DIVERSE
    seed subset" (eval-set seeding, dedup-cluster exemplars, active-
    learning batches) where uniform sampling oversamples dense modes.

    Determinism / replayability: greedy FPS on float distances is not
    engine-replayable — one low-bit difference flips an argmax and the
    whole downstream chain. Like ``kmeans_quantized``, this runs on the
    exact-integer scalar-quantized codes (``sq_train_encode`` — a
    closed form of the corpus): squared distances are exact integers,
    the argmax (ties -> smallest id) is bit-stable, and the seed is the
    lowest id, so a SQL oracle replays the ENTIRE selection chain.

    Returns the k selected rows as (rank, id, d2): rank = selection
    order (1..k), d2 = the squared quantized distance from the selected
    vector to the previously-selected set at selection time (NULL for
    the rank-1 seed; d2 is non-increasing in rank — the k-center radius
    curve, useful directly as a coverage diagnostic).

    Scale shape: k iterations; each is ONE shuffle-free projection
    (the newest center rides the plan as a dim-length literal array,
    bounded by the model, not the data) plus a TakeOrderedAndProject
    argmax collecting ONE row; running min-distances live in a column
    that is eagerly checkpointed per iteration, so lineage stays O(1)
    and each pass reads the previous pass's cache. Driver state = k
    quantized vectors (k*dim ints) — the same bounded boundary as the
    trained k-means centroids. Overflow: d2 <= dim * levels² (~4.2M at
    dim=64) — long forever."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    encoded, _scales = sq_train_encode(
        df, dim=dim, id_col=id_col, emb_col=emb_col, levels=levels
    )
    q = (
        encoded.select(
            F.col(id_col).alias("id"), F.col("codes").cast("array<long>").alias("qv")
        )
        .localCheckpoint(eager=True)
    )

    def dist2_to(center_codes: list[int]) -> Column:
        arr = ",".join(f"{int(v)}L" for v in center_codes)
        c = F.expr(f"array({arr})")
        return F.aggregate(
            F.zip_with(F.col("qv"), c, lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )

    seed = q.orderBy("id").limit(1).collect()
    if not seed:
        raise ValueError("input is empty — nothing to sample")
    picked = [(1, int(seed[0].id), None)]
    center = [int(v) for v in seed[0].qv]

    state = q.filter(F.col("id") != picked[0][1]).select(
        "id", "qv", dist2_to(center).alias("mind2")
    )
    for r in range(2, k + 1):
        # LAZY checkpoint: the argmax collect below is a full-partition
        # TakeOrderedAndProject, so it materializes the checkpoint as a
        # side effect — ONE job per pick instead of an eager-checkpoint
        # job plus a collect job (VERDICT r12 item 2: the driver-loop
        # fixed cost is what this row's wall clock is made of)
        state = state.localCheckpoint(eager=False)
        top = state.orderBy(F.desc("mind2"), F.asc("id")).limit(1).collect()
        if not top:
            break  # fewer than k vectors: return what exists
        picked.append((r, int(top[0].id), int(top[0].mind2)))
        center = [int(v) for v in top[0].qv]
        state = state.filter(F.col("id") != int(top[0].id)).select(
            "id",
            "qv",
            F.least(F.col("mind2"), dist2_to(center)).alias("mind2"),
        )
    spark = df.sparkSession
    return spark.createDataFrame(
        [(r, i, d) for r, i, d in picked],
        f"rank INT, {id_col} LONG, d2 LONG",
    )


def farthest_point_sample_batched(
    df: DataFrame,
    k: int,
    *,
    dim: int,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    levels: int = 255,
    m: int = 32,
    _stats: dict | None = None,
) -> DataFrame:
    """Batched farthest-point sampling: EXACTLY the same selection as
    ``farthest_point_sample`` (same exact-integer codes, same argmax,
    same tie-breaks — provably, see below) in far fewer Spark jobs.
    The sequential variant launches one job per pick, which is fine at
    contract k=8 and wrong at k=10,000 (VERDICT r10 item 7); this one
    collects the top-``m`` candidates per round and simulates the exact
    sequential greedy on them DRIVER-SIDE, accepting picks while they
    provably dominate every uncollected point.

    Why the result is identical to sequential FPS: let T = the smallest
    current min-distance among the m collected candidates. Every
    uncollected point's current min-distance is <= T, and min-distances
    only DECREASE as centers are added, so any uncollected point's
    value stays <= T for the whole round. The round's first pick is the
    global (mind2 DESC, id ASC) top-1 — exact by construction (ties at
    T collect smallest ids first, so the tie-winner is always in the
    candidate set). Each later simulated pick is accepted only while
    its UPDATED distance (min over original mind2 and exact distances
    to this round's accepted centers, recomputed on the collected
    integer codes) is STRICTLY > T — it then beats every uncollected
    point outright, ties impossible. When the best simulated candidate
    falls to <= T the round ends and the next round re-collects against
    fresh state. Worst case (pathologically clustered data) each round
    accepts 1 pick and this degrades to sequential; in spread data each
    round accepts O(m) picks, so jobs ~ k/m (sub-linear in k — the
    k=256 stress in BASELINE.md measures it).

    Driver state per round: m rows of (id, dim ints) — bounded by
    config, not data, same boundary class as the trained centroids.
    ``_stats``: pass a dict to receive {"rounds": n} (stress-test
    instrumentation)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if m < 2:
        raise ValueError(f"m must be >= 2, got {m}")
    encoded, _scales = sq_train_encode(
        df, dim=dim, id_col=id_col, emb_col=emb_col, levels=levels
    )
    q = (
        encoded.select(
            F.col(id_col).alias("id"),
            F.col("codes").cast("array<long>").alias("qv"),
        )
        .localCheckpoint(eager=True)
    )

    def dist2_to(center_codes: list[int]) -> Column:
        arr = ",".join(f"{int(v)}L" for v in center_codes)
        c = F.expr(f"array({arr})")
        return F.aggregate(
            F.zip_with(F.col("qv"), c, lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )

    seed = q.orderBy("id").limit(1).collect()
    if not seed:
        raise ValueError("input is empty — nothing to sample")
    picked = [(1, int(seed[0].id), None)]
    center = [int(v) for v in seed[0].qv]
    state = q.filter(F.col("id") != picked[0][1]).select(
        "id", "qv", dist2_to(center).alias("mind2")
    )
    rounds = 0
    while len(picked) < k:
        # lazy: the candidate collect materializes the checkpoint in the
        # same job (see farthest_point_sample)
        state = state.localCheckpoint(eager=False)
        cands = (
            state.orderBy(F.desc("mind2"), F.asc("id")).limit(m).collect()
        )
        if not cands:
            break  # fewer than k vectors: return what exists
        rounds += 1
        T = min(int(c.mind2) for c in cands)
        sim = [
            {"id": int(c.id), "qv": [int(v) for v in c.qv], "d": int(c.mind2)}
            for c in cands
        ]
        accepted: list[dict] = []
        while sim and len(picked) + len(accepted) < k:
            best = sorted(sim, key=lambda s: (-s["d"], s["id"]))[0]
            if accepted and best["d"] <= T:
                break  # an uncollected point could now win: next round
            accepted.append(best)
            sim.remove(best)
            for s in sim:
                d2 = sum(
                    (x - y) * (x - y) for x, y in zip(s["qv"], best["qv"])
                )
                if d2 < s["d"]:
                    s["d"] = d2
        for a in accepted:
            picked.append((len(picked) + 1, a["id"], a["d"]))
        ids = [a["id"] for a in accepted]
        state = state.filter(~F.col("id").isin(ids)).select(
            "id",
            "qv",
            F.least(
                F.col("mind2"), *[dist2_to(a["qv"]) for a in accepted]
            ).alias("mind2"),
        )
    if _stats is not None:
        _stats["rounds"] = rounds
    spark = df.sparkSession
    return spark.createDataFrame(
        [(r, i, d) for r, i, d in picked],
        f"rank INT, {id_col} LONG, d2 LONG",
    )


def _kmeans_quad_expr(qq: Column, ct: Column, use_decimal: bool) -> Column:
    """Exact-integer quad sum Q_c = ||n_c·x − s_c||² for the quantized
    k-means argmin. v = n_c·x − s_c stays in LONG (|v| ≤ 2·levels·N,
    safe for any real corpus); the SQUARE-and-sum is the overflow risk
    (Q ≤ dim·(2·levels·n_c)², past 2^63 once a cluster holds ~2M
    255-level dim-64 vectors) — ``use_decimal`` routes it through
    DECIMAL(38,0), still exact integers, headroom to n_c ~ 1e15."""
    diffs = F.zip_with(qq, ct["s"], lambda x, si: ct["n"] * x - si)
    if not use_decimal:
        return F.aggregate(
            diffs,
            F.lit(0).cast("long"),
            lambda acc, v: acc + v * v,
        )
    return F.aggregate(
        diffs,
        F.lit(0).cast("decimal(38,0)"),
        lambda acc, v: acc
        + (
            v.cast("decimal(19,0)") * v.cast("decimal(19,0)")
        ).cast("decimal(38,0)"),
    )


def _kmeans_needs_decimal(dim: int, levels: int, n_max: int) -> bool:
    """True when the LONG quad sum could overflow for a cluster of
    ``n_max`` vectors — exact Python-int arithmetic, no float slop."""
    return dim * (2 * levels * n_max) ** 2 >= 2**63


def kmeans_quantized(
    df: DataFrame,
    *,
    dim: int,
    k: int = 8,
    n_iter: int = 3,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    levels: int = 255,
) -> DataFrame:
    """Lloyd's k-means over scalar-quantized embeddings with EXACT
    integer state -> (id, cluster): a deterministic, engine-replayable
    clustering pass (the building block behind IVF list assignment,
    corpus bucketing for SemDeDup-style pipelines, and mixture capping
    by content cluster).

    Floating-point k-means is not replayable across engines: centroid
    means depend on float summation ORDER, and one low-bit difference
    can flip an argmin. This variant never leaves integers until the
    final comparison: vectors are scalar-quantized to codes in
    [0, levels] (``sq_train_encode`` — itself a closed form of the
    corpus), centroid state is (elementwise SUM vector, COUNT) — never
    divided — and the distance to a centroid MEAN compares via

        D_c = ||n_c·x - s_c||² / n_c²

    whose numerator and denominator are exact integers; the single
    double division of identical integers is IEEE-identical in any
    engine, so the argmin (ties -> smallest cluster id) is bit-stable
    and the WHOLE training loop replays in SQL (oracle `kmeans_clusters`
    unrolls every iteration in DuckDB). Initialization = the k
    lowest-id vectors as singleton centroids.

    Scale shape: per iteration, the k-row centroid state is embedded as
    a LITERAL array of (c, s, n) structs in a single projection — the
    argmin is a shuffle-free fold over that array (k·dim longs, bounded
    by the model, not the data), so the only per-iteration shuffle left
    is the unavoidable elementwise (cluster, dim) sum with map-side
    combine; centroid state collects k rows to the driver per iteration
    (the same bounded boundary as IVF's trained centroids). Overflow
    bound: |n·x - s| <= 2·levels·n, so Q <= dim·(2·levels·n)² — past
    2^63 once a cluster holds ~2M vectors at levels=255, dim=64; a
    per-iteration gate on the live centroid counts
    (``_kmeans_needs_decimal``, exact integer arithmetic) switches the
    square-and-sum to DECIMAL(38,0) there — still exact integers, so
    the replayed argmin is unchanged, with headroom to ~1e15 vectors
    per cluster. Empty clusters carry their previous state."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    encoded, _scales = sq_train_encode(
        df, dim=dim, id_col=id_col, emb_col=emb_col, levels=levels
    )
    q = encoded.select(
        F.col(id_col).alias("id"), F.col("codes").cast("array<long>").alias("qv")
    ).localCheckpoint(eager=True)

    # centroid state lives on the driver: k rows of (cluster id,
    # elementwise integer SUM vector, count) — never divided
    cent_list: list[tuple[int, list[int], int]] = [
        (int(i), [int(v) for v in r.qv], 1)
        for i, r in enumerate(q.orderBy("id").limit(k).collect())
    ]

    assigned = None
    for _ in range(n_iter):
        # literal k-centroid array, ascending c so the strict-< fold
        # resolves distance ties to the SMALLEST cluster id (same rule
        # as the former orderBy(d, c) window — the oracle replays it).
        # Built as ONE parsed expr string: k·dim F.lit calls cost ~1.5 s
        # of py4j driver time per iteration (measured at k=8, dim=64)
        # for the identical plan.
        def cent_sql(c: int, s: list[int], n: int) -> str:
            arr = ",".join(f"{int(v)}L" for v in s)
            return (
                f"named_struct('c', CAST({int(c)} AS INT), "
                f"'s', array({arr}), 'n', CAST({int(n)} AS BIGINT))"
            )

        cent_arr = F.expr(
            "array(" + ",".join(cent_sql(*t) for t in sorted(cent_list)) + ")"
        )
        qq = F.col("qv")
        # per-iteration overflow gate on the LIVE centroid counts: the
        # quad sum leaves LONG for DECIMAL(38,0) only once a cluster is
        # big enough that long could wrap — both paths are exact
        # integers, so the replayed argmin is identical either way
        use_decimal = _kmeans_needs_decimal(
            dim, levels, max(n for _c, _s, n in cent_list)
        )

        def _dist(ct):
            # exact-integer D_c = ||n_c·x - s_c||² / n_c²: the one
            # double division of identical exact integers is
            # IEEE-identical in any engine
            quad = _kmeans_quad_expr(qq, ct, use_decimal)
            den = (
                ct["n"].cast("decimal(19,0)") * ct["n"].cast("decimal(19,0)")
                if use_decimal
                else ct["n"] * ct["n"]
            )
            return quad.cast("double") / den.cast("double")

        dists = F.transform(
            cent_arr,
            lambda ct: F.struct(ct["c"].alias("c"), _dist(ct).alias("d")),
        )
        best = F.aggregate(
            dists,
            F.struct(
                F.lit(-1).cast("int").alias("c"),
                F.lit(None).cast("double").alias("d"),
            ),
            lambda acc, x: F.when(
                acc["d"].isNull() | (x["d"] < acc["d"]), x
            ).otherwise(acc),
        )
        # no checkpoint needed: assigned is ONE projection over the
        # checkpointed q (centroids are literals), so lineage is flat —
        # each iteration costs exactly one corpus pass (the stats job)
        assigned = q.select("id", best["c"].alias("c"), "qv")
        # one aggregate yields both the elementwise sums and the cluster
        # size (every vector contributes one value per pos, so the
        # per-(c, pos) row count IS the cluster count)
        stats = (
            assigned.select("c", F.posexplode("qv").alias("pos", "v"))
            .groupBy("c", "pos")
            .agg(F.sum("v").alias("sv"), F.count("*").alias("cnt"))
            .groupBy("c")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "sv"))),
                    lambda st: st["sv"],
                ).alias("s"),
                F.max("cnt").alias("n"),
            )
        )
        new_rows = {
            r.c: (r.c, [int(v) for v in r.s], int(r.n))
            for r in stats.collect()  # bounded: k rows
        }
        cent_list = [new_rows.get(c, (c, s, n)) for c, s, n in cent_list]

    return assigned.select(F.col("id").alias(id_col), F.col("c").alias("cluster"))
