"""Graph operators for dedup pipelines: connected components over
near-duplicate pair sets, and cluster-based canonical-document selection.

Pair mining (minhash/simhash/embedding buckets — operators/dedup.py,
operators/similarity.py) yields EDGES; an actual dedup decision needs the
transitive closure: if A~B and B~C, then {A,B,C} is one duplicate cluster
and exactly one document survives. The reference has no graph operators
(SURVEY.md §2.2) — this is an engine extension shaped for the 100 TB
regime, where duplicate clusters from boilerplate/mirror sites routinely
chain thousands of documents.

Algorithm: iterative min-label propagation (the hash-to-min scheme).
Every vertex repeatedly adopts the smallest component id among itself and
its neighbors; convergence needs O(diameter) rounds — near-dup clusters
are dense (diameter is small, typically <= 4), so rounds stay in single
digits even at corpus scale. Each round is two key-partitioned shuffles
(join + min-aggregate) with map-side partial aggregation; lineage is cut
with localCheckpoint per round so the plan never deepens; convergence is
detected with a 1-row count aggregate (the only driver-side value — this
is an iterative fixpoint, the same evaluate-loop boundary as the
reference's semi-naive stabilize, core/src/database.rs:317-336).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ByteType,
    IntegerType,
    LongType,
    NumericType,
    ShortType,
)


def _is_numeric_type(dt) -> bool:
    """True for the id dtypes whose convergence check may use the exact
    decimal label-sum (any numeric); strings/dates take the distinct-count
    path."""
    return isinstance(dt, NumericType)

# Below this many DIRECTED edge rows the transitive closure runs as
# driver-side union-find instead of the distributed fixpoint: each
# propagation round costs two shuffles + a checkpoint + a 1-row collect
# (~1 s of fixed overhead on local[32]) regardless of edge count, so a
# small pair set pays several seconds to close a graph Python handles in
# milliseconds (measured r8: fuzzy_dedup's cluster stage 6.7 -> ~1 s at
# sf0.1 with 512 directed edges). 2M rows of two longs is ~32 MB through
# Arrow — the same bounded-collect class as a finished sketch. Corpus
# runs whose pair miners emit more stay on the distributed loop.
_CC_DRIVER_EDGE_LIMIT = 2_000_000


def _driver_union_find(spark, edges: DataFrame) -> DataFrame:
    """Exact connected components of a BOUNDED directed edge list via
    union-find with path halving: (id, component), component = the
    smallest member id. Arrow both ways (toPandas / createDataFrame), so
    the 2M-row ceiling moves ~32 MB, not Python object graphs."""
    return _union_find_pdf(spark, edges.toPandas())


def _union_find_pdf(spark, pdf) -> DataFrame:
    """Union-find over an already-collected (src, dst) pandas frame —
    split out so the size gate can reuse ONE Arrow collect for both the
    bound check and the edges (r12: the former ``limit().count()`` gate
    plus a second full collect cost two jobs per call; arrival-batch
    dedup pays this once per add_batch)."""
    import pandas as pd
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = parent.setdefault(x, x)
        while r != parent[r]:
            parent[r] = parent[parent[r]]  # path halving
            r = parent[r]
        # compress x's own chain
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for s, d in zip(pdf["src"].tolist(), pdf["dst"].tolist()):
        rs, rd = find(int(s)), find(int(d))
        if rs != rd:
            parent[rd] = rs
    comp_min: dict[int, int] = {}
    roots = {x: find(x) for x in list(parent)}
    for x, r in roots.items():
        if x < comp_min.get(r, x + 1):
            comp_min[r] = x
    if not roots:
        return spark.createDataFrame(
            spark.sparkContext.emptyRDD(), "id LONG, component LONG"
        )
    out = pd.DataFrame(
        {
            "id": list(roots),
            "component": [comp_min[r] for r in roots.values()],
        }
    )
    # createDataFrame(pandas) slices into defaultParallelism Arrow
    # batches — 32 near-empty partitions for a 150-row label table that
    # EVERY downstream consumer stage then re-scans 32-tasks-wide
    # (profiled r14: ~10 such 32-task churn stages per arrival in the
    # incremental dedup rows). Coalesce to ~1M labels per partition —
    # the driver already held the whole edge list, so label volume is
    # bounded by the same _CC_DRIVER_EDGE_LIMIT transfer.
    n_parts = max(1, len(out) // 1_000_000)
    return spark.createDataFrame(out.astype("int64")).coalesce(n_parts)


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    *,
    max_iter: int = 25,
    nodes: DataFrame | None = None,
    node_col: str | None = None,
) -> DataFrame:
    """(id, component) for every vertex, component = smallest reachable id.

    ``pairs`` is an undirected edge list. Pass ``nodes`` to include
    isolated vertices (they become their own singleton components) —
    for dedup that means every document gets a cluster id, not only the
    ones with a near-duplicate.
    """
    # edges only need to be shuffled into place once; reuse across rounds.
    # Checkpoint BEFORE deriving labels: the edge list's lineage is the
    # whole upstream pair miner (e.g. the full MinHash pipeline), and a
    # labels chain rooted at the UNcheckpointed edges would re-run that
    # miner once more in round 1 (measured: fuzzy_dedup 21 -> 9 s warm).
    # Both directions come from ONE explode over a single read of
    # ``pairs`` — not a union of two selects — so the upstream miner is
    # evaluated once by construction: the union's two legs were separate
    # AQE leaf stages that each re-ran the (lazily cached) verify tail
    # before either populated its cache (profiled r13: two ~35 s-CPU
    # evaluations of the exact-Jaccard verify inside one action).
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col(id_a).alias("src"), F.col(id_b).alias("dst")
                    ),
                    F.struct(
                        F.col(id_b).alias("src"), F.col(id_a).alias("dst")
                    ),
                )
            ).alias("__e")
        )
        .select("__e.src", "__e.dst")
        .distinct()
        .localCheckpoint(eager=False)
    )
    # iterate over edge ENDPOINTS only: isolated vertices are their own
    # singleton components by definition and can never change label, so
    # carrying them through the propagation rounds would scale every
    # per-round shuffle with the corpus instead of with the (far
    # smaller) near-dup edge set. They are appended once at the end.
    # small-graph gate: union-find on the driver when the edge set is
    # bounded (limit documented above). Identical output to the loop —
    # component = min reachable id — pinned by
    # test_graph.py::test_driver_and_distributed_cc_agree.
    # Type gate (r9): the driver path casts through int64, so it is only
    # taken when BOTH endpoint columns are integral — string/date ids
    # (valid for the type-generic distributed loop) would crash in
    # int(), and digit-strings would silently change the output dtype
    # and min-ordering semantics. Non-integral ids always take the
    # distributed loop, whatever the edge count.
    # NB: simpleString() yields 'tinyint'/'smallint'/'int'/'bigint' —
    # gate on the DataType classes so byte/short ids take the fast path
    integral_types = (ByteType, ShortType, IntegerType, LongType)
    pdf = None
    if all(isinstance(f.dataType, integral_types) for f in edges.schema.fields):
        # ONE Arrow collect serves as both the size gate and the edge
        # transfer (r12): limit(LIMIT+1).toPandas() moves <= ~32 MB; if
        # it came back under the limit we already hold every edge, and
        # an over-limit graph pays one bounded transfer before taking
        # the distributed loop it would run anyway.
        pdf = edges.limit(_CC_DRIVER_EDGE_LIMIT + 1).toPandas()
        n_edges = len(pdf)
    else:
        n_edges = _CC_DRIVER_EDGE_LIMIT + 1
    if n_edges <= _CC_DRIVER_EDGE_LIMIT:
        labels = _union_find_pdf(pairs.sparkSession, pdf)
        # match the distributed path's dtype contract: component/id carry
        # the INPUT id type (int32 in → int32 out), not the union-find's
        # internal int64.
        src_t = edges.schema["src"].dataType
        labels = labels.select(
            F.col("id").cast(src_t).alias("id"),
            F.col("component").cast(src_t).alias("component"),
        )
        if nodes is not None:
            nc = node_col or id_a
            isolated = nodes.select(F.col(nc).alias("id")).distinct().join(
                labels.select("id").hint("shuffle_merge"), on="id", how="left_anti"
            )
            labels = labels.union(
                isolated.select("id", F.col("id").alias("component"))
            )
        return labels

    labels = edges.select(F.col("src").alias("id")).distinct()
    labels = labels.select("id", F.col("id").alias("component"))
    prev_sum = None
    for _ in range(max_iter):
        # candidate labels flowing along edges: neighbor's component -> me.
        # Both sides grow with the corpus — pin a shuffle join so the
        # static size estimate can never pick a driver-sized broadcast
        # build (same discipline as the LSH bucket self-joins).
        flowed = (
            edges.join(labels.hint("shuffle_merge"), edges.src == labels.id)
            .select(F.col("dst").alias("id"), "component")
        )
        new_labels = (
            labels.union(flowed)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=False)  # cut per-round lineage growth
        )
        # convergence: labels are per-node monotone non-increasing, so the
        # total is strictly decreasing until fixpoint — an equal sum means
        # nothing moved. One 1-row aggregate instead of a labels<->labels
        # join per round (exact decimal: id sums can exceed long range).
        # Non-numeric ids (r9): a decimal cast of a string label is an
        # ANSI crash, so the generic path counts distinct rows of
        # (old ∪ new) instead — any changed label makes the union hold
        # strictly more distinct (id, component) rows than the node
        # count. Exact for every orderable type; one extra distinct-agg
        # per round that only the non-numeric path pays.
        if _is_numeric_type(labels.schema["component"].dataType):
            cur_sum = new_labels.agg(
                F.sum(F.col("component").cast("decimal(38,0)")).alias("s")
            ).collect()[0].s
        else:
            n_nodes = new_labels.count()
            moved = labels.union(new_labels).distinct().count() > n_nodes
            labels = new_labels
            if not moved:
                break
            continue
        labels = new_labels
        # cur_sum is None only when there are no edges at all — every
        # vertex is isolated and the loop has nothing to propagate
        if cur_sum is None or (prev_sum is not None and cur_sum == prev_sum):
            break
        prev_sum = cur_sum
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(pathological graph diameter — raise max_iter)"
        )
    if nodes is not None:
        nc = node_col or id_a
        isolated = nodes.select(F.col(nc).alias("id")).distinct().join(
            labels.select("id").hint("shuffle_merge"), on="id", how="left_anti"
        )
        labels = labels.union(isolated.select("id", F.col("id").alias("component")))
    return labels


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    pair_a: str = "id_a",
    pair_b: str = "id_b",
) -> DataFrame:
    """Cluster every document: (id, cluster_id, cluster_size, is_keeper).

    cluster_id is the smallest doc id reachable through the near-dup
    pair graph (deterministic, seed-free); the keeper is the cluster
    representative (id == cluster_id) — the row set a curation pipeline
    keeps. Singletons (no near-dup) keep themselves.
    """
    cc = connected_components(
        pairs, pair_a, pair_b, nodes=docs.select(id_col), node_col=id_col
    )
    sizes = cc.groupBy("component").agg(F.count("*").alias("cluster_size"))
    return (
        cc.join(sizes.hint("shuffle_merge"), on="component")
        .select(
            F.col("id").alias(id_col),
            F.col("component").alias("cluster_id"),
            "cluster_size",
            (F.col("id") == F.col("component")).alias("is_keeper"),
        )
    )


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    n_iter: int = 5,
    damping: float = 0.85,
    nodes: DataFrame | None = None,
    node_col: str | None = None,
) -> DataFrame:
    """Fixed-iteration PageRank power method -> (id, pr DECIMAL(38,18)).

    Centrality over pipeline-derived graphs: near-dup similarity graphs
    (which cluster representative is most linked), domain/link graphs for
    crawl prioritization, user-item interaction graphs. A fixed iteration
    count (power iteration converges geometrically at rate `damping`;
    5-20 rounds is standard) keeps the operator a deterministic dataflow.

    Numeric discipline (shared with the aggregate oracles): rank state is
    DECIMAL(38,18). Each round divides in DOUBLE (deterministic IEEE op),
    casts each edge contribution back to DECIMAL, and SUMs decimals —
    exact and ORDER-INSENSITIVE, so the result is bit-stable no matter
    how Spark partitions the edge shuffle, and a SQL oracle replaying the
    same expressions matches hash-for-hash.

    Scale shape: per round, one shuffle join of edges against the rank
    table on src (both grow with the graph — pinned shuffle, never
    broadcast) + one key-partitioned SUM with map-side combine; dangling
    mass is a 1-row aggregate broadcast back. Lineage is cut per round
    with localCheckpoint, so the plan stays flat for any n_iter.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    node_ids = e.select(F.col("src").alias("id")).union(
        e.select(F.col("dst").alias("id"))
    ).distinct()
    if nodes is not None:
        nc = node_col or "id"
        node_ids = node_ids.union(nodes.select(F.col(nc).alias("id"))).distinct()
    node_ids = node_ids.localCheckpoint(eager=False)
    n = node_ids.count()
    if n == 0:
        return node_ids.withColumn("pr", F.lit(None).cast("decimal(38,18)"))
    e = e.localCheckpoint(eager=False)
    outdeg = e.groupBy("src").agg(F.count("*").alias("outdeg")).localCheckpoint(eager=False)

    base = (1.0 - damping) / float(n)
    pr = node_ids.select(
        "id", F.lit(1.0 / float(n)).cast("decimal(38,18)").alias("pr")
    )
    for _ in range(n_iter):
        contrib = (
            e.join(pr.hint("shuffle_merge"), e.src == pr.id)
            .join(outdeg, on="src")
            .select(
                F.col("dst").alias("id"),
                (F.col("pr").cast("double") / F.col("outdeg").cast("double"))
                .cast("decimal(38,18)")
                .alias("c"),
            )
        )
        s = contrib.groupBy("id").agg(F.sum("c").alias("s"))
        dm = (
            pr.join(outdeg, pr.id == outdeg.src, "left_anti")
            .agg(F.coalesce(F.sum("pr").cast("double"), F.lit(0.0)).alias("dm"))
        )
        pr = (
            node_ids.join(s.hint("shuffle_merge"), on="id", how="left")
            .join(F.broadcast(dm))
            .select(
                "id",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("s").cast("double"), F.lit(0.0))
                        + F.col("dm") / F.lit(float(n))
                    )
                )
                .cast("decimal(38,18)")
                .alias("pr"),
            )
            .localCheckpoint(eager=False)
        )
    return pr


def triangle_counts(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Per-vertex triangle participation -> (id, degree, n_triangles,
    clustering_coeff): how many triangles each vertex closes, and the
    local clustering coefficient 2T / (d*(d-1)).

    Triangle density is the standard structure probe for pipeline-derived
    graphs: a near-dup similarity graph whose clusters are real mirrors
    shows coefficients near 1 (every pair of my duplicates are duplicates
    of each other), while hash-collision noise shows coefficients near 0;
    on interaction graphs it separates communities from hubs.

    Scale shape (the degree-orientation scheme — the distributed-triangle
    standard, cf. Suri & Vassilvitskii, "Counting Triangles and the Curse
    of the Last Reducer", WWW'11): orient every canonical edge from its
    lower-(degree, id) endpoint to the higher one. Out-degrees are then
    bounded by O(sqrt(m)), so the wedge self-join materializes O(m^1.5)
    rows worst-case instead of sum(d^2) — the hub explosion never
    happens. Three shuffles total: degree aggregate, wedge self-join on
    the oriented source, and the closing-edge equi-join (both sides grow
    with the graph, so both joins are pinned shuffle — never a
    driver-sized broadcast). Each triangle is produced exactly once.
    """
    # canonical edges, EAGERLY checkpointed (r13): e is consumed by the
    # degree aggregate, the orientation joins and the closing-edge join —
    # concurrent AQE leaf stages that would each re-run the caller's pair
    # miner over a lazily-marked checkpoint (the same race as the
    # connected-components edge list). Degrees come from ONE explode over
    # a single read of e, not a two-leg union, for the same reason.
    e = (
        pairs.select(
            F.least(F.col(id_a), F.col(id_b)).alias("a"),
            F.greatest(F.col(id_a), F.col(id_b)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        e.select(F.explode(F.array("a", "b")).alias("id"))
        .groupBy("id")
        .agg(F.count("*").alias("degree"))
        .localCheckpoint(eager=False)
    )
    # orient each edge low->high by (degree, id); ids are distinct so the
    # composite order is total and every edge gets exactly one direction
    da = deg.select(F.col("id").alias("a"), F.col("degree").alias("da"))
    db = deg.select(F.col("id").alias("b"), F.col("degree").alias("db"))
    oriented = (
        e.join(da.hint("shuffle_merge"), on="a")
        .join(db.hint("shuffle_merge"), on="b")
        .select(
            F.when(
                (F.col("da") < F.col("db"))
                | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))),
                F.struct(F.col("a").alias("src"), F.col("b").alias("dst")),
            )
            .otherwise(F.struct(F.col("b").alias("src"), F.col("a").alias("dst")))
            .alias("o")
        )
        .select("o.src", "o.dst")
        .localCheckpoint(eager=False)
    )
    # wedges (src -> v, src -> w), v < w; the closing edge in canonical
    # (a < b) form is then exactly (v, w)
    w1 = oriented.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    w2 = oriented.select(F.col("src").alias("u"), F.col("dst").alias("w"))
    wedges = w1.join(w2.hint("shuffle_merge"), on="u").filter(F.col("v") < F.col("w"))
    tri = wedges.join(
        e.hint("shuffle_merge"),
        (wedges.v == e.a) & (wedges.w == e.b),
    ).select("u", "v", "w")
    per_node = (
        tri.select(F.explode(F.array("u", "v", "w")).alias("id"))
        .groupBy("id")
        .agg(F.count("*").alias("n_triangles"))
    )
    return (
        deg.join(per_node.hint("shuffle_merge"), on="id", how="left")
        .select(
            "id",
            "degree",
            F.coalesce(F.col("n_triangles"), F.lit(0)).alias("n_triangles"),
            F.when(
                F.col("degree") >= 2,
                F.round(
                    F.lit(2.0)
                    * F.coalesce(F.col("n_triangles"), F.lit(0)).cast("double")
                    / (
                        F.col("degree").cast("double")
                        * (F.col("degree") - F.lit(1)).cast("double")
                    ),
                    6,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("clustering_coeff"),
        )
    )


def k_core(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    *,
    k: int = 2,
    max_iter: int = 100,
) -> DataFrame:
    """The k-core of an undirected graph: the maximal subgraph where every
    vertex has degree >= k, found by iterative peeling (repeatedly drop
    vertices with degree < k until stable). Output: (id, degree) with the
    degree measured INSIDE the final core.

    Community/quality probe for similarity graphs: the 2-core separates
    chained mirror clusters from isolated accidental pairs; higher cores
    find densely inter-duplicated boilerplate families. Per round: one
    degree aggregate + two semi-joins (edges against surviving vertices),
    all key-partitioned shuffles; lineage cut per round with
    localCheckpoint; convergence = a 1-row count (the same fixpoint
    boundary as connected_components/pagerank). Rounds are bounded by the
    peeling depth — the degeneracy ordering length — which is tiny on
    real similarity graphs; ``max_iter`` is a safety rail."""
    if k < 1:
        raise ValueError("k must be >= 1")
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n_prev = None
    for _ in range(max_iter):
        deg = edges.groupBy("src").agg(F.count("*").alias("degree"))
        keep = deg.filter(F.col("degree") >= k).localCheckpoint(eager=False)
        n = keep.count()  # 1-row fixpoint scalar
        if n == n_prev:
            return keep.select(F.col("src").alias("id"), "degree")
        n_prev = n
        if n == 0:
            return keep.select(F.col("src").alias("id"), "degree")
        kept_ids = keep.select("src")
        edges = (
            edges.join(kept_ids, "src", "leftsemi")
            .join(kept_ids.select(F.col("src").alias("dst")), "dst", "leftsemi")
            .localCheckpoint(eager=False)
        )
    raise RuntimeError(f"k_core did not converge in {max_iter} rounds")
