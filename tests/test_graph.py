"""Connected components + dedup clustering tests."""

import pytest
from pyspark.sql import functions as F

from codd_spark.operators.graph import connected_components, dedup_clusters

BASE = "the quick brown fox jumps over the lazy dog and runs far away into the green forest tonight"


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [
            (0, BASE),
            (1, BASE.replace("green", "dark")),
            (2, BASE),  # exact dup of 0
            (3, "completely different content about database engines and query optimizers"),
            (4, "spark streaming with watermarks handles late arriving events gracefully"),
        ],
        "doc_id LONG, text STRING",
    )


def test_connected_components_basic(spark):
    # components: {1,2,3,4} (chain), {7,9}, isolated via nodes: {5}
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (9, 7)], "id_a LONG, id_b LONG"
    )
    nodes = spark.createDataFrame([(i,) for i in (1, 2, 3, 4, 5, 7, 9)], "id LONG")
    got = {
        r.id: r.component
        for r in connected_components(pairs, nodes=nodes, node_col="id").collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 7: 7, 9: 7}


def test_connected_components_long_chain_converges(spark, monkeypatch):
    # a 40-node path graph: worst-case diameter for label propagation;
    # must converge (min label walks the whole chain) well inside
    # max_iter. Distributed path forced — the driver gate would solve
    # this instantly and test nothing about the loop.
    import codd_spark.operators.graph as g

    monkeypatch.setattr(g, "_CC_DRIVER_EDGE_LIMIT", -1)
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "id_a LONG, id_b LONG"
    )
    got = connected_components(pairs, max_iter=50).collect()
    assert {r.component for r in got} == {0}
    assert len(got) == 41


def test_connected_components_nonconvergence_raises(spark, monkeypatch):
    import codd_spark.operators.graph as g

    monkeypatch.setattr(g, "_CC_DRIVER_EDGE_LIMIT", -1)  # force the loop
    pairs = spark.createDataFrame([(i, i + 1) for i in range(20)], "id_a LONG, id_b LONG")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iter=2)


def test_union_find_matches_bfs_reference(spark):
    """Property check of the r8 driver union-find against a brute-force
    BFS closure, over random multigraphs (dups, self-loops, both
    orientations)."""
    import random

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(
        max_examples=25,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(st.lists(st.tuples(st.integers(0, 60), st.integers(0, 60)), max_size=120))
    def check(edge_list):
        pairs = spark.createDataFrame(
            edge_list or [(0, 0)], "id_a LONG, id_b LONG"
        )
        got = {
            r.id: r.component for r in connected_components(pairs).collect()
        }
        # BFS reference: component = min reachable id
        adj = {}
        for a, b in edge_list or [(0, 0)]:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        want = {}
        for start in adj:
            seen, stack = {start}, [start]
            while stack:
                x = stack.pop()
                for y in adj[x]:
                    if y not in seen:
                        seen.add(y)
                        stack.append(y)
            want[start] = min(seen)
        assert got == want

    check()


def test_driver_and_distributed_cc_agree(spark, monkeypatch):
    """The r8 small-graph gate (driver union-find) must produce the
    exact labels of the distributed min-label loop — component = min
    reachable id — on a graph with chains, a cycle, self-loops,
    duplicate edges in both orientations, and isolated nodes."""
    import random

    import codd_spark.operators.graph as g

    rng = random.Random(8)
    edges = [(i, i + 1) for i in range(0, 30, 3)]          # short chains
    edges += [(100, 101), (101, 102), (102, 100)]          # cycle
    edges += [(200, 200)]                                  # self loop
    edges += [(rng.randrange(300, 340), rng.randrange(300, 340)) for _ in range(40)]
    edges += [(b, a) for a, b in edges[:10]]               # reversed dups
    pairs = spark.createDataFrame(edges, "id_a LONG, id_b LONG")
    nodes = spark.createDataFrame(
        [(i,) for i in range(0, 400, 7)], "id LONG"
    )

    fast = {
        (r.id, r.component)
        for r in connected_components(pairs, nodes=nodes, node_col="id").collect()
    }
    monkeypatch.setattr(g, "_CC_DRIVER_EDGE_LIMIT", -1)
    slow = {
        (r.id, r.component)
        for r in connected_components(pairs, nodes=nodes, node_col="id").collect()
    }
    assert fast == slow and len(fast) > 0


def test_dedup_clusters_keepers(spark, docs):
    """docs fixture: 0 and 2 are exact dups, 1 is a near dup of both;
    3 and 4 are distinct -> clusters {0,1,2}, {3}, {4}."""
    from codd_spark.operators.dedup import ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.3)
    out = {r.doc_id: r for r in dedup_clusters(docs, pairs, "doc_id").collect()}
    assert {i: out[i].cluster_id for i in range(5)} == {0: 0, 1: 0, 2: 0, 3: 3, 4: 4}
    assert out[0].cluster_size == 3 and out[3].cluster_size == 1
    assert [out[i].is_keeper for i in range(5)] == [True, False, False, True, True]


def test_tf_idf_top_terms(spark):
    from codd_spark.operators.text import tf_idf_top_terms

    df = spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "cherry durian cherry durian"),
        ],
        "doc_id LONG, text STRING",
    )
    out = tf_idf_top_terms(df, "doc_id", "text", k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 1: apple tf=2, df=1 -> idf ln(3); banana tf=1, df=2 -> ln(1.5)
    top1 = sorted(by_doc[1], key=lambda r: r.rank)
    assert [r.term for r in top1] == ["apple", "banana"]
    import math
    assert abs(top1[0].tf_idf - round(2 * math.log(3), 6)) < 1e-9
    assert all(len(v) <= 2 for v in by_doc.values())


def test_pagerank_matches_numpy_power_iteration(spark):
    import numpy as np

    from codd_spark.operators.graph import pagerank

    # directed graph with a dangling node (3 has no out-edges)
    edges = [(0, 1), (1, 2), (2, 0), (0, 2), (2, 3)]
    df = spark.createDataFrame(edges, "src BIGINT, dst BIGINT")
    got = {r["id"]: float(r["pr"]) for r in pagerank(df, n_iter=20).collect()}

    n, d = 4, 0.85
    pr = np.full(n, 1.0 / n)
    out = {0: [1, 2], 1: [2], 2: [0, 3]}
    for _ in range(20):
        nxt = np.full(n, (1 - d) / n)
        dangling = sum(pr[u] for u in range(n) if u not in out)
        for u, vs in out.items():
            for v in vs:
                nxt[v] += d * pr[u] / len(vs)
        nxt += d * dangling / n
        pr = nxt
    for i in range(n):
        assert abs(got[i] - pr[i]) < 1e-9, (i, got[i], pr[i])
    assert abs(sum(got.values()) - 1.0) < 1e-9  # rank mass conserved


def test_triangle_counts_exact_small_graph(spark):
    from codd_spark.operators.graph import triangle_counts

    # K4 on {0,1,2,3} (4 triangles, every vertex in 3) plus a pendant
    # vertex 4 attached to 0 (degree 1, zero triangles) and an isolated
    # edge 5-6; duplicate + reversed input edges must not double-count
    edges = [
        (0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3),
        (1, 0),  # reversed duplicate
        (0, 1),  # exact duplicate
        (4, 0),
        (5, 6),
    ]
    df = spark.createDataFrame(edges, "id_a BIGINT, id_b BIGINT")
    got = {r["id"]: r for r in triangle_counts(df).collect()}
    assert set(got) == {0, 1, 2, 3, 4, 5, 6}
    for v in (1, 2, 3):
        assert got[v]["degree"] == 3
        assert got[v]["n_triangles"] == 3
        assert got[v]["clustering_coeff"] == 1.0
    assert got[0]["degree"] == 4  # K4 neighbors + pendant
    assert got[0]["n_triangles"] == 3
    assert got[0]["clustering_coeff"] == 0.5  # 2*3 / (4*3)
    assert got[4]["degree"] == 1 and got[4]["n_triangles"] == 0
    assert got[4]["clustering_coeff"] == 0.0
    assert got[5]["n_triangles"] == 0 and got[6]["n_triangles"] == 0


def test_triangle_counts_matches_bruteforce(spark):
    import itertools
    import random

    from codd_spark.operators.graph import triangle_counts

    rng = random.Random(7)
    nodes = list(range(30))
    edges = sorted(
        {(a, b) for a, b in itertools.combinations(nodes, 2) if rng.random() < 0.2}
    )
    df = spark.createDataFrame(edges, "id_a BIGINT, id_b BIGINT")
    got = {r["id"]: r["n_triangles"] for r in triangle_counts(df).collect()}

    eset = set(edges)
    expect = {v: 0 for v in {x for e in edges for x in e}}
    for a, b, c in itertools.combinations(nodes, 3):
        if (a, b) in eset and (b, c) in eset and (a, c) in eset:
            expect[a] += 1
            expect[b] += 1
            expect[c] += 1
    assert got == expect


def test_semantic_dedup_lsh_and_exact_agree_on_separable_data(spark):
    """Well-separated clusters: the LSH bucket path must find the same
    clusters as the exact all-pairs path (duplicate groups are near
    cos=1, so every bucket agrees across all planes)."""
    import math

    from codd_spark.operators.similarity import semantic_dedup

    # three tight duplicate groups of 3 vectors each + 3 singletons, dim 8
    base = [
        [1, 0, 0, 0, 0, 0, 0, 0],
        [0, 1, 0, 0, 0, 0, 0, 0],
        [0, 0, 1, 0, 0, 0, 0, 0],
    ]
    rows = []
    vid = 0
    for g, b in enumerate(base):
        for j in range(3):
            v = [x + (0.001 * j if i == (g + 3) else 0.0) for i, x in enumerate(b)]
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    for i in range(3):  # mutually-orthogonal singletons
        v = [0.0] * 8
        v[5 + i] = 1.0
        rows.append((vid, v))
        vid += 1
    df = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>")

    for exact in (True, False):
        out = {
            r["vec_id"]: (r["cluster_id"], r["cluster_size"], r["is_keeper"])
            for r in semantic_dedup(
                df, dim=8, threshold=0.95, exact=exact, n_planes=6
            ).collect()
        }
        assert len(out) == 12
        for g in range(3):
            ids = [3 * g, 3 * g + 1, 3 * g + 2]
            for i in ids:
                assert out[i] == (ids[0], 3, i == ids[0]), (exact, i, out[i])
        for i in (9, 10, 11):  # singletons keep themselves
            assert out[i] == (i, 1, True)


def test_triangle_and_components_on_empty_edges(spark):
    from codd_spark.operators.graph import connected_components, triangle_counts

    empty = spark.createDataFrame([], "id_a BIGINT, id_b BIGINT")
    assert triangle_counts(empty).count() == 0
    # no edges + an explicit node set: every node is its own singleton
    nodes = spark.createDataFrame([(1,), (2,)], "doc_id BIGINT")
    cc = {
        r["id"]: r["component"]
        for r in connected_components(empty, nodes=nodes, node_col="doc_id").collect()
    }
    assert cc == {1: 1, 2: 2}


def test_k_core_matches_python_peel(spark):
    import random

    from codd_spark.operators.graph import k_core

    rng = random.Random(23)
    # dense clique (core) + chains hanging off it + isolated pairs
    edges = set()
    clique = list(range(10))
    for i in clique:
        for j in clique:
            if i < j:
                edges.add((i, j))
    for s in range(10, 40):  # chains: degree <= 2, peeled at k=3
        edges.add((rng.choice(clique), s))
        edges.add((s, s + 100))
    pairs = spark.createDataFrame(sorted(edges), "id_a LONG, id_b LONG")

    def peel(es, k):
        es = {frozenset(e) for e in es}
        while True:
            deg = {}
            for e in es:
                for v in e:
                    deg[v] = deg.get(v, 0) + 1
            bad = {v for v, d in deg.items() if d < k}
            if not bad:
                return deg
            es = {e for e in es if not (e & bad)}

    for k in (2, 3, 5, 11):
        got = {(r.id, r.degree) for r in k_core(pairs, k=k).collect()}
        assert got == set(peel(edges, k).items()), f"k={k}"
    with pytest.raises(ValueError, match="k must"):
        k_core(pairs, k=0)


def test_cc_string_ids_take_distributed_path(spark):
    """ADVICE r8: connected_components is type-generic (the distributed
    min-label loop works on any orderable id), but the r8 driver gate
    cast through int64 and crashed on string ids for every graph under
    the 2M-edge limit. String-id graphs must (a) work, (b) keep the
    input dtype — digit strings stay strings with STRING min-ordering
    ('10' < '9'), not get silently promoted to LONG."""
    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y"), ("10", "9")],
        "id_a STRING, id_b STRING",
    )
    out = connected_components(pairs)
    assert [f.dataType.simpleString() for f in out.schema.fields] == [
        "string",
        "string",
    ]
    got = {(r.id, r.component) for r in out.collect()}
    assert got == {
        ("a", "a"), ("b", "a"), ("c", "a"),
        ("x", "x"), ("y", "x"),
        ("10", "10"), ("9", "10"),  # STRING ordering: '10' < '9'
    }


def test_cc_int32_ids_keep_dtype_on_driver_path(spark):
    """The driver union-find returns int64 internally; the public
    contract is input-dtype-out on both paths."""
    pairs = spark.createDataFrame([(1, 2), (3, 4)], "id_a INT, id_b INT")
    out = connected_components(pairs)
    assert [f.dataType.simpleString() for f in out.schema.fields] == ["int", "int"]
    assert {(r.id, r.component) for r in out.collect()} == {
        (1, 1), (2, 1), (3, 3), (4, 3),
    }


def test_cc_tinyint_smallint_ids_take_driver_path(spark, monkeypatch):
    """ADVICE r9: simpleString() yields 'tinyint'/'smallint' for
    byte/short ids, so the r9 set-based gate never let them onto the
    driver union-find fast path. The gate now tests DataType classes:
    small integral graphs under the edge limit must take the driver
    path AND keep the input dtype."""
    import codd_spark.operators.graph as g

    called = {"n": 0}
    real = g._union_find_pdf

    def spy(session, pdf):
        called["n"] += 1
        return real(session, pdf)

    # the gate folds the size check and the edge transfer into ONE
    # Arrow collect and calls _union_find_pdf directly (r12)
    monkeypatch.setattr(g, "_union_find_pdf", spy)
    for sql_t, simple in [("TINYINT", "tinyint"), ("SMALLINT", "smallint")]:
        pairs = spark.createDataFrame(
            [(1, 2), (3, 4)], f"id_a {sql_t}, id_b {sql_t}"
        )
        out = connected_components(pairs)
        assert [f.dataType.simpleString() for f in out.schema.fields] == [
            simple,
            simple,
        ]
        assert {(r.id, r.component) for r in out.collect()} == {
            (1, 1), (2, 1), (3, 3), (4, 3),
        }
    assert called["n"] == 2
