"""Connected-components / dedup-clustering contracts.

The star-algorithm implementation must match a trusted driver-side
union-find on planted graphs whose shapes are chosen to break weaker
schemes: long chains (defeat per-hop label propagation inside the
round budget), stars, and merged multi-cluster graphs.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from etl_python_sqlite_spark.operators.graph import (
    connected_components,
    dedup_cluster_assignment,
    pagerank,
)


def _union_find(edge_list):
    par = {}

    def find(x):
        while par.setdefault(x, x) != x:
            par[x] = par[par[x]]
            x = par[x]
        return x

    for a, b in edge_list:
        ra, rb = find(a), find(b)
        if ra != rb:
            par[max(ra, rb)] = min(ra, rb)
    # min id per component for every node seen
    comp = {}
    for x in list(par):
        comp[x] = find(x)
    return comp


def _check(spark, edge_list):
    edges = spark.createDataFrame(edge_list, ["id_a", "id_b"])
    expected = _union_find(edge_list)
    # single-task union-find path (default for small edge sets)
    got = {
        r["id"]: r["component"]
        for r in connected_components(edges).collect()
    }
    assert got == expected
    # distributed star-rounds path (force it: no local finishing)
    got_dist = {
        r["id"]: r["component"]
        for r in connected_components(edges, local_edge_limit=0).collect()
    }
    assert got_dist == expected
    # attested-count fast path (r12: no tier-gate job, no persist) —
    # same result whether the hint is exact or a loose upper bound
    got_hint = {
        r["id"]: r["component"]
        for r in connected_components(
            edges, n_edges=len(edge_list)
        ).collect()
    }
    assert got_hint == expected
    # an over-large REAL edge set under a small attested bound must
    # stay correct (the hint is a size promise, never a semantics one)
    got_loose = {
        r["id"]: r["component"]
        for r in connected_components(
            edges, n_edges=1, local_edge_limit=1
        ).collect()
    }
    assert got_loose == expected


def test_chain_collapses_to_min(spark):
    # 0-1-2-...-19 : one component rooted at 0; O(log n) star rounds
    _check(spark, [(i, i + 1) for i in range(19)])


def test_reverse_chain_and_duplicates(spark):
    edges = [(i + 1, i) for i in range(19)] + [(5, 4), (10, 9)]
    _check(spark, edges)


def test_two_clusters_and_star(spark):
    edges = [(1, 2), (2, 3), (3, 1), (10, 11), (10, 12), (10, 13), (13, 14)]
    _check(spark, edges)


def test_merged_clusters_via_bridge(spark):
    # two dense blobs joined by one bridge edge must fuse
    blob_a = [(i, j) for i in range(0, 5) for j in range(i + 1, 5)]
    blob_b = [(i, j) for i in range(100, 105) for j in range(i + 1, 105)]
    _check(spark, blob_a + blob_b + [(4, 100)])


def test_self_loops_and_empty(spark):
    edges = spark.createDataFrame([(7, 7)], ["id_a", "id_b"])
    assert connected_components(edges).count() == 0


def test_cluster_assignment_includes_singletons(spark):
    nodes = spark.createDataFrame([(i,) for i in range(8)], ["doc_id"])
    edges = spark.createDataFrame([(0, 1), (1, 2), (5, 6)], ["id_a", "id_b"])
    rows = {
        r["doc_id"]: (r["cluster_id"], r["cluster_size"])
        for r in dedup_cluster_assignment(nodes, edges).collect()
    }
    assert rows == {
        0: (0, 3),
        1: (0, 3),
        2: (0, 3),
        3: (3, 1),
        4: (4, 1),
        5: (5, 2),
        6: (5, 2),
        7: (7, 1),
    }


# --- pagerank -------------------------------------------------------------


def _pagerank_reference(
    edge_list,
    iterations=5,
    total_mass=10**12,
    damp_num=85,
    damp_den=100,
    dangling="evaporate",
):
    """Hand-rolled exact-integer PageRank — the module's documented
    quantized estimator, replayed in pure CPython (no NetworkX)."""
    edges = sorted({(u, v) for u, v in edge_list if u != v})
    nodes = sorted({x for e in edges for x in e})
    n = len(nodes)
    outdeg = {}
    for u, _ in edges:
        outdeg[u] = outdeg.get(u, 0) + 1
    r0 = total_mass // n
    base = (damp_den - damp_num) * r0 // damp_den
    r = {v: r0 for v in nodes}
    for _ in range(iterations):
        acc = {v: 0 for v in nodes}
        for u, v in edges:
            acc[v] += (damp_num * r[u]) // (damp_den * outdeg[u])
        extra = 0
        if dangling == "redistribute":
            dmass = sum(r[v] for v in nodes if v not in outdeg)
            extra = (damp_num * dmass) // (damp_den * n)
        r = {v: base + extra + acc[v] for v in nodes}
    return r


_DIRECTED_EDGES = [
    # 4 is dangling (no out-edges); 0 is a hub
    (0, 1), (0, 2), (1, 2), (2, 0), (3, 0), (1, 4), (3, 4),
]


def test_pagerank_matches_integer_reference(spark):
    # default limits route this 7-edge graph through the LOCAL tier
    edges = spark.createDataFrame(_DIRECTED_EDGES, ["src", "dst"])
    got = {r["node"]: r["r"] for r in pagerank(edges).collect()}
    assert got == _pagerank_reference(_DIRECTED_EDGES)


def test_pagerank_all_tiers_identical_ranks(spark):
    """The three execution tiers — single-task local, broadcast-rank
    Pregel, shuffle-join Pregel — are strategy only: ranks must be
    bit-identical across all of them and equal the CPython reference
    (r4 VERDICT #1: the strategy gate must be semantics-free)."""
    edges = spark.createDataFrame(_DIRECTED_EDGES, ["src", "dst"])
    want = _pagerank_reference(_DIRECTED_EDGES)
    local = {r["node"]: r["r"] for r in pagerank(edges).collect()}
    bcast = {
        r["node"]: r["r"]
        for r in pagerank(edges, local_edge_limit=0).collect()
    }
    shuf = {
        r["node"]: r["r"]
        for r in pagerank(
            edges, local_edge_limit=0, broadcast_max_nodes=0
        ).collect()
    }
    assert local == bcast == shuf == want


def test_pagerank_tiers_on_random_graph(spark):
    import random

    rng = random.Random(7)
    redges = sorted(
        {(rng.randrange(60), rng.randrange(60)) for _ in range(300)}
    )
    redges = [(u, v) for u, v in redges if u != v]
    df = spark.createDataFrame(redges, ["src", "dst"])
    want = _pagerank_reference(redges)
    local = {r["node"]: r["r"] for r in pagerank(df).collect()}
    dist = {
        r["node"]: r["r"] for r in pagerank(df, local_edge_limit=0).collect()
    }
    assert local == dist == want


def test_pagerank_dangling_redistribution(spark):
    """Directed graph with a dangling sink: 'redistribute' must match
    the hand-rolled reference and differ from evaporation (the sink
    holds mass, so the share is non-zero)."""
    edges = spark.createDataFrame(_DIRECTED_EDGES, ["src", "dst"])
    got = {
        r["node"]: r["r"]
        for r in pagerank(edges, dangling="redistribute").collect()
    }
    want = _pagerank_reference(_DIRECTED_EDGES, dangling="redistribute")
    assert got == want
    evap = _pagerank_reference(_DIRECTED_EDGES, dangling="evaporate")
    assert want != evap
    # redistribute on ALL tiers (gate × dangling interplay)
    got_bcast = {
        r["node"]: r["r"]
        for r in pagerank(
            edges, dangling="redistribute", local_edge_limit=0
        ).collect()
    }
    got_shuf = {
        r["node"]: r["r"]
        for r in pagerank(
            edges, dangling="redistribute", local_edge_limit=0,
            broadcast_max_nodes=0,
        ).collect()
    }
    assert got_bcast == want and got_shuf == want


def test_pagerank_rejects_unknown_dangling_mode(spark):
    edges = spark.createDataFrame(_DIRECTED_EDGES, ["src", "dst"])
    try:
        pagerank(edges, dangling="bogus")
    except ValueError:
        pass
    else:
        raise AssertionError("expected ValueError")


def test_ext_dedup_clusters_partitions_sample(spark):
    """Every sampled doc appears exactly once; sizes are consistent;
    canonical docs are the cluster minima."""
    from etl_python_sqlite_spark.plans.ext import ext_dedup_clusters

    out = ext_dedup_clusters(spark, "/root/testdata/sf0.001").collect()
    by_cluster: dict[int, list] = {}
    for r in out:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    assert len(out) == len({r["doc_id"] for r in out})
    for cid, members in by_cluster.items():
        assert cid == min(m["doc_id"] for m in members)
        assert all(m["cluster_size"] == len(members) for m in members)


def _brute_triangles(edge_list):
    """itertools reference: count triangles per node on the undirected
    simple graph."""
    import itertools

    adj = {}
    for a, b in edge_list:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = {n: 0 for n in adj}
    for a, b, c in itertools.combinations(sorted(adj), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            tri[a] += 1
            tri[b] += 1
            tri[c] += 1
    return {n: (t, len(adj[n])) for n, t in tri.items() if t > 0}


def test_triangle_counts_matches_bruteforce(spark):
    from etl_python_sqlite_spark.operators.graph import triangle_counts

    # K4 glued to a square with one diagonal, plus a triangle-free tail
    edges = [
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),   # K4: 4 triangles
        (4, 5), (5, 6), (6, 7), (7, 4), (5, 7),           # square + diag
        (7, 8), (8, 9),                                    # tail
        (2, 1), (3, 1), (1, 1),                            # dups + self-loop
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: (r["tri_cnt"], r["degree"])
        for r in triangle_counts(df).collect()
    }
    assert got == _brute_triangles(edges)


def test_triangle_counts_random_graph(spark):
    import random

    from etl_python_sqlite_spark.operators.graph import triangle_counts

    rnd = random.Random(7)
    edges = [(rnd.randrange(40), rnd.randrange(40)) for _ in range(220)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: (r["tri_cnt"], r["degree"])
        for r in triangle_counts(df).collect()
    }
    assert got == _brute_triangles(edges)


def test_triangle_closure_tiers_identical(spark):
    """The broadcast and shuffle closure strategies must produce the
    SAME per-node triangle counts — the strategy gate is a physical
    choice, never a semantic one (the pagerank tier-equality rule)."""
    from etl_python_sqlite_spark.operators.graph import triangle_counts

    edges = [
        (1, 2), (2, 3), (1, 3),            # triangle
        (3, 4), (4, 5), (3, 5),            # triangle sharing node 3
        (5, 6), (6, 7),                    # path, no triangle
        (1, 4),                            # closes (1,3,4)
        (8, 9),                            # isolated edge
    ]
    df = spark.createDataFrame(edges, "src long, dst long")

    def canon(out):
        return sorted(
            (r["node"], r["tri_cnt"], r["degree"]) for r in out.collect()
        )

    bcast = canon(triangle_counts(df))  # default gate -> broadcast
    shuf = canon(triangle_counts(df, broadcast_max_edges=0))  # forced shuffle
    assert bcast == shuf
    # ground truth: triangles {1,2,3}, {3,4,5}, {1,3,4}
    by_node = {n: t for n, t, _ in bcast}
    assert by_node == {1: 2, 2: 1, 3: 3, 4: 2, 5: 1}


@pytest.mark.slow  # >8 s e2e/fuzz (default tier deselects)
def test_pagerank_symmetric_canonical_matches_directed_union(spark):
    """r11-opt: pagerank(edges_symmetric=True) over a canonical (u < v)
    frame must be bit-identical to feeding the directed union, on both
    the local-numpy tier and the Pregel tiers."""
    import random

    from pyspark.sql import functions as F

    rng = random.Random(13)
    canon = sorted(
        {
            (min(a, b), max(a, b))
            for a, b in ((rng.randrange(50), rng.randrange(50)) for _ in range(250))
            if a != b
        }
    )
    cdf = spark.createDataFrame(canon, ["u", "v"])
    directed = cdf.union(cdf.select(F.col("v").alias("u"), F.col("u").alias("v")))
    want = {
        r["node"]: r["r"]
        for r in pagerank(directed, "u", "v", edges_distinct=True).collect()
    }
    got_local = {
        r["node"]: r["r"]
        for r in pagerank(
            cdf, "u", "v", edges_distinct=True, edges_symmetric=True
        ).collect()
    }
    got_pregel = {
        r["node"]: r["r"]
        for r in pagerank(
            cdf, "u", "v", edges_distinct=True, edges_symmetric=True,
            local_edge_limit=0,
        ).collect()
    }
    assert got_local == want
    assert got_pregel == want


def test_pagerank_caller_supplied_edge_count(spark):
    """r12-opt: a caller that already measured its distinct edge frame
    (the memoized co-occurrence stage) hands ``n_edges`` to the tier
    gate and skips the per-invocation count() job — ranks must be
    bit-identical to the recounting form on every tier, and the hint
    must be IGNORED (recounted) without ``edges_distinct``, where the
    operator's own filter+distinct changes the count."""
    edges = spark.createDataFrame(_DIRECTED_EDGES, ["src", "dst"])
    n = len(_DIRECTED_EDGES)
    want = _pagerank_reference(_DIRECTED_EDGES)
    hinted_local = {
        r["node"]: r["r"]
        for r in pagerank(edges, edges_distinct=True, n_edges=n).collect()
    }
    hinted_pregel = {
        r["node"]: r["r"]
        for r in pagerank(
            edges, edges_distinct=True, n_edges=n, local_edge_limit=0
        ).collect()
    }
    assert hinted_local == want
    assert hinted_pregel == want
    # a wildly wrong hint without edges_distinct must not leak into the
    # tier gate (0 would force the local tier even above the limit; the
    # recount keeps the documented tier choice AND the exact ranks)
    ignored = {
        r["node"]: r["r"] for r in pagerank(edges, n_edges=0).collect()
    }
    assert ignored == want
