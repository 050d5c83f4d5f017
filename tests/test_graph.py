"""Connected-components / dedup-cluster tests (llm/graph.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datalake2anomali_spark.llm.graph import connected_components, dedup_clusters


def _cc_map(edges_df):
    return {r["node"]: r["component"] for r in edges_df.collect()}


def test_cc_two_components_and_path(spark):
    # component {1,2,3,4} is a path (diameter 3 → several propagation
    # rounds), component {10, 11} is a single edge
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], ["src", "dst"]
    )
    got = _cc_map(connected_components(edges))
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_cc_long_path_converges(spark):
    # 0-1-2-...-12 as a single path: min label must travel the full length
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], ["src", "dst"]
    )
    got = _cc_map(connected_components(edges))
    assert set(got.values()) == {0}
    assert len(got) == 13


def test_cc_duplicate_edges_and_self_loops(spark):
    edges = spark.createDataFrame(
        [(5, 6), (6, 5), (5, 5), (6, 7)], ["src", "dst"]
    )
    got = _cc_map(connected_components(edges))
    assert got == {5: 5, 6: 5, 7: 5}


def test_cc_nonconvergence_raises(spark):
    edges = spark.createDataFrame([(i, i + 1) for i in range(6)], ["src", "dst"])
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iter=2)


def test_dedup_clusters_canonical_flag(spark):
    pairs = spark.createDataFrame(
        [(2, 9), (9, 4), (30, 31)], ["d1", "d2"]
    )
    out = dedup_clusters(pairs).collect()
    by_doc = {r["doc_id"]: r for r in out}
    assert by_doc[2]["cluster_id"] == 2 and by_doc[2]["is_canonical"]
    assert by_doc[9]["cluster_id"] == 2 and not by_doc[9]["is_canonical"]
    assert by_doc[4]["cluster_id"] == 2
    assert by_doc[30]["cluster_id"] == 30 and by_doc[30]["is_canonical"]
    assert by_doc[31]["cluster_id"] == 30 and not by_doc[31]["is_canonical"]
    # exactly one canonical per cluster
    canon = (
        dedup_clusters(pairs)
        .groupBy("cluster_id")
        .agg(F.sum(F.col("is_canonical").cast("int")).alias("n"))
        .collect()
    )
    assert all(r["n"] == 1 for r in canon)


def test_dedup_keep_best_picks_quality_winner(spark):
    from pyspark.sql import functions as F

    from datalake2anomali_spark.llm.graph import dedup_keep_best

    docs = spark.createDataFrame(
        [(1, 10.0), (2, 30.0), (3, 20.0), (4, 5.0), (5, 5.0), (9, 1.0)],
        "doc_id long, score double",
    )
    # cluster {1,2,3} (best: 2), cluster {4,5} (tie -> smallest id 4), 9 alone
    pairs = spark.createDataFrame([(1, 2), (2, 3), (4, 5)], "d1 long, d2 long")
    out = {r.doc_id: r for r in dedup_keep_best(docs, pairs, F.col("score")).collect()}
    assert set(out) == {2, 4, 9}
    assert out[2].cluster_id == 1 and out[2].kept_reason == "best_of_cluster"
    assert out[4].cluster_id == 4 and out[4].kept_reason == "best_of_cluster"
    assert out[9].cluster_id is None and out[9].kept_reason == "singleton"


def test_dedup_keep_best_star_algorithm_on_chain(spark):
    """keep-best with algorithm="star" survives a chain-shaped pair graph.

    A 1000-node transitive near-dup chain has diameter 999 — min-label
    propagation's max_iter=25 would raise — so the star passthrough is the
    scale path: O(log n) rounds regardless of shape.
    """
    from pyspark.sql import functions as F

    from datalake2anomali_spark.llm.graph import dedup_keep_best

    n = 1000
    docs = spark.createDataFrame(
        [(i, float(i % 7)) for i in range(n)] + [(5000, 1.0)],
        "doc_id long, score double",
    )
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "d1 long, d2 long"
    )
    out = {
        r.doc_id: r
        for r in dedup_keep_best(
            docs, pairs, F.col("score"), algorithm="star"
        ).collect()
    }
    # one survivor for the whole chain: max score (6.0) at smallest such id (6)
    assert set(out) == {6, 5000}
    assert out[6].cluster_id == 0 and out[6].kept_reason == "best_of_cluster"
    assert out[5000].kept_reason == "singleton"
    # and the default (propagation) raises on this diameter, documenting WHY
    # the passthrough exists
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup_keep_best(docs, pairs, F.col("score")).collect()


def test_star_cc_matches_propagation_and_handles_long_paths(spark):
    import random

    from datalake2anomali_spark.llm.graph import (
        connected_components,
        connected_components_star,
    )

    # adversarial shape for min-label: a 120-node path (diameter 119 would
    # exceed propagation's max_iter=25) plus a clique and random components
    path = [(i, i + 1) for i in range(100, 220)]
    clique = [(i, j) for i in range(10) for j in range(i + 1, 10)]
    rng = random.Random(13)
    rand = [(rng.randrange(300, 360), rng.randrange(300, 360)) for _ in range(80)]
    edges = spark.createDataFrame(path + clique + rand, "src long, dst long")
    star = {
        (r.node, r.component)
        for r in connected_components_star(edges).collect()
    }
    # the path collapses to one component rooted at its min node
    assert {(n, 100) for n in range(100, 221)} <= star
    assert {(n, 0) for n in range(10)} <= star
    # equivalence with min-label propagation on the propagation-feasible
    # subgraph (clique + random part)
    feasible = spark.createDataFrame(clique + rand, "src long, dst long")
    prop = {
        (r.node, r.component) for r in connected_components(feasible).collect()
    }
    star_feasible = {
        (r.node, r.component)
        for r in connected_components_star(feasible).collect()
    }
    assert prop == star_feasible


def test_pagerank_exact_integer_chain(spark):
    """Hand-computable 3-node graph: A→B, B→A, B→C, C→B (A,C leaves of B).

    Recurrence (scale 1e6, d=85%): contribution = r div deg, then
    r' = 150000 + (85·Σ) div 100 — recomputed in python ints below, so the
    test pins bit-exact agreement, not approximate ranks.
    """
    from datalake2anomali_spark.llm.graph import pagerank

    edges = [(0, 1), (1, 0), (1, 2), (2, 1)]
    deg = {0: 1, 1: 2, 2: 1}
    r = {0: 1_000_000, 1: 1_000_000, 2: 1_000_000}
    for _ in range(3):
        inbox = {n: 0 for n in r}
        for s, d in edges:
            inbox[d] += r[s] // deg[s]
        r = {n: 150_000 + (85 * inbox[n]) // 100 for n in r}

    df = spark.createDataFrame(edges, "src long, dst long")
    got = {row.node: row.rank_scaled for row in pagerank(df, iters=3).collect()}
    assert got == r
    assert got[1] > got[0] == got[2]  # hub outranks symmetric leaves


def test_pagerank_dangling_and_sourceless_nodes(spark):
    """A node with no in-edges keeps only the base term; a dangling node
    (no out-edges) still receives mass but leaks its own (documented)."""
    from datalake2anomali_spark.llm.graph import pagerank

    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    got = {row.node: row.rank_scaled for row in pagerank(df, iters=1).collect()}
    assert got[1] == 150_000  # no in-edges: base only
    assert got[2] == 150_000 + (85 * 1_000_000) // 100


def test_triangle_counts_hand_graph(spark):
    """K4 plus a pendant chain: every K4 node sits in C(3,2)=3 triangles,
    chain nodes in none (absent from output)."""
    from datalake2anomali_spark.llm.graph import triangle_counts

    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    chain = [(3, 10), (10, 11)]
    df = spark.createDataFrame(k4 + chain, "src long, dst long")
    got = {r.node: r.n_triangles for r in triangle_counts(df).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangle_counts_duplicate_and_reversed_edges(spark):
    from datalake2anomali_spark.llm.graph import triangle_counts

    df = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 1), (1, 3), (3, 3)], "src long, dst long"
    )
    got = {r.node: r.n_triangles for r in triangle_counts(df).collect()}
    assert got == {1: 1, 2: 1, 3: 1}  # dups/reversals/self-loop ignored


def test_triangle_counts_matches_bruteforce_random(spark):
    import itertools
    import random

    from datalake2anomali_spark.llm.graph import triangle_counts

    rng = random.Random(11)
    nodes = list(range(30))
    edges = [(a, b) for a, b in itertools.combinations(nodes, 2) if rng.random() < 0.2]
    adj = set(edges)
    expect: dict[int, int] = {}
    for x, y, z in itertools.combinations(nodes, 3):
        if (x, y) in adj and (y, z) in adj and (x, z) in adj:
            for n in (x, y, z):
                expect[n] = expect.get(n, 0) + 1
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.n_triangles for r in triangle_counts(df).collect()}
    assert got == expect


def test_khop_features_hand_graph(spark):
    """Path 1-2-3-4 plus triangle 4-5-6: every feature hand-checkable."""
    from datalake2anomali_spark.llm.graph import khop_features

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (4, 6), (5, 6)], "src long, dst long"
    )
    got = {
        r.node: (r.degree, r.nbr_deg_sum, r.n_2hop)
        for r in khop_features(edges).collect()
    }
    # degrees: 1:1, 2:2, 3:2, 4:3, 5:2, 6:2
    assert got[1] == (1, 2, 1)           # nbr {2}; 2-hop {3}
    assert got[2] == (2, 3, 1)           # nbrs {1,3}; 2-hop {4}
    assert got[3] == (2, 5, 3)           # nbrs {2,4}; 2-hop {1,5,6}
    assert got[4] == (3, 6, 1)           # nbrs {3,5,6}; 2-hop {2}
    assert got[5] == (2, 5, 1)           # nbrs {4,6}; 2-hop {3}
    assert got[6] == (2, 5, 1)
    # triangle neighbors are distance 1, never double-counted at 2
    assert sum(v[2] for v in got.values()) == 8


def test_khop_isolated_pair(spark):
    from datalake2anomali_spark.llm.graph import khop_features

    edges = spark.createDataFrame([(7, 8)], "src long, dst long")
    got = {
        r.node: (r.degree, r.nbr_deg_sum, r.n_2hop)
        for r in khop_features(edges).collect()
    }
    assert got == {7: (1, 1, 0), 8: (1, 1, 0)}


def test_pagerank_redistribute_dangling_mass(spark):
    """dangling='redistribute': each iteration the sinks' summed rank is
    shared equally (integer div N) into every node's incoming mass —
    pinned against the recurrence recomputed in python ints."""
    from datalake2anomali_spark.llm.graph import pagerank

    # 1→2, 1→3, 2→3: node 3 is a pure sink (dangling)
    edges = [(1, 2), (1, 3), (2, 3)]
    deg = {1: 2, 2: 1}
    nodes = [1, 2, 3]
    r = {n: 1_000_000 for n in nodes}
    for _ in range(3):
        inbox = {n: 0 for n in nodes}
        for s, d in edges:
            inbox[d] += r[s] // deg[s]
        share = r[3] // len(nodes)  # node 3 is the only dangler
        r = {n: 150_000 + (85 * (inbox[n] + share)) // 100 for n in nodes}

    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        row.node: row.rank_scaled
        for row in pagerank(df, iters=3, dangling="redistribute").collect()
    }
    assert got == r
    # sanity: redistribution strictly raises the sourceless node above base
    assert got[1] > 150_000

    with pytest.raises(ValueError, match="redistribute"):
        pagerank(df, dangling="bogus")


def test_khop_max_degree_cap(spark):
    """The wedge bound is enforced in-operator: a hub above max_degree
    raises loudly by default; on_hub='filter' removes the hub and its
    incident edges, and the features equal khop_features over the
    hub-filtered edge list."""
    from datalake2anomali_spark.llm.graph import khop_features

    hub_edges = [(100, i) for i in range(1, 21)]  # hub degree 20
    tail = [(1, 2), (2, 3), (4, 5)]
    df = spark.createDataFrame(hub_edges + tail, "src long, dst long")

    with pytest.raises(ValueError, match="max_degree=5"):
        khop_features(df, max_degree=5).collect()

    got = khop_features(df, max_degree=5, on_hub="filter")
    want = khop_features(spark.createDataFrame(tail, "src long, dst long"))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    assert got.filter(F.col("node") == 100).count() == 0

    # a graph already under the cap is untouched by the cap
    ok = khop_features(spark.createDataFrame(tail, "src long, dst long"), max_degree=5)
    assert sorted(map(tuple, ok.collect())) == sorted(map(tuple, want.collect()))

    with pytest.raises(ValueError, match="on_hub"):
        khop_features(df, max_degree=5, on_hub="nope")


def test_k_core_matches_python_peeling(spark):
    """k-core equals the sequential peeling reference on a graph with a
    clear core/periphery split; degrees are within-core; k too large
    yields an empty result with the right schema."""
    from datalake2anomali_spark.llm.graph import k_core

    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]  # the 3-core
    tail = [(0, 10), (10, 11), (11, 12), (2, 20)]  # pendant chain + leaf
    tri = [(30, 31), (31, 32), (30, 32), (32, 0)]  # a 2-core triangle
    edges = k4 + tail + tri
    df = spark.createDataFrame(edges, "src long, dst long")

    def py_core(es, k):
        es = {tuple(sorted(e)) for e in es}
        while True:
            deg = {}
            for a, b in es:
                deg[a] = deg.get(a, 0) + 1
                deg[b] = deg.get(b, 0) + 1
            bad = {n for n, d in deg.items() if d < k}
            if not bad:
                return deg
            es = {e for e in es if e[0] not in bad and e[1] not in bad}
            if not es:
                return {}

    for k in (1, 2, 3):
        want = py_core(edges, k)
        got = {r.node: r.degree for r in k_core(df, k).collect()}
        assert got == want, (k, got, want)
    assert {r.node for r in k_core(df, 3).collect()} == {0, 1, 2, 3}

    empty = k_core(df, 10)
    assert empty.count() == 0
    assert empty.columns == ["node", "degree"]

    import pytest as _pytest

    with _pytest.raises(ValueError, match="k must"):
        k_core(df, 0)


def test_coreness_matches_python_reference(spark):
    """Full decomposition equals sequential min-degree peeling, and each
    level equals k_core membership differences."""
    from datalake2anomali_spark.llm.graph import coreness, k_core

    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    tail = [(0, 10), (10, 11), (11, 12), (2, 20)]
    tri = [(30, 31), (31, 32), (30, 32), (32, 0)]
    edges = k4 + tail + tri
    df = spark.createDataFrame(edges, "src long, dst long")

    def py_coreness(es):
        es = {tuple(sorted(e)) for e in es}
        core = {}
        k = 0
        while es:
            deg = {}
            for a, b in es:
                deg[a] = deg.get(a, 0) + 1
                deg[b] = deg.get(b, 0) + 1
            k = max(k, min(deg.values()))
            victims = {n for n, d in deg.items() if d <= k}
            for n in victims:
                core[n] = k
            es = {e for e in es if e[0] not in victims and e[1] not in victims}
            survivors = {n for e in es for n in e}
            # orphaned by the peel: edges gone, node itself not a victim
            for n in set(deg) - victims - survivors:
                core[n] = k
        return core

    want = py_coreness(edges)
    got = {r.node: r.coreness for r in coreness(df).collect()}
    assert got == want, (got, want)

    # star graph: the hub is orphaned by peeling its leaves (its edges all
    # vanish without it ever being a victim) and must still get coreness 1
    star = spark.createDataFrame([(100, i) for i in range(1, 6)], "src long, dst long")
    got_star = {r.node: r.coreness for r in coreness(star).collect()}
    assert got_star == {100: 1, 1: 1, 2: 1, 3: 1, 4: 1, 5: 1}

    # consistency with k_core: nodes with coreness >= k are exactly the k-core
    for k in (1, 2, 3):
        in_core = {r.node for r in k_core(df, k).collect()}
        assert in_core == {n for n, c in want.items() if c >= k}, k


def test_coreness_hindex_matches_peel(spark):
    """The h-index fixpoint (Montresor et al. 2011) must equal the
    peel-based decomposition exactly — on the core/periphery graph, a
    star (hub's estimate must fall from degree 5 to 1), a clique, a
    path, and a duplicated/self-loop/reversed edge list (canonicalization
    shared with the other graph ops)."""
    from datalake2anomali_spark.llm.graph import coreness, coreness_hindex

    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    tail = [(0, 10), (10, 11), (11, 12), (2, 20)]
    tri = [(30, 31), (31, 32), (30, 32), (32, 0)]
    cases = [
        k4 + tail + tri,
        [(100, i) for i in range(1, 6)],  # star: hub h-index iterates down
        [(a, b) for a in range(5) for b in range(a + 1, 5)],  # K5
        [(i, i + 1) for i in range(8)],  # path
        # noise: duplicates, reversed duplicates, self-loop
        k4 + [(1, 0), (0, 1), (7, 7), (0, 10), (10, 0)] + tail,
    ]
    for edges in cases:
        df = spark.createDataFrame(edges, "src long, dst long")
        want = {r.node: r.coreness for r in coreness(df).collect()}
        got = {r.node: r.coreness for r in coreness_hindex(df).collect()}
        assert got == want, (edges, got, want)
