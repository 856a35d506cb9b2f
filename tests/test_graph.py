"""PageRank: checked against a local dense power iteration with the
identical formulation (uniform teleport, dangling redistribution)."""

from __future__ import annotations

import numpy as np
import pytest

from udacity_data_engineering_capstone_project_spark.operators.graph import pagerank


def _reference_pagerank(edges, n, damping=0.85, iters=60):
    M = np.zeros((n, n))
    for u, v in edges:
        M[v, u] += 1.0
    deg = M.sum(axis=0)
    with np.errstate(divide="ignore", invalid="ignore"):
        M = np.where(deg > 0, M / deg, 0.0)
    dangling = deg == 0
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        r = (1 - damping) / n + damping * (M @ r + r[dangling].sum() / n)
    return r


EDGES = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (1, 3), (4, 0)]
# node 5 appears only as a destination; node 4 has one out-edge


def test_pagerank_matches_dense_reference(spark):
    edges = EDGES + [(3, 5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(df, max_iter=60, tol=1e-12).collect()}
    exp = _reference_pagerank(edges, 6)
    assert set(got) == set(range(6))
    for i in range(6):
        assert got[i] == pytest.approx(exp[i], abs=1e-6)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_dangling_mass_conserved(spark):
    # 5 is a pure sink: without dangling redistribution ranks leak
    df = spark.createDataFrame([(0, 5), (1, 5), (2, 5)], "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(df, max_iter=40).collect()}
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-6)
    assert got[5] > got[0]


def test_pagerank_parallel_edges_weighted(spark):
    # two edges 0->1 and one 0->2: 1 receives twice 2's share from 0
    df = spark.createDataFrame([(0, 1), (0, 1), (0, 2)], "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(df, max_iter=40).collect()}
    exp = _reference_pagerank([(0, 1), (0, 1), (0, 2)], 3)
    for i in range(3):
        assert got[i] == pytest.approx(exp[i], abs=1e-6)


def test_pagerank_empty(spark):
    df = spark.createDataFrame([], "src long, dst long")
    assert pagerank(df).count() == 0


def test_triangle_count_known_graphs(spark):
    from udacity_data_engineering_capstone_project_spark.operators.graph import triangle_count

    def tc(edges):
        df = spark.createDataFrame(edges, "src string, dst string")
        return {r["node"]: r["n_triangles"] for r in triangle_count(df).collect()}

    # single triangle
    assert tc([("a", "b"), ("b", "c"), ("c", "a")]) == {"a": 1, "b": 1, "c": 1}
    # square: no triangles, all nodes reported with 0
    assert tc([("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")]) == {
        "a": 0, "b": 0, "c": 0, "d": 0
    }
    # K4: 4 triangles, each node in 3
    k4 = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d")]
    assert tc(k4) == {"a": 3, "b": 3, "c": 3, "d": 3}
    # duplicates / reversed edges / self-loops don't change anything
    noisy = k4 + [("b", "a"), ("c", "c"), ("a", "b"), ("d", "c")]
    assert tc(noisy) == {"a": 3, "b": 3, "c": 3, "d": 3}


def test_triangle_count_matches_bruteforce_random(spark):
    import itertools
    import numpy as np

    from udacity_data_engineering_capstone_project_spark.operators.graph import triangle_count

    rng = np.random.RandomState(11)
    n = 40
    edges = [
        (f"n{i}", f"n{j}")
        for i in range(n)
        for j in range(i + 1, n)
        if rng.rand() < 0.2
    ]
    adj = {k: set() for k in {x for e in edges for x in e}}
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    expected = {k: 0 for k in adj}
    for a, b, c in itertools.combinations(sorted(adj), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            expected[a] += 1
            expected[b] += 1
            expected[c] += 1
    got = {
        r["node"]: r["n_triangles"]
        for r in triangle_count(
            spark.createDataFrame(edges, "src string, dst string").repartition(8)
        ).collect()
    }
    assert got == expected


def test_clustering_coefficient(spark):
    from udacity_data_engineering_capstone_project_spark.operators.graph import (
        clustering_coefficient,
    )

    # kite: K4 on a,b,c,d plus a pendant e attached to d
    edges = [
        ("a", "b"), ("a", "c"), ("a", "d"),
        ("b", "c"), ("b", "d"), ("c", "d"), ("d", "e"),
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        r["node"]: (r["degree"], r["n_triangles"], r["coefficient"])
        for r in clustering_coefficient(df).collect()
    }
    assert got["a"] == (3, 3, 1.0)  # all of a's wedges close
    assert got["b"] == (3, 3, 1.0)
    assert got["c"] == (3, 3, 1.0)
    # d has degree 4, 3 triangles of 6 possible wedges
    assert got["d"] == (4, 3, 0.5)
    assert got["e"] == (1, 0, 0.0)  # degree < 2


def test_triangle_count_keeps_self_loop_only_nodes(spark):
    from udacity_data_engineering_capstone_project_spark.operators.graph import (
        clustering_coefficient,
        triangle_count,
    )

    edges = spark.createDataFrame(
        [("a", "a"), ("b", "c"), ("c", "d"), ("b", "d")], "src string, dst string"
    )
    got = {r["node"]: r["n_triangles"] for r in triangle_count(edges).collect()}
    # a's only edge is a self-loop: still a node of the graph, 0 triangles
    assert got == {"a": 0, "b": 1, "c": 1, "d": 1}
    cc = {
        r["node"]: (r["degree"], r["coefficient"])
        for r in clustering_coefficient(edges).collect()
    }
    assert cc["a"] == (0, 0.0)
    assert cc["b"] == (2, 1.0)


def _reference_ppr(edges, n, seeds, damping=0.85, iters=60):
    M = np.zeros((n, n))
    for u, v in edges:
        M[v, u] += 1.0
    deg = M.sum(axis=0)
    with np.errstate(divide="ignore", invalid="ignore"):
        M = np.where(deg > 0, M / deg, 0.0)
    dangling = deg == 0
    reset = np.zeros(n)
    reset[list(seeds)] = 1.0 / len(seeds)
    r = reset.copy()
    for _ in range(iters):
        r = (1 - damping) * reset + damping * (M @ r + r[dangling].sum() * reset)
    return r


def test_personalized_pagerank_matches_dense_reference(spark):
    from udacity_data_engineering_capstone_project_spark.operators.graph import (
        personalized_pagerank,
    )

    edges = EDGES + [(3, 5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["rank"]
        for r in personalized_pagerank(
            df, [0, 3], max_iter=60, tol=1e-12
        ).collect()
    }
    exp = _reference_ppr(edges, 6, [0, 3])
    for i in range(6):
        assert got[i] == pytest.approx(exp[i], abs=1e-6)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    # proximity semantics: the seeds' neighborhood outranks the far side
    assert got[0] > got[5]


def test_personalized_pagerank_isolated_seed_and_locality(spark):
    from udacity_data_engineering_capstone_project_spark.operators.graph import (
        personalized_pagerank,
    )

    # two disjoint triangles; seed in the first one only
    tri_a = [(0, 1), (1, 2), (2, 0)]
    tri_b = [(10, 11), (11, 12), (12, 10)]
    df = spark.createDataFrame(tri_a + tri_b, "src long, dst long")
    got = {
        r["node"]: r["rank"]
        for r in personalized_pagerank(df, [0], max_iter=60).collect()
    }
    # mass never reaches the unlinked community
    assert got[10] == got[11] == got[12] == 0.0
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)

    # a seed absent from the edge list is a dangling teleport target:
    # it holds rank itself and feeds nothing
    got2 = {
        r["node"]: r["rank"]
        for r in personalized_pagerank(df, [99], max_iter=40).collect()
    }
    assert 99 in got2 and got2[99] == pytest.approx(1.0, abs=1e-9)
    import pytest as _pt

    with _pt.raises(ValueError):
        personalized_pagerank(df, [])


def test_ppr_dangling_fold_row_bound_falls_back_to_classic(spark):
    """The dangling fold inflates the weight table by |dangling| x
    n_seeds virtual rows; `dangling_fold_max_rows` must bound that
    (VERDICT r13 #5). With the cap at 0 the classic per-round dangling
    aggregate runs instead, and both paths agree on every rank (they
    are algebraically equivalent; drift is last-ULP only)."""
    from udacity_data_engineering_capstone_project_spark.operators.graph import (
        personalized_pagerank,
    )

    # chain with a dangling tail: 2 and 5 have no out-edges
    edges = [(0, 1), (1, 2), (0, 3), (3, 4), (4, 5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    folded = {
        r["node"]: r["rank"]
        for r in personalized_pagerank(df, [0], max_iter=20).collect()
    }
    classic = {
        r["node"]: r["rank"]
        for r in personalized_pagerank(
            df, [0], max_iter=20, dangling_fold_max_rows=0
        ).collect()
    }
    assert set(folded) == set(classic)
    for n in folded:
        assert folded[n] == pytest.approx(classic[n], abs=1e-12)
    assert sum(classic.values()) == pytest.approx(1.0, abs=1e-9)


def test_label_propagation_unroll_invariance(spark):
    """Round chaining (r14) must be a pure execution-strategy change:
    any unroll width returns byte-identical labels, including when the
    batch boundary passes a converged fixed point."""
    from udacity_data_engineering_capstone_project_spark.operators.graph import (
        label_propagation,
    )

    def clique(ids):
        return [(a, b) for a in ids for b in ids if a < b]

    edges = clique(range(5)) + clique(range(10, 15)) + [(4, 10)]
    df = spark.createDataFrame(edges, "src long, dst long")
    base = {
        r["node"]: r["label"]
        for r in label_propagation(df, max_iter=7, unroll=1).collect()
    }
    for unroll in (2, 3, 7):
        got = {
            r["node"]: r["label"]
            for r in label_propagation(df, max_iter=7, unroll=unroll).collect()
        }
        assert got == base, f"unroll={unroll} diverged"


def test_label_propagation_splits_bridged_cliques(spark):
    from udacity_data_engineering_capstone_project_spark.operators.graph import (
        label_propagation,
    )

    def clique(ids):
        return [(a, b) for a in ids for b in ids if a < b]

    # two 5-cliques joined by ONE bridge: one connected component,
    # two communities
    edges = clique(range(5)) + clique(range(10, 15)) + [(4, 10)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["label"] for r in label_propagation(df).collect()}
    a_labels = {got[i] for i in range(5)}
    b_labels = {got[i] for i in range(10, 15)}
    assert len(a_labels) == 1 and len(b_labels) == 1
    assert a_labels != b_labels
    # determinism: a second run returns the identical assignment
    again = {r["node"]: r["label"] for r in label_propagation(df).collect()}
    assert again == got


def test_label_propagation_bounded_on_bipartite_oscillator(spark):
    from udacity_data_engineering_capstone_project_spark.operators.graph import (
        label_propagation,
    )

    # K2,2: synchronous LPA can oscillate; max_iter must bound it and
    # the result must still be a valid (node -> label) map
    df = spark.createDataFrame(
        [(0, 2), (0, 3), (1, 2), (1, 3)], "src long, dst long"
    )
    out = label_propagation(df, max_iter=4).collect()
    assert {r["node"] for r in out} == {0, 1, 2, 3}
    assert all(r["label"] in (0, 1, 2, 3) for r in out)
