"""Golden-graph tests for the native graph algorithms (FIXTURES.md §3):
6 vertices, a dangling vertex (no out-edges), two triangles, a duplicate
edge, and a self-loop, with expected values computed by an independent
pure-Python evaluator of the same declared semantics."""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from flight_delays_progetto_big_data_2024_spark.graph.algorithms import (
    degrees,
    pagerank,
    triangle_count,
    undirected_edges,
)

# directed multigraph: A→B duplicated, D self-loop, F dangling
EDGES = [
    ("A", "B"),
    ("A", "B"),  # duplicate edge
    ("B", "C"),
    ("C", "A"),
    ("A", "C"),
    ("D", "D"),  # self-loop
    ("B", "D"),
    ("D", "E"),
    ("E", "B"),
    ("E", "F"),  # F has no out-edges (dangling)
]


@pytest.fixture(scope="module")
def edge_df(spark):
    return spark.createDataFrame(EDGES, ["src", "dst"])


def py_pagerank(edges, iters=10, reset=0.15, dedup=True):
    """Independent evaluator of the declared semantics: rank=1 init,
    rank = reset + (1-reset)·Σ rank_u/outdeg_u, dangling mass dropped.
    With dedup=False, parallel edges are separate contribution channels
    (each counts in out-degree and contributes once) — pagerank()'s
    documented multigraph behavior."""
    edges = sorted(set(edges)) if dedup else sorted(edges)
    verts = sorted({x for e in edges for x in e})
    outdeg = Counter(u for u, _ in edges)
    rank = {v: 1.0 for v in verts}
    for _ in range(iters):
        mass = {v: 0.0 for v in verts}
        for u, v in edges:
            mass[v] += rank[u] / outdeg[u]
        rank = {v: reset + (1 - reset) * mass[v] for v in verts}
    return rank


def test_degrees_count_parallel_edges(edge_df):
    got = {r["id"]: (r["in_degree"], r["out_degree"]) for r in degrees(edge_df).collect()}
    # A→B twice: B in-degree includes both; self-loop counts both ways
    assert got["B"] == (3, 2)  # A,A,E in; C,D out
    assert got["A"] == (1, 3)
    assert got["D"] == (2, 2)  # B,D(self) in; D(self),E out
    assert got["F"] == (1, 0)  # dangling: no out-edges


def test_pagerank_matches_independent_evaluator(edge_df):
    distinct = edge_df.distinct()
    got = {r["id"]: r["pagerank"] for r in pagerank(distinct).collect()}
    want = py_pagerank(EDGES)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9), v


def test_pagerank_parallel_edges_are_contribution_channels(edge_df):
    # the fixture's duplicate A->B edge fed AS-IS: out-degree counts it
    # and B receives A's mass twice over (documented multigraph rule)
    got = {r["id"]: r["pagerank"] for r in pagerank(edge_df).collect()}
    want = py_pagerank(EDGES, dedup=False)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9), v
    assert want["B"] > py_pagerank(EDGES)["B"]  # the duplicate matters


def test_pagerank_local_fastpath_matches_distributed(edge_df):
    """broadcast_graph=True routes a dimension-sized graph through the
    driver-local iteration loop; its ranks must agree with both the
    distributed loop and the independent evaluator. Also pins that the
    fast-path really engaged (a 1-partition local relation, not the
    10-superstep plan) and that the weighted recurrence survives the
    local path."""
    distinct = edge_df.distinct()
    local = pagerank(distinct, broadcast_graph=True)
    assert local.rdd.getNumPartitions() == 1
    got = {r["id"]: r["pagerank"] for r in local.collect()}
    dist = {r["id"]: r["pagerank"] for r in pagerank(distinct).collect()}
    want = py_pagerank(EDGES)
    assert set(got) == set(dist) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9), v
        assert got[v] == pytest.approx(dist[v], abs=1e-9), v
    # weighted graph: both paths split rank by weight share identically
    spark = edge_df.sparkSession
    wdf = spark.createDataFrame(
        [("A", "B", 3.0), ("A", "C", 1.0), ("B", "C", 2.0), ("C", "A", 1.0)],
        ["src", "dst", "w"],
    )
    wl = {r["id"]: r["pagerank"]
          for r in pagerank(wdf, weight_col="w", broadcast_graph=True).collect()}
    wd = {r["id"]: r["pagerank"]
          for r in pagerank(wdf, weight_col="w").collect()}
    assert set(wl) == set(wd)
    for v in wd:
        assert wl[v] == pytest.approx(wd[v], abs=1e-9), v


def test_pagerank_local_fastpath_guard_falls_back(edge_df, monkeypatch):
    """A graph over the vertex ceiling must run the distributed loop
    even under broadcast_graph=True — the fast-path may never become
    the scale path. Simulated by shrinking the ceiling below the golden
    graph's vertex count."""
    from flight_delays_progetto_big_data_2024_spark.graph import algorithms

    monkeypatch.setattr(algorithms, "LOCAL_ITER_MAX_VERTICES", 2)
    got = {r["id"]: r["pagerank"]
           for r in algorithms.pagerank(edge_df.distinct(), broadcast_graph=True).collect()}
    want = py_pagerank(EDGES)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9), v


def test_undirected_canonicalization(edge_df):
    und = {(r["u"], r["v"]) for r in undirected_edges(edge_df).collect()}
    # duplicates + reverse duplicates collapsed, self-loop dropped
    assert und == {("A", "B"), ("B", "C"), ("A", "C"), ("B", "D"), ("D", "E"), ("B", "E"), ("E", "F")}


def test_triangle_count_golden(edge_df):
    got = {r["id"]: r["triangle_count"] for r in triangle_count(edge_df).collect()}
    # triangles: {A,B,C} and {B,D,E}
    assert got == {"A": 1, "B": 2, "C": 1, "D": 1, "E": 1, "F": 0}


def test_pagerank_no_edges_vertex_gets_reset_only(spark):
    # a vertex that is never a destination converges to the reset prob
    df = spark.createDataFrame([("X", "Y")], ["src", "dst"])
    got = {r["id"]: r["pagerank"] for r in pagerank(df).collect()}
    assert got["X"] == pytest.approx(0.15, abs=1e-12)


def test_connected_components_golden(spark):
    from flight_delays_progetto_big_data_2024_spark.graph.algorithms import (
        connected_components,
    )

    # chain 1-2-3-4 (diameter 3), pair {10,11}, singleton 20 via vertices
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (11, 10)], ["src", "dst"]
    )
    verts = spark.createDataFrame([(i,) for i in (1, 2, 3, 4, 10, 11, 20)], ["id"])
    got = {
        r["id"]: r["component"]
        for r in connected_components(edges, vertices=verts).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20}


def test_connected_components_matches_union_find(spark):
    """Random-ish graph vs a python union-find reference."""
    import random

    from flight_delays_progetto_big_data_2024_spark.graph.algorithms import (
        connected_components,
    )

    rng = random.Random(7)
    n = 60
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(45)]
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        parent[find(u)] = find(v)
    comp = {}
    for x in range(n):
        comp.setdefault(find(x), []).append(x)
    want = {x: min(members) for members in comp.values() for x in members}

    df = spark.createDataFrame(edges, ["src", "dst"])
    verts = spark.createDataFrame([(i,) for i in range(n)], ["id"])
    got = {
        r["id"]: r["component"]
        for r in connected_components(df, vertices=verts).collect()
    }
    assert got == want


def test_connected_components_long_chain_converges_fast(spark):
    """Pointer jumping must keep long-chain convergence sub-linear in
    the diameter. Round-13 reworked the jump to resolve against the
    PREVIOUS round's materialized labels (one execution of the
    neighbor-min join per round instead of two); the contraction is
    then Fibonacci-like rather than doubling, still geometric — a
    300-vertex chain (diameter 299) must converge inside the default
    max_iter=25, where plain propagation would need 299 rounds. Also
    asserts the labeling itself (all vertices collapse to the chain
    minimum)."""
    from flight_delays_progetto_big_data_2024_spark.graph.algorithms import (
        connected_components,
    )

    n = 300
    edges = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], ["src", "dst"])
    got = {r["id"]: r["component"] for r in connected_components(edges).collect()}
    assert got == {i: 0 for i in range(n)}


def test_shortest_hops_golden_path_graph(spark):
    """Path a->b->c->d plus a shortcut a->c and an unreachable island:
    hop counts must be the true minima and the island absent."""
    from pyspark.sql import functions as F

    from flight_delays_progetto_big_data_2024_spark.graph.algorithms import (
        shortest_hops,
    )

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("a", "c"), ("x", "y")],
        "src string, dst string",
    )
    source = spark.createDataFrame([("a",)], "id string")
    got = {r["id"]: r["hops"] for r in shortest_hops(edges, source).collect()}
    assert got == {"a": 0, "b": 1, "c": 1, "d": 2}

    # max_hops truncation
    got2 = {
        r["id"]: r["hops"]
        for r in shortest_hops(edges, source, max_hops=1).collect()
    }
    assert got2 == {"a": 0, "b": 1, "c": 1}
