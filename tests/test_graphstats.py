"""Graph analytics (extras/graphstats.py) vs serial brute-force oracles."""

import itertools

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from pyfuseray.extras.graphstats import (
    degree_histogram,
    degree_table,
    graph_stats,
    triangle_count,
)


def _edges_ds(edges: list[tuple[int, int]], blocks: int = 1) -> rd.Dataset:
    a = pa.array([e[0] for e in edges], pa.int64())
    b = pa.array([e[1] for e in edges], pa.int64())
    ds = rd.from_arrow(pa.table({"a": a, "b": b}))
    return ds.repartition(blocks) if blocks > 1 else ds


def _brute(edges: list[tuple[int, int]]):
    es = set(edges)
    deg: dict[int, int] = {}
    for x, y in es:
        deg[x] = deg.get(x, 0) + 1
        deg[y] = deg.get(y, 0) + 1
    tris = sum(
        1
        for x, y, z in itertools.combinations(sorted(deg), 3)
        if (x, y) in es and (x, z) in es and (y, z) in es
    )
    return deg, tris


def _rand_graph(rng, n_nodes, n_edges):
    seen = set()
    while len(seen) < n_edges:
        x, y = rng.integers(0, n_nodes, 2)
        if x == y:
            continue
        seen.add((min(int(x), int(y)), max(int(x), int(y))))
    return sorted(seen)


@pytest.mark.parametrize("seed,blocks", [(0, 1), (1, 3), (2, 7)])
def test_random_graph_matches_brute(seed, blocks):
    rng = np.random.default_rng(seed)
    edges = _rand_graph(rng, 40, 120)
    deg, tris = _brute(edges)
    ds = _edges_ds(edges, blocks)

    got = degree_table(ds).to_pandas().set_index("node")["degree"].to_dict()
    assert got == deg

    hist = degree_histogram(ds).to_pandas()
    want = pd.Series(list(deg.values())).value_counts().sort_index()
    assert list(hist["degree"]) == list(want.index)
    assert list(hist["n_nodes"]) == list(want.values)

    assert triangle_count(ds) == tris


def test_known_shapes():
    # K5: C(5,3)=10 triangles, all degrees 4
    k5 = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    ds = _edges_ds(k5)
    assert triangle_count(ds) == 10
    h = degree_histogram(ds).to_pandas()
    assert list(h["degree"]) == [4] and list(h["n_nodes"]) == [5]

    # path graph: zero triangles
    path = [(i, i + 1) for i in range(10)]
    assert triangle_count(_edges_ds(path)) == 0

    # two disjoint triangles with non-contiguous ids
    two = [(1, 5), (5, 9), (1, 9), (100, 200), (200, 300), (100, 300)]
    assert triangle_count(_edges_ds(two, blocks=2)) == 2


def test_graph_stats_row_and_empty():
    edges = [(1, 2), (2, 3), (1, 3), (3, 4)]
    df = graph_stats(_edges_ds(edges))
    assert df.iloc[0].to_dict() == {"n_nodes": 4, "n_edges": 4, "n_triangles": 1}
    assert all(df[c].dtype == np.int64 for c in df.columns)

    empty = _edges_ds([])
    assert triangle_count(empty) == 0
    assert degree_table(empty).count() == 0


def test_cluster_size_histogram():
    from pyfuseray.extras.graphstats import cluster_size_histogram

    # labels: cluster 1 has 3 nodes, cluster 10 has 3 nodes, three singletons
    labels = rd.from_arrow(
        pa.table(
            {
                "node": pa.array(list(range(9)), pa.int64()),
                "label": pa.array([1, 1, 1, 10, 10, 10, 7, 8, 9], pa.int64()),
            }
        )
    ).repartition(3)
    h = cluster_size_histogram(labels).to_pandas()
    assert list(h["cluster_size"]) == [1, 3]
    assert list(h["n_clusters"]) == [3, 2]


def test_batching_independence():
    rng = np.random.default_rng(7)
    edges = _rand_graph(rng, 60, 300)
    base = triangle_count(_edges_ds(edges))
    for blocks in (2, 5, 11):
        assert triangle_count(_edges_ds(edges, blocks)) == base
