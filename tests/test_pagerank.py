"""Integer fixed-point PageRank vs a serial numpy oracle (exact ==)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from pyfuseray.extras.pagerank import pagerank_int


def _serial(edges, node_ids, iters=3, scale=10**12, num=85, den=100):
    ids = sorted(node_ids)
    idx = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    deg = np.zeros(n, np.int64)
    for a, b in edges:
        deg[idx[a]] += 1
        deg[idx[b]] += 1
    tel = ((scale * (den - num)) // den) // n
    pr = np.full(n, scale // n, np.int64)
    for _ in range(iters):
        recv = np.zeros(n, np.int64)
        contrib = pr // np.maximum(deg, 1)
        for a, b in edges:
            recv[idx[b]] += contrib[idx[a]]
            recv[idx[a]] += contrib[idx[b]]
        pr = tel + (num * recv) // den
    return dict(zip(ids, pr.tolist()))


def _ds(edges, nodes, blocks=1):
    p = rd.from_arrow(
        pa.table(
            {
                "a": pa.array([e[0] for e in edges], pa.int64()),
                "b": pa.array([e[1] for e in edges], pa.int64()),
            }
        )
    )
    nd = rd.from_arrow(pa.table({"doc_id": pa.array(sorted(nodes), pa.int64())}))
    if blocks > 1:
        p, nd = p.repartition(blocks), nd.repartition(blocks)
    return p, nd


@pytest.mark.parametrize("seed,blocks", [(0, 1), (3, 4)])
def test_matches_serial_oracle(seed, blocks):
    rng = np.random.default_rng(seed)
    nodes = set(range(50))
    edges = set()
    while len(edges) < 120:
        x, y = rng.integers(0, 50, 2)
        if x != y:
            edges.add((min(int(x), int(y)), max(int(x), int(y))))
    edges = sorted(edges)
    want = _serial(edges, nodes)
    p, nd = _ds(edges, nodes, blocks)
    got = pagerank_int(p, nd).to_pandas().set_index("node")["pr"].to_dict()
    assert got == want


def test_isolated_nodes_get_teleport_only():
    # nodes 10 and 11 share the only edge; 99 is isolated
    p, nd = _ds([(10, 11)], {10, 11, 99})
    got = pagerank_int(p, nd).to_pandas().set_index("node")["pr"].to_dict()
    want = _serial([(10, 11)], {10, 11, 99})
    assert got == want
    scale, num, den, n = 10**12, 85, 100, 3
    assert got[99] == ((scale * (den - num)) // den) // n


def test_hub_ranks_highest():
    # star: hub 0 must outrank the leaves
    edges = [(0, i) for i in range(1, 20)]
    p, nd = _ds(edges, set(range(20)), blocks=3)
    got = pagerank_int(p, nd).to_pandas().set_index("node")["pr"].to_dict()
    assert got[0] == max(got.values())
    leaves = {got[i] for i in range(1, 20)}
    assert len(leaves) == 1  # symmetric leaves identical (integer-exact)
