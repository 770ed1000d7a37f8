"""Connected components: driver and distributed routes identical; the
vectorized contraction matches a brute-force reference on random graphs.
"""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from pyfuseray.extras.components import (
    connected_components,
    keep_canonical,
    label_pairs_numpy,
)


def _brute_labels(a, b, universe):
    # floyd-warshall-free reference: repeated relaxation over edges
    lab = {n: n for n in universe}
    for x, y in zip(a, b):
        lab.setdefault(x, x)
        lab.setdefault(y, y)
    changed = True
    while changed:
        changed = False
        for x, y in zip(a, b):
            m = min(lab[x], lab[y])
            if lab[x] != m or lab[y] != m:
                lab[x] = lab[y] = m
                changed = True
    return lab


def test_label_pairs_numpy_random_graphs():
    rng = np.random.default_rng(7)
    for trial in range(10):
        n = int(rng.integers(2, 60))
        e = int(rng.integers(1, 80))
        a = rng.integers(0, n, e) * 13  # sparse ids
        b = rng.integers(0, n, e) * 13
        keys, labs = label_pairs_numpy(a.astype(np.int64), b.astype(np.int64))
        ref = _brute_labels(a.tolist(), b.tolist(), set(a) | set(b))
        got = dict(zip(keys.tolist(), labs.tolist()))
        assert got == ref


def test_chain_star_cycle_with_isolated(ray_session):
    # chain 0..9, star 100<->101..110, cycle 200..204, isolated 300/301
    a = list(range(9)) + [100] * 10 + [200, 201, 202, 203, 204]
    b = list(range(1, 10)) + list(range(101, 111)) + [201, 202, 203, 204, 200]
    pairs = rd.from_pandas(pd.DataFrame({"a": a, "b": b}))
    universe = sorted(set(a) | set(b) | {300, 301})
    nodes = rd.from_pandas(pd.DataFrame({"doc_id": universe}))
    out = (
        connected_components(pairs, nodes=nodes, mode="driver")
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    exp = {n: 0 for n in range(10)}
    exp.update({n: 100 for n in range(100, 111)})
    exp.update({n: 200 for n in range(200, 205)})
    exp.update({300: 300, 301: 301})
    assert dict(zip(out["node"], out["label"])) == exp


def test_driver_and_distributed_routes_agree(ray_session):
    # chain long enough that pointer jumping matters (several rounds,
    # kept short: each distributed round costs ~8 s of Ray fixed
    # overhead) + a clique + isolated node
    a = list(range(0, 12)) + [500, 500, 501]
    b = list(range(1, 13)) + [501, 502, 502]
    pairs = rd.from_pandas(pd.DataFrame({"a": a, "b": b}))
    nodes = rd.from_pandas(
        pd.DataFrame({"doc_id": sorted(set(a) | set(b) | {900})})
    )
    drv = (
        connected_components(pairs, nodes=nodes, mode="driver")
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    dist = (
        connected_components(pairs, nodes=nodes, mode="distributed")
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(drv, dist)
    assert (drv[drv.node <= 12].label == 0).all()
    assert (drv[(drv.node >= 500) & (drv.node <= 502)].label == 500).all()
    assert drv[drv.node == 900].label.item() == 900


def test_keep_canonical_routes_agree(ray_session):
    # clusters {1,2,3}, {10,11}; 5/6/7 untouched -> survivors 1,5,6,7,10
    pairs = rd.from_pandas(pd.DataFrame({"a": [1, 2, 10], "b": [2, 3, 11]}))
    docs = rd.from_pandas(
        pd.DataFrame(
            {"doc_id": [1, 2, 3, 5, 6, 7, 10, 11],
             "text": [f"t{i}" for i in range(8)]}
        )
    )
    bcast = (
        keep_canonical(docs, pairs)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    anti = (
        keep_canonical(docs, pairs, broadcast_max_drop=0)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert bcast["doc_id"].tolist() == [1, 5, 6, 7, 10]
    pd.testing.assert_frame_equal(bcast, anti)
    # no pairs -> corpus unchanged
    empty = rd.from_pandas(pd.DataFrame({"a": pd.Series([], dtype="int64"),
                                         "b": pd.Series([], dtype="int64")}))
    out = keep_canonical(docs, empty).to_pandas()
    assert sorted(out["doc_id"]) == [1, 2, 3, 5, 6, 7, 10, 11]


def test_empty_pairs_all_singletons(ray_session):
    pairs = rd.from_pandas(pd.DataFrame({"a": pd.Series([], dtype="int64"),
                                         "b": pd.Series([], dtype="int64")}))
    nodes = rd.from_pandas(pd.DataFrame({"doc_id": [3, 7, 11]}))
    out = connected_components(pairs, nodes=nodes).to_pandas()
    assert dict(zip(out["node"], out["label"])) == {3: 3, 7: 7, 11: 11}
