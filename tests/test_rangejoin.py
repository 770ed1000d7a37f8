"""Block+halo windowed range self-join == brute-force O(n^2) counts,
including rows exactly at the window edge, at block boundaries, with
duplicate timestamps, and across multiple keys."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from pyfuseray.extras.rangejoin import neighbor_count_join


def _brute(df, w):
    t = df["t"].to_numpy()
    k = df["k"].to_numpy()
    out = []
    for i in range(len(df)):
        out.append(
            int(((k == k[i]) & (np.abs(t - t[i]) <= w)).sum()) - 1
        )
    return dict(zip(df["rid"], out))


@pytest.mark.parametrize("seed", [1, 2])
def test_neighbor_counts_match_brute(ray_session, seed):
    rng = np.random.default_rng(seed)
    n = 400
    w, bsz = 50, 100
    df = pd.DataFrame(
        {
            "rid": np.arange(n, dtype=np.int64),
            "k": rng.choice(["x", "y", "z"], size=n),
            # cluster timestamps around block edges; force exact-edge
            # distances and duplicate ts
            "t": np.concatenate(
                [
                    rng.integers(0, 1000, n - 6),
                    [100, 150, 200, 200, 249, 301],
                ]
            ).astype(np.int64),
        }
    )
    ds = rd.from_pandas(df).repartition(5)
    got = (
        neighbor_count_join(
            ds, key_col="k", ts_col="t", id_col="rid",
            window_us=w, block_us=bsz,
        )
        .to_pandas()
    )
    want = _brute(df, w)
    assert dict(zip(got["rid"], got["n_neighbors"])) == want
    assert len(got) == n


def test_neighbor_counts_rejects_thin_blocks(ray_session):
    ds = rd.from_pandas(pd.DataFrame({"rid": [1], "k": ["a"], "t": [0]}))
    with pytest.raises(ValueError):
        neighbor_count_join(ds, key_col="k", ts_col="t", id_col="rid",
                            window_us=100, block_us=50)
