"""asof_join and topk_per_group vs brute-force oracles, including the
variants the DuckDB contract entries don't cover (forward direction,
strict inequality, ascending order, key-boundary isolation)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from pyfuseray.extras.asof import asof_join
from pyfuseray.extras.grouptop import topk_per_group


def _mk(n_keys=7, n_left=300, n_right=120, seed=0):
    rng = np.random.default_rng(seed)
    left = pa.table(
        {
            "lid": np.arange(n_left, dtype=np.int64),
            "k": rng.integers(0, n_keys, n_left).astype(np.int64),
            "t": rng.integers(0, 1000, n_left).astype(np.int64),
        }
    )
    right = pa.table(
        {
            "k": rng.integers(0, n_keys, n_right).astype(np.int64),
            "t": rng.integers(0, 1000, n_right).astype(np.int64),
            "pay": rng.integers(0, 10**6, n_right).astype(np.int64),
        }
    )
    return left, right


def _brute_asof(left, right, allow_exact, direction):
    lt = left.to_pydict()
    rt = right.to_pydict()
    out = {}
    for lid, k, t in zip(lt["lid"], lt["k"], lt["t"]):
        best = None
        for rk, rt_, pay in zip(rt["k"], rt["t"], rt["pay"]):
            if rk != k:
                continue
            if direction == "backward":
                ok = rt_ <= t if allow_exact else rt_ < t
                better = best is None or rt_ > best[0]
            else:
                ok = rt_ >= t if allow_exact else rt_ > t
                better = best is None or rt_ < best[0]
            if ok and better:
                best = (rt_, pay)
        if best is not None:
            out[lid] = best[0]  # match on ts only: payload can tie
    return out


@pytest.mark.parametrize("allow_exact", [True, False])
@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_matches_brute(allow_exact, direction):
    left, right = _mk()
    got = asof_join(
        rd.from_arrow(left),
        rd.from_arrow(right),
        on="t",
        by="k",
        right_cols=["t", "pay"],
        allow_exact=allow_exact,
        direction=direction,
    ).to_pandas()
    want = _brute_asof(left, right, allow_exact, direction)
    got_map = dict(zip(got["lid"], got["t_right"]))
    assert got_map == want
    # dtypes survive the union null-padding (no float64 widening)
    assert str(got["lid"].dtype) == "int64"
    assert str(got["pay"].dtype) == "int64"


def test_asof_no_cross_key_leak():
    # key 1 has purchases, key 2 has none: key-2 events must not match
    left = pa.table({"lid": [0, 1], "k": [1, 2], "t": [100, 100]})
    right = pa.table({"k": [1], "t": [50], "pay": [7]})
    out = asof_join(
        rd.from_arrow(left), rd.from_arrow(right),
        on="t", by="k", right_cols=["t", "pay"],
    ).to_pandas()
    assert out["lid"].tolist() == [0]
    assert out["t_right"].tolist() == [50]


def test_asof_collision_suffix():
    left = pa.table({"lid": [0], "k": [1], "t": [10], "pay": [1]})
    right = pa.table({"k": [1], "t": [5], "pay": [2]})
    out = asof_join(
        rd.from_arrow(left), rd.from_arrow(right),
        on="t", by="k", right_cols=["t", "pay"],
    ).to_pandas()
    assert out["pay"].tolist() == [1]
    assert out["pay_right"].tolist() == [2]


@pytest.mark.parametrize("descending", [True, False])
def test_topk_per_group_matches_brute(descending):
    rng = np.random.default_rng(1)
    n = 500
    tbl = pa.table(
        {
            "g": rng.integers(0, 9, n).astype(np.int64),
            "v": rng.integers(0, 40, n).astype(np.int64),  # many ties
            "i": np.arange(n, dtype=np.int64),
        }
    )
    k = 4
    got = (
        topk_per_group(
            rd.from_arrow(tbl), group_col="g", order_col="v",
            tie_col="i", k=k, descending=descending,
        )
        .to_pandas()
        .sort_values(["g", "rank"])
        .reset_index(drop=True)
    )
    rows = sorted(
        zip(tbl["g"].to_pylist(), tbl["v"].to_pylist(), tbl["i"].to_pylist()),
        key=lambda r: (r[0], -r[1] if descending else r[1], r[2]),
    )
    want = []
    seen = {}
    for g, v, i in rows:
        r = seen.get(g, 0)
        if r < k:
            want.append((g, r, v, i))
            seen[g] = r + 1
    assert list(zip(got["g"], got["rank"], got["v"], got["i"])) == want


def test_topk_string_groups():
    tbl = pa.table(
        {
            "g": ["a", "b", "a", "b", "a"],
            "v": [3, 1, 5, 2, 4],
            "i": [0, 1, 2, 3, 4],
        }
    )
    got = (
        topk_per_group(
            rd.from_arrow(tbl), group_col="g", order_col="v", tie_col="i", k=2
        )
        .to_pandas()
        .sort_values(["g", "rank"])
    )
    assert list(zip(got["g"], got["v"])) == [("a", 5), ("a", 4), ("b", 2), ("b", 1)]
