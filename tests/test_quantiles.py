"""Histogram-compressed grouped quantiles == numpy's linear-interp
quantile on the raw multiset (ties, singleton groups, skewed counts)."""

import numpy as np
import pandas as pd
import ray.data as rd

from pyfuseray.extras.quantiles import grouped_quantiles


def test_grouped_quantiles_match_numpy(ray_session):
    rng = np.random.default_rng(11)
    n = 3000
    df = pd.DataFrame(
        {
            # heavy ties: integer values on a small grid
            "g": rng.choice(["aa", "bb", "cc", "dd"], size=n,
                            p=[0.7, 0.2, 0.09, 0.01]),
            "v": rng.integers(0, 40, size=n).astype(np.int64),
        }
    )
    # a singleton group
    df = pd.concat(
        [df, pd.DataFrame({"g": ["solo"], "v": [7]})], ignore_index=True
    )
    ds = rd.from_pandas(df).repartition(7)
    got = grouped_quantiles(ds, group_col="g", value_col="v",
                            qs=(0.1, 0.5, 0.9))
    got = got.set_index("g").sort_index()
    for g, sub in df.groupby("g"):
        want = np.quantile(sub["v"].to_numpy(dtype=float), [0.1, 0.5, 0.9])
        np.testing.assert_allclose(
            got.loc[g, ["q10", "q50", "q90"]].to_numpy(dtype=float),
            want, rtol=0, atol=1e-12,
        )


def test_group_quantile_threshold_filter(ray_session):
    """filter_by_group_quantile == the serial rule: keep rows whose
    value is >= the group's discrete q-quantile (element at rank
    ceil(q*n)-1 — DuckDB quantile_disc), ties at the threshold kept."""
    from pyfuseray.extras.quantiles import (
        filter_by_group_quantile,
        group_quantile_thresholds,
    )

    rng = np.random.default_rng(23)
    n = 2500
    df = pd.DataFrame(
        {
            "g": rng.choice(["en", "de", "fr"], size=n, p=[0.8, 0.15, 0.05]),
            "v": np.round(rng.random(size=n), 2),  # heavy ties at 2dp
            "id": np.arange(n, dtype=np.int64),
        }
    )
    df = pd.concat(
        [df, pd.DataFrame({"g": ["solo"], "v": [0.5], "id": [n]})],
        ignore_index=True,
    )
    ds = rd.from_pandas(df).repartition(9)

    for q in (0.0, 0.37, 0.5, 1.0):
        th = group_quantile_thresholds(ds, group_col="g", value_col="v", q=q)
        want_ids: set[int] = set()
        for g, sub in df.groupby("g"):
            v = np.sort(sub["v"].to_numpy(dtype=float))
            rank = max(int(np.ceil(q * v.size)) - 1, 0)
            thr = v[rank]
            assert th.set_index("g").loc[g, "threshold"] == thr, (g, q)
            want_ids |= set(sub.loc[sub["v"] >= thr, "id"].tolist())
        got = filter_by_group_quantile(
            ds, group_col="g", value_col="v", q=q
        ).to_pandas()
        assert set(got["id"].tolist()) == want_ids, q
        # singleton group always keeps its one row
        assert (got["g"] == "solo").sum() == 1
