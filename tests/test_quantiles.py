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
