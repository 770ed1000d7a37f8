"""Two-pass exact heavy hitters == brute-force counts at every
batching; the pass-1 candidate rule is a true superset under skew."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from pyfuseray.extras.heavyhitters import heavy_hitters


def _mk_docs(rng, n_docs=60):
    # zipf-ish vocabulary with a few guaranteed-heavy terms
    vocab = [f"w{i}" for i in range(50)]
    rows = []
    for _ in range(n_docs):
        k = int(rng.integers(5, 40))
        probs = 1.0 / np.arange(1, len(vocab) + 1)
        probs /= probs.sum()
        rows.append(" ".join(rng.choice(vocab, size=k, p=probs)))
    return pd.DataFrame({"text": rows})


def _brute(df, phi):
    toks = []
    for t in df["text"]:
        toks.extend(t.lower().split())
    terms, counts = np.unique(np.asarray(toks, dtype=object),
                              return_counts=True)
    keep = counts >= phi * len(toks)
    return dict(zip(terms[keep].tolist(), counts[keep].tolist()))


@pytest.mark.parametrize("nparts", [1, 9])
def test_heavy_hitters_exact_any_batching(ray_session, nparts):
    rng = np.random.default_rng(5)
    df = _mk_docs(rng)
    ds = rd.from_pandas(df).repartition(nparts)
    got = heavy_hitters(ds, phi=0.02)
    want = _brute(df, 0.02)
    assert dict(zip(got["term"], got["cnt"])) == want
    assert got["term"].is_monotonic_increasing


def test_heavy_hitters_guards(ray_session):
    ds = rd.from_pandas(pd.DataFrame({"text": ["a a b"]}))
    with pytest.raises(ValueError):
        heavy_hitters(ds, phi=0.0)
    out = heavy_hitters(
        rd.from_pandas(pd.DataFrame({"text": ["", None]})), phi=0.5
    )
    assert len(out) == 0
