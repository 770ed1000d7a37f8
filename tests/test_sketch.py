"""Count-Min approximate heavy hitters (extras/sketch.py): CM
guarantees + recall vs the exact two-pass operator."""

from __future__ import annotations

import collections
import re

import numpy as np
import pyarrow as pa
import ray.data as rd

from pyfuseray.extras.sketch import approx_heavy_hitters

_TOKEN = re.compile(r"[a-z0-9]+")


def _zipf_corpus(n_docs: int = 300, seed: int = 21):
    rng = np.random.default_rng(seed)
    vocab = [f"tok{i}" for i in range(800)]
    p = 1.0 / np.arange(1, len(vocab) + 1)
    p /= p.sum()
    rows = []
    for d in range(n_docs):
        words = rng.choice(vocab, size=int(rng.integers(30, 90)), p=p)
        rows.append({"doc_id": d, "text": " ".join(words)})
    return rows


def _exact_counts(rows):
    c: collections.Counter = collections.Counter()
    for r in rows:
        c.update(_TOKEN.findall(r["text"].lower()))
    return c


def test_cm_superset_and_overestimate(ray_session):
    rows = _zipf_corpus()
    ds = rd.from_items(rows).repartition(7)
    exact = _exact_counts(rows)
    total = sum(exact.values())
    theta = 0.005

    got = approx_heavy_hitters(ds, threshold_frac=theta, width=16384)
    got_map = dict(zip(got.term, got.est_count))

    true_hh = {t for t, n in exact.items() if n >= theta * total}
    # recall 1.0: every true heavy hitter surfaces (pigeonhole superset
    # + one-sided estimates can only ADD mass)
    assert true_hh <= set(got_map), true_hh - set(got_map)
    # CM is one-sided: est >= true for every reported term
    for t, est in got_map.items():
        assert est >= exact[t], (t, est, exact[t])
    # eps*N error bound (eps = e/width) holds for the reported terms —
    # generous factor 4 slack over the probabilistic bound
    eps_n = np.e / 16384 * total
    for t, est in got_map.items():
        assert est - exact[t] <= 4 * eps_n, (t, est, exact[t])


def test_cm_matches_exact_operator_at_threshold(ray_session):
    from pyfuseray.extras.heavyhitters import heavy_hitters

    rows = _zipf_corpus(n_docs=200, seed=4)
    ds = rd.from_items(rows).repartition(5)
    theta = 0.01
    exact_out = heavy_hitters(ds, phi=theta)
    approx_out = approx_heavy_hitters(ds, threshold_frac=theta, width=32768)
    # every exactly-heavy term is reported by the sketch path
    assert set(exact_out.term) <= set(approx_out.term)


def test_cm_batching_independent_superset(ray_session):
    rows = _zipf_corpus(n_docs=150, seed=9)
    exact = _exact_counts(rows)
    total = sum(exact.values())
    theta = 0.008
    true_hh = {t for t, n in exact.items() if n >= theta * total}
    for parts in (1, 11):
        ds = rd.from_items(rows).repartition(parts)
        got = approx_heavy_hitters(ds, threshold_frac=theta)
        assert true_hh <= set(got.term), parts
