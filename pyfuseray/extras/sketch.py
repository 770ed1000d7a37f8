"""Count-Min sketch: single-pass approximate heavy hitters.

``extras/heavyhitters.py`` finds EXACT heavy hitters in two passes
(pigeonhole candidates, then a broadcast-verified recount).
``approx_heavy_hitters`` here is the bounded-memory SINGLE-pass tier
(Cormode & Muthukrishnan 2005): every batch contributes

- a local Count-Min sketch (``depth x width`` int64 counters,
  vectorized bincount updates over the batch's unique terms), and
- its pigeonhole candidates (terms with local count >= theta x local
  tokens — if a term holds a theta fraction globally it holds it in at
  least one batch, so the union is a guaranteed superset; same
  argument the exact operator uses).

Sketches are ASSOCIATIVE (elementwise sums), so they combine in a
tree: one map_batches level sums sketch rows, the driver folds the
(bounded) remainder. Estimates are the CM minimum over rows —
one-sided: ``est >= true`` always, ``est <= true + eps * N`` with
probability ``1 - delta`` for ``width = ceil(e/eps)``,
``depth = ceil(ln(1/delta))``. No SQL oracle (approximate by design);
``tests/test_sketch.py`` pins the superset/overestimate guarantees and
recall 1.0 vs the exact operator on zipfian data.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

_TOKEN = re.compile(r"[a-z0-9]+")

_MERSENNE = (1 << 61) - 1
_DEPTH = 4


def _hash_params(depth: int, seed: int = 17) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=depth, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=depth, dtype=np.uint64)
    return a, b


def _term_hash64(terms: list[str]) -> np.ndarray:
    """Process-stable 64-bit term hash (md5 prefix, the simhash
    convention)."""
    return np.fromiter(
        (
            int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big")
            for t in terms
        ),
        dtype=np.uint64,
        count=len(terms),
    )


def _rows(h64: np.ndarray, width: int, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(depth, n) bucket indices via universal hashing mod width."""
    vals = (a[:, None] * (h64[None, :] % _MERSENNE) + b[:, None]) % np.uint64(
        _MERSENNE
    )
    return (vals % np.uint64(width)).astype(np.int64)


def approx_heavy_hitters(
    ds: rd.Dataset,
    *,
    text_col: str = "text",
    threshold_frac: float = 0.001,
    width: int = 16384,
    depth: int = _DEPTH,
    seed: int = 17,
) -> pd.DataFrame:
    """(term, est_count) for every candidate term whose CM estimate is
    >= threshold_frac of the total token count — one streaming pass,
    driver state O(depth x width + candidates)."""
    a, b = _hash_params(depth, seed)

    def batch_sketch(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        counts: dict[str, int] = {}
        total = 0
        for t in texts:
            for tok in _TOKEN.findall((t or "").lower()):
                counts[tok] = counts.get(tok, 0) + 1
                total += 1
        terms = list(counts)
        c = np.fromiter(counts.values(), dtype=np.int64, count=len(terms))
        sk = np.zeros((depth, width), dtype=np.int64)
        cand: list[str] = []
        if terms:
            rows = _rows(_term_hash64(terms), width, a, b)
            for d in range(depth):
                sk[d] = np.bincount(rows[d], weights=c, minlength=width)
            # pigeonhole: local candidates at the global threshold frac
            thresh = max(1.0, threshold_frac * total)
            cand = [t for t, n in counts.items() if n >= thresh]
        return pa.table(
            {
                "sketch": pa.array([sk.ravel()], pa.list_(pa.int64())),
                "total": pa.array([total], pa.int64()),
                "candidates": pa.array([cand], pa.list_(pa.string())),
            }
        )

    def combine(batch: pa.Table) -> pa.Table:
        sks = np.asarray(batch.column("sketch").to_pylist(), dtype=np.int64)
        cands = sorted(
            {t for row in batch.column("candidates").to_pylist() for t in row}
        )
        return pa.table(
            {
                "sketch": pa.array([sks.sum(axis=0)], pa.list_(pa.int64())),
                "total": pa.array(
                    [int(np.sum(batch.column("total").to_numpy(
                        zero_copy_only=False)))],
                    pa.int64(),
                ),
                "candidates": pa.array([cands], pa.list_(pa.string())),
            }
        )

    # tree reduce: per-batch sketches -> one combine level -> driver fold
    parts = (
        ds.map_batches(batch_sketch, batch_format="pyarrow", batch_size=1024)
        .map_batches(combine, batch_format="pyarrow", batch_size=64)
        .to_pandas()
    )
    sketch = np.zeros(depth * width, dtype=np.int64)
    total = 0
    cands: set[str] = set()
    for r in parts.itertuples():
        sketch += np.asarray(r.sketch, dtype=np.int64)
        total += int(r.total)
        cands.update(r.candidates)
    sketch = sketch.reshape(depth, width)

    if not cands or total == 0:
        return pd.DataFrame(columns=["term", "est_count"])
    terms = sorted(cands)
    rows = _rows(_term_hash64(terms), width, a, b)
    est = np.min(
        np.stack([sketch[d][rows[d]] for d in range(depth)]), axis=0
    )
    thresh = threshold_frac * total
    keep = est >= thresh
    out = pd.DataFrame({"term": np.asarray(terms)[keep],
                        "est_count": est[keep].astype(np.int64)})
    return out.sort_values(
        ["est_count", "term"], ascending=[False, True]
    ).reset_index(drop=True)
