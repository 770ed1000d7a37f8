"""Exact distributed heavy hitters (frequent terms) in two passes.

The classic candidate + verify plan — the scale-honest way to get an
EXACT answer to "every term with frequency >= phi * N" without ever
shuffling the full token stream:

* **Pass 1 (candidates)**: each batch counts its own tokens exactly
  (np.unique over the batch token stream) and emits only terms with
  local count >= phi * batch_tokens. Pigeonhole guarantees this union
  is a SUPERSET of the true heavy hitters for ANY batching: if a term
  had local share < phi in every batch, its global share is < phi.
  Candidate volume is bounded by n_batches / phi — output-sized, never
  corpus-sized. Batch token totals ride along for the exact N.
* **Pass 2 (verify)**: the candidate list is broadcast ONCE via
  ray.put; batches re-tokenize and count ONLY candidate terms
  (vectorized searchsorted membership), partials merge through one
  small ``groupby(term).sum`` (group count == candidate count), and the
  driver applies the exact threshold ``cnt >= phi * N``.

The result is EXACT and batching-independent (the superset shrinks to
the same final set), so it hash-checks against a plain
``GROUP BY ... HAVING count >= phi * total`` SQL oracle — unlike a
Misra-Gries / count-min sketch, whose counts are approximate. The
pass-1 batch counting IS a Misra-Gries-style summary with the error
knob set to exactness-per-batch.

Reference role: the term-frequency dictionary the reference builds
whole (`final_ii.py` df/cf maps) answers this query only by
materializing every term; here the shuffled state is candidates only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd
from ray.data.aggregate import Sum

MAX_CANDIDATES = 2_000_000


def _batch_tokens(batch: pa.Table, tokenizer) -> np.ndarray:
    toks: list[str] = []
    for t in batch.column("text").to_pylist():
        toks.extend(tokenizer(t))
    return np.asarray(toks, dtype=object)


def heavy_hitters(
    docs: rd.Dataset,
    *,
    phi: float,
    tokenizer=None,
) -> pd.DataFrame:
    """Exact (term, cnt) for every term with cnt >= phi * total_tokens,
    sorted by term. ``docs`` needs a ``text`` column; ``tokenizer``
    defaults to the SQL-mirrorable simple [a-z0-9]+ tokenizer."""
    if not (0.0 < phi <= 1.0):
        raise ValueError(f"phi must be in (0, 1], got {phi}")
    if tokenizer is None:
        from pyfuseray.extras.textstats import simple_tokens

        tokenizer = simple_tokens

    def pass1(batch: pa.Table) -> pa.Table:
        toks = _batch_tokens(batch, tokenizer)
        n = len(toks)
        if n == 0:
            return pa.table(
                {"term": pa.array([], pa.string()),
                 "n_batch": pa.array([], pa.int64())}
            )
        terms, counts = np.unique(toks, return_counts=True)
        keep = counts >= phi * n
        # one total-marker row per batch (term='' can't collide: the
        # tokenizer never emits an empty token)
        return pa.table(
            {
                "term": pa.array(
                    np.concatenate((terms[keep], [""])), pa.string()
                ),
                "n_batch": pa.array(
                    np.concatenate(
                        (np.zeros(int(keep.sum()), dtype=np.int64), [n])
                    )
                ),
            }
        )

    p1 = docs.select_columns(["text"]).map_batches(
        pass1, batch_format="pyarrow"
    ).to_pandas()
    if len(p1) == 0:  # all-empty corpus: Ray drops columns entirely
        return pd.DataFrame({"term": pd.Series([], dtype=str),
                             "cnt": pd.Series([], dtype=np.int64)})
    total = int(p1["n_batch"].sum())
    cand = np.unique(p1.loc[p1["term"] != "", "term"].to_numpy(dtype=object))
    if len(cand) > MAX_CANDIDATES:
        raise ValueError(
            f"{len(cand)} candidates exceeds MAX_CANDIDATES "
            f"({MAX_CANDIDATES}) — raise phi or batch size"
        )
    if total == 0 or len(cand) == 0:
        return pd.DataFrame({"term": pd.Series([], dtype=str),
                             "cnt": pd.Series([], dtype=np.int64)})

    cand_ref = ray.put(cand)

    def pass2(batch: pa.Table) -> pa.Table:
        cand_arr = ray.get(cand_ref)
        toks = _batch_tokens(batch, tokenizer)
        if len(toks) == 0:
            return pa.table(
                {"term": pa.array([], pa.string()),
                 "cnt": pa.array([], pa.int64())}
            )
        pos = np.searchsorted(cand_arr, toks)
        pos = np.clip(pos, 0, len(cand_arr) - 1)
        hit = cand_arr[pos] == toks
        terms, counts = np.unique(toks[hit], return_counts=True)
        return pa.table(
            {
                "term": pa.array(terms.astype(str), pa.string()),
                "cnt": pa.array(counts.astype(np.int64)),
            }
        )

    merged = (
        docs.select_columns(["text"])
        .map_batches(pass2, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
    )
    out = merged[merged["cnt"] >= phi * total].sort_values("term")
    return out.reset_index(drop=True)
