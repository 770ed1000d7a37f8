"""Deterministic weighted sampling without replacement (A-Res).

Efraimidis–Spirakis reservoir sampling: each row draws a uniform
``u in (0,1)`` and the sample is the top-k rows by ``u^(1/w)`` —
equivalently by ``ln(u)/w`` (monotone) — giving inclusion probability
proportional to weight without replacement. The training-data use is
token-budget-aware corpus subsampling (weight = document length or a
quality score).

Determinism: ``u`` derives from a 60-bit md5 of the row id (the same
convention as the stratified sampler), so the sample is a pure function
of the data — reproducible across runs, batch structures and engines,
and expressible in SQL for the contract oracle. Keys are ROUNDED to
6dp with the id as tie-break before ranking (ln differs across libms in
the last ulp; rounding + a total tie order makes both engines pick the
identical sample).

Scale shape: the key stage is a vectorized ``map_batches``; selection
reuses the ``extras/grouptop`` partial top-k combiner (the shuffle
moves at most k rows per batch, never the corpus).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from pyfuseray.extras.grouptop import topk_per_group
from pyfuseray.extras.md5vec import md5_hi60_ints

_U_DENOM = float(1 << 60)


def _md5_u(ids) -> np.ndarray:
    """id -> uniform (0,1): (60-bit md5 int + 0.5) / 2^60.

    Vectorized single-block MD5 (extras/md5vec), no per-row hashlib."""
    return (md5_hi60_ints(ids) + 0.5) / _U_DENOM


def weighted_sample(
    ds: rd.Dataset,
    k: int,
    *,
    weight_col: str,
    id_col: str = "doc_id",
    key_dp: int = 6,
) -> rd.Dataset:
    """Top-k rows by the A-Res key ``ln(u)/max(w, 1)`` (rounded to
    ``key_dp``, ties by id ascending). Returns the input columns plus
    ``rank`` and ``key``."""

    def add_key(batch: pa.Table) -> pa.Table:
        u = _md5_u(batch.column(id_col))
        w = np.maximum(
            batch.column(weight_col).to_numpy(zero_copy_only=False).astype(
                np.float64
            ),
            1.0,
        )
        key = np.round(np.log(u) / w, key_dp)
        out = batch.append_column("key", pa.array(key, pa.float64()))
        return out.append_column(
            "_g", pa.array(np.zeros(batch.num_rows, np.int64))
        )

    keyed = ds.map_batches(add_key, batch_format="pyarrow")
    out = topk_per_group(
        keyed, group_col="_g", order_col="key", tie_col=id_col,
        k=k, descending=True,
    )
    return out.drop_columns(["_g"])
