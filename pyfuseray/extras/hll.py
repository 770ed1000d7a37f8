"""HyperLogLog: single-pass approximate distinct counting.

The exact vocabulary size comes from the df table (a term-keyed
shuffle); this is the shuffle-FREE tier: estimate distinct terms (or
distinct values of any column) in one streaming pass with O(2^p)
driver state (Flajolet et al. 2007, standard error ~1.04/sqrt(2^p) —
p=12 → 4096 registers, ~1.6%).

Register arrays merge by elementwise MAX (associative), so they
combine exactly like the Count-Min sketch in ``extras/sketch.py``:
per-batch registers -> one map_batches combine level -> driver fold of
the bounded remainder. Hashing is the vectorized single-block MD5 from
``extras/md5vec`` (60 usable bits: p index bits + q = 60-p rank bits),
process-stable across workers.

No SQL oracle (approximate by design — the same rows-only contract
class as ``heavy_hitters_sketch``); ``tests/test_hll.py`` pins the
error bound vs exact distinct counts across scales, merge
associativity, and the linear-counting small-range regime.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from pyfuseray.extras.md5vec import md5_hi60_arrow

_TOKEN = re.compile(r"[a-z0-9]+")


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def _registers_from_values(values: pa.Array, p: int) -> np.ndarray:
    """Fold a batch of string values into one 2^p register array."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if len(values) == 0:
        return regs
    # md5_hi60_arrow returns int64 in [0, 2^60); shift math needs uint64
    h = md5_hi60_arrow(values).astype(np.uint64)
    q = 60 - p
    idx = (h >> np.uint64(q)).astype(np.int64)
    rest = h & np.uint64((1 << q) - 1)
    # rho = position of the first 1 bit in the q low bits (1-based from
    # the top), q+1 when they are all zero — vectorized via bit_length:
    # bit_length(rest) = q - (leading zeros), so rho = q - bl + 1
    bl = np.zeros(rest.size, dtype=np.int64)
    nz = rest != 0
    # np.log2 is exact for bit_length up to 2^53; rest < 2^48 after the
    # shift for p >= 12, and float64 log2 of an integer < 2^60 still
    # identifies the top bit exactly (values are not near powers of two
    # boundaries in a way log2 could miss: floor(log2(x)) is exact for
    # x < 2^53; for larger x use a halving pre-step)
    big = rest >= (1 << 52)
    rest_small = rest.copy()
    shift_back = np.zeros(rest.size, dtype=np.int64)
    while np.any(big):
        rest_small[big] >>= 16
        shift_back[big] += 16
        big = rest_small >= (1 << 52)
    nz = rest_small != 0
    bl[nz] = (
        np.floor(np.log2(rest_small[nz].astype(np.float64))).astype(np.int64)
        + 1
        + shift_back[nz]
    )
    rho = (q - bl + 1).astype(np.uint8)
    np.maximum.at(regs, idx, rho)
    return regs


def _estimate(regs: np.ndarray) -> float:
    m = regs.size
    raw = _alpha(m) * m * m / float(np.sum(np.exp2(-regs.astype(np.float64))))
    zeros = int(np.count_nonzero(regs == 0))
    if raw <= 2.5 * m and zeros > 0:
        return m * float(np.log(m / zeros))  # linear counting
    return raw


def approx_distinct(
    ds: rd.Dataset,
    column: str,
    *,
    tokenize: bool = False,
    p: int = 12,
) -> int:
    """Approximate COUNT(DISTINCT column) — or, with ``tokenize=True``,
    the distinct simple tokens of a text column (vocabulary size) — in
    one streaming pass, no shuffle, O(2^p) driver state."""
    if not 4 <= p <= 18:
        raise ValueError("p must be in [4, 18]")
    m = 1 << p

    def batch_regs(batch: pa.Table) -> pa.Table:
        col = batch.column(column)
        if tokenize:
            toks: set[str] = set()
            for t in col.to_pylist():
                toks.update(_TOKEN.findall((t or "").lower()))
            values = pa.array(sorted(toks), type=pa.string())
        else:
            values = pa.compute.cast(
                pa.compute.unique(col.combine_chunks()), pa.string()
            )
        regs = _registers_from_values(values, p)
        return pa.table({"regs": pa.array([regs], pa.list_(pa.uint8()))})

    def combine(batch: pa.Table) -> pa.Table:
        rows = np.asarray(batch.column("regs").to_pylist(), dtype=np.uint8)
        return pa.table(
            {"regs": pa.array([rows.max(axis=0)], pa.list_(pa.uint8()))}
        )

    parts = (
        ds.select_columns([column])
        .map_batches(batch_regs, batch_format="pyarrow")
        .map_batches(combine, batch_format="pyarrow", batch_size=64)
        .to_pandas()
    )
    regs = np.zeros(m, dtype=np.uint8)
    for r in parts.itertuples():
        regs = np.maximum(regs, np.asarray(r.regs, dtype=np.uint8))
    return int(round(_estimate(regs)))


def vocabulary_size_hll(ds: rd.Dataset, *, text_col: str = "text",
                        p: int = 12) -> pd.DataFrame:
    """One-row frame (n_distinct_terms_est) — the rows-only contract
    surface for the vocabulary-size estimate."""
    est = approx_distinct(ds, text_col, tokenize=True, p=p)
    return pd.DataFrame({"n_distinct_terms_est": [est]})
