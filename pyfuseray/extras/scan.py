"""Distributed global ordered cumulative aggregate (prefix scan).

``running_sum`` computes ``SUM(value) OVER (ORDER BY order_cols ROWS
UNBOUNDED PRECEDING)`` over a Dataset — the classic two-pass parallel
prefix scan, expressed Ray-Data-first:

1. **Range-bucket assignment** (narrow pass): cut points over the
   primary order column come from a bounded seeded sample (driver-side
   quantiles over <= ``sample_cap`` keys), broadcast in the closure.
   Equal primary keys always land in the same bucket (``searchsorted
   side='right'`` against the cuts), so bucket order == global order.
2. **Pass A**: one ``groupby(bucket).sum`` whose state is the BUCKET
   TOTALS (bounded by ``n_buckets``, never the row count); the driver
   exclusive-scans them into per-bucket offsets.
3. **Pass B**: one coarse shuffle on the bucket id; each group lexsorts
   by the full order key, cumsums locally, and adds its bucket offset.

Driver state is O(n_buckets); the row stream is shuffled exactly once.
Floating-point note: the bucket offset groups additions differently
from a strictly sequential scan, so results can differ from a serial
oracle by O(n * eps) — callers that hash-compare against SQL should
round (the contract entry rounds to 4dp).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

DEFAULT_BUCKETS = 512
SAMPLE_CAP = 200_000


def _order_arrays(t: pa.Table, order_cols: list[str]) -> list[np.ndarray]:
    return [
        t.column(c).to_numpy(zero_copy_only=False) for c in order_cols
    ]


def running_sum(
    ds: rd.Dataset,
    *,
    order_cols: list[str],
    value_col: str,
    out_col: str = "running",
    n_buckets: int = DEFAULT_BUCKETS,
    sample_cap: int = SAMPLE_CAP,
    seed: int = 13,
) -> rd.Dataset:
    """Append ``out_col`` = cumulative sum of ``value_col`` in global
    ``order_cols`` order. ``order_cols`` must be a total order (include
    a unique tiebreaker, e.g. ``["ts", "event_id"]``); the primary
    order column must be numeric (range cuts)."""
    primary = order_cols[0]

    # -- cut points from a bounded seeded sample (driver state: O(n_buckets))
    n_rows = ds.count()
    frac = min(1.0, sample_cap / max(n_rows, 1))
    sample = (
        ds.select_columns([primary]).random_sample(frac, seed=seed).to_pandas()
    )
    keys = np.sort(sample[primary].to_numpy())
    if keys.size >= n_buckets:
        qs = np.linspace(0, keys.size - 1, n_buckets + 1)[1:-1].astype(np.int64)
        cuts = np.unique(keys[qs])
    else:
        cuts = np.unique(keys)[:-1] if keys.size > 1 else np.array([], keys.dtype)

    def assign(batch: pa.Table) -> pa.Table:
        v = batch.column(primary).to_numpy(zero_copy_only=False)
        b = np.searchsorted(cuts, v, side="right").astype(np.int64)
        return batch.append_column("_bk", pa.array(b, pa.int64()))

    tagged = ds.map_batches(assign, batch_format="pyarrow")

    # -- pass A: bucket totals -> exclusive scan on the driver
    from ray.data.aggregate import Sum

    totals = (
        tagged.select_columns(["_bk", value_col])
        .groupby("_bk")
        .aggregate(Sum(value_col, alias_name="s"))
        .to_pandas()
        .sort_values("_bk")
    )
    bks = totals["_bk"].to_numpy()
    sums = totals["s"].to_numpy(dtype=np.float64)
    offsets = dict(zip(bks.tolist(), np.concatenate([[0.0], np.cumsum(sums)[:-1]])))

    # -- pass B: one coarse shuffle, per-bucket sort + local cumsum + offset
    def scan(group: pa.Table) -> pa.Table:
        bk = int(group.column("_bk")[0].as_py())
        arrs = _order_arrays(group, order_cols)
        # np.lexsort: LAST key is primary
        order = np.lexsort(arrs[::-1])
        g = group.take(pa.array(order, pa.int64()))
        v = g.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        run = np.cumsum(v) + offsets.get(bk, 0.0)
        return g.append_column(out_col, pa.array(run, pa.float64())).drop_columns(
            ["_bk"]
        )

    return tagged.groupby("_bk").map_groups(scan, batch_format="pyarrow")
