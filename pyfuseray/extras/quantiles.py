"""Exact grouped quantiles over bounded-cardinality value domains.

The scale-honest exact-quantile plan for integer-ish metrics (lengths,
counts, scores): quantiles are order statistics, so a (group, value) ->
count HISTOGRAM is a lossless sufficient statistic. One vectorized
map-side partial count per batch collapses corpus-sized input to
histogram-sized state, a single Ray ``groupby([group, value]).sum``
merges the partials (vectorized hash aggregate — never one Python task
per group), and only the merged histogram (bounded by
|groups| x |distinct values|, NOT by row count) reaches the driver,
where cumulative counts + linear interpolation reproduce
``quantile_cont`` exactly.

Partitioning assumption (documented per the repo policy): the value
domain is bounded — true for document lengths, token counts, quality
scores quantized to a grid. Continuous unbounded domains would need a
t-digest-style mergeable sketch instead (approximate by nature, so it
cannot be hash-checked against a SQL oracle; not needed here).

Interpolation matches DuckDB/numpy ``quantile_cont``: rank
p = q * (N - 1); result = v[floor(p)] + frac * (v[floor(p)+1] - v[floor(p)])
over the sorted multiset, computed from cumulative histogram counts via
searchsorted (no multiset expansion).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Sum


def grouped_quantiles(
    ds: rd.Dataset,
    *,
    group_col: str,
    value_col: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75),
) -> pd.DataFrame:
    """Exact per-group quantiles of ``value_col``. Returns a DataFrame
    with one row per group: (group_col, q{25}, q{50}, ...), float64.
    """

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.column(group_col)
        v = batch.column(value_col).cast(pa.float64()).to_numpy(
            zero_copy_only=False
        )
        # vectorized (group, value) counts: dictionary-encode the group
        # (S-byte/object-free), lexsort, run-length count
        codes = g.combine_chunks().dictionary_encode()
        gi = codes.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((v, gi))
        gi_s, v_s = gi[order], v[order]
        new = np.concatenate(
            ([True], (gi_s[1:] != gi_s[:-1]) | (v_s[1:] != v_s[:-1]))
        )
        starts = np.flatnonzero(new)
        counts = np.diff(np.append(starts, gi_s.size))
        return pa.table(
            {
                group_col: codes.dictionary.take(
                    pa.array(gi_s[starts], pa.int64())
                ),
                "value": pa.array(v_s[starts], pa.float64()),
                "n": pa.array(counts.astype(np.int64)),
            }
        )

    hist = (
        ds.select_columns([group_col, value_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby([group_col, "value"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    hist = hist.sort_values([group_col, "value"], kind="stable")

    out_rows: list[dict] = []
    for gval, sub in hist.groupby(group_col, sort=True):
        v = sub["value"].to_numpy(dtype=np.float64)
        c = sub["n"].to_numpy(dtype=np.int64)
        cum = np.cumsum(c)
        n_total = cum[-1]
        row = {group_col: gval}
        for q in qs:
            p = q * (n_total - 1)
            lo_rank = int(np.floor(p))
            hi_rank = int(np.ceil(p))
            # value at rank r (0-based) = first v whose cumulative
            # count exceeds r
            lo_v = v[np.searchsorted(cum, lo_rank, side="right")]
            hi_v = v[np.searchsorted(cum, hi_rank, side="right")]
            row[f"q{int(round(q * 100))}"] = lo_v + (p - lo_rank) * (hi_v - lo_v)
        out_rows.append(row)
    return pd.DataFrame(out_rows)
