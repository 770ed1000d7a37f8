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


def _group_value_histogram(
    ds: rd.Dataset, group_col: str, value_col: str
) -> pd.DataFrame:
    """(group, value, n) histogram — the lossless sufficient statistic
    for per-group order statistics. Map-side partial counts collapse
    corpus-sized input to histogram-sized state; one hash-aggregate
    merge; only the bounded histogram reaches the driver."""

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
    return hist.sort_values([group_col, "value"], kind="stable")


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
    hist = _group_value_histogram(ds, group_col, value_col)

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


def group_quantile_thresholds(
    ds: rd.Dataset, *, group_col: str, value_col: str, q: float
) -> pd.DataFrame:
    """Exact per-group DISCRETE quantile: the element at 0-based rank
    ``max(ceil(q*n) - 1, 0)`` of the group's sorted value multiset —
    DuckDB ``quantile_disc`` semantics. Discrete means the threshold is
    an actual data value (no interpolation), so a ``>= threshold``
    filter downstream is bit-exact against the SQL oracle: both sides
    compare each row's value to the same float64 bit pattern.

    Returns a small DataFrame (group_col, threshold) — |groups| rows,
    broadcastable; built from the same bounded histogram as
    ``grouped_quantiles`` (corpus rows never reach the driver)."""
    hist = _group_value_histogram(ds, group_col, value_col)
    out_rows: list[dict] = []
    for gval, sub in hist.groupby(group_col, sort=True):
        v = sub["value"].to_numpy(dtype=np.float64)
        cum = np.cumsum(sub["n"].to_numpy(dtype=np.int64))
        n_total = int(cum[-1])
        rank = max(int(np.ceil(q * n_total)) - 1, 0)
        thr = v[np.searchsorted(cum, rank, side="right")]
        out_rows.append({group_col: gval, "threshold": float(thr)})
    return pd.DataFrame(out_rows)


def filter_by_group_quantile(
    ds: rd.Dataset,
    *,
    group_col: str,
    value_col: str,
    q: float,
) -> rd.Dataset:
    """Keep rows whose ``value_col`` is >= their group's q-th discrete
    quantile (per-language quality-floor curation: e.g. q=0.5 keeps the
    upper half of each language by quality, so no language is starved
    by a global threshold).

    100-TB shape: two streaming passes — (1) the histogram aggregate
    (bounded state, above), (2) a map_batches filter with the
    |groups|-sized threshold table captured in the closure (broadcast
    once per worker by Ray's task serialization, never per batch, never
    a shuffle of the corpus). Ties at the threshold are kept on both
    routes by the >= rule; no float drift because the threshold is a
    data value (see group_quantile_thresholds)."""
    th = group_quantile_thresholds(
        ds, group_col=group_col, value_col=value_col, q=q
    )
    thr_map = dict(zip(th[group_col].tolist(), th["threshold"].tolist()))

    def keep(batch: pa.Table) -> pa.Table:
        codes = batch.column(group_col).combine_chunks().dictionary_encode()
        # per-distinct-group threshold, fanned out via the dictionary
        # indices (vectorized; groups seen here always exist in thr_map
        # because the thresholds came from the same dataset)
        per_dict = np.array(
            [thr_map[g] for g in codes.dictionary.to_pylist()],
            dtype=np.float64,
        )
        gi = codes.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        v = batch.column(value_col).cast(pa.float64()).to_numpy(
            zero_copy_only=False
        )
        return batch.filter(pa.array(v >= per_dict[gi]))

    return ds.map_batches(keep, batch_format="pyarrow")
