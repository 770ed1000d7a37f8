"""ROLLUP aggregation: one shuffle at the finest level, coarser levels
derived from it.

A GROUP BY ROLLUP(k1, k2, ...) asks for aggregates at every prefix of
the key list plus the grand total. The scale-honest plan runs ONE Ray
hash aggregate at the finest level (the only pass over the corpus) and
then re-aggregates the bounded finest-level table (|k1 x k2 x ...|
rows, driver-side pandas) for every coarser level — additive
aggregates (count, sum) roll up losslessly, and integer sums keep the
re-aggregation exact (no float reassociation), so the result is
hash-checkable against DuckDB's ROLLUP.

Rolled-up key positions are filled with the sentinel ``'(all)'``
rather than NULL: the contract harness compares values as strings, and
pandas NaN vs SQL NULL stringify differently; COALESCE on the oracle
side pins the same sentinel.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Count, Sum

SENTINEL = "(all)"


def rollup_counts_sums(
    ds: rd.Dataset,
    *,
    keys: list[str],
    sum_col: str,
) -> pd.DataFrame:
    """(k1, ..., kn, n_rows, total) at every ROLLUP level. ``sum_col``
    must be integer-typed (exact re-aggregation)."""
    finest = (
        ds.select_columns(keys + [sum_col])
        .groupby(keys)
        .aggregate(
            Count(alias_name="n_rows"),
            Sum(sum_col, alias_name="total"),
        )
        .to_pandas()
    )
    finest["total"] = finest["total"].astype("int64")
    finest["n_rows"] = finest["n_rows"].astype("int64")

    levels = [finest.copy()]
    for depth in range(len(keys) - 1, -1, -1):
        head = keys[:depth]
        if head:
            lvl = (
                finest.groupby(head, sort=False, as_index=False)[
                    ["n_rows", "total"]
                ].sum()
            )
        else:
            lvl = pd.DataFrame(
                {
                    "n_rows": [int(finest["n_rows"].sum())],
                    "total": [int(finest["total"].sum())],
                }
            )
        for k in keys[depth:]:
            lvl[k] = SENTINEL
        levels.append(lvl[keys + ["n_rows", "total"]])

    out = pd.concat(levels, ignore_index=True)
    return out.sort_values(keys + ["n_rows"]).reset_index(drop=True)
