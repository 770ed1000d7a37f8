"""Bigram collocation extraction (PMI) over a documents table.

The n-gram statistics a training-data pipeline uses for tokenizer
vocabulary design and boilerplate detection. Same shuffle policy as
``extras.keywords``:

* **count pass**: each batch emits per-batch partial counts of its
  adjacent token pairs (and of its tokens); both merge through ONE
  ``groupby(key).sum`` each, so the shuffled state is the bigram /
  unigram VOCABULARY, never the token stream.
* **PMI pass**: the unigram table is broadcast once via ``ray.put``
  (size-gated like keywords' df dictionary); bigram-table batches
  compute PMI locally and a bounded top-k merges on the driver.

PMI = ln( (c_ab / N_bi) / ((c_a / N_uni) * (c_b / N_uni)) ), rounded
to 6dp BEFORE ranking so the (pmi desc, a asc, b asc) order is
reproducible against a DuckDB oracle (contract ``top_bigrams_pmi``).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd
from ray.data.aggregate import Sum

BROADCAST_MAX_TERMS = 50_000_000


def _pair_partial(batch: pa.Table) -> pa.Table:
    from pyfuseray.extras.textstats import simple_tokens

    pairs: list[str] = []
    for t in batch.column("text").to_pylist():
        toks = simple_tokens(t)
        pairs.extend(a + " " + b for a, b in zip(toks, toks[1:]))
    if not pairs:
        return pa.table({"bigram": pa.array([], pa.string()),
                         "c": pa.array([], pa.int64())})
    u, c = np.unique(np.asarray(pairs, dtype=object), return_counts=True)
    return pa.table({"bigram": pa.array(u.astype(str), pa.string()),
                     "c": pa.array(c.astype(np.int64))})


def _tok_partial(batch: pa.Table) -> pa.Table:
    from pyfuseray.extras.textstats import simple_tokens

    toks: list[str] = []
    for t in batch.column("text").to_pylist():
        toks.extend(simple_tokens(t))
    if not toks:
        return pa.table({"term": pa.array([], pa.string()),
                         "c": pa.array([], pa.int64())})
    u, c = np.unique(np.asarray(toks, dtype=object), return_counts=True)
    return pa.table({"term": pa.array(u.astype(str), pa.string()),
                     "c": pa.array(c.astype(np.int64))})


def top_bigrams_pmi(
    docs: rd.Dataset,
    *,
    min_count: int = 5,
    k: int = 30,
    broadcast_max_terms: int = BROADCAST_MAX_TERMS,
) -> pd.DataFrame:
    """Top-k adjacent-token bigrams by PMI (ties: a asc, b asc), among
    bigrams with count >= min_count. Returns a bounded k-row DataFrame
    (rank, a, b, c_ab, pmi)."""
    text = docs.select_columns(["text"])

    uni = (
        text.map_batches(_tok_partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
    )
    if len(uni) > broadcast_max_terms:
        raise ValueError(
            f"vocabulary {len(uni)} exceeds broadcast gate {broadcast_max_terms}"
        )
    n_uni = float(uni["c"].sum())
    terms = uni["term"].to_numpy(dtype=object)
    order = np.argsort(terms)
    uni_ref = ray.put((terms[order], uni["c"].to_numpy(np.int64)[order]))

    # bigram table is vocabulary-sized (bounded); materialize so the
    # total-count reduction and the PMI pass share one computation
    bi = (
        text.map_batches(_pair_partial, batch_format="pyarrow")
        .groupby("bigram")
        .aggregate(Sum("c", alias_name="c_ab"))
        .materialize()
    )
    n_bi = float(bi.sum("c_ab"))

    def pmi_partial(batch: pa.Table) -> pa.Table:
        """Per-batch PMI + local top-k (bounded rows leave each batch)."""
        ts, cs = ray.get(uni_ref)
        big = batch.column("bigram").to_pylist()
        c_ab = batch.column("c_ab").to_numpy(zero_copy_only=False)
        keep = c_ab >= min_count
        rows = []
        for s, cab in zip(
            (big[i] for i in np.flatnonzero(keep)), c_ab[keep]
        ):
            a, b = s.split(" ", 1)
            ca = int(cs[np.searchsorted(ts, a)])
            cb = int(cs[np.searchsorted(ts, b)])
            pmi = round(
                math.log((cab / n_bi) / ((ca / n_uni) * (cb / n_uni))), 6
            )
            rows.append((a, b, int(cab), pmi))
        rows.sort(key=lambda r: (-r[3], r[0], r[1]))
        rows = rows[:k]
        return pa.table(
            {
                "a": pa.array([r[0] for r in rows], pa.string()),
                "b": pa.array([r[1] for r in rows], pa.string()),
                "c_ab": pa.array([r[2] for r in rows], pa.int64()),
                "pmi": pa.array([r[3] for r in rows], pa.float64()),
            }
        )

    cand = bi.map_batches(pmi_partial, batch_format="pyarrow").to_pandas()
    cand = cand.sort_values(
        ["pmi", "a", "b"], ascending=[False, True, True]
    ).head(k).reset_index(drop=True)
    cand.insert(0, "rank", np.arange(len(cand), dtype=np.int64))
    return cand
