"""Per-document keyword extraction: top-k TF-IDF terms per doc.

Two stages, one tiny shuffle:

* **df pass**: every batch emits per-term distinct-doc counts (a doc
  lives wholly inside one batch, so batch-local distinct is exact) and
  they merge through one ``groupby(term).sum`` — the shuffled state is
  the VOCABULARY, not the token stream.
* **score pass**: the (term -> df) dictionary is broadcast ONCE via
  ray.put (size-gated; at index scale the dictionary already lives in
  the segment df table — `pyfuseray.stats` — and would be joined from
  there instead, see `query.IndexSearcher`), then each batch scores its
  own docs locally and emits exactly k rows per doc. No shuffle: per-doc
  top-k is batch-local by construction.

Score = (1 + log10(tf)) * log10(N / df) — the reference's ltc weight
(`/root/reference/app/InvertedIndexFinal.py` scoring), rounded to 6dp
BEFORE ranking so the (score desc, term asc) order is reproducible
bit-for-bit against a SQL window oracle.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd
from ray.data.aggregate import Sum

BROADCAST_MAX_TERMS = 50_000_000


def top_terms_per_doc(
    docs: rd.Dataset,
    *,
    k: int = 3,
    tokenizer=None,
    broadcast_max_terms: int = BROADCAST_MAX_TERMS,
) -> rd.Dataset:
    """(doc_id, rank, term, score): the k highest-TF-IDF terms per doc,
    rank 0-based by (round(score, 6) desc, term asc)."""
    if tokenizer is None:
        from pyfuseray.extras.textstats import simple_tokens

        tokenizer = simple_tokens

    n_docs = docs.count()

    def df_partial(batch: pa.Table) -> pa.Table:
        terms: list[str] = []
        for t in batch.column("text").to_pylist():
            terms.extend(set(tokenizer(t)))
        if not terms:
            return pa.table({"term": pa.array([], pa.string()),
                             "df": pa.array([], pa.int64())})
        u, c = np.unique(np.asarray(terms, dtype=object), return_counts=True)
        return pa.table({"term": pa.array(u.astype(str), pa.string()),
                         "df": pa.array(c.astype(np.int64))})

    df_tbl = (
        docs.select_columns(["text"])
        .map_batches(df_partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("df", alias_name="df"))
        .to_pandas()
    )
    if len(df_tbl) > broadcast_max_terms:
        raise ValueError(
            f"vocabulary {len(df_tbl)} exceeds broadcast gate "
            f"{broadcast_max_terms}; join df from the index segments instead"
        )
    df_terms = df_tbl["term"].to_numpy(dtype=object)
    order = np.argsort(df_terms)
    df_ref = ray.put(
        (df_terms[order], df_tbl["df"].to_numpy(dtype=np.int64)[order])
    )

    def score(batch: pa.Table) -> pa.Table:
        terms_sorted, dfs_sorted = ray.get(df_ref)
        out_doc: list[int] = []
        out_rank: list[int] = []
        out_term: list[str] = []
        out_score: list[float] = []
        ids = batch.column("doc_id").to_pylist()
        for doc_id, text in zip(ids, batch.column("text").to_pylist()):
            toks = tokenizer(text)
            if not toks:
                continue
            u, tf = np.unique(np.asarray(toks, dtype=object),
                              return_counts=True)
            pos = np.searchsorted(terms_sorted, u)
            dfv = dfs_sorted[pos]
            w = [
                round(
                    (1.0 + math.log10(int(t))) * math.log10(n_docs / int(d)),
                    6,
                )
                for t, d in zip(tf, dfv)
            ]
            top = sorted(zip(w, u), key=lambda p: (-p[0], p[1]))[:k]
            for r, (s, term) in enumerate(top):
                out_doc.append(doc_id)
                out_rank.append(r)
                out_term.append(term)
                out_score.append(s)
        return pa.table(
            {
                "doc_id": pa.array(out_doc, pa.int64()),
                "rank": pa.array(out_rank, pa.int64()),
                "term": pa.array(out_term, pa.string()),
                "score": pa.array(out_score, pa.float64()),
            }
        )

    return docs.select_columns(["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow"
    )
