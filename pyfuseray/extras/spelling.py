"""Spelling suggestion ("did you mean") over the index dictionary.

The reference engine has no spell path; this is the standard
dictionary-correction feature every fulltext engine grows: for a query
term with no (or low-df) hits, propose the dictionary terms within
bounded edit distance, ranked by (distance ASC, df DESC, term ASC).

Distributed shape (100-TB bar): the candidate source is the DICTIONARY
(term, df) — vocabulary-sized, not corpus-sized. Query terms broadcast
once (ray.put via closure capture of a small list); each dictionary
batch computes banded Levenshtein FULLY VECTORIZED (numpy DP over a
fixed-width byte matrix: the per-cell loop runs over the ~20x20 (query
len x term len) grid of VECTOR ops, never over candidate terms) and
emits only its local top-k per query term, so the driver merge is
output-sized (n_queries x k rows per batch).

Hash-checked vs DuckDB's built-in levenshtein() (contract
``spelling_suggest_simple``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from pyfuseray.docids import _utf8_fixed_width

_BIG = np.int32(1 << 20)


def _levenshtein_vec(terms_b: np.ndarray, widths: np.ndarray, q: bytes) -> np.ndarray:
    """Edit distance of every fixed-width candidate (byte matrix rows,
    true byte lengths ``widths``) vs one query term — one numpy DP.

    dp over (term prefix j, query prefix i): a (n, m+1) matrix updated
    L times; each row's answer is read off at j == width(row).
    """
    n = terms_b.shape[0]
    m = len(q)
    if n == 0:
        return np.empty(0, dtype=np.int32)
    L = terms_b.shape[1] if terms_b.ndim == 2 else 0
    qv = np.frombuffer(q, dtype=np.uint8)
    cur = np.broadcast_to(np.arange(m + 1, dtype=np.int32), (n, m + 1)).copy()
    out = np.full(n, _BIG, dtype=np.int32)
    out[widths == 0] = m
    for j in range(1, L + 1):
        new = np.empty_like(cur)
        new[:, 0] = j
        tj = terms_b[:, j - 1]
        for i in range(1, m + 1):
            sub = cur[:, i - 1] + (tj != qv[i - 1])
            np.minimum(sub, cur[:, i] + 1, out=sub)
            np.minimum(sub, new[:, i - 1] + 1, out=sub)
            new[:, i] = sub
        cur = new
        hit = widths == j
        if hit.any():
            out[hit] = cur[hit, m]
    return out


def suggest_batch(
    batch: pa.Table, query_terms: list[str], *, max_dist: int = 2, k: int = 5
) -> pa.Table:
    """Per-batch candidate generation: local top-k suggestions per query
    term from this batch's slice of the dictionary."""
    terms = batch.column("term")
    df = batch.column("df").to_numpy(zero_copy_only=False).astype(np.int64)
    mat = _utf8_fixed_width(terms)
    n = len(mat)
    L = mat.dtype.itemsize
    bytes2d = mat.view(np.uint8).reshape(n, L) if n else np.empty((0, L), np.uint8)
    widths = (bytes2d != 0).sum(axis=1).astype(np.int32) if n else np.empty(0, np.int32)
    # trailing NULs undercount only if a term embeds \x00 — impossible
    # for [a-z0-9]+ analyzer tokens
    out_q, out_s, out_d, out_df = [], [], [], []
    tstr = None
    for q in query_terms:
        qb = q.encode("utf-8")
        m = len(qb)
        keep = np.abs(widths - m) <= max_dist
        if not keep.any():
            continue
        cand = bytes2d[keep]
        d = _levenshtein_vec(cand, widths[keep], qb)
        ok = d <= max_dist
        if not ok.any():
            continue
        idx_all = np.flatnonzero(keep)[ok]
        dd = d[ok]
        if tstr is None:
            tstr = terms.to_pylist()
        sub_terms = [tstr[i] for i in idx_all]
        sub_df = df[idx_all]
        order = sorted(
            range(len(sub_terms)),
            key=lambda i: (int(dd[i]), -int(sub_df[i]), sub_terms[i]),
        )[:k]
        for i in order:
            out_q.append(q)
            out_s.append(sub_terms[i])
            out_d.append(int(dd[i]))
            out_df.append(int(sub_df[i]))
    return pa.table(
        {
            "query_term": pa.array(out_q, pa.string()),
            "suggestion": pa.array(out_s, pa.string()),
            "dist": pa.array(out_d, pa.int64()),
            "df": pa.array(out_df, pa.int64()),
        }
    )


def suggest(
    dictionary: rd.Dataset,
    query_terms: list[str],
    *,
    max_dist: int = 2,
    k: int = 5,
) -> pd.DataFrame:
    """Top-k suggestions per query term over a (term, df) dictionary
    Dataset. Returns (query_term, rank, suggestion, dist, df), ranked
    (dist ASC, df DESC, suggestion ASC) with the canonical tie-break."""
    parts = dictionary.map_batches(
        lambda t: suggest_batch(t, query_terms, max_dist=max_dist, k=k),
        batch_format="pyarrow",
    ).to_pandas()
    if parts.empty:
        return pd.DataFrame(
            columns=["query_term", "rank", "suggestion", "dist", "df"]
        )
    parts = parts.sort_values(
        ["query_term", "dist", "df", "suggestion"],
        ascending=[True, True, False, True],
    )
    parts["rank"] = parts.groupby("query_term").cumcount()
    out = parts[parts["rank"] < k].reset_index(drop=True)
    return out[["query_term", "rank", "suggestion", "dist", "df"]]
