"""Distributed bulk query execution: score MANY queries in one streaming
pass over the index segments.

The interactive path (``pyfuseray.query.IndexSearcher``) reads only the
query terms' segment rows — right for top-k <= 20 and few queries. For
bulk workloads (requalifying a query log, building training pairs) the
scale path is scatter-gather: one ``map_batches`` pass over ALL segment
rows with the query set + collection stats broadcast once via
``ray.put``, partial per-(query, doc) contributions combined by a
``groupby`` shuffle, and per-query top-k taken in ``map_groups`` — the
distributed form of the reference's score-accumulation loop
(reference ``app/InvertedIndexFinal.py:358-418``).

Partitioning assumptions: the query-term table and the docstats arrays
fit in the object store (ray.put broadcast). At 10^12-doc scale the
docstats side would be partitioned by doc range and joined per block;
the query-term broadcast stays tiny.
"""

from __future__ import annotations

import math
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from pyfuseray.analyzer import Analyzer
from pyfuseray.checkpoint import load_manifest
from pyfuseray.codec import decode_postings
from pyfuseray.scoring import BM25_B, BM25_K1, bm25_idf, tfidf_weight, tfidf_weight_vec


def bulk_search(
    index_dir: str,
    queries: list[str],
    top_k: int = 10,
    *,
    scoring: str = "bm25",
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> pd.DataFrame:
    """Score every query against the whole index in one streaming pass.

    Returns a DataFrame (query_id, rank, doc_id, score) with canonical
    (-score, doc_id) per-query ordering — rank-identical to the
    interactive searcher.
    """
    m = load_manifest(index_dir)
    if m is None or not m.stage_done("done"):
        raise FileNotFoundError(f"no complete index manifest in {index_dir}")
    n_docs, avgdl = m.n_docs, m.avgdl or 1.0
    analyzer = Analyzer()

    # driver-side: per-query term weights (tiny) --------------------------
    q_terms: dict[str, list[tuple[int, int]]] = {}  # term -> [(query_id, qtf)]
    per_query_terms: list[dict[str, int]] = []
    for qid, q in enumerate(queries):
        tf = analyzer.preprocess_query(q)
        per_query_terms.append(tf)
        for t, f in tf.items():
            q_terms.setdefault(t, []).append((qid, f))
    q_ref = ray.put(q_terms)

    # docstats dense arrays, broadcast once --------------------------------
    import pyarrow.dataset as pads

    tbl = pads.dataset(os.path.join(index_dir, "stats", "docstats.parquet")).to_table()
    ids = tbl.column("doc_id").to_numpy()
    size = max(n_docs, int(ids.max()) + 1 if ids.size else 0)
    dls = np.full(size, avgdl, dtype=np.float64)
    norms = np.full(size, 1.0, dtype=np.float64)
    dls[ids] = tbl.column("dl").to_numpy().astype(np.float64)
    norms[ids] = tbl.column("norm").to_numpy().astype(np.float64)
    dl_ref = ray.put(dls)
    # norms is as large as dls — broadcast it the same way instead of
    # capturing the dense array in the topk_group closure (which would
    # serialize it into every map_groups task spec)
    norms_ref = ray.put(norms)

    def score_stage(batch: pa.Table) -> pa.Table:
        qt = ray.get(q_ref)
        dl_dense = ray.get(dl_ref)
        out_q: list[np.ndarray] = []
        out_d: list[np.ndarray] = []
        out_s: list[np.ndarray] = []
        terms = batch.column("term").to_pylist()
        dfs = batch.column("df").to_numpy(zero_copy_only=False)
        blobs = batch.column("blob").to_pylist()
        offsets = batch.column("offset").to_pylist()
        for term, df, blob, offs in zip(terms, dfs, blobs, offsets):
            hits = qt.get(term)
            if not hits:
                continue
            doc_ids, tfs = decode_postings(blob, np.asarray(offs, dtype=np.int64))
            if scoring == "bm25":
                idf = bm25_idf(float(df), n_docs)
                tfv = tfs.astype(np.float64)
                denom = tfv + k1 * (1.0 - b + b * dl_dense[doc_ids] / avgdl)
                base = idf * tfv * (k1 + 1.0) / denom
                for qid, _qtf in hits:
                    out_q.append(np.full(doc_ids.size, qid, dtype=np.int64))
                    out_d.append(doc_ids)
                    out_s.append(base)
            else:
                w_td = tfidf_weight_vec(tfs, float(df), float(n_docs))
                for qid, qtf in hits:
                    w_tq = tfidf_weight(qtf, float(df), float(n_docs))
                    out_q.append(np.full(doc_ids.size, qid, dtype=np.int64))
                    out_d.append(doc_ids)
                    out_s.append(w_td * w_tq)
        if not out_q:
            return pa.table(
                {"query_id": pa.array([], pa.int64()),
                 "doc_id": pa.array([], pa.int64()),
                 "partial": pa.array([], pa.float64())}
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                "doc_id": pa.array(np.concatenate(out_d), pa.int64()),
                "partial": pa.array(np.concatenate(out_s), pa.float64()),
            }
        )

    def topk_group(group: pd.DataFrame) -> pd.DataFrame:
        qid = int(group["query_id"].iloc[0])
        docs = group["doc_id"].to_numpy()
        scores = group["partial"].to_numpy(dtype=np.float64)
        # combine same-doc contributions from different terms
        order = np.argsort(docs, kind="stable")
        docs, scores = docs[order], scores[order]
        uniq, starts = np.unique(docs, return_index=True)
        sums = np.add.reduceat(scores, starts)
        if scoring == "tfidf":
            qn = math.sqrt(_query_norm2(qid))
            if qn > 0:
                nrm = ray.get(norms_ref)[uniq]
                nz = nrm != 0
                sums[nz] = sums[nz] / (qn * nrm[nz])
        k = min(top_k, uniq.size)
        idx = np.lexsort((uniq, -sums))[:k]
        return pd.DataFrame(
            {
                "query_id": qid,
                "rank": np.arange(k, dtype=np.int64),
                "doc_id": uniq[idx],
                "score": sums[idx],
            }
        )

    # query norms need each query term's df: read it from the df table
    # once, driver-side (query terms are few)
    df_lookup: dict[str, int] = {}
    if scoring == "tfidf":
        df_tbl = pads.dataset(os.path.join(index_dir, "stats", "df.parquet")).to_table(
            filter=pads.field("term").isin(list(q_terms))
        )
        df_lookup = dict(zip(df_tbl["term"].to_pylist(), df_tbl["df"].to_pylist()))

    def _query_norm2(qid: int) -> float:
        total = 0.0
        for t, f in per_query_terms[qid].items():
            df = df_lookup.get(t)
            if df:
                w = tfidf_weight(f, df, n_docs)
                total += w * w
        return total

    segments = rd.read_parquet(os.path.join(index_dir, "segments"))
    partials = segments.map_batches(score_stage, batch_format="pyarrow")
    ranked = partials.groupby("query_id").map_groups(topk_group, batch_format="pandas")
    out = ranked.to_pandas()
    if out.empty:
        return pd.DataFrame(columns=["query_id", "rank", "doc_id", "score"])
    return out.sort_values(["query_id", "rank"]).reset_index(drop=True)
