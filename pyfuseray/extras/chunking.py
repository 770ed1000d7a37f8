"""Sliding-window token chunking — the context-chunking stage of an
embedding/RAG pipeline: each document becomes overlapping windows of
``window`` tokens advanced by ``stride`` (stride < window overlaps,
stride == window tiles). The downstream embedder/indexer consumes
(doc_id, chunk_idx, chunk_text) rows instead of unbounded documents.

Reference analogue: the corpus-projection + per-document token stream
(/root/reference/app/DataLoader.py:49, TextPreProcess.py:41-51) feeds
whole documents to the indexer; chunking is the standard webtext
extension when consumers have bounded context.

100-TB shape: ONE streaming ``map_batches`` explode — no shuffle, no
driver state; output is ~(window/stride)x the corpus token mass, so
backpressure and block splitting handle sizing. Tokenization is the
SQL-mirrorable simple ``[a-z0-9]+`` lowercase rule so the whole
operator is hash-checkable against a DuckDB range/list_slice oracle
(``chunk_windows`` in __ray_entry__).

Semantics (pinned by tests/test_chunking.py):
- tokens = simple_tokens(text); docs with ZERO tokens emit no chunks
- window starts = 0, stride, 2*stride, ... while start < n_tokens
  (the final window may be shorter than ``window``)
- chunk_idx = start // stride; chunk_text = ' '.join of the slice
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from pyfuseray.extras.textstats import simple_tokens


def chunk_batch(
    batch: pa.Table, *, window: int, stride: int
) -> pa.Table:
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    texts = batch.column("text").to_pylist()
    out_id: list[np.ndarray] = []
    idx: list[int] = []
    starts: list[int] = []
    ntok: list[int] = []
    chunks: list[str] = []
    for did, t in zip(ids, texts):
        toks = simple_tokens(t)
        n = len(toks)
        if n == 0:
            continue
        row_starts = range(0, n, stride)
        out_id.append(np.full(len(row_starts), did, dtype=np.int64))
        for s in row_starts:
            piece = toks[s : s + window]
            idx.append(s // stride)
            starts.append(s)
            ntok.append(len(piece))
            chunks.append(" ".join(piece))
    return pa.table(
        {
            "doc_id": pa.array(
                np.concatenate(out_id) if out_id else
                np.empty(0, dtype=np.int64)
            ),
            "chunk_idx": pa.array(idx, type=pa.int64()),
            "tok_start": pa.array(starts, type=pa.int64()),
            "n_tokens": pa.array(ntok, type=pa.int64()),
            "chunk_text": pa.array(chunks, type=pa.string()),
        }
    )


def chunk_token_windows(
    ds: rd.Dataset, *, window: int = 64, stride: int = 48
) -> rd.Dataset:
    """Explode documents(doc_id, text) into overlapping token windows.

    Returns (doc_id, chunk_idx, tok_start, n_tokens, chunk_text)."""
    if window < 1 or stride < 1:
        raise ValueError("window and stride must be >= 1")

    def stage(batch: pa.Table) -> pa.Table:
        return chunk_batch(batch, window=window, stride=stride)

    return ds.select_columns(["doc_id", "text"]).map_batches(
        stage, batch_format="pyarrow"
    )
