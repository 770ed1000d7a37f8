"""High-level pipelines: pages/documents -> corpus -> index -> search.

This is the engine's equivalent of the reference's
``DataLoader.loadData`` + ``build_index`` + ``merge_blocks`` lifecycle
(reference ``app/DataLoader.py:34-75``), re-expressed as streaming Ray
Data stages, plus search entry points.
"""

from __future__ import annotations

import ray.data as rd

from pyfuseray.build import build_index
from pyfuseray.checkpoint import Manifest
from pyfuseray.docids import assign_doc_ids, dedup_keep_first
from pyfuseray.extract import extract_batch
from pyfuseray.query import IndexSearcher


def pages_to_corpus(pages: rd.Dataset, *, dedup: bool = True) -> rd.Dataset:
    """pages(url, warc_ts, html, text, lang) -> corpus(doc_id, url, text).

    extract (drops html immediately) -> exact dedup keep-first by url ->
    doc_id = rank of url in sorted order.
    """
    extracted = pages.map_batches(extract_batch, batch_format="pyarrow")
    if dedup:
        extracted = dedup_keep_first(extracted, key="url", order_col="warc_ts")
    with_ids = assign_doc_ids(extracted)
    return with_ids.select_columns(["doc_id", "url", "text"])


def documents_to_corpus(documents: rd.Dataset) -> rd.Dataset:
    """Driver testdata documents(doc_id, text, ...) -> corpus(doc_id, text)."""
    return documents.select_columns(["doc_id", "text"])


def build_from_pages(
    pages: rd.Dataset, out_dir: str, *, corpus_dir: str | None = None, **build_kwargs
) -> Manifest:
    """Full ingest + index build from a pages Dataset.

    The ingest is staged so nothing recomputes: extract+dedup writes a
    parquet checkpoint, doc_id assignment reads it back (row count comes
    free from parquet metadata), and the final (doc_id, url, text)
    corpus is itself persisted before the index build re-reads it.
    Without ``corpus_dir`` the Dataset pipeline stays lazy (small-corpus
    and test path).
    """
    if corpus_dir is None:
        corpus = pages_to_corpus(pages)
        return build_index(corpus.select_columns(["doc_id", "text"]), out_dir, **build_kwargs)

    import os
    import shutil


    if build_kwargs.get("overwrite") and os.path.exists(corpus_dir):
        shutil.rmtree(corpus_dir)
    final = os.path.join(corpus_dir, "corpus")
    if not os.path.isdir(final) or not any(os.scandir(final)):
        # One narrow (url, warc_ts) pass plans dedup + the doc_id rank
        # map; the heavy columns make exactly ONE pass: filter losers ->
        # doc_id = searchsorted -> extract (drops html) -> corpus write.
        from pyfuseray.docids import ingest_pages

        with_ids, _ = ingest_pages(pages)
        extracted = with_ids.map_batches(extract_batch, batch_format="pyarrow")
        # int sort by doc_id: tokenizer batches then cover contiguous doc
        # ranges, so SPIMI runs stay doc-disjoint and the segment merge is
        # pure concatenation (never the decode-merge fallback)
        extracted.sort("doc_id").write_parquet(final)
    corpus = rd.read_parquet(final, columns=["doc_id", "text"])
    return build_index(corpus, out_dir, **build_kwargs)


def search(index_dir: str, query: str, top_k: int = 10, *, scoring: str = "tfidf",
           algorithm: str = "taat") -> list[tuple[int, float]]:
    s = IndexSearcher(index_dir)
    if scoring == "bm25":
        return s.search_bm25(query, top_k, algorithm=algorithm)
    return s.search_tfidf(query, top_k)
