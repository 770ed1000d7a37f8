"""Serial single-process reference engine for conformance testing.

Replicates the chosen reference semantics (SURVEY.md §2.9) with ~150
lines of pure Python — no Ray. The distributed pipeline must be
rank-identical to this oracle (same top-k doc_ids, scores equal to 1e-9,
canonical tie-break ``(-score, doc_id)``).

Semantics, with reference citations:
- per-doc term frequencies: ``app/InvertedIndexFinal.py:156-158``
- postings merge sums tf per (term, doc): ``app/InvertedIndexFinal.py:240-244``
- TF-IDF weight: ``app/InvertedIndexFinal.py:50-54``
- EXACT post-merge document norms with final df (v1 semantics,
  ``app/InvertedIndex.py:408-419``), zero norms -> 1
  (``app/InvertedIndex.py:419``)
- query-side 1-char token drop: ``app/TextPreProcess.py:64``
- cosine normalization: ``app/InvertedIndex.py:377-382``
- top-k sort: reference uses insertion-order tie-break
  (``app/InvertedIndexFinal.py:418``); we canonicalize to
  ``(-score, doc_id)`` on both sides (SURVEY.md §2.9.5).
- BM25 variant (benchmark path): k1=1.2, b=0.75 over the same postings.
"""

from __future__ import annotations

import math
from collections import defaultdict

from pyfuseray.analyzer import Analyzer
from pyfuseray.scoring import (
    BM25_B,
    BM25_K1,
    bm25_idf,
    tfidf_weight,
)


class OracleIndex:
    """In-memory inverted index with reference-conformant semantics."""

    def __init__(self, analyzer: Analyzer | None = None):
        self.analyzer = analyzer or Analyzer()
        # term -> list[(doc_id, tf)] sorted by doc_id
        self.postings: dict[str, list[tuple[int, int]]] = {}
        self.doc_norms: dict[int, float] = {}
        self.doclen: dict[int, int] = {}
        self.doc_count = 0
        self.avgdl = 0.0

    # -- build ---------------------------------------------------------
    def build(self, docs: list[tuple[int, str]]) -> "OracleIndex":
        """Build from (doc_id, text) pairs. doc_ids must be unique."""
        acc: dict[str, list[tuple[int, int]]] = defaultdict(list)
        self.doc_count = len(docs)
        for doc_id, text in docs:
            tfs = self.analyzer.term_frequencies(text)
            self.doclen[doc_id] = sum(tfs.values())
            for term in sorted(tfs):
                acc[term].append((doc_id, tfs[term]))
        # merge: sum tf per (term, doc) then sort by doc_id
        # (InvertedIndexFinal.py:240-244)
        self.postings = {}
        for term, plist in acc.items():
            merged: dict[int, int] = {}
            for doc_id, tf in plist:
                merged[doc_id] = merged.get(doc_id, 0) + tf
            self.postings[term] = sorted(merged.items())
        self._compute_norms()
        n = max(1, self.doc_count)
        self.avgdl = sum(self.doclen.values()) / n
        return self

    def _compute_norms(self) -> None:
        """Exact post-merge norms with final df (InvertedIndex.py:408-419)."""
        norms: dict[int, float] = defaultdict(float)
        for term in sorted(self.postings):
            plist = self.postings[term]
            df = len(plist)
            for doc_id, tf in plist:
                w = tfidf_weight(tf, df, self.doc_count)
                norms[doc_id] += w * w
        self.doc_norms = {}
        for doc_id in self.doclen:
            v = math.sqrt(norms.get(doc_id, 0.0))
            self.doc_norms[doc_id] = v if v != 0.0 else 1.0

    # -- stats ----------------------------------------------------------
    def df(self) -> dict[str, int]:
        return {t: len(p) for t, p in self.postings.items()}

    def cf(self) -> dict[str, int]:
        return {t: sum(tf for _, tf in p) for t, p in self.postings.items()}

    # -- query ------------------------------------------------------------
    def search_tfidf(self, query: str, top_k: int = 10) -> list[tuple[int, float]]:
        """TF-IDF cosine top-k (reference-conformant scoring path)."""
        terms = self.analyzer.preprocess_query(query)
        scores: dict[int, float] = defaultdict(float)
        query_norm = 0.0
        for term in sorted(terms):
            plist = self.postings.get(term)
            if not plist:
                continue
            df = len(plist)
            w_tq = tfidf_weight(terms[term], df, self.doc_count)
            query_norm += w_tq * w_tq
            for doc_id, tf in plist:
                scores[doc_id] += tfidf_weight(tf, df, self.doc_count) * w_tq
        if not scores:
            return []
        query_norm = math.sqrt(query_norm)
        if query_norm > 0:
            for doc_id in scores:
                dn = self.doc_norms.get(doc_id, 1.0)
                if dn != 0:
                    scores[doc_id] /= query_norm * dn
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:top_k]

    def search_bm25(
        self,
        query: str,
        top_k: int = 10,
        k1: float = BM25_K1,
        b: float = BM25_B,
    ) -> list[tuple[int, float]]:
        """BM25 top-k (benchmark scoring path)."""
        terms = self.analyzer.preprocess_query(query)
        scores: dict[int, float] = defaultdict(float)
        for term in sorted(terms):
            plist = self.postings.get(term)
            if not plist:
                continue
            df = len(plist)
            idf = bm25_idf(df, self.doc_count)
            for doc_id, tf in plist:
                dl = self.doclen[doc_id]
                denom = tf + k1 * (1.0 - b + b * dl / self.avgdl)
                scores[doc_id] += idf * (tf * (k1 + 1.0)) / denom
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:top_k]
