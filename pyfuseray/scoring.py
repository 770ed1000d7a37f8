"""Pure scoring functions, float64 throughout.

``tfidf_weight`` replicates the reference weight exactly
(reference ``app/InvertedIndexFinal.py:50-54`` and
``app/InvertedIndex.py:400-404``):

    w(tf, df) = (1 + log10(tf)) * log10(N / df),   0 if tf<=0 or df<=0 or N<=0

``bm25_term_score`` is the benchmark-path ranking function (Robertson/
Sparck Jones BM25, k1=1.2 b=0.75 defaults) — the reference's BASELINE
metric names BM25 while the reference code implements log-TF-IDF cosine;
both ship and both are pinned by goldens (SURVEY.md §2.9.3).

Used identically by the distributed pipeline and the serial oracle so
rank-identity is exact (same operations, same order, float64).
"""

from __future__ import annotations

import math

import numpy as np

BM25_K1 = 1.2
BM25_B = 0.75


def tfidf_weight(tf: float, df: float, n_docs: float) -> float:
    """Reference TF-IDF weight (scalar)."""
    if tf <= 0 or df <= 0 or n_docs <= 0:
        return 0.0
    return (1.0 + math.log10(tf)) * math.log10(n_docs / df)


def tfidf_weight_vec(tf: np.ndarray, df: float, n_docs: float) -> np.ndarray:
    """Vectorized reference TF-IDF weight for one term's posting list."""
    tf = np.asarray(tf, dtype=np.float64)
    if df <= 0 or n_docs <= 0:
        return np.zeros_like(tf)
    idf = math.log10(n_docs / df)
    w = (1.0 + np.log10(np.maximum(tf, 1.0))) * idf
    return np.where(tf > 0, w, 0.0)


def bm25_idf(df: float, n_docs: float) -> float:
    """BM25 idf with the standard +1 inside the log (never negative)."""
    return math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)


def bm25_term_score_vec(
    tf: np.ndarray,
    doclen: np.ndarray,
    df: float,
    n_docs: float,
    avgdl: float,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> np.ndarray:
    """Vectorized BM25 contribution of one term over its posting list."""
    tf = np.asarray(tf, dtype=np.float64)
    doclen = np.asarray(doclen, dtype=np.float64)
    idf = bm25_idf(df, n_docs)
    denom = tf + k1 * (1.0 - b + b * doclen / avgdl)
    return idf * (tf * (k1 + 1.0)) / denom


def bm25_max_score(df: float, n_docs: float, k1: float = BM25_K1) -> float:
    """Upper bound of one term's BM25 contribution (tf -> inf)."""
    return bm25_idf(df, n_docs) * (k1 + 1.0)
