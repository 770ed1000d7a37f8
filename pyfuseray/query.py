"""Query execution over a built index directory.

Replaces the reference's O(index-size) sequential scan per query term
(reference ``app/InvertedIndexFinal.py:363-392``) with partition-pruned
segment reads: term -> crc32 bucket -> one Parquet partition, read with
a predicate-pushdown filter on ``term``.

Two scoring paths (SURVEY.md §2.9.3):
- ``search_tfidf``: exhaustive TAAT log-TF-IDF + cosine, accumulation
  order identical to the serial oracle (query terms ascending, postings
  in doc_id order) so top-k is rank-identical with scores equal to 1e-9.
- ``search_bm25``: BM25 with either vectorized TAAT ("taat") or
  block-max WAND with a bounded min-heap ("wand"); both produce the
  same canonical (-score, doc_id)-ordered top-k.

Stats sidecars (norms / doclen) are loaded lazily as sorted numpy
arrays; missing doc_ids default to norm=1 (reference
``app/InvertedIndex.py:419``). At cluster scale the same Searcher runs
inside actor processes with stats passed as ``ray.put`` object refs.
"""

from __future__ import annotations

import bisect
import heapq
import math
import os
from dataclasses import dataclass

import numpy as np
import pyarrow.dataset as pads

from pyfuseray.analyzer import Analyzer
from pyfuseray.checkpoint import Manifest, load_manifest
from pyfuseray.codec import decode_block, decode_postings
from pyfuseray.postings import term_bucket
from pyfuseray.scoring import BM25_B, BM25_K1, bm25_idf, tfidf_weight, tfidf_weight_vec


@dataclass
class SegmentRow:
    term: str
    df: int
    cf: int
    blob: bytes
    last_doc: np.ndarray
    max_tf: np.ndarray
    max_bm25: np.ndarray
    offset: np.ndarray


class IndexSearcher:
    def __init__(self, index_dir: str, analyzer: Analyzer | None = None):
        self.index_dir = index_dir
        m = load_manifest(index_dir)
        if m is None or not m.stage_done("done"):
            raise FileNotFoundError(f"no complete index manifest in {index_dir}")
        if not os.path.isdir(os.path.join(index_dir, "segments")):
            raise FileNotFoundError(f"index manifest present but segments/ missing in {index_dir}")
        self.manifest: Manifest = m
        self.analyzer = analyzer or Analyzer()
        self._norm_vals: np.ndarray | None = None
        self._dl_vals: np.ndarray | None = None
        self._seg_datasets: dict[int, pads.Dataset] = {}
        # bounded term -> SegmentRow|None cache (zipfian query terms)
        self._row_cache: dict[str, SegmentRow | None] = {}
        self._row_cache_max = 50_000

    # -- segment lookup -----------------------------------------------------
    def lookup(self, terms: list[str]) -> dict[str, SegmentRow]:
        """Partition-pruned, filter-pushdown read of the terms' segment rows."""
        out: dict[str, SegmentRow] = {}
        cache = self._row_cache
        misses = []
        for t in terms:
            if t in cache:
                row = cache[t]
                if row is not None:
                    out[t] = row
            else:
                misses.append(t)
        if not misses:
            return out
        by_bucket: dict[int, list[str]] = {}
        for t in misses:
            by_bucket.setdefault(term_bucket(t, self.manifest.num_buckets), []).append(t)
        for bucket, ts in by_bucket.items():
            dataset = self._seg_datasets.get(bucket)
            if dataset is None:
                part = os.path.join(self.index_dir, "segments", f"bucket={bucket}")
                if not os.path.isdir(part):
                    continue
                dataset = pads.dataset(part, format="parquet")
                self._seg_datasets[bucket] = dataset
            tbl = dataset.to_table(filter=pads.field("term").isin(ts))
            for i in range(tbl.num_rows):
                row = {c: tbl.column(c)[i].as_py() for c in
                       ("term", "df", "cf", "blob")}
                out[row["term"]] = SegmentRow(
                    term=row["term"],
                    df=int(row["df"]),
                    cf=int(row["cf"]),
                    blob=row["blob"],
                    last_doc=np.asarray(tbl.column("last_doc")[i].as_py(), dtype=np.int64),
                    max_tf=np.asarray(tbl.column("max_tf")[i].as_py(), dtype=np.int64),
                    max_bm25=np.asarray(tbl.column("max_bm25")[i].as_py(), dtype=np.float64),
                    offset=np.asarray(tbl.column("offset")[i].as_py(), dtype=np.int64),
                )
        if len(cache) < self._row_cache_max:
            for t in misses:
                cache[t] = out.get(t)
        return out

    # -- stats sidecars -----------------------------------------------------
    # doc_ids are dense ranks (0..N-1), so docstats loads ONCE into dense
    # numpy arrays indexed by doc_id: O(1) lookups in scoring loops.
    def _load_docstats(self) -> None:
        path = os.path.join(self.index_dir, "stats", "docstats.parquet")
        tbl = pads.dataset(path, format="parquet").to_table()
        ids = tbl.column("doc_id").to_numpy()
        size = max(self.manifest.n_docs, int(ids.max()) + 1 if ids.size else 0)
        # docs absent from the index: norm 1 (InvertedIndex.py:419), dl avgdl
        norms = np.full(size, 1.0, dtype=np.float64)
        dls = np.full(size, self.manifest.avgdl or 1.0, dtype=np.float64)
        norms[ids] = tbl.column("norm").to_numpy().astype(np.float64)
        dls[ids] = tbl.column("dl").to_numpy().astype(np.float64)
        self._norm_vals, self._dl_vals = norms, dls

    def _norms(self) -> np.ndarray:
        if self._norm_vals is None:
            self._load_docstats()
        return self._norm_vals

    def _doclens(self) -> np.ndarray:
        if self._dl_vals is None:
            self._load_docstats()
        return self._dl_vals

    # -- scoring ------------------------------------------------------------
    def search_tfidf(self, query: str, top_k: int = 10) -> list[tuple[int, float]]:
        """Reference-conformant TF-IDF cosine (TAAT, exhaustive)."""
        terms = self.analyzer.preprocess_query(query)
        if not terms:
            return []
        n = self.manifest.n_docs
        rows = self.lookup(sorted(terms))
        doc_parts: list[np.ndarray] = []
        w_parts: list[np.ndarray] = []
        query_norm = 0.0
        for term in sorted(terms):
            row = rows.get(term)
            if row is None:
                continue
            w_tq = tfidf_weight(terms[term], row.df, n)
            query_norm += w_tq * w_tq
            doc_ids, tfs = decode_postings(row.blob, row.offset)
            doc_parts.append(doc_ids)
            w_parts.append(tfidf_weight_vec(tfs, row.df, n) * w_tq)
        if not doc_parts:
            return []
        docs = np.concatenate(doc_parts)
        contribs = np.concatenate(w_parts)
        order = np.argsort(docs, kind="stable")  # stable: preserves term order
        docs, contribs = docs[order], contribs[order]
        uniq, starts = np.unique(docs, return_index=True)
        scores = np.add.reduceat(contribs, starts)
        query_norm = math.sqrt(query_norm)
        if query_norm > 0:
            norms = self._norms()[uniq]
            nz = norms != 0
            scores[nz] = scores[nz] / (query_norm * norms[nz])
        return _topk(uniq, scores, top_k)

    def search_bm25(
        self,
        query: str,
        top_k: int = 10,
        algorithm: str = "auto",
        k1: float = BM25_K1,
        b: float = BM25_B,
    ) -> list[tuple[int, float]]:
        terms = self.analyzer.preprocess_query(query)
        if not terms:
            return []
        rows = self.lookup(sorted(terms))
        present = [t for t in sorted(terms) if t in rows]
        if not present:
            return []
        seg_rows = [rows[t] for t in present]
        # The stored per-block max_bm25 upper bounds were computed with the
        # BUILD-time (k1, b) (manifest.bm25_k1/bm25_b). For any other
        # parameters they are not valid upper bounds and WAND would prune
        # true top-k docs — fall back to exhaustive TAAT, which is exact
        # for arbitrary (k1, b).
        build_k1 = getattr(self.manifest, "bm25_k1", BM25_K1)
        build_b = getattr(self.manifest, "bm25_b", BM25_B)
        if (k1, b) != (build_k1, build_b):
            return self._bm25_taat(seg_rows, top_k, k1, b)
        if algorithm == "auto":
            # WAND's doc-at-a-time loop wins when the threshold can prune:
            # measured on a 160k-doc/20k-vocab index, vectorized TAAT wins
            # for all-selective (tiny lists, decode-all is cheap) AND for
            # all-dense queries (nothing can be skipped); WAND wins in the
            # mixed regime, where high-idf selective terms raise the
            # threshold enough to skip most of the dense lists.
            dfs = [r.df for r in seg_rows]
            total, min_df, max_df = sum(dfs), min(dfs), max(dfs)
            mixed = len(dfs) > 1 and min_df <= 0.05 * max_df
            algorithm = "wand" if (total > 50_000 and mixed) else "taat"
        if algorithm == "wand":
            return self._bm25_wand(seg_rows, top_k, k1, b)
        return self._bm25_taat(seg_rows, top_k, k1, b)

    def _bm25_taat(self, seg_rows: list[SegmentRow], top_k: int, k1: float, b: float) -> list[tuple[int, float]]:
        n = self.manifest.n_docs
        avgdl = self.manifest.avgdl or 1.0
        dl_dense = self._doclens()
        doc_parts, s_parts = [], []
        for row in seg_rows:
            doc_ids, tfs = decode_postings(row.blob, row.offset)
            dls = dl_dense[doc_ids]
            idf = bm25_idf(row.df, n)
            tf = tfs.astype(np.float64)
            denom = tf + k1 * (1.0 - b + b * dls / avgdl)
            s_parts.append(idf * tf * (k1 + 1.0) / denom)
            doc_parts.append(doc_ids)
        docs = np.concatenate(doc_parts)
        contribs = np.concatenate(s_parts)
        order = np.argsort(docs, kind="stable")
        docs, contribs = docs[order], contribs[order]
        uniq, starts = np.unique(docs, return_index=True)
        scores = np.add.reduceat(contribs, starts)
        return _topk(uniq, scores, top_k)

    def _bm25_wand(self, seg_rows: list[SegmentRow], top_k: int, k1: float, b: float) -> list[tuple[int, float]]:
        """Block-max WAND with a bounded min-heap (north-star query path)."""
        n = self.manifest.n_docs
        avgdl = self.manifest.avgdl or 1.0
        dl_dense = self._doclens()
        cursors = [
            _Cursor(row, bm25_idf(row.df, n), k1) for row in seg_rows if len(row.blob)
        ]
        cursors = [c for c in cursors if c.cur_doc is not None]
        heap: list[tuple[float, int]] = []  # min-heap of (score, -doc_id)
        k1_plus1 = k1 + 1.0
        one_minus_b = 1.0 - b

        def threshold() -> float:
            return heap[0][0] if len(heap) >= top_k else -math.inf

        def score_doc(doc: int) -> float:
            s = 0.0
            dl_term = k1 * (one_minus_b + b * float(dl_dense[doc]) / avgdl)
            for c in cursors:
                if c.cur_doc == doc:
                    tf = float(c.cur_tf)
                    s += c.idf * tf * k1_plus1 / (tf + dl_term)
            return s

        while True:
            live = [c for c in cursors if c.cur_doc is not None]
            if not live:
                break
            live.sort(key=lambda c: c.cur_doc)
            theta = threshold()
            # pivot: first cursor where cumulative term upper bound beats theta
            # >= (not >) so exact score ties at the threshold can still be
            # examined — they may win on the doc_id tie-break
            acc = 0.0
            pivot = -1
            for i, c in enumerate(live):
                acc += c.term_ub
                if acc >= theta:
                    pivot = i
                    break
            if pivot < 0:
                break
            pivot_doc = live[pivot].cur_doc
            if live[0].cur_doc == pivot_doc:
                # block-max refinement over EVERY cursor positioned on
                # pivot_doc (cursors beyond the pivot index may sit on it too)
                on_pivot = [c for c in live if c.cur_doc == pivot_doc]
                block_ub = sum(c.block_max_at(pivot_doc) for c in on_pivot)
                if block_ub >= theta:
                    s = score_doc(pivot_doc)
                    # heap key (score, -doc_id): on score ties the larger
                    # doc_id is the min element, so smaller doc_ids win
                    item = (s, -pivot_doc)
                    if len(heap) < top_k:
                        heapq.heappush(heap, item)
                    elif item > heap[0]:
                        heapq.heapreplace(heap, item)
                    # advance EVERY cursor sitting on pivot_doc (cursors
                    # beyond the pivot can also be positioned on it)
                    for c in live:
                        if c.cur_doc == pivot_doc:
                            c.next_geq(pivot_doc + 1)
                else:
                    jump = min(c.block_last_at(pivot_doc) for c in on_pivot) + 1
                    nxt = [c.cur_doc for c in live if c.cur_doc > pivot_doc]
                    if nxt:
                        # docs at/after the next cursor's position gain its
                        # contribution, which the block bound didn't include
                        jump = min(jump, min(nxt))
                    jump = max(jump, pivot_doc + 1)
                    for c in on_pivot:
                        if c.cur_doc is not None and c.cur_doc < jump:
                            c.next_geq(jump)
            else:
                live[0].next_geq(pivot_doc)
        out = sorted(((doc, s) for s, neg in heap for doc in [-neg]),
                     key=lambda kv: (-kv[1], kv[0]))
        return out[:top_k]


class _Cursor:
    """Lazy block-decoding posting-list cursor for WAND.

    Hot-loop state lives in Python lists + bisect (faster than numpy for
    per-element access); blocks decode lazily via the numpy codec.
    """

    __slots__ = (
        "row", "idf", "term_ub", "block_idx", "pos",
        "docs", "tfs", "cur_doc", "cur_tf",
        "_last", "_maxs", "_nblocks",
    )

    def __init__(self, row: SegmentRow, idf: float, k1: float = BM25_K1):
        self.row = row
        self.idf = idf
        self._last: list[int] = row.last_doc.tolist()
        self._maxs: list[float] = row.max_bm25.tolist()
        self._nblocks = len(self._last)
        self.term_ub = max(self._maxs) if self._maxs else idf * (k1 + 1.0)
        self.block_idx = -1
        self.docs: list[int] = []
        self.tfs: list[int] = []
        self.cur_doc: int | None = None
        self.cur_tf = 0
        self._open_block(0)

    def _open_block(self, idx: int) -> None:
        if idx >= self._nblocks:
            self.cur_doc = None
            return
        self.block_idx = idx
        d, t = decode_block(self.row.blob, self.row.offset, idx)
        self.docs = d.tolist()
        self.tfs = t.tolist()
        self.pos = 0
        self.cur_doc = self.docs[0]
        self.cur_tf = self.tfs[0]

    def next_geq(self, target: int) -> None:
        if self.cur_doc is None:
            return
        if self._last[self.block_idx] < target:
            # skip whole blocks via last_doc metadata
            idx = bisect.bisect_left(self._last, target)
            if idx >= self._nblocks:
                self.cur_doc = None
                return
            self._open_block(idx)
            pos = bisect.bisect_left(self.docs, target)
        else:
            pos = bisect.bisect_left(self.docs, target, self.pos)
        # current block's last_doc >= target, so the position exists
        self.pos = pos
        self.cur_doc = self.docs[pos]
        self.cur_tf = self.tfs[pos]

    def block_max_at(self, doc: int) -> float:
        if doc <= self._last[self.block_idx]:
            return self._maxs[self.block_idx]
        idx = bisect.bisect_left(self._last, doc)
        return self._maxs[idx] if idx < self._nblocks else 0.0

    def block_last_at(self, doc: int) -> int:
        if doc <= self._last[self.block_idx]:
            return self._last[self.block_idx]
        idx = bisect.bisect_left(self._last, doc)
        return self._last[idx] if idx < self._nblocks else 1 << 62


def _topk(doc_ids: np.ndarray, scores: np.ndarray, k: int) -> list[tuple[int, float]]:
    """Canonical (-score, doc_id) top-k (SURVEY.md §2.9.5)."""
    if doc_ids.size == 0:
        return []
    k = min(k, doc_ids.size)
    idx = np.lexsort((doc_ids, -scores))[:k]
    return [(int(doc_ids[i]), float(scores[i])) for i in idx]
