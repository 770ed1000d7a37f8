"""Corpus -> (term, doc_id, tf, dl, bucket) postings via an actor pool.

This is the map side of SPIMI: the reference's per-document analyzer +
term-frequency loop (reference ``app/InvertedIndexFinal.py:152-170``)
becomes a stateful ``map_batches`` stage. The analyzer (stoplist set +
stemmer + compiled regexes + a per-actor stem memo) is built ONCE per
actor in ``__init__`` and reused per batch (reference state T1,
``app/TextPreProcess.py:11-27``).

Each output row carries:
- ``bucket``: crc32(term) % num_buckets — the stable shuffle/partition
  key used for postings_raw layout and per-bucket segment builds
  (python ``hash()`` is process-salted and must never be used);
- ``dl``: the document length (sum of tfs after stop/stem), carried on
  every posting so segment builds can compute exact per-block BM25
  maxima without a doc-side join.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

from pyfuseray.analyzer import Analyzer

DEFAULT_NUM_BUCKETS = 8


def term_bucket(term: str, num_buckets: int) -> int:
    """Stable term -> bucket hash (crc32, never process-salted hash())."""
    return zlib.crc32(term.encode("utf-8")) % num_buckets


class TokenizerStage:
    """Actor-pool map_batches callable: (doc_id, text) -> postings rows."""

    def __init__(self, num_buckets: int = DEFAULT_NUM_BUCKETS):
        self.analyzer = Analyzer()
        self.num_buckets = num_buckets
        self._bucket_memo: dict[str, int] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        terms: list[str] = []
        out_doc: list[int] = []
        out_tf: list[int] = []
        out_dl: list[int] = []
        tf_of = self.analyzer.term_frequencies
        for doc_id, text in zip(doc_ids, texts):
            if not text:
                continue
            tfs = tf_of(text)
            if not tfs:
                continue
            dl = sum(tfs.values())
            for term, tf in tfs.items():
                terms.append(term)
                out_tf.append(tf)
            out_doc.extend([doc_id] * len(tfs))
            out_dl.extend([dl] * len(tfs))
        memo = self._bucket_memo
        nb = self.num_buckets
        buckets = np.empty(len(terms), dtype=np.int32)
        for i, t in enumerate(terms):
            b = memo.get(t)
            if b is None:
                b = zlib.crc32(t.encode("utf-8")) % nb
                memo[t] = b
            buckets[i] = b
        return pa.table(
            {
                "term": pa.array(terms, type=pa.string()),
                "doc_id": pa.array(out_doc, type=pa.int64()),
                "tf": pa.array(out_tf, type=pa.int32()),
                "dl": pa.array(out_dl, type=pa.int32()),
                "bucket": pa.array(buckets, type=pa.int32()),
            }
        )
