"""Corpus -> encoded SPIMI run rows via an actor pool.

This is the map side of SPIMI (reference ``app/InvertedIndexFinal.py:
152-170, 201-236``): each input batch of documents becomes one sorted
in-memory "block" that is immediately delta+varbyte-encoded into one
run row per term:

    (term, bucket, first_doc, last_doc_max, df, cf,
     blob, last_doc: list, max_tf: list, min_dl: list, offset: list)

Runs are doc_id-sorted internally and (for a doc_id-ordered corpus)
disjoint in doc range across batches, so the reduce side merges them by
pure blob concatenation — the shuffle moves compressed runs (~bytes per
posting) instead of one row per posting.

The analyzer (stoplist + stemmer + memo tables) is built ONCE per actor
in ``__init__`` (reference state T1); the per-batch encode path is
vectorized numpy over the whole batch (one lexsort + one varbyte_encode
call), not a per-term Python encode loop.

``bucket = crc32(term) % num_buckets`` is the stable shuffle/partition
key (python ``hash()`` is process-salted and must never be used).
``min_dl`` per block makes BM25 block upper bounds computable at merge
time (g(tf, dl) is increasing in tf and decreasing in dl) without
carrying doc lengths per posting.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

from pyfuseray.analyzer import make_analyzer
from pyfuseray.codec import BLOCK_SIZE, varbyte_encode

DEFAULT_NUM_BUCKETS = 8

RUN_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("bucket", pa.int32()),
        ("first_doc", pa.int64()),
        ("last_doc_max", pa.int64()),
        ("df", pa.int64()),
        ("cf", pa.int64()),
        ("blob", pa.binary()),
        ("last_doc", pa.list_(pa.int64())),
        ("max_tf", pa.list_(pa.int64())),
        ("min_dl", pa.list_(pa.int64())),
        ("offset", pa.list_(pa.int64())),
    ]
)


def term_bucket(term: str, num_buckets: int) -> int:
    """Stable term -> bucket hash (crc32, never process-salted hash())."""
    return zlib.crc32(term.encode("utf-8")) % num_buckets


def encode_runs(
    terms: list[str],
    docs: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    num_buckets: int,
    bucket_memo: dict[str, int],
    block_size: int = BLOCK_SIZE,
) -> pa.Table:
    """Vectorized: flat (term, doc, tf, dl) postings -> one run row per term.

    One lexsort + one varbyte_encode over the whole batch; per-term work
    is only cheap slicing of precomputed arrays.
    """
    n = len(terms)
    if n == 0:
        return pa.table({}, schema=RUN_SCHEMA)
    # term -> dense int code via dict (np.unique on object strings does
    # per-element Python comparisons and dominates the batch otherwise)
    code_of: dict[str, int] = {}
    inv = np.empty(n, dtype=np.int64)
    setdefault = code_of.setdefault
    for i, t in enumerate(terms):
        inv[i] = setdefault(t, len(code_of))
    codes = list(code_of)
    order = np.lexsort((docs, inv))
    return encode_sorted_runs(
        codes, inv[order], docs[order], tfs[order], dls[order],
        num_buckets, bucket_memo, block_size,
    )


def encode_sorted_runs(
    codes: list[str],
    inv_s: np.ndarray,
    docs_s: np.ndarray,
    tfs_s: np.ndarray,
    dls_s: np.ndarray,
    num_buckets: int,
    bucket_memo: dict[str, int],
    block_size: int = BLOCK_SIZE,
) -> pa.Table:
    """Encode postings ALREADY sorted by (term code, doc_id) into run rows.

    ``codes[inv_s[i]]`` is posting i's term. The core of ``encode_runs``,
    exposed so callers that already hold (run, doc)-ordered postings —
    the tokenizer after its lexsort, and ``deletes.compact`` after
    filtering decoded runs (order-preserving mask) — skip the re-sort.
    """
    n = int(inv_s.size)
    if n == 0:
        return pa.table({}, schema=RUN_SCHEMA)
    # run (term) boundaries in the sorted arrays
    run_starts = np.flatnonzero(np.concatenate(([True], inv_s[1:] != inv_s[:-1])))
    run_ends = np.concatenate((run_starts[1:], [n]))
    # block starts: every block_size-th position WITHIN its run
    run_idx = np.repeat(np.arange(run_starts.size), run_ends - run_starts)
    within = np.arange(n, dtype=np.int64) - run_starts[run_idx]
    is_block_start = (within % block_size) == 0
    block_starts = np.flatnonzero(is_block_start)
    # deltas with absolute restart at block starts
    deltas = np.empty(n, dtype=np.uint64)
    deltas[1:] = (docs_s[1:] - docs_s[:-1]).astype(np.uint64)
    deltas[block_starts] = docs_s[block_starts].astype(np.uint64)
    values = np.empty(2 * n, dtype=np.uint64)
    values[0::2] = deltas
    values[1::2] = tfs_s.astype(np.uint64)
    blob_all, nbytes = varbyte_encode(values)
    cum = np.concatenate(([0], np.cumsum(nbytes)))
    value_byte_start = cum[0::2][:n]  # byte offset of each posting's delta
    # per-block metadata (global, split per run below)
    block_ends = np.concatenate((block_starts[1:], [n]))
    # a block never crosses a run boundary (within resets per run)
    blk_last = docs_s[block_ends - 1]
    blk_maxtf = np.maximum.reduceat(tfs_s, block_starts)
    blk_mindl = np.minimum.reduceat(dls_s, block_starts)
    blk_offsets = value_byte_start[block_starts]
    blk_run = run_idx[block_starts]
    blk_bounds = np.searchsorted(blk_run, np.arange(run_starts.size + 1))
    # per-run aggregates
    run_first = docs_s[run_starts]
    run_last = docs_s[run_ends - 1]
    run_df = run_ends - run_starts
    run_cf = np.add.reduceat(tfs_s, run_starts)
    run_byte_start = value_byte_start[run_starts]

    # only the term strings + bucket memo need a Python loop; every list/
    # binary column is built from the global per-block arrays via arrow
    # offset construction (zero per-run list building, zero blob copies —
    # the blob column shares blob_all's buffer)
    out_terms, out_bucket = [], np.empty(run_starts.size, dtype=np.int32)
    for r in range(run_starts.size):
        t = codes[inv_s[run_starts[r]]]
        out_terms.append(t)
        b = bucket_memo.get(t)
        if b is None:
            b = zlib.crc32(t.encode("utf-8")) % num_buckets
            bucket_memo[t] = b
        out_bucket[r] = b
    blk_off32 = pa.array(blk_bounds.astype(np.int32), pa.int32())

    def _list(values: np.ndarray) -> pa.ListArray:
        return pa.ListArray.from_arrays(blk_off32, pa.array(values, pa.int64()))

    blob_offsets = np.concatenate((run_byte_start, [len(blob_all)])).astype(np.int32)
    blob_arr = pa.Array.from_buffers(
        pa.binary(), run_starts.size,
        [None, pa.py_buffer(blob_offsets.tobytes()), pa.py_buffer(blob_all)],
    )
    return pa.table(
        {
            "term": pa.array(out_terms, pa.string()),
            "bucket": pa.array(out_bucket, pa.int32()),
            "first_doc": pa.array(run_first, pa.int64()),
            "last_doc_max": pa.array(run_last, pa.int64()),
            "df": pa.array(run_df.astype(np.int64), pa.int64()),
            "cf": pa.array(run_cf.astype(np.int64), pa.int64()),
            "blob": blob_arr,
            "last_doc": _list(blk_last),
            "max_tf": _list(blk_maxtf),
            "min_dl": _list(blk_mindl),
            "offset": _list(blk_offsets - run_byte_start[blk_run]),
        },
        schema=RUN_SCHEMA,
    )


# per-worker-process TokenizerStage cache for the plain-function
# map_batches path (tokenize_batch below)
_STAGE_CACHE: dict[tuple[int, int, str], "TokenizerStage"] = {}


def tokenize_batch(
    batch: pa.Table, *, num_buckets: int = DEFAULT_NUM_BUCKETS,
    block_size: int | None = None, analyzer: str = "reference",
) -> pa.Table:
    """Plain-function tokenizer for ``map_batches`` (task path).

    State (analyzer, stoplist, memo tables) is still built once per
    worker PROCESS — cached in a module global — but tasks schedule on
    the worker processes Ray already started for earlier pipeline
    stages, avoiding the actor pool's cold start (measured 5-10 s to
    spawn ~30 fresh actor processes for a stage that only runs ~15 s).
    Semantically identical to ``TokenizerStage`` (reference state T1:
    setup once per worker, work per batch)."""
    key = (num_buckets, block_size or BLOCK_SIZE, analyzer)
    stage = _STAGE_CACHE.get(key)
    if stage is None:
        stage = _STAGE_CACHE[key] = TokenizerStage(num_buckets, block_size, analyzer)
    return stage(batch)


class TokenizerStage:
    """Actor-pool map_batches callable: (doc_id, text) -> run rows."""

    def __init__(self, num_buckets: int = DEFAULT_NUM_BUCKETS,
                 block_size: int | None = None, analyzer: str = "reference"):
        self.analyzer = make_analyzer(analyzer)
        self.num_buckets = num_buckets
        self.block_size = block_size or BLOCK_SIZE
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
        return encode_runs(
            terms,
            np.asarray(out_doc, dtype=np.int64),
            np.asarray(out_tf, dtype=np.int64),
            np.asarray(out_dl, dtype=np.int64),
            self.num_buckets,
            self._bucket_memo,
            self.block_size,
        )
