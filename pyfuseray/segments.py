"""Segment build: postings -> delta+varbyte posting-list segments.

Re-expresses the reference's SPIMI spill + k-way merge (reference
``app/InvertedIndexFinal.py:201-236, 287-346``) as a Ray Data shuffle:
``groupby((term, salt)).map_groups(encode)`` assembles each posting
list; ``groupby(term).map_groups(stitch)`` post-merges salted splits.

Skew handling (SURVEY.md §4.2, north-star requirement): every posting
gets ``salt = doc_id * S // N`` — a doc_id-RANGE split so a hot term's
group is bounded by ~N/S postings, and splits arrive in ascending
doc_id ranges. Because every codec block restarts from an absolute
doc_id, stitching is pure blob concatenation (no decode).

BM25 block maxima: the per-posting BM25 score factors as
``idf(df) * g(tf, dl)`` with ``g`` independent of df, so encode stores
per-block ``max_g`` computed from (tf, dl, avgdl) and stitch multiplies
by ``idf`` once global df is known — exact block-max metadata without a
second pass over the postings.

Segment schema (one row per term, term-sorted within a partition file):
    term: string, df: int64, cf: int64, blob: binary,
    last_doc / max_tf: list<int64>, max_bm25: list<float64>,
    offset: list<int64>
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from pyfuseray.codec import EncodedPostings, concat_encoded, encode_postings
from pyfuseray.scoring import BM25_B, BM25_K1, bm25_idf

SEGMENT_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("bucket", pa.int32()),
        ("df", pa.int64()),
        ("cf", pa.int64()),
        ("blob", pa.binary()),
        ("last_doc", pa.list_(pa.int64())),
        ("max_tf", pa.list_(pa.int64())),
        ("max_bm25", pa.list_(pa.float64())),
        ("offset", pa.list_(pa.int64())),
    ]
)

_ENC_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("bucket", pa.int32()),
        ("salt", pa.int64()),
        ("df", pa.int64()),
        ("cf", pa.int64()),
        ("blob", pa.binary()),
        ("last_doc", pa.list_(pa.int64())),
        ("max_tf", pa.list_(pa.int64())),
        ("max_g", pa.list_(pa.float64())),
        ("offset", pa.list_(pa.int64())),
    ]
)


def _bm25_g(tf: np.ndarray, dl: np.ndarray, avgdl: float, k1: float = BM25_K1, b: float = BM25_B) -> np.ndarray:
    """df-independent BM25 factor: score = idf(df) * g(tf, dl)."""
    tf = tf.astype(np.float64)
    return (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl.astype(np.float64) / avgdl))


def make_encode_group(avgdl: float, block_size: int | None = None):
    """Per-(term, salt) group encoder (numpy batch format)."""
    from pyfuseray.codec import BLOCK_SIZE

    block_size = block_size or BLOCK_SIZE

    def encode_group(group: dict[str, np.ndarray]) -> pa.Table:
        term = str(group["term"][0])
        bucket = int(group["bucket"][0])
        salt = int(group["salt"][0])
        doc_ids = group["doc_id"].astype(np.int64)
        tfs = group["tf"].astype(np.int64)
        dls = group["dl"].astype(np.int64)
        order = np.argsort(doc_ids, kind="stable")
        doc_ids, tfs, dls = doc_ids[order], tfs[order], dls[order]
        # merge duplicate (term, doc) pairs by summing tf — cannot occur in
        # this pipeline (tf computed once per doc) but kept for the
        # reference's merge semantics (InvertedIndexFinal.py:240-244)
        if doc_ids.size > 1 and (doc_ids[1:] == doc_ids[:-1]).any():
            uniq, idx = np.unique(doc_ids, return_index=True)
            tfs = np.add.reduceat(tfs, idx)
            dls = dls[idx]
            doc_ids = uniq
        g = _bm25_g(tfs, dls, avgdl)
        enc = encode_postings(doc_ids, tfs, bm25_scores=g, block_size=block_size)
        return pa.table(
            {
                "term": [term],
                "bucket": [bucket],
                "salt": [salt],
                "df": [int(doc_ids.size)],
                "cf": [int(tfs.sum())],
                "blob": [enc.blob],
                "last_doc": [enc.last_doc.tolist()],
                "max_tf": [enc.max_tf.tolist()],
                "max_g": [enc.max_bm25.tolist()],
                "offset": [enc.offset.tolist()],
            },
            schema=_ENC_SCHEMA,
        )

    return encode_group


def make_finalize(n_docs: int):
    """Stitch split posting lists of one term and attach exact BM25 maxima."""

    def finalize_rows(rows: pd.DataFrame) -> pa.Table:
        rows = rows.sort_values("salt")
        parts = [
            EncodedPostings(
                blob=bytes(r.blob),
                last_doc=np.asarray(r.last_doc, dtype=np.int64),
                max_tf=np.asarray(r.max_tf, dtype=np.int64),
                max_bm25=np.asarray(r.max_g, dtype=np.float64),
                offset=np.asarray(r.offset, dtype=np.int64),
            )
            for r in rows.itertuples()
        ]
        stitched = concat_encoded(parts)
        df = int(rows["df"].sum())
        idf = bm25_idf(df, n_docs)
        return pa.table(
            {
                "term": [rows["term"].iloc[0]],
                "bucket": [int(rows["bucket"].iloc[0])],
                "df": [df],
                "cf": [int(rows["cf"].sum())],
                "blob": [stitched.blob],
                "last_doc": [stitched.last_doc.tolist()],
                "max_tf": [stitched.max_tf.tolist()],
                "max_bm25": [(stitched.max_bm25 * idf).tolist()],
                "offset": [stitched.offset.tolist()],
            },
            schema=SEGMENT_SCHEMA,
        )

    return finalize_rows


def build_bucket_segment(
    postings: rd.Dataset,
    *,
    n_docs: int,
    avgdl: float,
    num_salts: int = 1,
    block_size: int | None = None,
    bucket: int | None = None,
) -> rd.Dataset:
    """Build the segment rows for a postings dataset (one bucket or all).

    ``num_salts`` = S; salt = doc_id * S // n_docs bounds every shuffle
    group at ~n_docs/S docs regardless of term hotness. ``bucket`` sets
    a constant bucket id when the input is a single bucket's leaf dir
    (hive reads of the root already carry the column).
    """
    s = max(1, int(num_salts))
    n = max(1, int(n_docs))

    def add_salt(batch: pa.Table) -> pa.Table:
        doc = batch.column("doc_id").to_numpy(zero_copy_only=False)
        salt = (doc.astype(np.int64) * s) // n
        if "bucket" in batch.column_names:
            idx = batch.column_names.index("bucket")
            batch = batch.set_column(
                idx, "bucket", batch.column("bucket").cast(pa.int32())
            )
        else:
            batch = batch.append_column(
                "bucket", pa.array(np.full(batch.num_rows, bucket or 0, dtype=np.int32))
            )
        return batch.append_column("salt", pa.array(salt, type=pa.int64()))

    salted = postings.map_batches(add_salt, batch_format="pyarrow")
    enc = salted.groupby(["term", "salt"]).map_groups(
        make_encode_group(avgdl, block_size), batch_format="numpy"
    )
    if s == 1:
        # one split per term: finalize is a per-row map, no second shuffle
        def finalize_batch(batch: pa.Table) -> pa.Table:
            dfs = batch.column("df").to_numpy(zero_copy_only=False)
            max_g = batch.column("max_g").to_pylist()
            max_bm25 = [
                (np.asarray(g, dtype=np.float64) * bm25_idf(d, n_docs)).tolist()
                for g, d in zip(max_g, dfs)
            ]
            return pa.table(
                {
                    "term": batch.column("term"),
                    "bucket": batch.column("bucket"),
                    "df": batch.column("df"),
                    "cf": batch.column("cf"),
                    "blob": batch.column("blob"),
                    "last_doc": batch.column("last_doc"),
                    "max_tf": batch.column("max_tf"),
                    "max_bm25": pa.array(max_bm25, type=pa.list_(pa.float64())),
                    "offset": batch.column("offset"),
                },
                schema=SEGMENT_SCHEMA,
            )

        return enc.map_batches(finalize_batch, batch_format="pyarrow")
    return enc.groupby("term").map_groups(make_finalize(n_docs), batch_format="pandas")
