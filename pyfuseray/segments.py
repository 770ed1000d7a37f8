"""Segment build: SPIMI run rows -> merged posting-list segments.

Re-expresses the reference's k-way block merge (reference
``app/InvertedIndexFinal.py:287-346``) as a Ray Data shuffle over
ENCODED runs: the tokenizer already emitted doc_id-sorted delta+varbyte
runs per (term, batch), so the merge is pure blob concatenation —
every codec block restarts from an absolute doc_id, and runs from a
doc_id-ordered corpus cover disjoint doc ranges. A decode-merge-reencode
fallback handles overlapping ranges (unordered corpora), summing tf for
duplicate (term, doc) pairs (reference merge semantics,
``app/InvertedIndexFinal.py:240-244``).

Skew handling (north-star requirement): ``salt = first_doc * S // N``
splits a hot term's runs into S doc-range groups; the per-term stitch
of split lists is again concatenation.

BM25 block metadata: runs carry per-block (max_tf, min_dl); since
g(tf, dl) is increasing in tf and decreasing in dl, the finalize step
attaches ``max_bm25 = idf(df) * g(max_tf, min_dl)`` — a tight, valid
per-block upper bound for block-max WAND — once global df is known.
Heavily fragmented lists (many tiny per-batch blocks) are re-blocked by
a vectorized decode + re-encode in finalize.

Final segment schema (one row per term, term-sorted within files):
    term, bucket, df, cf, blob, last_doc/max_tf: list<int64>,
    max_bm25: list<float64>, offset: list<int64>
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from pyfuseray.codec import BLOCK_SIZE, decode_postings, encode_postings
from pyfuseray.postings import RUN_SCHEMA
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

_MERGED_SCHEMA = RUN_SCHEMA  # merge preserves the run schema


def _bm25_g(tf: np.ndarray, dl: np.ndarray, avgdl: float,
            k1: float = BM25_K1, b: float = BM25_B) -> np.ndarray:
    """df-independent BM25 factor: score = idf(df) * g(tf, dl)."""
    tf = tf.astype(np.float64)
    return (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl.astype(np.float64) / avgdl))


def merge_runs(group: pd.DataFrame) -> pa.Table:
    """Merge one (term[, salt]) group of runs into a single run row."""
    rows = group.sort_values("first_doc")
    firsts = rows["first_doc"].to_numpy()
    lasts = rows["last_doc_max"].to_numpy()
    disjoint = bool(np.all(firsts[1:] > lasts[:-1])) if len(rows) > 1 else True
    if disjoint:
        blobs, l_last, l_maxtf, l_mindl, l_off = [], [], [], [], []
        shift = 0
        for r in rows.itertuples():
            blobs.append(bytes(r.blob))
            l_last.extend(r.last_doc)
            l_maxtf.extend(r.max_tf)
            l_mindl.extend(r.min_dl)
            l_off.extend([o + shift for o in r.offset])
            shift += len(r.blob)
        blob = b"".join(blobs)
        df = int(rows["df"].sum())
        cf = int(rows["cf"].sum())
    else:
        # fallback: overlapping doc ranges (unordered corpus) — decode,
        # merge summing tf per doc, re-encode
        all_docs, all_tfs, all_mindl = [], [], []
        for r in rows.itertuples():
            d, t = decode_postings(bytes(r.blob), np.asarray(r.offset, dtype=np.int64))
            all_docs.append(d)
            all_tfs.append(t)
            all_mindl.append(min(r.min_dl) if len(r.min_dl) else 1)
        docs = np.concatenate(all_docs)
        tfs = np.concatenate(all_tfs)
        order = np.argsort(docs, kind="stable")
        docs, tfs = docs[order], tfs[order]
        uniq, starts = np.unique(docs, return_index=True)
        tfs = np.add.reduceat(tfs, starts)
        enc = encode_postings(uniq, tfs)
        blob = enc.blob
        l_last = enc.last_doc.tolist()
        l_maxtf = enc.max_tf.tolist()
        l_mindl = [int(min(all_mindl))] * len(l_last)
        l_off = enc.offset.tolist()
        df, cf = int(uniq.size), int(tfs.sum())
    return pa.table(
        {
            "term": [rows["term"].iloc[0]],
            "bucket": [int(rows["bucket"].iloc[0])],
            "first_doc": [int(firsts[0])],
            "last_doc_max": [int(l_last[-1]) if l_last else int(lasts[-1])],
            "df": [df],
            "cf": [cf],
            "blob": [blob],
            "last_doc": [list(map(int, l_last))],
            "max_tf": [list(map(int, l_maxtf))],
            "min_dl": [list(map(int, l_mindl))],
            "offset": [list(map(int, l_off))],
        },
        schema=_MERGED_SCHEMA,
    )


def make_finalize(n_docs: int, avgdl: float, block_size: int | None = None):
    """Merged run row -> final segment row with BM25 block upper bounds.

    Re-blocks lists whose per-batch blocks got too fragmented (vectorized
    decode + re-encode; the new blocks use the term-global min_dl for
    their — still valid — BM25 bound).
    """
    bs = block_size or BLOCK_SIZE

    def finalize(batch: pa.Table) -> pa.Table:
        out = {k: [] for k in ("term", "bucket", "df", "cf", "blob",
                               "last_doc", "max_tf", "max_bm25", "offset")}
        for i in range(batch.num_rows):
            term = batch.column("term")[i].as_py()
            bucket = batch.column("bucket")[i].as_py()
            df = batch.column("df")[i].as_py()
            cf = batch.column("cf")[i].as_py()
            blob = batch.column("blob")[i].as_py()
            last_doc = batch.column("last_doc")[i].as_py()
            max_tf = batch.column("max_tf")[i].as_py()
            min_dl = batch.column("min_dl")[i].as_py()
            offset = batch.column("offset")[i].as_py()
            idf = bm25_idf(df, n_docs)
            if len(last_doc) > 2 * max(1, -(-df // bs)):
                d, t = decode_postings(blob, np.asarray(offset, dtype=np.int64))
                enc = encode_postings(d, t, block_size=bs)
                term_min_dl = float(min(min_dl)) if min_dl else 1.0
                g = _bm25_g(enc.max_tf, np.full(enc.max_tf.size, term_min_dl), avgdl)
                blob = enc.blob
                last_doc = enc.last_doc.tolist()
                max_tf = enc.max_tf.tolist()
                offset = enc.offset.tolist()
                max_bm25 = (idf * g).tolist()
            else:
                g = _bm25_g(
                    np.asarray(max_tf, dtype=np.int64),
                    np.asarray(min_dl, dtype=np.int64),
                    avgdl,
                )
                max_bm25 = (idf * g).tolist()
            out["term"].append(term)
            out["bucket"].append(bucket)
            out["df"].append(df)
            out["cf"].append(cf)
            out["blob"].append(blob)
            out["last_doc"].append(last_doc)
            out["max_tf"].append(max_tf)
            out["max_bm25"].append(max_bm25)
            out["offset"].append(offset)
        return pa.table(out, schema=SEGMENT_SCHEMA)

    return finalize


def build_bucket_segment(
    runs: rd.Dataset,
    *,
    n_docs: int,
    avgdl: float,
    num_salts: int = 1,
    block_size: int | None = None,
    bucket: int | None = None,
) -> rd.Dataset:
    """Merge run rows into final segment rows (one bucket or all).

    ``num_salts`` = S; salt = first_doc * S // n_docs splits hot terms'
    runs into bounded doc-range groups. ``bucket`` sets a constant
    bucket id when reading a single bucket's leaf dir (hive reads of
    the root already carry the column).
    """
    s = max(1, int(num_salts))
    n = max(1, int(n_docs))

    def add_salt(batch: pa.Table) -> pa.Table:
        first = batch.column("first_doc").to_numpy(zero_copy_only=False)
        salt = (first.astype(np.int64) * s) // n
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

    salted = runs.map_batches(add_salt, batch_format="pyarrow")
    if s == 1:
        merged = salted.groupby("term").map_groups(merge_runs, batch_format="pandas")
    else:
        part = salted.groupby(["term", "salt"]).map_groups(
            merge_runs, batch_format="pandas"
        )
        merged = part.groupby("term").map_groups(merge_runs, batch_format="pandas")
    return merged.map_batches(
        make_finalize(n_docs, avgdl, block_size), batch_format="pyarrow"
    )
