"""Global collection statistics as Ray Data aggregates.

- N (doc_count): corpus count — includes zero-token docs, matching the
  reference's ``doc_count = len(documents)`` (``app/InvertedIndexFinal.py:259``).
- doclen: sum(tf) per doc (post-analyzer token count) via a
  partial-aggregating groupby; avgdl = sum(doclen) / N.
- df/cf: projection of the segment rows (no extra shuffle — df is the
  posting-list length, ``app/InvertedIndexFinal.py:249``).
- norms: EXACT post-merge norms (v1 semantics, ``app/InvertedIndex.py:408-419``):
  decode segments -> (doc_id, w^2) -> groupby(doc_id) -> sqrt(sum).
  Contributions are sorted before summation so the float64 result is
  deterministic under any shuffle order. Zero norms -> 1
  (``app/InvertedIndex.py:419``); docs absent from the index default to
  norm 1 at query time.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Max

from pyfuseray.codec import decode_postings
from pyfuseray.scoring import tfidf_weight_vec


def doclen_dataset(postings: rd.Dataset) -> rd.Dataset:
    """(doc_id, dl) from postings rows.

    dl is carried on every posting row, so a per-batch (doc_id, dl)
    dedup first shrinks the shuffle from one row per POSTING to at most
    one row per (doc, batch) — the map-side combine — before the final
    groupby takes the max (all values per doc are equal)."""

    def batch_unique(batch: pa.Table) -> pa.Table:
        doc = batch.column("doc_id").to_numpy(zero_copy_only=False)
        dl = batch.column("dl").to_numpy(zero_copy_only=False)
        uniq, idx = np.unique(doc, return_index=True)
        return pa.table(
            {
                "doc_id": pa.array(uniq, type=pa.int64()),
                "dl": pa.array(dl[idx].astype(np.int64), type=pa.int64()),
            }
        )

    return (
        postings.select_columns(["doc_id", "dl"])
        .map_batches(batch_unique, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Max("dl", alias_name="dl"))
    )


def df_dataset(segments: rd.Dataset) -> rd.Dataset:
    """(term, df, cf) straight off the segment rows."""
    return segments.select_columns(["term", "df", "cf"])


def norms_dataset(segments: rd.Dataset, n_docs: int) -> rd.Dataset:
    """(doc_id, norm) with exact final-df TF-IDF weights."""

    def w2_rows(batch: pa.Table) -> pa.Table:
        out_doc: list[np.ndarray] = []
        out_w2: list[np.ndarray] = []
        dfs = batch.column("df").to_numpy(zero_copy_only=False)
        blobs = batch.column("blob").to_pylist()
        offsets = batch.column("offset").to_pylist()
        for df, blob, offs in zip(dfs, blobs, offsets):
            doc_ids, tfs = decode_postings(blob, np.asarray(offs, dtype=np.int64))
            w = tfidf_weight_vec(tfs, float(df), float(n_docs))
            out_doc.append(doc_ids)
            out_w2.append(w * w)
        if not out_doc:
            return pa.table({"doc_id": pa.array([], pa.int64()), "w2": pa.array([], pa.float64())})
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(out_doc), type=pa.int64()),
                "w2": pa.array(np.concatenate(out_w2), type=pa.float64()),
            }
        )

    def norm_group(group: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        w2 = np.sort(group["w2"])  # deterministic float64 summation order
        norm = float(np.sqrt(w2.sum()))
        return {
            "doc_id": np.asarray([group["doc_id"][0]], dtype=np.int64),
            "norm": np.asarray([norm if norm != 0.0 else 1.0], dtype=np.float64),
        }

    w2 = segments.map_batches(w2_rows, batch_format="pyarrow")
    return w2.groupby("doc_id").map_groups(norm_group, batch_format="numpy")
