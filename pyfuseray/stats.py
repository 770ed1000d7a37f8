"""Global collection statistics as Ray Data aggregates.

- N (doc_count): corpus count — includes zero-token docs, matching the
  reference's ``doc_count = len(documents)`` (``app/InvertedIndexFinal.py:259``).
- avgdl: total token count via a native shuffle-free sum over run rows.
- df/cf: projection of the segment rows (no extra shuffle — df is the
  posting-list length, ``app/InvertedIndexFinal.py:249``).
- docstats (doc length + EXACT post-merge cosine norms, v1 semantics
  ``app/InvertedIndex.py:408-419``): decode segments ->
  (doc_id, tf, w^2) -> one doc-range-bucketed shuffle -> vectorized
  per-doc reductions. w^2 contributions are sorted within each doc
  before summation so the float64 norm is deterministic under any
  shuffle order. Zero norms -> 1 (``app/InvertedIndex.py:419``); docs
  absent from the index default to norm 1 at query time.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from pyfuseray.codec import decode_postings
from pyfuseray.scoring import tfidf_weight_vec


def total_tokens(runs: rd.Dataset) -> int:
    """Collection token count = sum(cf) over run rows — a native,
    shuffle-free aggregate (avgdl = total_tokens / N)."""
    return int(runs.sum("cf") or 0)


def df_dataset(segments: rd.Dataset) -> rd.Dataset:
    """(term, df, cf) straight off the segment rows."""
    return segments.select_columns(["term", "df", "cf"])


DOC_BUCKET = 4096


def docstats_dataset(
    segments: rd.Dataset, n_docs: int, *, batch_size: int = 256
) -> rd.Dataset:
    """(doc_id, dl, norm): doc length AND exact final-df cosine norm in
    ONE decode pass + ONE doc_id-keyed shuffle over the (compressed)
    segments — dl = sum(tf), norm = sqrt(sum w^2) with zero -> 1.

    The shuffle key is ``doc_id // DOC_BUCKET`` (a doc-RANGE bucket), not
    doc_id itself: each group then holds ~DOC_BUCKET complete documents
    and the per-doc reductions run as vectorized numpy segment ops
    (lexsort + reduceat) instead of one Python call per document. w^2
    contributions are sorted within each doc before summation so the
    float64 norm is deterministic under any shuffle order."""

    def tf_w2_partials(batch: pa.Table) -> pa.Table:
        """Decode + map-side combine: one partial (dl, sum w^2) row per
        (doc, batch) instead of one row per POSTING — the shuffle then
        moves ~terms-per-batch times fewer rows. The within-doc partial
        sums ascending w^2 values (lexsort) so a doc fully contained in
        one batch gets a bit-deterministic sum; cross-batch partials
        combine in shuffle order (differences ~1e-16, far inside the
        1e-9 conformance tolerance).

        Decode stays per-ROW on purpose: a joint whole-batch varbyte
        decode was tried and measured 3x SLOWER — its O(bytes)
        temporaries (~40 B per input byte) blow the cache and pay
        allocation stalls under memory pressure, while per-blob arrays
        stay L2-resident and reuse warm allocator blocks."""
        out_doc: list[np.ndarray] = []
        out_tf: list[np.ndarray] = []
        out_w2: list[np.ndarray] = []
        dfs = batch.column("df").to_numpy(zero_copy_only=False)
        blobs = batch.column("blob").to_pylist()
        offsets = batch.column("offset").to_pylist()
        for df, blob, offs in zip(dfs, blobs, offsets):
            doc_ids, tfs = decode_postings(blob, np.asarray(offs, dtype=np.int64))
            w = tfidf_weight_vec(tfs, float(df), float(n_docs))
            out_doc.append(doc_ids)
            out_tf.append(tfs)
            out_w2.append(w * w)
        if not out_doc:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "doc_bucket": pa.array([], pa.int64()),
                    "dl": pa.array([], pa.int64()),
                    "w2": pa.array([], pa.float64()),
                }
            )
        doc = np.concatenate(out_doc)
        tf = np.concatenate(out_tf)
        w2 = np.concatenate(out_w2)
        order = np.lexsort((w2, doc))
        doc, tf, w2 = doc[order], tf[order], w2[order]
        uniq, starts = np.unique(doc, return_index=True)
        return pa.table(
            {
                "doc_id": pa.array(uniq, type=pa.int64()),
                "doc_bucket": pa.array(uniq // DOC_BUCKET, type=pa.int64()),
                "dl": pa.array(np.add.reduceat(tf, starts), type=pa.int64()),
                "w2": pa.array(np.add.reduceat(w2, starts), type=pa.float64()),
            }
        )

    def bucket_stats(group: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        if len(group.get("doc_id", ())) == 0:
            # dtype-stable empty block (anything else trips Ray's
            # RefBundle schema-mismatch warning downstream)
            return {"doc_id": np.empty(0, np.int64),
                    "dl": np.empty(0, np.int64),
                    "norm": np.empty(0, np.float64)}
        doc = group["doc_id"].astype(np.int64)
        dl = group["dl"].astype(np.int64)
        w2 = group["w2"].astype(np.float64)
        order = np.lexsort((w2, doc))
        doc, dl, w2 = doc[order], dl[order], w2[order]
        uniq, starts = np.unique(doc, return_index=True)
        dl_sum = np.add.reduceat(dl, starts)
        norm = np.sqrt(np.add.reduceat(w2, starts))
        norm[norm == 0.0] = 1.0
        return {"doc_id": uniq, "dl": dl_sum, "norm": norm}

    # explicit batch_size: segment blocks/files are tiny (term-sorted
    # writes produce ~dozen-row blocks), and per-block batches make the
    # map-side combine collapse nothing — one partial row per POSTING
    # goes through the shuffle. Each ~256-term batch still covers most
    # doc ids, so the combine emits ~n_docs rows per batch instead
    # (60M postings -> bounded shuffle rows on the 400k-page corpus).
    # 256 over 1024: 4x the tasks (load balance at 32 CPUs — the 20k-row
    # segment table at bs=1024 is only ~20 tasks) AND each batch's
    # lexsort/unique runs on ~1.2M elements instead of ~4.8M, which is
    # superlinearly cheaper and cache-resident. Measured on the same
    # on-disk 400k-page index: 32 CPUs 20.0 -> 10.5 s, 8 CPUs
    # 26.4 -> 17.5 s (bs=128 is not better; bs=2048 is 2-3x worse).
    rows = segments.map_batches(
        tf_w2_partials, batch_format="pyarrow", batch_size=batch_size
    )
    return rows.groupby("doc_bucket").map_groups(bucket_stats, batch_format="numpy")
