"""Incremental index maintenance: add documents to a built index.

The reference rebuilds from scratch on every corpus change
(reference ``app/DataLoader.py:46, 77-89``). Here the expensive stage —
tokenization — runs over the NEW documents only; their SPIMI runs land
as a new postings GENERATION next to the persisted ``postings_raw``
checkpoint, and only the (cheap, wide) merge + stats stages are redone
over the union of generations with updated global stats (n_docs, avgdl,
BM25 block bounds). Segment content is merge-order independent (the
stage-C groupby repartitions by (term, salt)), so the result is
posting-for-posting identical to a one-shot build over the concatenated
corpus, and query results are rank-identical (pytest-pinned in
``tests/test_incremental.py``).

Layout after k adds:

    out_dir/
      manifest.json            (generations: ["postings_raw",
                                "postings_raw_g1", ... "postings_raw_gk"])
      postings_raw/bucket=b/   (generation 0 — the original build)
      postings_raw_g1/bucket=b/
      segments/bucket=b/       (always rebuilt over ALL generations)
      stats/df.parquet  stats/docstats.parquet

Crash safety: a new generation dir is written to ``<dir>.writing`` and
renamed into place BEFORE the manifest records it; the manifest update
clears the segment/stats stage marks in the same atomic write that adds
the generation. A crash after that point leaves a manifest with
``done=False`` — rerun ``finish_add(index_dir)`` (or ``add_documents``
with ``new_corpus=None``) to redo the merge from the recorded
generations. Re-running ``add_documents`` with the same corpus instead
would double-add it; the doc-range check below rejects that.

Scale shape: tokenize streams over the new docs only; the merge is one
groupby shuffle over compressed runs (bytes per posting, not rows); no
stage materializes the corpus. At 10^12 docs the pattern is the
standard log-structured one — frequent small adds should be batched by
the caller, and generations are compacted into segments on every add.
"""

from __future__ import annotations

import os
import shutil
import time

import pyarrow.dataset as pads
import ray.data as rd

from pyfuseray.build import _segment_checksums
from pyfuseray.checkpoint import BucketEntry, Manifest, load_manifest, save_manifest
from pyfuseray.postings import tokenize_batch
from pyfuseray.segments import build_bucket_segment
from pyfuseray.stats import df_dataset, docstats_dataset, total_tokens


def _generations(m: Manifest) -> list[str]:
    return list(getattr(m, "generations", None) or ["postings_raw"])


def _max_doc_id(index_dir: str) -> int:
    """Max indexed doc_id from docstats parquet column statistics (the
    file is doc_id-sorted; fragment stats make this metadata-only)."""
    path = os.path.join(index_dir, "stats", "docstats.parquet")
    ds = pads.dataset(path, format="parquet")
    hi = -1
    for frag in ds.get_fragments():
        for rg in frag.row_groups:
            st = rg.statistics or {}
            mx = (st.get("doc_id") or {}).get("max")
            if mx is not None:
                hi = max(hi, int(mx))
    return hi


def add_documents(
    index_dir: str,
    new_corpus: rd.Dataset | None,
    *,
    n_new: int | None = None,
    tokenizer_batch_size: int = 4096,
) -> Manifest:
    """Add a (doc_id, text) Dataset to a complete index in place.

    New doc_ids must all be greater than every indexed doc_id (assign
    them ``manifest.n_docs, n_docs+1, ...`` for dense-rank corpora).
    ``new_corpus=None`` redoes the merge/stats from the generations the
    manifest already records (crash repair — see module docstring).
    """
    m = load_manifest(index_dir)
    if m is None:
        raise FileNotFoundError(f"no index manifest in {index_dir}")
    gens = _generations(m)

    if new_corpus is not None:
        if not m.stage_done("done"):
            raise RuntimeError(
                f"index in {index_dir} is mid-add (done=False); run "
                "finish_add() before adding more documents"
            )
        if n_new is None:
            n_new = new_corpus.count()
        if n_new == 0:
            return m
        lo = int(new_corpus.min("doc_id"))
        hi_existing = _max_doc_id(index_dir)
        if lo <= hi_existing:
            raise ValueError(
                f"new doc_ids must start above the indexed max ({hi_existing}); "
                f"got min doc_id {lo}"
            )
        gen_name = f"postings_raw_g{len(gens)}"
        gen_dir = os.path.join(index_dir, gen_name)
        tmp = gen_dir + ".writing"
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(gen_dir, ignore_errors=True)
        t0 = time.perf_counter()
        runs = new_corpus.map_batches(
            tokenize_batch,
            fn_kwargs={
                "num_buckets": m.num_buckets,
                "block_size": m.block_size or None,
                "analyzer": m.analyzer,
            },
            batch_format="pyarrow",
            batch_size=tokenizer_batch_size,
        )
        runs.write_parquet(tmp, partition_cols=["bucket"])
        os.replace(tmp, gen_dir)
        new_total = total_tokens(rd.read_parquet(gen_dir, columns=["cf"]))
        # ONE atomic manifest write: record the generation AND invalidate
        # the segment/stats stages it obsoletes
        gens.append(gen_name)
        m.generations = gens
        m.n_docs += n_new
        m.total_postings += new_total
        m.avgdl = (m.total_postings / m.n_docs) if m.n_docs else 0.0
        m.buckets = {}
        for stage in ("df", "docstats", "compression", "done"):
            m.stages.pop(stage, None)
        m.mark_stage(
            f"add_g{len(gens) - 1}",
            wall_s=round(time.perf_counter() - t0, 3),
            n_new=n_new,
            new_tokens=new_total,
        )
        save_manifest(index_dir, m)

    return finish_add(index_dir)


def finish_add(index_dir: str) -> Manifest:
    """Redo merge + stats over all recorded postings generations."""
    m = load_manifest(index_dir)
    if m is None:
        raise FileNotFoundError(f"no index manifest in {index_dir}")
    if m.stage_done("done"):
        return m
    gens = _generations(m)
    segments_dir = os.path.join(index_dir, "segments")
    stats_dir = os.path.join(index_dir, "stats")

    parts = [rd.read_parquet(os.path.join(index_dir, g)) for g in gens]
    postings_all = parts[0].union(*parts[1:]) if len(parts) > 1 else parts[0]

    t0 = time.perf_counter()
    if os.path.exists(segments_dir):
        shutil.rmtree(segments_dir)
    seg = build_bucket_segment(
        postings_all,
        n_docs=m.n_docs,
        avgdl=m.avgdl,
        num_salts=m.num_salts,
        block_size=m.block_size or None,
    )
    seg_mem = seg.sort("term").materialize()
    seg_mem.write_parquet(
        segments_dir, partition_cols=["bucket"],
        # same layout as build_index's fresh write
        max_rows_per_file=4096, row_group_size=256,
    )
    sums = _segment_checksums(seg_mem)
    stage_ms = round((time.perf_counter() - t0) * 1000, 1)
    for k in range(m.num_buckets):
        part_dir = os.path.join(segments_dir, f"bucket={k}")
        checksum, rows, n_postings = sums.get(k, (0, 0, 0))
        m.mark_bucket(
            BucketEntry(k, part_dir, rows, int(n_postings), str(checksum), stage_ms)
        )
    save_manifest(index_dir, m)

    t0 = time.perf_counter()
    path = os.path.join(stats_dir, "df.parquet")
    if os.path.exists(path):
        shutil.rmtree(path)
    df_dataset(seg_mem).write_parquet(path)
    m.mark_stage("df", wall_s=round(time.perf_counter() - t0, 3))
    save_manifest(index_dir, m)

    t0 = time.perf_counter()
    path = os.path.join(stats_dir, "docstats.parquet")
    if os.path.exists(path):
        shutil.rmtree(path)
    # docstats reads the persisted files (canonical block structure both
    # fresh and resumed builds agree on — see build.py stage D)
    segments_disk = rd.read_parquet(segments_dir)
    docstats_dataset(segments_disk, m.n_docs).sort("doc_id").write_parquet(path)
    m.mark_stage("docstats", wall_s=round(time.perf_counter() - t0, 3))
    save_manifest(index_dir, m)

    total_postings = sum(int(v["n_postings"]) for v in m.buckets.values())
    blob_bytes = 0
    for dirpath, _, files in os.walk(segments_dir):
        for f in files:
            if f.endswith(".parquet"):
                blob_bytes += os.path.getsize(os.path.join(dirpath, f))
    m.mark_stage(
        "compression",
        segment_bytes=blob_bytes,
        fixed_width_bytes=total_postings * 8,
        bytes_per_posting=round(blob_bytes / max(1, total_postings), 3),
        ratio_vs_fixed8=round((total_postings * 8) / max(1, blob_bytes), 2),
    )
    m.mark_stage("done")
    save_manifest(index_dir, m)
    return m
