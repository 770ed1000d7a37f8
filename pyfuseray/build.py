"""End-to-end index build: corpus Dataset -> immutable index directory.

Pipeline (all stages stream; the only full-postings shuffle is the
per-bucket groupby in stage C):

  A. tokenize: map_batches(TokenizerStage actor pool) ->
     postings_raw/bucket=k/*.parquet (term-hash partitioned on disk)
  B. stats: doclen/avgdl via partial-aggregating groupby over postings
  C. segments: per bucket, groupby((term, salt)).map_groups(encode) ->
     stitch -> term-sorted segments/part-k/.  Resumable per bucket.
  D. df projection + exact norms from the (much smaller) segments
  E. manifest finalize

Index layout (SURVEY.md §7.7):
  out_dir/
    manifest.json
    postings_raw/bucket=k/*.parquet
    segments/part-k/*.parquet
    stats/doclen.parquet  stats/df.parquet  stats/norms.parquet
"""

from __future__ import annotations

import os
import shutil
import time

import pyarrow as pa
import ray.data as rd

from pyfuseray.checkpoint import (
    BucketEntry,
    Manifest,
    load_manifest,
    row_checksum_update,
    save_manifest,
)
from pyfuseray.postings import DEFAULT_NUM_BUCKETS, TokenizerStage
from pyfuseray.segments import build_bucket_segment
from pyfuseray.stats import df_dataset, doclen_dataset, norms_dataset


def _segment_checksum(seg: rd.Dataset) -> tuple[int, int]:
    """Order-insensitive content checksum + row count of segment rows."""

    def partial(batch: pa.Table) -> pa.Table:
        acc = 0
        terms = batch.column("term").to_pylist()
        dfs = batch.column("df").to_pylist()
        blobs = batch.column("blob").to_pylist()
        for t, d, b in zip(terms, dfs, blobs):
            acc = row_checksum_update(acc, t.encode(), str(d).encode(), b)
        return pa.table({"acc": pa.array([str(acc)]), "rows": pa.array([batch.num_rows])})

    acc, rows = 0, 0
    for b in seg.map_batches(partial, batch_format="pyarrow").iter_rows():
        acc = (acc + int(b["acc"])) % (1 << 128)
        rows += int(b["rows"])
    return acc, rows


def build_index(
    corpus: rd.Dataset,
    out_dir: str,
    *,
    n_docs: int | None = None,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
    num_salts: int | None = None,
    split_docs: int = 500_000,
    tokenizer_batch_size: int = 1024,
    tokenizer_concurrency: int | tuple[int, int] | None = None,
    block_size: int | None = None,
    overwrite: bool = False,
) -> Manifest:
    """Build (or resume building) an index from a (doc_id, text) Dataset."""
    if overwrite and os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    m = load_manifest(out_dir) or Manifest()

    if n_docs is None:
        n_docs = corpus.count()
    if num_salts is None:
        num_salts = max(1, n_docs // max(1, split_docs))
    if m.num_buckets and m.num_buckets != num_buckets:
        raise ValueError(
            f"resume with num_buckets={num_buckets} != manifest {m.num_buckets}"
        )
    m.n_docs = n_docs
    m.num_buckets = num_buckets
    m.num_salts = num_salts

    postings_dir = os.path.join(out_dir, "postings_raw")
    segments_dir = os.path.join(out_dir, "segments")
    stats_dir = os.path.join(out_dir, "stats")

    # -- stage A: tokenize -> bucket-partitioned postings ------------------
    if not m.stage_done("postings"):
        t0 = time.perf_counter()
        if tokenizer_concurrency is None:
            # actor pool sized to the cluster, leaving headroom for the
            # read and write stages so the pipeline doesn't serialize
            import ray

            cpus = int(ray.cluster_resources().get("CPU", 4))
            tokenizer_concurrency = (1, max(2, cpus - 2))
        postings = corpus.map_batches(
            TokenizerStage,
            fn_constructor_kwargs={"num_buckets": num_buckets},
            batch_format="pyarrow",
            batch_size=tokenizer_batch_size,
            concurrency=tokenizer_concurrency,
        )
        if os.path.exists(postings_dir):
            shutil.rmtree(postings_dir)  # stage is atomic: redo partial output
        postings.write_parquet(postings_dir, partition_cols=["bucket"])
        m.mark_stage("postings", wall_s=round(time.perf_counter() - t0, 3))
        save_manifest(out_dir, m)

    postings_all = rd.read_parquet(postings_dir)

    # -- stage B: doclen + avgdl -------------------------------------------
    if not m.stage_done("doclen"):
        t0 = time.perf_counter()
        doclen = doclen_dataset(postings_all)
        path = os.path.join(stats_dir, "doclen.parquet")
        if os.path.exists(path):
            shutil.rmtree(path)
        doclen.write_parquet(path)
        total = rd.read_parquet(path).sum("dl") or 0
        m.total_postings = int(total)
        m.avgdl = (total / n_docs) if n_docs else 0.0
        m.mark_stage("doclen", wall_s=round(time.perf_counter() - t0, 3), total_tokens=int(total))
        save_manifest(out_dir, m)

    # -- stage C: per-bucket segment build (resumable per bucket) ----------
    for k in range(num_buckets):
        if m.bucket_done(k):
            continue
        t0 = time.perf_counter()
        bucket_dir = os.path.join(postings_dir, f"bucket={k}")
        part_dir = os.path.join(segments_dir, f"part-{k}")
        if os.path.exists(part_dir):
            shutil.rmtree(part_dir)  # incomplete previous attempt
        if not os.path.exists(bucket_dir):
            # empty bucket: record a zero entry
            m.mark_bucket(BucketEntry(k, part_dir, 0, 0, "0", 0.0))
            save_manifest(out_dir, m)
            continue
        bucket_postings = rd.read_parquet(bucket_dir)
        seg = build_bucket_segment(
            bucket_postings, n_docs=n_docs, avgdl=m.avgdl, num_salts=num_salts,
            block_size=block_size,
        )
        seg.sort("term").write_parquet(part_dir)
        checksum, rows = _segment_checksum(rd.read_parquet(part_dir))
        n_postings = rd.read_parquet(part_dir).sum("df") or 0
        m.mark_bucket(
            BucketEntry(
                bucket=k,
                path=part_dir,
                rows=rows,
                n_postings=int(n_postings),
                checksum=str(checksum),
                build_ms=round((time.perf_counter() - t0) * 1000, 1),
            )
        )
        save_manifest(out_dir, m)

    import glob

    seg_files = sorted(glob.glob(os.path.join(segments_dir, "part-*", "*.parquet")))
    segments_all = rd.read_parquet(seg_files)

    # -- stage D: df + exact norms ------------------------------------------
    if not m.stage_done("df"):
        t0 = time.perf_counter()
        path = os.path.join(stats_dir, "df.parquet")
        if os.path.exists(path):
            shutil.rmtree(path)
        df_dataset(segments_all).write_parquet(path)
        m.mark_stage("df", wall_s=round(time.perf_counter() - t0, 3))
        save_manifest(out_dir, m)

    if not m.stage_done("norms"):
        t0 = time.perf_counter()
        path = os.path.join(stats_dir, "norms.parquet")
        if os.path.exists(path):
            shutil.rmtree(path)
        norms_dataset(segments_all, n_docs).sort("doc_id").write_parquet(path)
        m.mark_stage("norms", wall_s=round(time.perf_counter() - t0, 3))
        save_manifest(out_dir, m)

    m.mark_stage("done")
    save_manifest(out_dir, m)
    return m
