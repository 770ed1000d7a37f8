"""End-to-end training-data curation: filter → dedup → partitioned sink.

Composes the individually SQL-checked building blocks — quality scoring
(textstats.quality_stage), exact content dedup (dedup.exact_dedup) and
SimHash near-dedup with keep-one-per-cluster (dedup.simhash_candidates
+ components.keep_canonical) — into the single pipeline a large-scale
training-data run executes, ending in a RESUMABLE hive-partitioned
parquet layout:

    out_dir/lang=<lang>/shard=<doc_id % n_shards>/*.parquet

Reference role: the filter-then-load corpus prep in the reference's
DataLoader (/root/reference/app/DataLoader.py loadData: read, project,
clean) — extended with the dedup stages a web-scale corpus needs and a
partitioned sink the reference lacks (it writes one flat index dir).

Scale shape:
* every stage is a streaming ``map_batches`` or a coarse-bucket shuffle
  whose group count is bounded (exact_dedup / simhash_candidates /
  keep_canonical each document their own shuffle shape); the corpus is
  never materialized on the driver;
* the write goes to a ``.writing`` staging dir and is swapped into
  place with ``os.replace`` (the pipeline.py corpus-checkpoint
  pattern), so readers only ever see a complete layout;
* a ``_MANIFEST.json`` (config + row count + partition list) makes the
  sink idempotent: re-running with the same config returns the
  manifest without recomputation, and downstream jobs use the
  (lang, shard) dirs as their skip/resume unit.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import ray.data as rd

from pyfuseray.extras.components import keep_canonical
from pyfuseray.extras.dedup import exact_dedup, simhash_candidates
from pyfuseray.extras.textstats import quality_stage

MANIFEST_NAME = "_MANIFEST.json"


def _quality_lang_filter(min_quality: float, langs: list[str] | None):
    """Streaming filter stage: quality >= min_quality AND lang in langs.

    Quality is computed by the SAME code path as the hash-checked
    `quality_score` contract entry (quality_stage), so the curation
    filter is bit-identical to its DuckDB oracle expression.
    """
    lang_set = pa.array(sorted(langs)) if langs else None

    def fn(batch: pa.Table) -> pa.Table:
        q = quality_stage(batch)
        mask = pc.greater_equal(q.column("quality"), pa.scalar(min_quality))
        if lang_set is not None:
            mask = pc.and_(mask, pc.is_in(batch.column("lang"), value_set=lang_set))
        return batch.filter(mask)

    return fn


def _add_shard(n_shards: int):
    def fn(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "shard", pa.array((d % n_shards).astype(np.int64))
        )

    return fn


def curate_corpus(
    docs: rd.Dataset,
    out_dir: str,
    *,
    min_quality: float = 0.35,
    langs: list[str] | None = None,
    n_shards: int = 16,
    simhash_blocks: int = 4,
    resume: bool = True,
) -> dict:
    """Run the curation pipeline and write the partitioned corpus.

    Stages (order is part of the contract — the DuckDB oracle replays
    the same order):
      1. quality/lang filter (streaming, no shuffle);
      2. exact content dedup keep-min-id (one coarse-bucket shuffle);
      3. SimHash hamming<=3 near-dedup, keep the min-id canonical doc
         per duplicate cluster (pair-sized intermediate state);
      4. shard = doc_id % n_shards; hive-partitioned parquet write by
         (lang, shard), atomic swap + manifest.

    Returns the manifest dict (``resumed=True`` when a matching
    manifest short-circuited the run).
    """
    config = {
        "min_quality": min_quality,
        "langs": sorted(langs) if langs else None,
        "n_shards": n_shards,
        "simhash_blocks": simhash_blocks,
    }
    manifest_path = os.path.join(out_dir, MANIFEST_NAME)
    if resume and os.path.exists(manifest_path):
        with open(manifest_path) as f:
            manifest = json.load(f)
        if manifest.get("config") == config:
            return {**manifest, "resumed": True}

    filtered = docs.map_batches(
        _quality_lang_filter(min_quality, langs), batch_format="pyarrow"
    )
    survivors = exact_dedup(filtered)
    pairs = simhash_candidates(
        survivors.select_columns(["doc_id", "text"]), n_blocks=simhash_blocks
    ).select_columns(["a", "b"])
    curated = keep_canonical(survivors, pairs).map_batches(
        _add_shard(n_shards), batch_format="pyarrow"
    )

    tmp = out_dir.rstrip("/") + ".writing"
    shutil.rmtree(tmp, ignore_errors=True)
    # an all-filtered corpus writes zero files (no dir): create it so the
    # manifest + atomic swap still land
    os.makedirs(tmp, exist_ok=True)
    curated.write_parquet(tmp, partition_cols=["lang", "shard"])

    # row count + partition list from parquet metadata (no second scan)
    written = pads.dataset(tmp, format="parquet", partitioning="hive")
    n_docs_out = written.count_rows()
    parts = sorted(
        {os.path.relpath(os.path.dirname(f), tmp) for f in written.files}
    )
    manifest = {"config": config, "n_docs_out": n_docs_out, "partitions": parts}
    with open(os.path.join(tmp, MANIFEST_NAME), "w") as f:
        json.dump(manifest, f, indent=1)

    shutil.rmtree(out_dir, ignore_errors=True)
    os.replace(tmp, out_dir)
    return {**manifest, "resumed": False}


def read_curated(out_dir: str) -> rd.Dataset:
    """Read a curated layout back (hive partition columns restored)."""
    paths = [
        os.path.join(r, fn)
        for r, _, fns in os.walk(out_dir)
        for fn in fns
        if fn.endswith(".parquet")
    ]
    return rd.read_parquet(sorted(paths))
