"""Profile the pages build per-stage at a given CPU count.

    python scripts/profile_build.py [ncpus] [n_pages]

Prints one JSON line with total wall + per-stage manifest walls.
Scratch under /tmp; reuses bench corpus cache.
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ["PYTHONPATH"] = REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

ncpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
n_pages = int(sys.argv[2]) if len(sys.argv) > 2 else 400_000

import ray

ray.init(address="local", num_cpus=ncpus, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

import pyarrow.parquet as pq
import ray.data as rd

from pyfuseray.pages import synth_pages
from pyfuseray.pipeline import build_from_pages

pages_path = f"/tmp/pyfuseray_bench_pages_{n_pages}_20000_80_400.parquet"
if not os.path.exists(pages_path):
    pq.write_table(
        synth_pages(n_pages, seed=42, null_text_frac=0.15, dup_frac=0.02,
                    vocab_size=20000, words_per_doc=(80, 400)),
        pages_path, row_group_size=4096,
    )
with open(pages_path, "rb") as fh:
    while fh.read(1 << 24):
        pass

ix = f"/tmp/pyfuseray_prof_ix_{ncpus}"
t0 = time.perf_counter()
m = build_from_pages(
    rd.read_parquet(pages_path), ix,
    corpus_dir=f"/tmp/pyfuseray_prof_corpus_{ncpus}",
    num_buckets=8, overwrite=True,
)
total = time.perf_counter() - t0
stages = {k: v.get("wall_s") for k, v in m.stages.items() if isinstance(v, dict)}
seg_ms = [v["build_ms"] for v in m.buckets.values()]
print(json.dumps({
    "ncpus": ncpus, "n_pages": n_pages, "total_s": round(total, 2),
    "stages": stages, "segment_stage_ms": max(seg_ms) if seg_ms else None,
}))
ray.shutdown()
