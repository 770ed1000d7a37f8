"""Memory-bandwidth ceiling probe for the scaling analysis (BASELINE.md).

Runs the IDENTICAL tokenize workload (the build's dominant parallel
stage: regex scan + dict memo over zipfian text) in K independent
processes — no Ray, no shared state, no disk — and reports the per-
process wall time at each K. On hardware where cores are independent,
per-process wall is flat in K; on this sandbox it inflates well before
K reaches the 32 advertised cores while /proc/stat steal stays 0,
i.e. the shared resource is the node's DRAM/LLC bandwidth, not CPU.

That ceiling bounds single-NODE scaling efficiency for string-heavy
stages no matter how the work is scheduled; on the north rule's N vs
4N NODE clusters each node brings its own memory channels, so the
cluster proxy measured by `bench.py --scaling` is conservative.

Usage: python scripts/membw_probe.py [K ...]   (default: 1 4 8 16 32)
Prints one JSON line.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _work(seed: int) -> float:
    """Tokenize ~4k synthetic docs with the production analyzer."""
    from pyfuseray.analyzer import make_analyzer
    from pyfuseray.pages import synth_pages

    texts = synth_pages(
        4000, seed=seed, null_text_frac=0.0, dup_frac=0.0,
        vocab_size=20_000, words_per_doc=(80, 400),
    ).column("text").to_pylist()
    a = make_analyzer("reference")
    t0 = time.perf_counter()
    total = 0
    for t in texts:
        total += len(a.term_frequencies(t))
    assert total > 0
    return time.perf_counter() - t0


def probe(k: int) -> dict:
    with mp.get_context("spawn").Pool(k) as pool:
        walls = pool.map(_work, range(k))
    return {
        "k": k,
        "per_proc_wall_s": round(sum(walls) / len(walls), 2),
        "max_wall_s": round(max(walls), 2),
    }


def main() -> None:
    ks = [int(x) for x in sys.argv[1:]] or [1, 4, 8, 16, 32]
    rows = [probe(k) for k in ks]
    base = rows[0]["per_proc_wall_s"]
    for r in rows:
        r["slowdown_vs_k1"] = round(r["per_proc_wall_s"] / base, 2)
    print(json.dumps({"metric": "per-process tokenize wall vs concurrency",
                      "rows": rows}))


if __name__ == "__main__":
    main()
