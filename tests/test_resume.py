"""Checkpoint/resume: interrupted builds resume from the last completed
segment and produce content-identical indexes (north-rule requirement)."""

import glob
import json
import os
import shutil

import pyarrow.dataset as pads
import ray.data as rd

from pyfuseray.build import build_index
from pyfuseray.checkpoint import load_manifest, manifest_path
from pyfuseray.query import IndexSearcher
from tests.corpora import PANGRAM_DOCS, PANGRAM_QUERIES


def _corpus():
    return rd.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(PANGRAM_DOCS)]
    ).repartition(4)


def _segment_content(index_dir):
    files = sorted(glob.glob(os.path.join(index_dir, "segments", "bucket=*", "*.parquet")))
    tbl = pads.dataset(files).to_table()
    rows = sorted(
        zip(
            tbl["term"].to_pylist(),
            tbl["df"].to_pylist(),
            tbl["cf"].to_pylist(),
            tbl["blob"].to_pylist(),
            map(tuple, tbl["last_doc"].to_pylist()),
            map(tuple, tbl["offset"].to_pylist()),
        )
    )
    return rows


def test_resume_after_partial_segments(tmp_path):
    full_dir = str(tmp_path / "full")
    build_index(_corpus(), full_dir, num_buckets=4, num_salts=2, overwrite=True)
    reference_content = _segment_content(full_dir)
    ref_manifest = load_manifest(full_dir)

    # simulate a crash: wipe two buckets' outputs and drop them (plus all
    # later stages) from the manifest
    crash_dir = str(tmp_path / "crash")
    shutil.copytree(full_dir, crash_dir)
    m = json.load(open(manifest_path(crash_dir)))
    for k in ("2", "3"):
        del m["buckets"][k]
    for stage in ("df", "docstats", "done"):
        m["stages"].pop(stage, None)
    json.dump(m, open(manifest_path(crash_dir), "w"))
    shutil.rmtree(os.path.join(crash_dir, "segments", "bucket=2"))
    # bucket 3: leave a PARTIAL write behind — resume must discard it
    part3 = os.path.join(crash_dir, "segments", "bucket=3")
    for f in sorted(glob.glob(os.path.join(part3, "*.parquet")))[1:]:
        os.unlink(f)
    for stats in ("df.parquet", "docstats.parquet"):
        shutil.rmtree(os.path.join(crash_dir, "stats", stats), ignore_errors=True)

    m2 = build_index(_corpus(), crash_dir, num_buckets=4, num_salts=2)
    assert m2.stage_done("done")
    assert _segment_content(crash_dir) == reference_content
    # per-bucket checksums identical to the uninterrupted build
    for k in range(4):
        assert m2.buckets[str(k)]["checksum"] == ref_manifest.buckets[str(k)]["checksum"]

    # resumed index answers queries identically
    s_full, s_resumed = IndexSearcher(full_dir), IndexSearcher(crash_dir)
    for q in PANGRAM_QUERIES:
        assert s_full.search_tfidf(q, 10) == s_resumed.search_tfidf(q, 10)


def test_completed_buckets_are_skipped(tmp_path, monkeypatch):
    out = str(tmp_path / "ix")
    build_index(_corpus(), out, num_buckets=4, overwrite=True)

    # poison the segment builder: a resume of a COMPLETE index must not
    # rebuild anything, so the poison must never trigger
    import pyfuseray.build as build_mod

    def boom(*a, **k):
        raise AssertionError("segment rebuild attempted on completed bucket")

    monkeypatch.setattr(build_mod, "build_bucket_segment", boom)
    m = build_index(_corpus(), out, num_buckets=4)
    assert m.stage_done("done")


def test_resume_config_mismatch_raises(tmp_path):
    """Resuming with a different block_size or num_salts must raise, not
    silently mix codec granularities / salt layouts in one index."""
    import pytest

    out = str(tmp_path / "ix")
    build_index(_corpus(), out, num_buckets=4, num_salts=2, block_size=8,
                overwrite=True)
    with pytest.raises(ValueError, match="block_size"):
        build_index(_corpus(), out, num_buckets=4, num_salts=2, block_size=16)
    with pytest.raises(ValueError, match="num_salts"):
        build_index(_corpus(), out, num_buckets=4, num_salts=3, block_size=8)
    # same config resumes fine (no-op on a complete index)
    m = build_index(_corpus(), out, num_buckets=4, num_salts=2, block_size=8)
    assert m.stage_done("done")
    assert m.block_size == 8


def test_stale_format_version_rejected(tmp_path):
    """A manifest from an older FORMAT_VERSION must NOT be served (the
    searcher would silently return wrong/empty results from a stale
    layout): load_manifest ignores it and IndexSearcher refuses."""
    import pytest

    out = str(tmp_path / "ix")
    build_index(_corpus(), out, num_buckets=2, overwrite=True)
    m = json.load(open(manifest_path(out)))
    m["version"] = m["version"] - 1
    json.dump(m, open(manifest_path(out), "w"))
    assert load_manifest(out) is None
    with pytest.raises(FileNotFoundError):
        IndexSearcher(out)
    # a rebuild over the stale dir recovers cleanly
    m2 = build_index(_corpus(), out, num_buckets=2)
    assert m2.stage_done("done")
    assert IndexSearcher(out).search_tfidf(PANGRAM_QUERIES[0], 3)


def test_rerun_content_identical(tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    build_index(_corpus(), a, num_buckets=4, num_salts=2, overwrite=True)
    build_index(_corpus().repartition(7), b, num_buckets=4, num_salts=2, overwrite=True)
    assert _segment_content(a) == _segment_content(b)
    ma, mb = load_manifest(a), load_manifest(b)
    for k in range(4):
        assert ma.buckets[str(k)]["checksum"] == mb.buckets[str(k)]["checksum"]


def test_resume_docstats_on_sorted_route(tmp_path):
    """Crash AFTER segments but BEFORE docstats on the production
    (corpus_sorted=True) route: the resume regenerates docstats through
    the sequential runs-decode path (postings files on disk). Segment
    checksums stay identical; searches stay rank-identical with scores
    within the 1e-9 conformance tolerance (the runs decode's float
    summation order may differ from the overlapped in-memory pass by
    ~1e-14 — documented in build_index's corpus_sorted note)."""
    full_dir = str(tmp_path / "full")
    build_index(_corpus(), full_dir, num_buckets=4, num_salts=2,
                overwrite=True, corpus_sorted=True)
    ref_manifest = load_manifest(full_dir)

    crash_dir = str(tmp_path / "crash")
    shutil.copytree(full_dir, crash_dir)
    m = json.load(open(manifest_path(crash_dir)))
    for stage in ("docstats", "done"):
        m["stages"].pop(stage, None)
    json.dump(m, open(manifest_path(crash_dir), "w"))
    shutil.rmtree(os.path.join(crash_dir, "stats", "docstats.parquet"))

    m2 = build_index(_corpus(), crash_dir, num_buckets=4, num_salts=2,
                     corpus_sorted=True)
    assert m2.stage_done("done")
    for k in range(4):
        assert (m2.buckets[str(k)]["checksum"]
                == ref_manifest.buckets[str(k)]["checksum"])

    s_full, s_resumed = IndexSearcher(full_dir), IndexSearcher(crash_dir)
    for q in PANGRAM_QUERIES:
        a = s_full.search_tfidf(q, 10)
        b = s_resumed.search_tfidf(q, 10)
        assert [d for d, _ in a] == [d for d, _ in b], q
        assert all(abs(sa - sb) < 1e-9 for (_, sa), (_, sb) in zip(a, b)), q
        wa = s_full.search_bm25(q, 10, algorithm="wand")
        wb = s_resumed.search_bm25(q, 10, algorithm="wand")
        assert wa == wb, q  # bm25 uses integer dl: exact across routes


def test_segment_materialize_gate_routes_identical(tmp_path):
    """Stage C is size-gated like stage A: above
    ``postings_materialize_threshold`` a fresh build must NOT pin the
    merged segments in the object store — it builds per bucket and
    streams each straight to parquet (the resume code path), with
    checksums computed off the files. Both routes must produce the same
    index content: identical bucket checksums and posting counts,
    rank-identical searches (scores within the 1e-9 conformance
    tolerance; bm25 exact — integer dl)."""
    a_dir = str(tmp_path / "mem_route")
    b_dir = str(tmp_path / "stream_route")
    build_index(_corpus(), a_dir, num_buckets=4, num_salts=2, overwrite=True)
    build_index(_corpus(), b_dir, num_buckets=4, num_salts=2, overwrite=True,
                postings_materialize_threshold=0)
    ma, mb = load_manifest(a_dir), load_manifest(b_dir)
    assert mb.stage_done("done")
    assert _segment_content(a_dir) == _segment_content(b_dir)
    assert {k: (v["checksum"], v["n_postings"]) for k, v in ma.buckets.items()} == {
        k: (v["checksum"], v["n_postings"]) for k, v in mb.buckets.items()
    }
    sa, sb = IndexSearcher(a_dir), IndexSearcher(b_dir)
    for q in PANGRAM_QUERIES:
        ta, tb = sa.search_tfidf(q, 10), sb.search_tfidf(q, 10)
        assert [d for d, _ in ta] == [d for d, _ in tb], q
        assert all(abs(x - y) < 1e-9 for (_, x), (_, y) in zip(ta, tb)), q
        assert sa.search_bm25(q, 10, algorithm="wand") == sb.search_bm25(
            q, 10, algorithm="wand"
        ), q
