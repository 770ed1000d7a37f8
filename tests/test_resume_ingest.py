"""Per-file-group resumable ingest (VERDICT r3 #9): a crash mid-corpus
checkpoint resumes from the finished groups — never redoing their
extract — and the finished index is bit-identical to an uninterrupted
build."""

import json
import os

import pyarrow.parquet as pq
import pytest

import pyfuseray.pipeline as pipeline
from pyfuseray.checkpoint import Manifest
from pyfuseray.pages import synth_pages
from pyfuseray.pipeline import build_from_pages
from pyfuseray.query import IndexSearcher


@pytest.fixture(scope="module")
def pages_dir(tmp_path_factory):
    """4 parquet shards, 2400 pages, with dups + null texts."""
    d = tmp_path_factory.mktemp("pages_shards")
    tbl = synth_pages(2400, seed=11, null_text_frac=0.1, dup_frac=0.05)
    for i in range(4):
        pq.write_table(tbl.slice(i * 600, 600), str(d / f"part-{i}.parquet"))
    return str(d)


def _checksums(m: Manifest) -> dict:
    return {k: (v["checksum"], v["n_postings"]) for k, v in m.buckets.items()}


def test_crash_resume_identical(ray_session, pages_dir, tmp_path, monkeypatch):
    # reference: uninterrupted resumable-route build
    ref = build_from_pages(
        pages_dir, str(tmp_path / "ix_ref"),
        corpus_dir=str(tmp_path / "corp_ref"),
        ingest_groups=4, num_buckets=2, overwrite=True,
    )

    # crash after 2 finished groups: the manifest writer raises on its
    # 3rd call (group writes 0 and 1 landed atomically before it)
    calls = {"n": 0}
    real = pipeline._atomic_json

    def crashing(path, obj):
        calls["n"] += 1
        if calls["n"] >= 3:
            raise RuntimeError("simulated crash mid-ingest")
        real(path, obj)

    monkeypatch.setattr(pipeline, "_atomic_json", crashing)
    with pytest.raises(RuntimeError, match="simulated crash"):
        build_from_pages(
            pages_dir, str(tmp_path / "ix"),
            corpus_dir=str(tmp_path / "corp"),
            ingest_groups=4, ingest_concurrency=1,
            num_buckets=2, overwrite=True,
        )
    pre = tmp_path / "corp" / "pre"
    man = tmp_path / "corp" / "ingest_manifest.json"
    assert man.exists()
    assert json.loads(man.read_text())["done"] == [0, 1]

    # resume: finished groups are skipped (their extract never reruns —
    # the manifest writer only sees NEW groups), the rest complete, and
    # the final index matches the uninterrupted build
    resumed_groups = []

    def recording(path, obj):
        resumed_groups.append(obj["done"][-1])
        real(path, obj)

    monkeypatch.setattr(pipeline, "_atomic_json", recording)
    m2 = build_from_pages(
        pages_dir, str(tmp_path / "ix"),
        corpus_dir=str(tmp_path / "corp"),
        ingest_groups=4, ingest_concurrency=1, num_buckets=2,
    )
    monkeypatch.setattr(pipeline, "_atomic_json", real)
    assert 0 not in resumed_groups and 1 not in resumed_groups
    assert set(resumed_groups) >= {2, 3}
    assert _checksums(m2) == _checksums(ref)
    assert m2.n_docs == ref.n_docs
    # pre/ + manifest are cleaned up once the final corpus lands
    assert not pre.exists() and not man.exists()

    s = IndexSearcher(str(tmp_path / "ix"))
    s_ref = IndexSearcher(str(tmp_path / "ix_ref"))
    for q in ["quick foxes jump", "data stream merge", "wizard"]:
        assert s.search_bm25(q, 10) == s_ref.search_bm25(q, 10)


def test_resumable_route_matches_materialize_route(ray_session, pages_dir, tmp_path):
    """The per-group write-first route and the default materialize route
    build bit-identical indexes over the same shards (the same pin the
    segment-materialize gate carries in test_pages.py)."""
    ref = build_from_pages(
        pages_dir, str(tmp_path / "ix_m"), corpus_dir=str(tmp_path / "corp_m"),
        num_buckets=2, overwrite=True,
    )
    res = build_from_pages(
        pages_dir, str(tmp_path / "ix_r"), corpus_dir=str(tmp_path / "corp_r"),
        ingest_groups=3, num_buckets=2, overwrite=True,
    )
    assert _checksums(res) == _checksums(ref)
    assert res.n_docs == ref.n_docs


def test_changed_input_invalidates_manifest(ray_session, pages_dir, tmp_path):
    """A stale manifest whose signature doesn't match the input set is
    discarded (stale pre-groups removed) instead of poisoning the build."""
    corp = tmp_path / "corp"
    pre = corp / "pre" / "group=0"
    os.makedirs(pre)
    (pre / "junk.parquet").write_bytes(b"not parquet")
    (corp / "ingest_manifest.json").write_text(
        json.dumps({"sig": {"files": [["other.parquet", 1]], "n_groups": 4,
                            "n_docs": 1}, "done": [0]})
    )
    m = build_from_pages(
        pages_dir, str(tmp_path / "ix"), corpus_dir=str(corp),
        ingest_groups=2, num_buckets=2,
    )
    assert m.n_docs > 0
    assert IndexSearcher(str(tmp_path / "ix")).search_bm25("quick foxes", 5)


def test_stage_b_final_corpus_globally_sorted(ray_session, pages_dir, tmp_path):
    """Stage B writes one file per doc range, zero-padded; reading the
    final corpus files in name order must yield globally non-decreasing
    doc_ids (the corpus_sorted=True fast path depends on it)."""
    import os

    import pyarrow.parquet as pq

    from pyfuseray.pipeline import build_from_pages

    out = str(tmp_path / "ix")
    cdir = str(tmp_path / "c")
    build_from_pages(
        pages_dir, out, corpus_dir=cdir,
        ingest_groups=3, num_buckets=2, overwrite=True,
    )
    final = os.path.join(cdir, "corpus")
    last = -1
    files = sorted(
        f for f in os.listdir(final) if f.endswith(".parquet")
    )
    assert len(files) > 1  # the invariant must span file boundaries
    for f in files:
        ids = pq.read_table(
            os.path.join(final, f), columns=["doc_id"]
        ).column("doc_id").to_numpy()
        assert ids.size == 0 or (
            int(ids[0]) > last and bool((ids[1:] >= ids[:-1]).all())
        ), f
        if ids.size:
            last = int(ids[-1])
