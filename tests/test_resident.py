"""Actor-resident BM25 tier (pyfuseray/resident.py): bit-identity with
the interactive searcher's TAAT path, shard-count invariance, tombstone
handling."""

import numpy as np
import pyarrow.parquet as pq
import ray.data as rd

from pyfuseray.build import build_index
from pyfuseray.pages import synth_pages
from pyfuseray.pipeline import build_from_pages
from pyfuseray.query import IndexSearcher
from pyfuseray.resident import ResidentTextSearcher
from tests.corpora import PANGRAM_DOCS, PANGRAM_QUERIES


def _pangram_ix(tmp_path):
    out = str(tmp_path / "ix")
    corpus = rd.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(PANGRAM_DOCS)]
    ).repartition(4)
    build_index(corpus, out, num_buckets=4, num_salts=2, overwrite=True)
    return out


def test_resident_bit_identical_to_taat(ray_session, tmp_path):
    ix = _pangram_ix(tmp_path)
    s = IndexSearcher(ix)
    r = ResidentTextSearcher(ix, n_shards=3)
    try:
        for q in PANGRAM_QUERIES + ["zzz-unknown", "", "the of and"]:
            want = s.search_bm25(q, 10, algorithm="taat")
            got = r.search_bm25(q, 10)
            assert got == want, q  # ids AND float bits
    finally:
        r.close()


def test_resident_many_matches_single(ray_session, tmp_path):
    ix = _pangram_ix(tmp_path)
    r = ResidentTextSearcher(ix, n_shards=3)
    try:
        qs = PANGRAM_QUERIES + ["zzz-unknown", ""]
        many = r.search_bm25_many(qs, 10)
        for q, got in zip(qs, many):
            assert got == r.search_bm25(q, 10), q
    finally:
        r.close()


def test_resident_shard_count_invariant(ray_session, tmp_path):
    ix = _pangram_ix(tmp_path)
    rs = [ResidentTextSearcher(ix, n_shards=n) for n in (1, 2, 5)]
    try:
        for q in PANGRAM_QUERIES:
            results = [r.search_bm25(q, 10) for r in rs]
            assert results[0] == results[1] == results[2], q
    finally:
        for r in rs:
            r.close()


def test_resident_custom_params_match_taat(ray_session, tmp_path):
    ix = _pangram_ix(tmp_path)
    s = IndexSearcher(ix)
    r = ResidentTextSearcher(ix, n_shards=2)
    try:
        for q in PANGRAM_QUERIES[:3]:
            want = s.search_bm25(q, 10, algorithm="taat", k1=0.9, b=0.3)
            got = r.search_bm25(q, 10, k1=0.9, b=0.3)
            assert [d for d, _ in got] == [d for d, _ in want], q
            assert all(
                abs(a - b) < 1e-12 for (_, a), (_, b) in zip(got, want)
            ), q
    finally:
        r.close()


def test_resident_drops_tombstoned_docs(ray_session, tmp_path):
    from pyfuseray.deletes import delete_documents

    ix = _pangram_ix(tmp_path)
    s = IndexSearcher(ix)
    full = {q: s.search_bm25(q, 10, algorithm="taat") for q in PANGRAM_QUERIES}
    victims = sorted({d for hits in full.values() for d, _ in hits})[:2]
    delete_documents(ix, victims)
    s2 = IndexSearcher(ix)
    r = ResidentTextSearcher(ix, n_shards=3)
    try:
        for q in PANGRAM_QUERIES:
            want = s2.search_bm25(q, 10, algorithm="taat")
            got = r.search_bm25(q, 10)
            assert got == want, q
            assert not ({d for d, _ in got} & set(victims)), q
    finally:
        r.close()


def test_resident_on_pages_corpus(ray_session, tmp_path):
    """Wider corpus through the production ingest: rank identity with
    auto (WAND) — WAND is itself bit-identical to TAAT."""
    tbl = synth_pages(400, seed=11, null_text_frac=0.1, dup_frac=0.05)
    path = str(tmp_path / "pages.parquet")
    pq.write_table(tbl, path)
    out = str(tmp_path / "ixp")
    build_from_pages(rd.read_parquet(path), out, num_buckets=4, num_salts=2,
                     overwrite=True)
    s = IndexSearcher(out)
    r = ResidentTextSearcher(out, n_shards=4)
    try:
        for q in ["quick foxes jump", "flowers bloom spring", "webhot",
                  "search engine data"]:
            want = s.search_bm25(q, 10, algorithm="auto")
            got = r.search_bm25(q, 10)
            assert got == want, q
    finally:
        r.close()
