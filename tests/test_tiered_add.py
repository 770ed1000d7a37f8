"""Tiered (log-structured) incremental adds: merge input bounded to the
new generation, BM25/boolean bit-identical to a fresh build, stale
tiers gated (not wrong), compaction == fresh build."""

import os

import pyarrow as pa
import pytest
import ray.data as rd

from pyfuseray.build import build_index
from pyfuseray.checkpoint import load_manifest
from pyfuseray.incremental import add_documents, compact_tiers
from pyfuseray.pages import synth_pages
from pyfuseray.query import IndexSearcher

QUERIES = ["quick fox", "wizard", "love", "flower bloom", "dog cat run"]


def _texts(n=240, seed=7):
    t = synth_pages(n, seed=seed, null_text_frac=0.0, dup_frac=0.0,
                    vocab_size=500, words_per_doc=(20, 60))
    return [x if x else "fallback words" for x in t.column("text").to_pylist()]


def _ds(texts, start):
    ids = list(range(start, start + len(texts)))
    return rd.from_arrow(pa.table({"doc_id": ids, "text": texts}))


@pytest.fixture(scope="module")
def tiered(tmp_path_factory, ray_session):
    texts = _texts()
    third = len(texts) // 3
    base = tmp_path_factory.mktemp("tiered")
    one = str(base / "oneshot")
    tod = str(base / "tiered")
    build_index(_ds(texts, 0), one, num_buckets=4, num_salts=2)
    build_index(_ds(texts[:third], 0), tod, num_buckets=4, num_salts=2)
    # two tiered adds, neither triggering auto-compaction
    add_documents(tod, _ds(texts[third : 2 * third], third),
                  mode="tiered", max_generations=10)
    m = add_documents(tod, _ds(texts[2 * third :], 2 * third),
                      mode="tiered", max_generations=10)
    return one, tod, m, texts


def test_merge_input_bounded_to_new_generation(tiered):
    """The evidence ask: a tiered add's merge shuffle consumes ONLY the
    new generation's run rows (recorded in the stage mark), and the
    base postings/segments are untouched on disk."""
    one, tod, m, texts = tiered
    assert m.seg_generations == ["segments_g1", "segments_g2"]
    third = len(texts) // 3
    for gen in ("g1", "g2"):
        stage = m.stages[f"tiered_add_{gen}"]
        gen_rows = rd.read_parquet(
            os.path.join(tod, f"postings_raw_{gen}")
        ).count()
        assert stage["merge_input_rows"] == gen_rows
        # the whole index holds ~3x one generation's postings: the
        # recorded merge input must be generation-sized, not index-sized
        total_rows = sum(
            rd.read_parquet(os.path.join(tod, g)).count()
            for g in m.generations
        )
        assert stage["merge_input_rows"] < total_rows / 2
    # base segments not rebuilt: bucket marks still from the initial
    # build (a full re-merge would have rewritten them)
    assert m.stage_done("done")


def test_bm25_and_boolean_bit_identical_to_fresh_build(tiered):
    one, tod, m, texts = tiered
    s1 = IndexSearcher(one)
    s2 = IndexSearcher(tod)
    for q in QUERIES:
        a = s1.search_bm25(q, 10, algorithm="taat")
        b = s2.search_bm25(q, 10)  # auto -> taat on multi-gen
        assert a == b, q  # ids AND float bits
        assert (
            s1.search_boolean(q, mode="and").tolist()
            == s2.search_boolean(q, mode="and").tolist()
        ), q
        assert (
            s1.search_boolean(q, mode="or").tolist()
            == s2.search_boolean(q, mode="or").tolist()
        ), q


def test_stale_tiers_gated_not_wrong(tiered):
    one, tod, m, texts = tiered
    s2 = IndexSearcher(tod)
    with pytest.raises(RuntimeError, match="compact_tiers"):
        s2.search_tfidf("quick fox", 5)
    from pyfuseray.distributed_query import bulk_search

    with pytest.raises(RuntimeError, match="compact_tiers"):
        bulk_search(tod, ["quick fox"], 5)
    from pyfuseray.resident import ResidentTextSearcher

    with pytest.raises(RuntimeError, match="compact_tiers"):
        ResidentTextSearcher(tod, n_shards=2)
    # explicit wand falls back to exact TAAT (custom-params contract)
    s1 = IndexSearcher(one)
    for q in QUERIES[:2]:
        assert s2.search_bm25(q, 10, algorithm="wand") == s1.search_bm25(
            q, 10, algorithm="taat"
        ), q


def test_compact_tiers_equals_fresh_build(tiered):
    import numpy as np
    import pyarrow.dataset as pads

    from pyfuseray.codec import decode_postings

    def _decoded(index_dir):
        tbl = pads.dataset(
            os.path.join(index_dir, "segments"), format="parquet"
        ).to_table(columns=["term", "df", "blob", "offset"])
        out = {}
        for i in range(tbl.num_rows):
            d, t = decode_postings(
                tbl.column("blob")[i].as_py(),
                np.asarray(tbl.column("offset")[i].as_py(), dtype=np.int64),
            )
            out[tbl.column("term")[i].as_py()] = (
                int(tbl.column("df")[i].as_py()),
                list(zip(d.tolist(), t.tolist())),
            )
        return out

    one, tod, m, texts = tiered
    m2 = compact_tiers(tod)
    assert m2.seg_generations == []
    m1 = load_manifest(one)
    # posting-for-posting identical (codec BLOCK boundaries legitimately
    # differ — merged runs restart blocks at generation boundaries — so
    # raw checksums are not comparable, same as full-mode incremental)
    assert _decoded(tod) == _decoded(one)
    assert {k: v["n_postings"] for k, v in m2.buckets.items()} == {
        k: v["n_postings"] for k, v in m1.buckets.items()
    }
    assert m2.n_docs == m1.n_docs
    assert abs(m2.avgdl - m1.avgdl) < 1e-9
    # per-generation dirs cleaned up
    assert not any(
        d.startswith("segments_g") for d in os.listdir(tod)
    )
    s1, s2 = IndexSearcher(one), IndexSearcher(tod)
    for q in QUERIES:
        assert s2.search_bm25(q, 10) == s1.search_bm25(q, 10), q
        # tfidf norms: w^2 partials combine in shuffle order (stats.py
        # docstring) — rank identity + 1e-9 scores, the suite-wide bar
        a, b = s2.search_tfidf(q, 10), s1.search_tfidf(q, 10)
        assert [d for d, _ in a] == [d for d, _ in b], q
        assert all(
            abs(x - y) < 1e-9 for (_, x), (_, y) in zip(a, b)
        ), q


def test_auto_compaction_at_max_generations(ray_session, tmp_path):
    texts = _texts(120, seed=11)
    half = len(texts) // 2
    quarter = len(texts) // 4
    ix = str(tmp_path / "auto")
    build_index(_ds(texts[:half], 0), ix, num_buckets=4)
    add_documents(ix, _ds(texts[half : half + quarter], half),
                  mode="tiered", max_generations=2)
    m = load_manifest(ix)
    assert m.seg_generations == ["segments_g1"]
    # second tiered add reaches max_generations=2 -> auto compact
    m = add_documents(ix, _ds(texts[half + quarter :], half + quarter),
                      mode="tiered", max_generations=2)
    assert m.seg_generations == []
    one = str(tmp_path / "one")
    build_index(_ds(texts, 0), one, num_buckets=4)
    s1, s2 = IndexSearcher(one), IndexSearcher(ix)
    for q in QUERIES:
        assert s2.search_bm25(q, 10) == s1.search_bm25(q, 10), q


def test_tombstone_compact_consolidates_tiers(ray_session, tmp_path):
    """deletes.compact on a tiered index folds the tiered generations
    too: one consolidated segment set, seg_generations cleared, results
    == fresh build over the surviving corpus."""
    from pyfuseray.deletes import compact, delete_documents

    texts = _texts(120, seed=13)
    half = len(texts) // 2
    ix = str(tmp_path / "ix")
    build_index(_ds(texts[:half], 0), ix, num_buckets=4)
    add_documents(ix, _ds(texts[half:], half),
                  mode="tiered", max_generations=10)
    victims = [1, half + 1]
    delete_documents(ix, victims)
    m = compact(ix)
    assert m.seg_generations == []
    assert not any(d.startswith("segments_g") for d in os.listdir(ix))
    survivors = [t for i, t in enumerate(texts) if i not in victims]
    keep_ids = [i for i in range(len(texts)) if i not in victims]
    one = str(tmp_path / "one")
    build_index(
        rd.from_arrow(pa.table({"doc_id": keep_ids, "text": survivors})),
        one, num_buckets=4,
    )
    s1, s2 = IndexSearcher(one), IndexSearcher(ix)
    for q in QUERIES:
        assert s2.search_bm25(q, 10) == s1.search_bm25(q, 10), q
