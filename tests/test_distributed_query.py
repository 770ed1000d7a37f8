"""Bulk scatter-gather search must be rank-identical to the interactive
searcher (and therefore to the serial oracle)."""

import pytest
import ray.data as rd

from pyfuseray.build import build_index
from pyfuseray.distributed_query import bulk_search
from pyfuseray.query import IndexSearcher
from tests.corpora import PANGRAM_DOCS, PANGRAM_QUERIES


@pytest.fixture(scope="module")
def ix(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("ix_bulk"))
    corpus = rd.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(PANGRAM_DOCS)]
    ).repartition(4)
    build_index(corpus, out, num_buckets=4, num_salts=2, overwrite=True)
    return out


@pytest.mark.parametrize("scoring", ["bm25", "tfidf"])
def test_bulk_matches_interactive(ix, scoring):
    s = IndexSearcher(ix)
    out = bulk_search(ix, PANGRAM_QUERIES, top_k=10, scoring=scoring)
    for qid, q in enumerate(PANGRAM_QUERIES):
        want = (
            s.search_bm25(q, 10, algorithm="taat")
            if scoring == "bm25"
            else s.search_tfidf(q, 10)
        )
        got = out[out["query_id"] == qid]
        assert got["doc_id"].tolist() == [d for d, _ in want], q
        for s1, (_, s2) in zip(got["score"], want):
            assert abs(s1 - s2) < 1e-9


def test_bulk_unknown_query(ix):
    out = bulk_search(ix, ["zzznothere"], top_k=5)
    assert len(out) == 0


@pytest.mark.parametrize("scoring", ["bm25", "tfidf"])
def test_bulk_ranged_docstats_matches_broadcast(ix, scoring):
    """The corpus-scale docstats path (coarse doc-bucket join instead of
    the dense broadcast) must be rank-identical to both the broadcast
    mode and the interactive searcher."""
    s = IndexSearcher(ix)
    out = bulk_search(ix, PANGRAM_QUERIES, top_k=10, scoring=scoring,
                      docstats_mode="ranged")
    for qid, q in enumerate(PANGRAM_QUERIES):
        want = (
            s.search_bm25(q, 10, algorithm="taat")
            if scoring == "bm25"
            else s.search_tfidf(q, 10)
        )
        got = out[out["query_id"] == qid]
        assert got["doc_id"].tolist() == [d for d, _ in want], q
        for s1, (_, s2) in zip(got["score"], want):
            assert abs(s1 - s2) < 1e-9
    assert len(bulk_search(ix, ["zzznothere"], top_k=5,
                           docstats_mode="ranged")) == 0
