"""Serial oracle conformance: golden dfs, score-ordering invariants,
non-empty results for every reference query (mirrors the reference's own
test strategy, SURVEY.md §5)."""

import math

from pyfuseray.oracle import OracleIndex
from tests.corpora import (
    FLOWER_DOCS,
    FLOWER_QUERIES,
    PANGRAM_DOCS,
    PANGRAM_GOLDEN_DF,
    PANGRAM_QUERIES,
    SPRING_DOCS,
)


def _build(docs):
    return OracleIndex().build(list(enumerate(docs)))


def test_pangram_golden_df():
    idx = _build(PANGRAM_DOCS)
    df = idx.df()
    for term, expected in PANGRAM_GOLDEN_DF.items():
        assert df.get(term) == expected, f"df({term})={df.get(term)} != {expected}"


def test_pangram_all_queries_nonempty():
    idx = _build(PANGRAM_DOCS)
    for q in PANGRAM_QUERIES:
        assert idx.search_tfidf(q, 10), f"query {q!r} returned nothing"
        assert idx.search_bm25(q, 10), f"bm25 query {q!r} returned nothing"


def test_flower_goldens():
    idx = _build(FLOWER_DOCS)
    df = idx.df()
    for term in ("flower", "spring", "garden", "love"):
        assert term in df
    assert df["flower"] >= 8


def test_flower_search_scores_descend():
    idx = _build(FLOWER_DOCS)
    for q in FLOWER_QUERIES:
        results = idx.search_tfidf(q, 5)
        assert results
        scores = [s for _, s in results]
        assert scores == sorted(scores, reverse=True)


def test_spring_goldens():
    idx = _build(SPRING_DOCS)
    df = idx.df()
    for term in ("spring", "flower", "season"):
        assert term in df
    assert df["spring"] > 1


def test_norms_positive_and_exact():
    idx = _build(FLOWER_DOCS)
    assert len(idx.doc_norms) == len(FLOWER_DOCS)
    for v in idx.doc_norms.values():
        assert v > 0
    # spot-check one norm by hand: doc must satisfy sum w^2 == norm^2
    from pyfuseray.scoring import tfidf_weight

    doc_id = 0
    expected = 0.0
    for term, plist in idx.postings.items():
        for d, tf in plist:
            if d == doc_id:
                w = tfidf_weight(tf, len(plist), idx.doc_count)
                expected += w * w
    assert math.isclose(idx.doc_norms[doc_id], math.sqrt(expected), rel_tol=1e-12)


def test_cosine_scores_bounded():
    idx = _build(FLOWER_DOCS)
    for q in FLOWER_QUERIES:
        for _, score in idx.search_tfidf(q, 10):
            assert -1e-9 <= score <= 1.0 + 1e-9


def test_tie_break_canonical():
    # identical docs => identical scores => ordered by doc_id
    docs = ["flower bloom"] * 4
    idx = _build(docs)
    results = idx.search_tfidf("flower", 4)
    assert [d for d, _ in results] == [0, 1, 2, 3]
