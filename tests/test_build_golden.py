"""End-to-end Ray pipeline vs goldens and the serial oracle.

Mirrors the reference test strategy (SURVEY.md §5): golden document
frequencies after merge (app/tests/final_ii.py:73-119), score ordering,
and rank-identity of every reference query vs the serial oracle —
tfidf-cosine, BM25 TAAT, and BM25 block-max WAND.
"""

import math

import pyarrow.dataset as pads
import pytest
import ray.data as rd

from pyfuseray.build import build_index
from pyfuseray.oracle import OracleIndex
from pyfuseray.query import IndexSearcher
from tests.corpora import (
    ALL_QUERIES,
    FLOWER_DOCS,
    PANGRAM_DOCS,
    PANGRAM_GOLDEN_DF,
    PANGRAM_QUERIES,
    SPRING_DOCS,
)


def _corpus_ds(docs):
    return rd.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(docs)]
    ).repartition(4)  # force multi-block parallelism on 20 docs (≥4 partitions)


@pytest.fixture(scope="module")
def pangram_index(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("ix_pangram"))
    # num_salts=3 forces salted term-splitting + stitch even at 20 docs
    build_index(_corpus_ds(PANGRAM_DOCS), out, num_buckets=4, num_salts=3,
                overwrite=True)
    return IndexSearcher(out)


@pytest.fixture(scope="module")
def pangram_oracle():
    return OracleIndex().build(list(enumerate(PANGRAM_DOCS)))


def test_golden_df(pangram_index):
    rows = pangram_index.lookup(list(PANGRAM_GOLDEN_DF))
    for term, expected in PANGRAM_GOLDEN_DF.items():
        assert term in rows, f"term {term} missing from index"
        assert rows[term].df == expected, (
            f"df({term})={rows[term].df} != {expected}"
        )


def test_manifest_stats(pangram_index, pangram_oracle):
    m = pangram_index.manifest
    assert m.n_docs == len(PANGRAM_DOCS)
    assert math.isclose(m.avgdl, pangram_oracle.avgdl, rel_tol=1e-12)
    assert m.total_postings == sum(pangram_oracle.doclen.values())
    assert m.num_salts == 3
    assert len(m.buckets) == 4


def test_norms_match_oracle(pangram_index, pangram_oracle):
    import numpy as np
    import os

    tbl = pads.dataset(
        os.path.join(pangram_index.index_dir, "stats", "docstats.parquet")
    ).to_table()
    got = dict(zip(tbl["doc_id"].to_pylist(), tbl["norm"].to_pylist()))
    for doc_id, expected in pangram_oracle.doc_norms.items():
        assert math.isclose(got[doc_id], expected, rel_tol=1e-12), doc_id
    assert np.all(np.asarray(tbl["norm"].to_pylist()) > 0)


@pytest.mark.parametrize("query", PANGRAM_QUERIES)
def test_rank_identity_tfidf(pangram_index, pangram_oracle, query):
    got = pangram_index.search_tfidf(query, 10)
    want = pangram_oracle.search_tfidf(query, 10)
    assert [d for d, _ in got] == [d for d, _ in want], query
    for (d1, s1), (d2, s2) in zip(got, want):
        assert abs(s1 - s2) < 1e-9, (query, d1, s1, s2)


@pytest.mark.parametrize("query", PANGRAM_QUERIES)
def test_rank_identity_bm25_taat_and_wand(pangram_index, pangram_oracle, query):
    want = pangram_oracle.search_bm25(query, 10)
    got_taat = pangram_index.search_bm25(query, 10, algorithm="taat")
    got_wand = pangram_index.search_bm25(query, 10, algorithm="wand")
    assert [d for d, _ in got_taat] == [d for d, _ in want], query
    assert [d for d, _ in got_wand] == [d for d, _ in want], query
    for (d1, s1), (_, s2) in zip(got_taat, want):
        assert abs(s1 - s2) < 1e-9, (query, d1)
    for (d1, s1), (_, s2) in zip(got_wand, want):
        assert abs(s1 - s2) < 1e-9, (query, d1)


@pytest.mark.parametrize("docs", [FLOWER_DOCS, SPRING_DOCS], ids=["flower", "spring"])
def test_other_corpora_rank_identity(tmp_path, docs):
    out = str(tmp_path / "ix")
    build_index(_corpus_ds(docs), out, num_buckets=2, overwrite=True)
    searcher = IndexSearcher(out)
    oracle = OracleIndex().build(list(enumerate(docs)))
    for q in ALL_QUERIES:
        got = searcher.search_tfidf(q, 5)
        want = oracle.search_tfidf(q, 5)
        assert [d for d, _ in got] == [d for d, _ in want], q
        got_b = searcher.search_bm25(q, 5, algorithm="wand")
        want_b = oracle.search_bm25(q, 5)
        assert [d for d, _ in got_b] == [d for d, _ in want_b], q


def test_scores_descend(pangram_index):
    for q in PANGRAM_QUERIES:
        res = pangram_index.search_tfidf(q, 10)
        assert res, q
        scores = [s for _, s in res]
        assert scores == sorted(scores, reverse=True)


def test_unsorted_corpus_hits_decode_merge_fallback(tmp_path):
    """An interleaved (non-doc-sorted) corpus makes tokenizer runs
    OVERLAP in doc range, forcing the decode-merge fallback inside
    merge_runs_group; the result must still be content-identical to the
    sorted build (same searcher answers, same df table)."""
    import glob
    import os

    docs = [{"doc_id": i, "text": t} for i, t in enumerate(PANGRAM_DOCS * 3)]
    sorted_ds = rd.from_items(docs).repartition(4)
    # interleave doc ranges across partitions: round-robin order
    shuffled = [docs[i] for i in range(0, len(docs), 2)] + [
        docs[i] for i in range(1, len(docs), 2)
    ]
    shuffled_ds = rd.from_items(shuffled).repartition(4)

    a, b = str(tmp_path / "sorted"), str(tmp_path / "shuffled")
    build_index(sorted_ds, a, num_buckets=2, num_salts=1,
                tokenizer_batch_size=8, overwrite=True)
    build_index(shuffled_ds, b, num_buckets=2, num_salts=1,
                tokenizer_batch_size=8, overwrite=True)

    def seg_content(ix):
        files = sorted(glob.glob(os.path.join(ix, "segments", "bucket=*", "*.parquet")))
        t = pads.dataset(files).to_table()
        return sorted(zip(t["term"].to_pylist(), t["df"].to_pylist(),
                          t["cf"].to_pylist()))

    assert seg_content(a) == seg_content(b)
    sa, sb = IndexSearcher(a), IndexSearcher(b)
    for q in PANGRAM_QUERIES:
        assert sa.search_tfidf(q, 10) == sb.search_tfidf(q, 10), q
        assert sa.search_bm25(q, 10, algorithm="wand") == sb.search_bm25(
            q, 10, algorithm="wand"
        ), q


def test_final_df_table_matches_segment_df(pangram_index):
    """The blob-free run aggregate (stats.final_df_table — feeds avgdl
    and the docstats idf broadcast) must agree exactly with the
    canonical post-merge df table: every (term, doc) pair lives in ONE
    run row, so run-df sums == merged dfs and run-cf sums == merged
    cfs."""
    import pandas as pd
    import ray.data as rd

    from pyfuseray.stats import final_df_table

    ix = pangram_index.index_dir
    runs = rd.read_parquet(f"{ix}/postings_raw")
    got = (
        final_df_table(runs)
        .to_pandas()
        .sort_values("term")
        .reset_index(drop=True)
    )
    seg = pads.dataset(
        [str(p) for p in __import__("pathlib").Path(f"{ix}/segments").rglob("*.parquet")]
    ).to_table()
    want = (
        seg.select(["term", "df", "cf"])
        .to_pandas()
        .groupby("term", as_index=False)  # salted terms: one row per salt
        .sum()
        .sort_values("term")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got.astype({"df": "int64", "cf": "int64"}), want.astype({"df": "int64", "cf": "int64"}))
