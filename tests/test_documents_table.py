"""Rank-identity on the driver's own documents table (sf0.001) — the
corpus the correctness gate runs on."""

import pytest
import ray.data as rd

from pyfuseray.build import build_index
from pyfuseray.oracle import OracleIndex
from pyfuseray.query import IndexSearcher

SF = "/root/testdata/sf0.001"

QUERIES = [
    "fast scan merge", "query data stream", "sort join filter",
    "batch window value", "small table row group", "the quick fox",
]


@pytest.fixture(scope="module")
def docs_env(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("ix_docs"))
    ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    build_index(ds, out, num_buckets=4, num_salts=2, overwrite=True)
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    oracle = OracleIndex().build(
        list(zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()))
    )
    return IndexSearcher(out), oracle


@pytest.mark.parametrize("query", QUERIES)
def test_documents_rank_identity(docs_env, query):
    searcher, oracle = docs_env
    got = searcher.search_tfidf(query, 10)
    want = oracle.search_tfidf(query, 10)
    assert [d for d, _ in got] == [d for d, _ in want], query
    for (_, s1), (_, s2) in zip(got, want):
        assert abs(s1 - s2) < 1e-9
    got_b = searcher.search_bm25(query, 10, algorithm="wand")
    want_b = oracle.search_bm25(query, 10)
    assert [d for d, _ in got_b] == [d for d, _ in want_b], query
    for (_, s1), (_, s2) in zip(got_b, want_b):
        assert abs(s1 - s2) < 1e-9


def test_documents_df_vs_oracle(docs_env):
    searcher, oracle = docs_env
    odf = oracle.df()
    rows = searcher.lookup(sorted(odf))
    assert set(rows) == set(odf)
    for t, df in odf.items():
        assert rows[t].df == df, t
        assert rows[t].cf == oracle.cf()[t], t
