"""Mini-SQL grammar + execution (mirrors reference SqlParser tests)."""

import pytest
import ray.data as rd

from pyfuseray.build import build_index
from pyfuseray.sqlfront import execute_sql, parse_query, to_duckdb_sql
from tests.corpora import PANGRAM_DOCS


def test_parse_basic():
    p = parse_query("SELECT url, text FROM pages LIKE quick fox LIMIT 5")
    assert p.fields == ["url", "text"]
    assert p.table == "pages"
    assert p.like_term == "quick fox"
    assert p.limit == 5


def test_parse_liketo_and_case():
    p = parse_query("select URL from PAGES LIKETO Flower Garden")
    assert p.fields == ["url"]
    assert p.like_term == "flower garden"
    assert p.limit is None


def test_parse_star_and_no_like():
    p = parse_query("SELECT * FROM pages")
    assert p.fields == ["*"] and p.like_term is None


def test_parse_error_defaults():
    # reference behavior: defaults on parse error (SqlParser.py:47-54)
    p = parse_query("garbage in garbage out")
    assert p.fields == ["*"] and p.like_term is None
    assert p.table == "pages"


def test_to_duckdb_sql():
    sql = to_duckdb_sql("SELECT doc_id FROM documents LIKE quick fox LIMIT 3",
                        default_table="documents")
    assert sql == (
        "SELECT doc_id FROM documents WHERE lower(text) LIKE '%quick%' "
        "AND lower(text) LIKE '%fox%' LIMIT 3"
    )


@pytest.fixture(scope="module")
def sql_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("sqlfront")
    corpus_path = str(root / "corpus.parquet")
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(PANGRAM_DOCS)), pa.int64()),
            "url": pa.array([f"u{i}" for i in range(len(PANGRAM_DOCS))], pa.string()),
            "text": pa.array(PANGRAM_DOCS, pa.string()),
        }
    )
    pq.write_table(tbl, corpus_path)
    ix = str(root / "ix")
    build_index(
        rd.from_arrow(tbl).select_columns(["doc_id", "text"]), ix,
        num_buckets=2, overwrite=True,
    )
    return ix, corpus_path


def test_execute_like(sql_env):
    ix, corpus = sql_env
    out = execute_sql("SELECT url, text FROM pages LIKE quick fox LIMIT 3", ix, corpus)
    assert out.num_rows == 3
    assert out.column_names == ["url", "text", "score", "score_fmt"]
    scores = out.column("score").to_pylist()
    assert scores == sorted(scores, reverse=True)
    # score_fmt mirrors the reference's f"{score:.2f}"
    assert all(f == f"{s:.2f}" for s, f in zip(scores, out.column("score_fmt").to_pylist()))


def test_execute_star_and_alias(sql_env):
    ix, corpus = sql_env
    out = execute_sql("SELECT * FROM pages LIKE wizard", ix, corpus)
    assert "doc_id" in out.column_names and "score" in out.column_names
    out2 = execute_sql("SELECT page FROM pages LIKE wizard", ix, corpus)
    assert out2.column_names == ["url", "score", "score_fmt"]


def test_execute_plain_scan(sql_env):
    ix, corpus = sql_env
    out = execute_sql("SELECT url FROM pages LIMIT 4", ix, corpus, top_k=4)
    assert out.num_rows == 4 and out.column_names == ["url"]


def test_execute_no_hits(sql_env):
    ix, corpus = sql_env
    out = execute_sql("SELECT url FROM pages LIKE zzzznothere", ix, corpus)
    assert out.num_rows == 0
    assert "score" in out.column_names


def test_execute_unknown_column(sql_env):
    ix, corpus = sql_env
    with pytest.raises(KeyError):
        execute_sql("SELECT nope FROM pages LIKE quick", ix, corpus)


def test_dedup_results_keep_first():
    import pyarrow as pa

    from pyfuseray.sqlfront import dedup_results_keep_first

    tbl = pa.table({"track": ["a", "b", "a", "c", "b"], "score": [5.0, 4.0, 3.0, 2.0, 1.0]})
    out = dedup_results_keep_first(tbl, "track")
    assert out.column("track").to_pylist() == ["a", "b", "c"]
    assert out.column("score").to_pylist() == [5.0, 4.0, 2.0]


def test_dedup_results_keep_max_score():
    import pyarrow as pa

    from pyfuseray.sqlfront import dedup_results_keep_max_score

    tbl = pa.table(
        {
            "url": ["u1", "u2", "u1", "u3"],
            "score": [1.0, 5.0, 3.0, 2.0],
            "score_fmt": ["1.00", "5.00", "3.00", "2.00"],
        }
    )
    out = dedup_results_keep_max_score(tbl)
    assert out.column("url").to_pylist() == ["u2", "u1", "u3"]
    assert out.column("score").to_pylist() == [5.0, 3.0, 2.0]
