"""Pages-table path: extract byte-identity, dedup keep-first,
deterministic doc_id ranks, end-to-end build + rank-identity."""

import pyarrow.parquet as pq
import ray.data as rd

from pyfuseray.docids import assign_doc_ids, dedup_keep_first
from pyfuseray.extract import extract_batch, extract_text
from pyfuseray.oracle import OracleIndex
from pyfuseray.pages import synth_pages
from pyfuseray.pipeline import build_from_pages, pages_to_corpus
from pyfuseray.query import IndexSearcher


def test_extract_byte_identity(tmp_path):
    """Distributed map_batches extraction is byte-identical per url to the
    serial pure function (BASELINE.json input_hint invariant)."""
    tbl = synth_pages(300, seed=7, null_text_frac=0.4)
    path = str(tmp_path / "pages.parquet")
    pq.write_table(tbl, path)

    serial = {
        u: extract_text(h, t)
        for u, h, t in zip(
            tbl["url"].to_pylist(), tbl["html"].to_pylist(), tbl["text"].to_pylist()
        )
    }
    ds = rd.read_parquet(path).repartition(7).map_batches(
        extract_batch, batch_format="pyarrow"
    )
    distributed = {r["url"]: r["text"] for r in ds.iter_rows()}
    assert distributed.keys() == serial.keys()
    for url, text in serial.items():
        assert distributed[url].encode() == text.encode(), url


def test_extract_html_path_matches_text_path():
    # same body through html stripping vs direct text
    body = "quick foxes jump over lazy dogs"
    html = f"<html><head><script>x&amp;</script></head><body><p>{body}</p></body></html>".encode()
    assert extract_text(html, None) == body
    assert extract_text(None, body) == body
    assert extract_text(html, body) == body  # text wins
    assert extract_text(b"<p>a &amp; b</p>", None) == "a & b"
    assert extract_text(None, None) == ""


def test_dedup_keep_first(tmp_path):
    tbl = synth_pages(200, seed=3, dup_frac=0.3)
    path = str(tmp_path / "pages.parquet")
    pq.write_table(tbl, path)
    ds = rd.read_parquet(path).map_batches(extract_batch, batch_format="pyarrow")
    deduped = dedup_keep_first(ds).to_pandas()
    assert deduped["url"].is_unique
    # keep-first: for each kept url the warc_ts is the min over its dups
    raw = tbl.to_pandas()
    mins = raw.groupby("url")["warc_ts"].min()
    for _, row in deduped.iterrows():
        assert row["warc_ts"] == mins[row["url"]]


def test_doc_ids_are_url_ranks(tmp_path):
    tbl = synth_pages(150, seed=5)
    path = str(tmp_path / "pages.parquet")
    pq.write_table(tbl, path)
    ds = rd.read_parquet(path).repartition(5).map_batches(
        extract_batch, batch_format="pyarrow"
    )
    got = assign_doc_ids(ds).to_pandas().sort_values("doc_id")
    expected_urls = sorted(tbl["url"].to_pylist())
    assert got["url"].tolist() == expected_urls
    assert got["doc_id"].tolist() == list(range(150))


def test_pages_end_to_end_rank_identity(tmp_path):
    tbl = synth_pages(120, seed=11, null_text_frac=0.3, dup_frac=0.1)
    path = str(tmp_path / "pages.parquet")
    pq.write_table(tbl, path)
    out = str(tmp_path / "ix")
    build_from_pages(rd.read_parquet(path), out, num_buckets=4, num_salts=2,
                     overwrite=True)
    searcher = IndexSearcher(out)

    # serial oracle over the same deterministic ingest
    raw = tbl.to_pandas()
    raw["etext"] = [
        extract_text(h, t) for h, t in zip(raw["html"], raw["text"])
    ]
    first = raw.sort_values(["url", "warc_ts"]).drop_duplicates("url", keep="first")
    docs = list(enumerate(first.sort_values("url")["etext"].tolist()))
    oracle = OracleIndex().build(docs)

    for q in ["quick foxes", "webhot", "flowers bloom spring", "search engine data"]:
        got = searcher.search_tfidf(q, 10)
        want = oracle.search_tfidf(q, 10)
        assert [d for d, _ in got] == [d for d, _ in want], q
        for (_, s1), (_, s2) in zip(got, want):
            assert abs(s1 - s2) < 1e-9
        got_b = searcher.search_bm25(q, 10, algorithm="wand")
        want_b = oracle.search_bm25(q, 10)
        assert [d for d, _ in got_b] == [d for d, _ in want_b], q


def test_ingest_pages_non_ascii_urls():
    """Real crawl urls contain non-ASCII; the fixed-width byte-array path
    must encode UTF-8 (not ASCII) and size widths in bytes, keeping
    doc_id = rank in UTF-8 byte order == code-point order."""
    import pyarrow as pa

    from pyfuseray.docids import ingest_pages

    urls = [
        "http://ex.com/münchen",
        "http://ex.com/東京/page",
        "http://ex.com/plain",
        "http://ex.com/café",
        "http://ex.com/ascii-longer-than-the-others-in-chars",
    ]
    tbl = pa.table(
        {
            "url": urls + [urls[0]],  # one duplicate url, later warc_ts
            "warc_ts": [10, 10, 10, 10, 10, 99],
            "html": [b""] * 6,
            "text": [f"doc {i}" for i in range(5)] + ["dup text"],
        }
    )
    out, n = ingest_pages(rd.from_arrow(tbl).repartition(3))
    got = out.to_pandas().sort_values("doc_id")
    assert n == 5
    assert got["url"].tolist() == sorted(urls)
    assert got["doc_id"].tolist() == list(range(5))
    # the keep-first winner for the duplicated url is the warc_ts=10 row
    dup_row = got[got["url"] == urls[0]]
    assert dup_row["warc_ts"].tolist() == [10]


def test_ingest_routes_agree():
    """The broadcast route (sorted-url array via ray.put) and the
    size-gated distributed route (dedup_pages_keep_first +
    assign_doc_ids) must produce the identical (doc_id, url, warc_ts)
    map on the same input."""
    from pyfuseray.docids import ingest_pages

    tbl = synth_pages(200, seed=9, dup_frac=0.25)
    ds = rd.from_arrow(tbl).repartition(5)
    bc, n1 = ingest_pages(ds)
    dist, n2 = ingest_pages(ds, broadcast_threshold=10)  # force distributed
    assert n1 == n2
    cols = ["doc_id", "url", "warc_ts"]
    a = bc.to_pandas()[cols].sort_values("doc_id").reset_index(drop=True)
    b = dist.to_pandas()[cols].sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)


def test_ingest_routes_agree_on_warc_ts_ties():
    """Duplicate urls TIED on warc_ts resolve via the md5(text)
    tie-break on BOTH ingest routes, with identical winners."""
    import hashlib

    import pyarrow as pa

    from pyfuseray.docids import ingest_pages

    tbl = pa.table(
        {
            "url": ["http://e/a", "http://e/a", "http://e/a",
                    "http://e/b", "http://e/c", "http://e/c"],
            "warc_ts": [5, 5, 9, 1, 3, 3],
            "html": [b""] * 6,
            "text": ["zz tie loser", "aa tie winner", "later row",
                     "only b", "c first", "c second"],
        }
    )
    ds = rd.from_arrow(tbl).repartition(3)
    bc, n1 = ingest_pages(ds)
    dist, n2 = ingest_pages(ds, broadcast_threshold=2)  # force distributed
    assert n1 == n2 == 3
    cols = ["doc_id", "url", "warc_ts", "text"]
    a = bc.to_pandas()[cols].sort_values("doc_id").reset_index(drop=True)
    b = dist.to_pandas()[cols].sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)
    # winner for the tied url is min (warc_ts, md5(text))
    tie_rows = ["zz tie loser", "aa tie winner"]
    want = min(tie_rows, key=lambda t: hashlib.md5(t.encode()).hexdigest())
    assert a[a["url"] == "http://e/a"]["text"].tolist() == [want]


def test_build_from_pages_corpus_routes_identical(tmp_path):
    """The size-gated corpus persistence (overlapped materialize+write
    below the threshold vs write-parquet-first streaming above it) must
    produce (a) a complete corpus checkpoint and (b) bit-identical
    indexes: same bucket checksums, same posting counts, rank-identical
    searches. Also covers the two-concurrent-driver-pipelines overlap
    path that bench.py exercises (ADVICE r2)."""
    tbl = synth_pages(150, seed=13, null_text_frac=0.25, dup_frac=0.1)
    path = str(tmp_path / "pages.parquet")
    pq.write_table(tbl, path)

    manifests = {}
    for name, thresh in (("overlap", 10**9), ("write_first", 0)):
        out = str(tmp_path / f"ix_{name}")
        cdir = str(tmp_path / f"corpus_{name}")
        m = build_from_pages(
            rd.read_parquet(path), out, corpus_dir=cdir,
            materialize_threshold=thresh, num_buckets=4, num_salts=2,
            overwrite=True,
        )
        manifests[name] = (out, m)
        # corpus checkpoint is complete and readable
        corpus = rd.read_parquet(f"{cdir}/corpus").to_pandas()
        assert len(corpus) == m.n_docs
        assert corpus["doc_id"].is_unique

    (out_a, ma), (out_b, mb) = manifests["overlap"], manifests["write_first"]
    assert ma.n_docs == mb.n_docs
    assert {k: (v["checksum"], v["n_postings"]) for k, v in ma.buckets.items()} == {
        k: (v["checksum"], v["n_postings"]) for k, v in mb.buckets.items()
    }
    sa, sb = IndexSearcher(out_a), IndexSearcher(out_b)
    for q in ["quick foxes", "flowers bloom spring", "webhot"]:
        assert sa.search_bm25(q, 10, algorithm="wand") == sb.search_bm25(
            q, 10, algorithm="wand"
        ), q
        assert sa.search_tfidf(q, 10) == sb.search_tfidf(q, 10), q


def test_extreme_hot_term_with_salting(tmp_path):
    """Skew stress: a term in ~95% of docs, salted into 4 doc-range
    splits, must still merge to the exact posting list and rank
    identically to the oracle."""
    tbl = synth_pages(300, seed=17, hot_frac=0.95, null_text_frac=0.0)
    path = str(tmp_path / "pages.parquet")
    pq.write_table(tbl, path)
    out = str(tmp_path / "ix")
    build_from_pages(rd.read_parquet(path), out, num_buckets=2, num_salts=4,
                     overwrite=True)
    searcher = IndexSearcher(out)
    raw = tbl.to_pandas().sort_values("url")
    docs = list(enumerate(
        [extract_text(h, t) for h, t in zip(raw["html"], raw["text"])]
    ))
    oracle = OracleIndex().build(docs)
    assert searcher.lookup(["webhot"])["webhot"].df == oracle.df()["webhot"]
    for q in ["webhot", "webhot quick", "quick foxes webhot"]:
        got = searcher.search_bm25(q, 10, algorithm="wand")
        want = oracle.search_bm25(q, 10)
        assert [d for d, _ in got] == [d for d, _ in want], q
