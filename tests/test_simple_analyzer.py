"""Simple (SQL-mirrorable) analyzer mode: build/query symmetry, manifest
pinning, and BM25 equality against a from-scratch in-test oracle.

The contract entry ``bm25_topk_simple`` hash-checks the same path against
DuckDB at the driver; this test gives the failure a local signal.
"""

import math
import re
from collections import Counter

import pyarrow as pa
import pytest
import ray.data as rd

from pyfuseray.analyzer import SimpleAnalyzer, make_analyzer
from pyfuseray.build import build_index
from pyfuseray.checkpoint import load_manifest
from pyfuseray.query import IndexSearcher

DOCS = [
    "Fast scan, merge! Fast merge.",
    "query data stream; stream stream",
    "batch window value",
    "the quick brown fox (it's running)",
    "",  # empty doc still counts toward N
    "fast fast fast scan",
]


def _corpus():
    return rd.from_arrow(
        pa.table({"doc_id": list(range(len(DOCS))), "text": DOCS})
    )


def _brute_bm25(query: str, k1=1.2, b=0.75):
    tok = lambda s: re.findall(r"[a-z0-9]+", s.lower())
    tfs = [Counter(tok(d)) for d in DOCS]
    n = len(DOCS)
    dls = [sum(c.values()) for c in tfs]
    avgdl = sum(dls) / n
    df = Counter(t for c in tfs for t in c)
    scores = {}
    for t in set(tok(query)):
        if not df[t]:
            continue
        idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
        for d, c in enumerate(tfs):
            if c[t]:
                s = idf * c[t] * (k1 + 1) / (c[t] + k1 * (1 - b + b * dls[d] / avgdl))
                scores[d] = scores.get(d, 0.0) + s
    return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))


def test_simple_mode_build_and_search(tmp_path):
    ix = str(tmp_path / "ix")
    m = build_index(_corpus(), ix, num_buckets=2, analyzer="simple")
    assert m.analyzer == "simple"
    assert load_manifest(ix).analyzer == "simple"
    s = IndexSearcher(ix)
    # searcher picks the analyzer from the manifest
    assert isinstance(s.analyzer, SimpleAnalyzer)
    # no stoplist / no stemming / keeps 1-char query tokens symmetric
    assert s.analyzer.preprocess_query("The running IT a") == {
        "the": 1, "running": 1, "it": 1, "a": 1,
    }
    for q in ["fast scan", "stream", "quick fox running", "value window"]:
        got = s.search_bm25(q, 10, algorithm="taat")
        want = _brute_bm25(q)[:10]
        assert [d for d, _ in got] == [d for d, _ in want]
        for (_, a), (_, bscore) in zip(got, want):
            assert abs(a - bscore) < 1e-9


def test_reference_mode_is_default_and_differs(tmp_path):
    ix = str(tmp_path / "ixref")
    m = build_index(_corpus(), ix, num_buckets=2)
    assert m.analyzer == "reference"
    s = IndexSearcher(ix)
    # reference chain stems: "running" -> "run"; simple mode must not
    assert s.analyzer.preprocess_query("running")  # stemmed, non-empty
    assert "run" in s.analyzer.preprocess_query("running")


def test_resume_analyzer_mismatch_raises(tmp_path):
    ix = str(tmp_path / "ixm")
    build_index(_corpus(), ix, num_buckets=2, analyzer="simple")
    with pytest.raises(ValueError, match="analyzer"):
        build_index(_corpus(), ix, num_buckets=2, analyzer="reference")


def test_unknown_analyzer_mode_raises():
    with pytest.raises(ValueError, match="unknown analyzer"):
        make_analyzer("nope")
