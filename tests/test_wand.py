"""Block-max WAND must equal exhaustive TAAT on a corpus large enough to
exercise block skipping and heap thresholds (regression for the
advance-past-pivot and block-UB-contributor bugs found in round 1)."""

import pytest
import ray.data as rd

from pyfuseray.build import build_index
from pyfuseray.pages import synth_pages
from pyfuseray.pipeline import build_from_pages
from pyfuseray.query import IndexSearcher

QUERIES = [
    "quick foxes",
    "webhot",
    "flowers bloom spring garden",
    "search engine data stream",
    "wizard quartz sphinx zephyr",
    "compress delta posting merge",
    "document corpus index ranking token",
]


@pytest.fixture(scope="module")
def big_index(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("ix_wand"))
    pages = rd.from_arrow(synth_pages(1500, seed=23, null_text_frac=0.1))
    build_from_pages(pages, out, num_buckets=4, num_salts=3, overwrite=True)
    return IndexSearcher(out)


@pytest.mark.parametrize("query", QUERIES)
@pytest.mark.parametrize("k", [1, 3, 10, 50])
def test_wand_equals_taat(big_index, query, k):
    taat = big_index.search_bm25(query, k, algorithm="taat")
    wand = big_index.search_bm25(query, k, algorithm="wand")
    assert [d for d, _ in taat] == [d for d, _ in wand], (query, k)
    for (_, s1), (_, s2) in zip(taat, wand):
        assert abs(s1 - s2) < 1e-12


def test_wand_tiny_blocks(tmp_path):
    """Force many blocks per posting list so skipping logic really runs."""
    out = str(tmp_path / "ix")
    pages = rd.from_arrow(synth_pages(600, seed=31))
    build_from_pages(pages, out, num_buckets=2, num_salts=2, block_size=8,
                     overwrite=True)
    s = IndexSearcher(out)
    for q in QUERIES:
        taat = s.search_bm25(q, 10, algorithm="taat")
        wand = s.search_bm25(q, 10, algorithm="wand")
        assert [d for d, _ in taat] == [d for d, _ in wand], q
