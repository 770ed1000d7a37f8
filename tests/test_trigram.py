"""Trigram substring index (extras/trigram.py): exactness vs a serial
LIKE oracle, gram extraction unit rules, batching independence, and
the short-literal fallback route."""

import re

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from pyfuseray.extras.trigram import (
    _doc_grams,
    build_trigram_index,
    grams_of,
    like_search,
    pattern_literals,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "pack my box with five dozen liquor jugs"),
    (2, "the quick onyx goblin jumps over the lazy dwarf"),
    (3, "sphinx of black quartz judge my vow"),
    (4, "ab"),  # shorter than one trigram
    (5, ""),  # empty
    (6, "quick quick quick"),  # repeated grams stay distinct per doc
]


def _like_to_re(pattern: str) -> str:
    parts = [
        ".*" if ch == "%" else "." if ch == "_" else re.escape(ch)
        for ch in pattern
    ]
    return "^" + "".join(parts) + "$"


def _oracle(pattern: str) -> list[int]:
    rx = re.compile(_like_to_re(pattern), re.DOTALL)
    return [i for i, t in DOCS if rx.match(t)]


@pytest.fixture(scope="module")
def index(ray_session, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("trgm") / "ix")
    ds = rd.from_items([{"doc_id": i, "text": t} for i, t in DOCS])
    build_trigram_index(ds, out, n_buckets=8)
    return out


def _corpus():
    return rd.from_items([{"doc_id": i, "text": t} for i, t in DOCS])


@pytest.mark.parametrize(
    "pattern",
    [
        "%quick%",
        "%jumps over%",
        "%quick%lazy%",
        "%qu_ck%",
        "the quick%dog",
        "%zzz%",
        "%ab%",  # falls back (literal < 3 bytes)
        "%a%",  # falls back
        "ab",  # exact-match pattern, no wildcards, short literal
        "%box with five dozen%",
    ],
)
def test_like_matches_serial_oracle(index, pattern):
    df = like_search(index, _corpus(), pattern).to_pandas()
    got = sorted(df["doc_id"]) if "doc_id" in df.columns else []
    assert got == _oracle(pattern)


def test_grams_of_packs_utf8_windows():
    g = grams_of("abcd")
    # 'abc' and 'bcd'
    want = {
        (ord("a") << 16) | (ord("b") << 8) | ord("c"),
        (ord("b") << 16) | (ord("c") << 8) | ord("d"),
    }
    assert set(g.tolist()) == want
    assert grams_of("ab").size == 0
    # multibyte UTF-8: windows are byte-based, still 3 wide
    assert grams_of("é a").size == len("é a".encode()) - 2


def test_pattern_literals():
    assert pattern_literals("%abc%de_f%") == ["abc", "de", "f"]
    assert pattern_literals("abc") == ["abc"]
    assert pattern_literals("%%__%%") == []


def test_doc_grams_distinct_and_boundary_safe():
    batch = pa.table({"doc_id": [7, 8], "text": ["aaaa", "xyz"]})
    t = _doc_grams(batch, "text", "doc_id")
    pairs = sorted(
        zip(
            t.column("doc_id").to_pylist(),
            t.column("gram").to_pylist(),
        )
    )
    aaa = (ord("a") << 16) | (ord("a") << 8) | ord("a")
    xyz = (ord("x") << 16) | (ord("y") << 8) | ord("z")
    # 'aaaa' has two 'aaa' windows -> ONE distinct pair; no window may
    # bridge 'aaaa'|'xyz' ('aax', 'axy' must not appear)
    assert pairs == [(7, aaa), (8, xyz)]


def test_build_batching_independence(ray_session, tmp_path):
    """Index contents identical no matter how the corpus batches."""
    import pyarrow.parquet as pq
    import glob as _glob

    outs = []
    for nb, blocks in (("one", 1), ("many", 4)):
        out = str(tmp_path / f"ix_{nb}")
        ds = rd.from_items(
            [{"doc_id": i, "text": t} for i, t in DOCS]
        ).repartition(blocks)
        build_trigram_index(ds, out, n_buckets=8)
        rowset = set()
        for f in _glob.glob(out + "/bucket=*/*.parquet"):
            t = pq.read_table(f, columns=["gram", "doc_id"])
            rowset |= set(
                zip(t.column("gram").to_pylist(), t.column("doc_id").to_pylist())
            )
        outs.append(rowset)
    assert outs[0] == outs[1] and len(outs[0]) > 0
