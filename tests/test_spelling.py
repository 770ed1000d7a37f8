"""Spelling suggestion (extras/spelling.py) + boolean OR/AND-NOT."""

import numpy as np
import pytest

from pyfuseray.docids import _utf8_fixed_width
from pyfuseray.extras.spelling import _levenshtein_vec, suggest, suggest_batch


def _lev_ref(a: str, b: str) -> int:
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
    return dp[len(b)]


def test_levenshtein_vec_fuzz():
    """The vectorized DP equals the classic per-pair DP over random
    [a-z0-9] terms of every length 0-8 (incl. empty)."""
    import pyarrow as pa

    rng = np.random.default_rng(7)
    alpha = "abc12"
    terms = [""] + [
        "".join(rng.choice(list(alpha), size=rng.integers(1, 9)))
        for _ in range(300)
    ]
    mat = _utf8_fixed_width(pa.array(terms, pa.string()))
    n, L = len(mat), mat.dtype.itemsize
    b2 = mat.view(np.uint8).reshape(n, L)
    widths = (b2 != 0).sum(axis=1).astype(np.int32)
    for q in ["", "a", "ab1", "c2ba", "abc12abc"]:
        got = _levenshtein_vec(b2, widths, q.encode())
        want = np.array([_lev_ref(t, q) for t in terms], dtype=np.int32)
        assert (got == want).all(), q


def test_suggest_ranking(ray_session):
    import ray.data as rd

    d = rd.from_items(
        [
            {"term": "query", "df": 100},
            {"term": "quart", "df": 50},
            {"term": "weird", "df": 10},
            {"term": "quest", "df": 100},
        ]
    )
    out = suggest(d, ["qurey"], max_dist=2, k=3)
    # dist: query=2, quart=3(out), quest=3(out) -> only query survives?
    # qurey->query: transpose = 2 edits under Levenshtein
    assert list(out["suggestion"]) == ["query"]
    out2 = suggest(d, ["quer"], max_dist=2, k=3)
    # quer->query 1, quest 2, quart 2: rank by (dist, df DESC, term)
    assert list(out2["suggestion"]) == ["query", "quest", "quart"]
    assert list(out2["rank"]) == [0, 1, 2]


def test_suggest_batch_empty():
    import pyarrow as pa

    t = pa.table({"term": pa.array([], pa.string()), "df": pa.array([], pa.int64())})
    out = suggest_batch(t, ["abc"])
    assert out.num_rows == 0


@pytest.fixture(scope="module")
def small_index(ray_session, tmp_path_factory):
    import ray.data as rd

    from pyfuseray.build import build_index

    rows = [
        (0, "fast scan merge sort"),
        (1, "fast scan only here"),
        (2, "merge sort alone"),
        (3, "scan fast reversed order"),
        (4, "nothing relevant"),
    ]
    out = str(tmp_path_factory.mktemp("bix") / "ix")
    corpus = rd.from_items([{"doc_id": d, "text": t} for d, t in rows])
    build_index(corpus, out, num_buckets=2, analyzer="simple")
    return out


def test_boolean_or_andnot_algebra(small_index):
    from pyfuseray.query import IndexSearcher

    s = IndexSearcher(small_index)
    a = set(s.search_boolean("fast", mode="or").tolist())
    b = set(s.search_boolean("merge", mode="or").tolist())
    both_or = set(s.search_boolean("fast merge", mode="or").tolist())
    both_and = set(s.search_boolean("fast merge", mode="and").tolist())
    assert both_or == a | b == {0, 1, 2, 3}
    assert both_and == a & b == {0}
    andnot = set(s.search_boolean("fast scan", mode="and", exclude="merge").tolist())
    assert andnot == {1, 3}
    # excluding an absent term is a no-op; empty base short-circuits
    assert set(
        s.search_boolean("fast scan", mode="and", exclude="zzznope").tolist()
    ) == {0, 1, 3}
    assert s.search_boolean("zzznope", mode="and", exclude="fast").size == 0


def test_largest_remainder_quotas():
    from pyfuseray.extras.mixture import largest_remainder_quotas

    w = {"a": 1.0, "b": 1.0, "c": 1.0}
    q = largest_remainder_quotas(w, {"a": 99, "b": 99, "c": 99}, 10)
    assert sum(q.values()) == 10
    assert sorted(q.values(), reverse=True) == [4, 3, 3]
    # exact thirds: leftover goes to smallest source names first on ties
    assert q["a"] == 4
    # availability cap: no re-allocation, deterministic under-fill
    q2 = largest_remainder_quotas(w, {"a": 2, "b": 99, "c": 99}, 30)
    assert q2 == {"a": 2, "b": 10, "c": 10}
    # zero-weight and missing-count sources
    q3 = largest_remainder_quotas({"a": 1.0, "b": 0.0}, {"a": 5}, 4)
    assert q3 == {"a": 4, "b": 0}
