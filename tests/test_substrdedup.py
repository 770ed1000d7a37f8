"""Exact duplicated-substring spans (extras/substrdedup.py): brute-force
serial oracle, within-doc repeats, batching independence, removal."""

import re

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from pyfuseray.extras.substrdedup import (
    duplicated_substring_spans,
    remove_duplicated_substrings,
)

_TOKEN = re.compile(r"[a-z0-9]+")


def _serial_spans(texts: dict[int, str], L: int) -> set[tuple[int, int, int]]:
    """Brute force: count every L-gram string globally, cover [p, p+L)
    for duplicated grams, merge contiguous coverage per doc."""
    from collections import Counter

    toks = {d: _TOKEN.findall((t or "").lower()) for d, t in texts.items()}
    counts = Counter(
        " ".join(ts[p : p + L])
        for ts in toks.values()
        for p in range(len(ts) - L + 1)
    )
    out = set()
    for d, ts in toks.items():
        covered = np.zeros(len(ts), dtype=bool)
        for p in range(len(ts) - L + 1):
            if counts[" ".join(ts[p : p + L])] >= 2:
                covered[p : p + L] = True
        i = 0
        while i < len(ts):
            if covered[i]:
                j = i
                while j < len(ts) and covered[j]:
                    j += 1
                out.add((d, i, j))
                i = j
            else:
                i += 1
    return out


def _got_spans(ds, L):
    t = duplicated_substring_spans(ds, min_len=L).to_pandas()
    return set(
        (int(r.doc_id), int(r.span_start), int(r.span_end))
        for r in t.itertuples()
    )


WORDS = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
         "lam mu nu xi omicron pi rho sigma tau upsilon").split()


def _rand_texts(n_docs=30, seed=5, planted=True):
    rng = np.random.default_rng(seed)
    texts = {}
    for d in range(n_docs):
        n = int(rng.integers(3, 40))
        texts[d] = " ".join(rng.choice(WORDS, size=n))
    if planted:
        boiler = "the quick brown fox jumps over the lazy dog tonight"
        # cross-doc duplicate at different offsets
        texts[1] = texts[1] + " " + boiler
        texts[2] = boiler + " " + texts[2]
        # within-doc duplicate
        texts[3] = texts[3] + " copy me twice now ok copy me twice now ok"
    return texts


@pytest.mark.parametrize("L", [3, 5, 8])
def test_spans_match_serial_oracle(ray_session, L):
    texts = _rand_texts()
    ds = rd.from_arrow(
        pa.table(
            {"doc_id": list(texts), "text": [texts[d] for d in texts]}
        )
    ).repartition(4)
    assert _got_spans(ds, L) == _serial_spans(texts, L)


def test_planted_duplicates_found(ray_session):
    texts = _rand_texts()
    got = _got_spans(
        rd.from_arrow(
            pa.table({"doc_id": list(texts), "text": list(texts.values())})
        ),
        5,
    )
    # the 10-token boilerplate is covered in docs 1 and 2; the 6-token
    # within-doc repeat in doc 3 appears as one merged span
    assert any(d == 1 and e - s >= 10 for d, s, e in got)
    assert any(d == 2 and s == 0 and e >= 10 for d, s, e in got)
    assert any(d == 3 for d, s, e in got)


def test_batching_independence(ray_session):
    texts = _rand_texts(seed=9)
    tbl = pa.table({"doc_id": list(texts), "text": list(texts.values())})
    a = _got_spans(rd.from_arrow(tbl), 4)
    b = _got_spans(rd.from_arrow(tbl).repartition(7), 4)
    assert a == b


def test_removal_matches_serial(ray_session):
    texts = _rand_texts(seed=11)
    L = 5
    spans = _serial_spans(texts, L)
    ds = rd.from_arrow(
        pa.table({"doc_id": list(texts), "text": list(texts.values())})
    ).repartition(3)
    got = {
        int(r.doc_id): r.text
        for r in remove_duplicated_substrings(ds, min_len=L)
        .to_pandas()
        .itertuples()
    }
    for d, text in texts.items():
        toks = _TOKEN.findall(text.lower())
        covered = np.zeros(len(toks), dtype=bool)
        for dd, s, e in spans:
            if dd == d:
                covered[s:e] = True
        want = " ".join(t for t, c in zip(toks, covered) if not c)
        assert got[d] == want, d


def test_no_duplicates_no_spans(ray_session):
    # every doc one distinct token: nothing reaches gram length
    ds = rd.from_arrow(
        pa.table({"doc_id": [0, 1], "text": ["alpha beta", "gamma delta"]})
    )
    assert _got_spans(ds, 5) == set()
