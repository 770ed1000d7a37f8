"""Positional sidecar index: phrase + proximity queries.

Pins pyfuseray/positional.py to brute-force serial oracles (token-list
scan for phrases, exhaustive position-pair check for proximity), the
regex-adjacency equivalence the contract oracle relies on, and
batch-structure independence."""

import itertools
import re

import numpy as np
import pytest
import ray.data as rd

from pyfuseray.positional import (
    build_positional_index,
    phrase_docs,
    proximity_docs,
    tokenize_raw,
)


def _corpus() -> list[str]:
    rng = np.random.default_rng(5)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "quick brown dog, then a fox",
        "the the quick the quick brown",
        "Quick... BROWN? yes",
        "brown quick",  # reversed — phrase miss, proximity hit
        "quick alpha beta gamma delta eps zeta eta theta brown",  # far apart
        "",
        "one-token",
    ]
    for _ in range(20):
        texts.append(" ".join(vocab[i] for i in rng.integers(0, len(vocab), 12)))
    return texts


def _brute_phrase(texts: list[str], phrase: str) -> list[int]:
    s = tokenize_raw(phrase)
    out = []
    for i, t in enumerate(texts):
        tk = tokenize_raw(t)
        if any(tk[j : j + len(s)] == s for j in range(len(tk) - len(s) + 1)):
            out.append(i)
    return out


def _brute_prox(texts: list[str], terms: list[str], window: int) -> list[int]:
    out = []
    for i, t in enumerate(texts):
        tk = tokenize_raw(t)
        pos = {q: [j for j, x in enumerate(tk) if x == q] for q in terms}
        if any(not p for p in pos.values()):
            continue
        best = min(
            max(c) - min(c) for c in itertools.product(*pos.values())
        )
        if best <= window:
            out.append(i)
    return out


@pytest.fixture(scope="module")
def pos_index(ray_session, tmp_path_factory):
    texts = _corpus()
    ds = rd.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    ).repartition(4)
    out = str(tmp_path_factory.mktemp("posix") / "ix")
    build_positional_index(ds, out, n_buckets=8)
    return out, texts


def test_phrase_matches_bruteforce(pos_index):
    ix, texts = pos_index
    for phrase in ("quick brown", "the quick brown", "the the",
                   "brown fox jumps", "zebra stripes", "quick"):
        got = phrase_docs(ix, phrase).tolist()
        assert got == _brute_phrase(texts, phrase), phrase


def test_phrase_is_punctuation_and_case_insensitive(pos_index):
    ix, texts = pos_index
    assert phrase_docs(ix, "Quick, BROWN!").tolist() == _brute_phrase(
        texts, "quick brown"
    )


def test_phrase_equals_regex_adjacency(pos_index):
    """The equivalence the contract oracle depends on: token adjacency
    over the raw [a-z0-9]+ stream == the regex-adjacency semantics."""
    ix, texts = pos_index
    rx = re.compile(r"(^|[^a-z0-9])quick[^a-z0-9]+brown([^a-z0-9]|$)")
    want = [i for i, t in enumerate(texts) if rx.search(t.lower())]
    assert phrase_docs(ix, "quick brown").tolist() == want


def test_proximity_matches_bruteforce(pos_index):
    ix, texts = pos_index
    for terms, window in (
        (["quick", "brown"], 1),
        (["quick", "brown"], 5),
        (["quick", "brown"], 50),
        (["fox", "dog", "lazy"], 4),
        (["fox", "dog", "lazy"], 10),
        (["alpha", "zeta"], 3),
    ):
        got = proximity_docs(ix, terms, window=window).tolist()
        assert got == _brute_prox(texts, terms, window), (terms, window)


def test_proximity_order_free_vs_phrase_ordered(pos_index):
    ix, texts = pos_index
    # doc 4 is "brown quick": adjacent but reversed
    assert 4 not in phrase_docs(ix, "quick brown").tolist()
    assert 4 in proximity_docs(ix, ["quick", "brown"], window=1).tolist()


def test_build_batch_structure_independent(ray_session, tmp_path):
    texts = _corpus()
    rows = [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    results = []
    for blocks in (1, 7):
        out = str(tmp_path / f"ix{blocks}")
        build_positional_index(
            rd.from_items(rows).repartition(blocks), out, n_buckets=4
        )
        results.append(
            (
                phrase_docs(out, "quick brown").tolist(),
                proximity_docs(out, ["fox", "dog"], window=6).tolist(),
            )
        )
    assert results[0] == results[1]
