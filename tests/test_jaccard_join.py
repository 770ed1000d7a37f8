"""Exact all-pairs n-gram Jaccard self-join (All-Pairs prefix filtering).

Pins dedup.jaccard_similarity_join to a brute-force serial oracle at
several thresholds, candidate-recall to the prefix-filter theorem, and
batch-structure independence (the pair set must not depend on how the
corpus is blocked)."""

import numpy as np
import ray.data as rd

from pyfuseray.extras.dedup import (
    jaccard_candidate_pairs,
    jaccard_similarity_join,
    ngram_jaccard,
)


def _corpus(n_docs: int = 36, seed: int = 11) -> list[str]:
    """Deterministic synthetic corpus with planted near-dups at graded
    similarity: clusters of mutated copies plus unrelated filler."""
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(120)]
    texts: list[str] = []
    base_docs = []
    for _ in range(6):
        words = [vocab[i] for i in rng.integers(0, len(vocab), size=30)]
        base_docs.append(words)
    for words in base_docs:
        texts.append(" ".join(words))
        for n_edits in (1, 4, 10):
            mutated = list(words)
            for pos in rng.integers(0, len(words), size=n_edits):
                mutated[pos] = vocab[int(rng.integers(0, len(vocab)))]
            texts.append(" ".join(mutated))
    while len(texts) < n_docs:
        words = [vocab[i] for i in rng.integers(0, len(vocab), size=20)]
        texts.append(" ".join(words))
    # edge rows: short doc (< k tokens -> whole-doc gram) and empty doc
    texts.append("tiny doc")
    texts.append("tiny doc")
    texts.append("")
    return texts


def _brute_pairs(texts: list[str], threshold: float, k: int = 5) -> set:
    out = set()
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            # empty docs emit no gram rows and are excluded by design
            if not texts[i].strip() or not texts[j].strip():
                continue
            if ngram_jaccard(texts[i], texts[j], k) >= threshold:
                out.add((i, j))
    return out


def test_jaccard_join_matches_bruteforce_across_thresholds(ray_session):
    texts = _corpus()
    ds = rd.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    ).repartition(5)
    for t in (0.25, 0.5, 0.85):
        got = jaccard_similarity_join(ds, threshold=t).to_pandas()
        got_set = set(zip(got["a"].tolist(), got["b"].tolist()))
        assert got_set == _brute_pairs(texts, t), f"threshold {t}"
        # the attached similarity is the exact metric
        for a, b, j in zip(got["a"], got["b"], got["jaccard"]):
            assert abs(j - round(ngram_jaccard(texts[a], texts[b]), 6)) == 0.0


def test_jaccard_candidates_are_superset_of_true_pairs(ray_session):
    texts = _corpus(seed=23)
    ds = rd.from_items([{"doc_id": i, "text": t} for i, t in enumerate(texts)])
    t = 0.4
    cand = jaccard_candidate_pairs(ds, threshold=t).to_pandas()
    cand_set = set(zip(cand["a"].tolist(), cand["b"].tolist()))
    assert cand_set >= _brute_pairs(texts, t)
    assert not cand["overflow"].any()


def test_jaccard_join_batch_structure_independent(ray_session):
    texts = _corpus(seed=7)
    rows = [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    sets = []
    for blocks in (1, 4, 13):
        ds = rd.from_items(rows).repartition(blocks)
        got = jaccard_similarity_join(ds, threshold=0.5, emit_counts=True).to_pandas()
        sets.append(
            set(zip(got["a"].tolist(), got["b"].tolist(),
                    got["inter"].tolist(), got["uni"].tolist()))
        )
    assert sets[0] == sets[1] == sets[2]
    assert sets[0]  # non-degenerate: the planted dups actually pair
