"""Unigram-LM perplexity scoring (extras/lm.py) vs a serial oracle."""

import math
import re

import numpy as np
import ray.data as rd

from pyfuseray.extras.lm import lm_perplexity, unigram_counts

_TOKEN = re.compile(r"[a-z0-9]+")


def _toks(t):
    return _TOKEN.findall(t.lower())


def _serial_lm(texts):
    cf = {}
    for t in texts:
        for w in _toks(t):
            cf[w] = cf.get(w, 0) + 1
    return cf, sum(cf.values()), len(cf)


def _serial_ce(text, cf, n_total, v):
    toks = _toks(text)
    if not toks:
        return None
    lp = sum(math.log((cf.get(w, 0) + 1) / (n_total + v)) for w in toks)
    return -lp / len(toks)


TEXTS = [
    "the cat sat on the mat",
    "the dog sat on the log",
    "zebra xylophone quartz jukebox vex",  # rare tokens -> high ppl
    "the the the the the",                 # repetitive -> low ppl
    "",
]


def _ds(texts, blocks=3):
    return rd.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    ).repartition(blocks)


def test_unigram_counts_match_serial(ray_session):
    got = unigram_counts(_ds(TEXTS)).to_pandas()
    cf, _, _ = _serial_lm(TEXTS)
    assert dict(zip(got["term"], got["cf"])) == cf


def test_self_perplexity_matches_serial(ray_session):
    out = lm_perplexity(_ds(TEXTS)).to_pandas().sort_values("doc_id")
    cf, n_total, v = _serial_lm(TEXTS)
    assert out["doc_id"].tolist() == [0, 1, 2, 3]  # empty doc excluded
    for _, r in out.iterrows():
        ce = _serial_ce(TEXTS[int(r["doc_id"])], cf, n_total, v)
        assert abs(r["cross_entropy"] - round(ce, 6)) < 1e-12
        assert abs(r["ppl"] - round(math.exp(ce), 4)) < 1e-12
    # the repetitive doc scores easiest, the rare-token doc hardest
    by_doc = out.set_index("doc_id")["cross_entropy"]
    assert by_doc[3] == by_doc.min()
    assert by_doc[2] == by_doc.max()


def test_cross_corpus_unseen_tokens_get_floor(ray_session):
    train = ["apple banana cherry apple", "banana cherry date"]
    lm = unigram_counts(_ds(train, blocks=1)).to_pandas()
    cf, n_total, v = _serial_lm(train)
    score_texts = ["apple unknownword"]
    out = lm_perplexity(
        _ds(score_texts, blocks=1), lm=lm
    ).to_pandas()
    want = -(
        math.log((cf["apple"] + 1) / (n_total + v))
        + math.log(1 / (n_total + v))
    ) / 2
    assert abs(out["cross_entropy"][0] - round(want, 6)) < 1e-12


def test_batching_independence(ray_session):
    outs = [
        lm_perplexity(_ds(TEXTS, blocks=b)).to_pandas()
        .sort_values("doc_id").reset_index(drop=True)
        for b in (1, 5)
    ]
    assert outs[0].equals(outs[1])
