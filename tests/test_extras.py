"""Training-data extras: dedup family, KNN, text stats, multimodal plumbing."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from pyfuseray.extras.dedup import (
    add_simhash,
    exact_dedup,
    minhash_dedup,
    ngram_jaccard,
    simhash64,
    simhash_candidates,
)
from pyfuseray.extras.knn import brute_force_topk, lsh_topk, range_search
from pyfuseray.extras.multimodal import (
    FEATURE_DIM,
    decode_image,
    extract_features,
    synth_media,
)
from pyfuseray.extras.textstats import (
    LangIdStage,
    lang_id,
    quality_scores,
    rolling_hash_fingerprint,
    token_counts,
)


def _doc_ds(texts):
    return rd.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    ).repartition(3)


# -- dedup -------------------------------------------------------------------

def test_exact_dedup_keeps_min_id():
    texts = ["hello world", "Hello   WORLD", "other doc", "hello world"]
    out = exact_dedup(_doc_ds(texts)).to_pandas().sort_values("doc_id")
    # normalization folds case+whitespace: docs 0,1,3 collapse to doc 0
    assert out["doc_id"].tolist() == [0, 2]


def test_minhash_finds_near_dups():
    base = "the quick brown fox jumps over the lazy dog and runs through the green fields every morning"
    near = base.replace("green", "wide")  # one-token edit
    texts = [base, near, "completely different content about database engines and parquet files and shuffles"]
    verified, clusters = minhash_dedup(_doc_ds(texts), threshold=0.5)
    assert (0, 1) in verified
    assert all(2 not in p for p in verified)
    assert clusters.get(1) == 0


def test_ngram_jaccard_bounds():
    assert ngram_jaccard("a b c d e f", "a b c d e f") == 1.0
    assert ngram_jaccard("a b c d e f", "x y z w v u") == 0.0
    assert ngram_jaccard("", "") == 1.0
    assert 0.0 < ngram_jaccard("a b c d e f g", "a b c d e f h") < 1.0


def test_simhash_near_vs_far():
    a = "the quick brown fox jumps over the lazy dog in the field"
    b = a + " extra"
    c = "entirely unrelated words concerning matrix multiplication kernels"
    ha, hb, hc = simhash64(a), simhash64(b), simhash64(c)
    def ham(x, y):
        return bin(x ^ y).count("1")
    assert ham(ha, hb) < ham(ha, hc)
    assert simhash64("") == 0


def test_simhash_candidates_pipeline():
    texts = ["aaa bbb ccc ddd eee fff"] * 2 + ["zzz yyy xxx www vvv uuu"]
    cand = simhash_candidates(_doc_ds(texts)).to_pandas()
    pairs = set(zip(cand["a"], cand["b"]))
    assert (0, 1) in pairs


# -- knn ---------------------------------------------------------------------

def _emb_ds(n=100, dim=16, seed=3):
    rng = np.random.default_rng(seed)
    vecs = rng.standard_normal((n, dim)).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
        }
    )
    return rd.from_arrow(tbl).repartition(4), vecs


def test_brute_force_topk_matches_numpy():
    ds, vecs = _emb_ds()
    q = vecs[7]
    got = brute_force_topk(ds, q, 5)[0]
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = vn @ (q / np.linalg.norm(q))
    want = np.lexsort((np.arange(len(sims)), -sims))[:5]
    assert [v for v, _ in got] == want.tolist()
    assert got[0][0] == 7  # self is nearest
    assert abs(got[0][1] - 1.0) < 1e-5


def test_brute_force_multi_query():
    ds, vecs = _emb_ds()
    res = brute_force_topk(ds, vecs[:3], 4)
    assert len(res) == 3
    for j, r in enumerate(res):
        assert r[0][0] == j


def test_lsh_topk_reasonable_recall():
    ds, vecs = _emb_ds(n=200)
    exact = {v for v, _ in brute_force_topk(ds, vecs[11], 10)[0]}
    approx = {v for v, _ in lsh_topk(ds, vecs[11], 10, n_planes=4)[0]}
    assert 11 in approx
    assert len(exact & approx) >= 3  # bucketed search keeps some true neighbors


def test_range_search():
    ds, vecs = _emb_ds()
    res = range_search(ds, vecs[5], radius=1e-6)
    assert res and res[0][0] == 5 and res[0][1] < 1e-6
    res_all = range_search(ds, vecs[5], radius=1e9)
    assert len(res_all) == 100
    dists = [d for _, d in res_all]
    assert dists == sorted(dists)


# -- textstats ---------------------------------------------------------------

def test_token_counts():
    out = token_counts(_doc_ds(["one two three", "", "a b"])).to_pandas()
    got = dict(zip(out["doc_id"], out["n_tokens"]))
    assert got == {0: 3, 1: 0, 2: 2}


def test_lang_id():
    texts = [
        "the cat and the dog sat in the garden for an hour with the birds",
        "el perro y el gato que viven en la casa de los abuelos",
        "der hund und die katze sind nicht mit den kindern zu hause",
        "",
    ]
    out = lang_id(_doc_ds(texts), concurrency=2).to_pandas()
    got = dict(zip(out["doc_id"], out["lang_pred"]))
    assert got[0] == "en" and got[1] == "es" and got[2] == "de" and got[3] == "und"


def test_quality_scores_bounds():
    out = quality_scores(_doc_ds(["word " * 200, "123 456 789", ""])).to_pandas()
    q = dict(zip(out["doc_id"], out["quality"]))
    assert q[0] == 1.0              # long, no digits
    assert 0.0 <= q[1] < 0.1        # digit-heavy and short
    assert q[2] == 0.0


def test_rolling_fingerprint_stability():
    a = "some document text that is long enough for windows"
    assert rolling_hash_fingerprint(a) == rolling_hash_fingerprint(a)
    assert rolling_hash_fingerprint(a) != rolling_hash_fingerprint(a + " different tail content here")


# -- multimodal --------------------------------------------------------------

def test_decode_stub_raises_without_fake():
    import pytest

    with pytest.raises(NotImplementedError):
        decode_image(b"\x00\x01")


def test_multimodal_feature_plumbing():
    media = rd.from_arrow(synth_media(50))
    feats = extract_features(media, concurrency=2, batch_size=16).to_pandas()
    assert len(feats) == 50
    assert all(len(v) == FEATURE_DIM for v in feats["feature"])
    norms = [float(np.linalg.norm(v)) for v in feats["feature"]]
    assert all(abs(n - 1.0) < 1e-3 for n in norms)
    # deterministic: same payload -> same feature
    feats2 = extract_features(rd.from_arrow(synth_media(50)),
                              concurrency=2, batch_size=16).to_pandas()
    f1 = {m: tuple(v) for m, v in zip(feats["media_id"], feats["feature"])}
    f2 = {m: tuple(v) for m, v in zip(feats2["media_id"], feats2["feature"])}
    assert f1 == f2
