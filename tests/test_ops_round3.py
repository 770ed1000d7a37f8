"""Round-3 operators: semi/anti join, distributed prefix scan,
boolean retrieval, bigram-PMI collocations.

Each has a hash-checked contract entry at the driver; these tests give
failures a local signal and pin the route-equality invariants."""

import math
import re
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from pyfuseray.extras.joins import anti_join, semi_join


def _sides(seed=7, n_left=500, n_right=200):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 300, n_left),
            "v": rng.normal(size=n_left).round(4),
        }
    )
    right = pd.DataFrame({"rk": rng.integers(150, 450, n_right)})
    return left, right


def _expect_semi(left, right, anti):
    keys = set(right["rk"].tolist())
    mask = left["k"].isin(keys)
    if anti:
        mask = ~mask
    return left[mask].sort_values(["k", "v"]).reset_index(drop=True)


def test_semi_anti_routes_agree():
    left, right = _sides()
    for anti in (False, True):
        exp = _expect_semi(left, right, anti)
        for limit in (0, 10**9):  # 0 forces distributed, 1e9 broadcast
            got = (
                semi_join(
                    rd.from_pandas(left),
                    rd.from_pandas(right),
                    left_on="k",
                    right_on="rk",
                    anti=anti,
                    broadcast_limit=limit,
                )
                .to_pandas()
                .sort_values(["k", "v"])
                .reset_index(drop=True)
            )
            pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_semi_anti_string_keys_and_empty_right():
    left = pd.DataFrame({"k": ["aa", "bb", "cc", "dd"], "v": [1, 2, 3, 4]})
    right = pd.DataFrame({"k": ["bb", "dd", "dd"]})
    got = semi_join(
        rd.from_pandas(left), rd.from_pandas(right), left_on="k"
    ).to_pandas()
    assert sorted(got["k"]) == ["bb", "dd"]
    got = anti_join(
        rd.from_pandas(left), rd.from_pandas(right), left_on="k"
    ).to_pandas()
    assert sorted(got["k"]) == ["aa", "cc"]
    # empty right: semi -> nothing, anti -> everything (broadcast route)
    empty = rd.from_pandas(pd.DataFrame({"k": pd.array([], dtype="str")}))
    assert semi_join(rd.from_pandas(left), empty, left_on="k").count() == 0
    assert anti_join(rd.from_pandas(left), empty, left_on="k").count() == 4


# -- distributed prefix scan -------------------------------------------------


def test_running_sum_matches_serial():
    from pyfuseray.extras.scan import running_sum

    rng = np.random.default_rng(3)
    n = 5000
    df = pd.DataFrame(
        {
            "t": rng.integers(0, 10**9, n),
            "id": np.arange(n),
            # integer-valued doubles: float64 partial sums are exact, so
            # the distributed result is bit-equal to the serial scan
            "v": rng.integers(-100, 1000, n).astype(np.float64),
        }
    )
    out = (
        running_sum(
            rd.from_pandas(df.sample(frac=1.0, random_state=5)),
            order_cols=["t", "id"],
            value_col="v",
            n_buckets=32,
        )
        .to_pandas()
        .sort_values(["t", "id"])
        .reset_index(drop=True)
    )
    serial = df.sort_values(["t", "id"]).reset_index(drop=True)
    assert np.array_equal(out["running"].to_numpy(), serial["v"].cumsum().to_numpy())
    # skewed: one primary key holds half the rows (single-bucket pileup
    # still correct; ties broken by id)
    df.loc[: n // 2, "t"] = 42
    out = (
        running_sum(
            rd.from_pandas(df), order_cols=["t", "id"], value_col="v",
            n_buckets=16,
        )
        .to_pandas()
        .sort_values(["t", "id"])
        .reset_index(drop=True)
    )
    serial = df.sort_values(["t", "id"]).reset_index(drop=True)
    assert np.array_equal(out["running"].to_numpy(), serial["v"].cumsum().to_numpy())


def test_running_sum_driver_state_bounded():
    """Pass A's shuffled state is the bucket totals: bucket count stays
    <= n_buckets regardless of row count."""
    from pyfuseray.extras import scan as scan_mod

    rng = np.random.default_rng(11)
    df = pd.DataFrame(
        {"t": rng.integers(0, 10**6, 4000), "id": np.arange(4000),
         "v": np.ones(4000)}
    )
    out = scan_mod.running_sum(
        rd.from_pandas(df), order_cols=["t", "id"], value_col="v",
        n_buckets=8,
    ).to_pandas()
    assert len(out) == 4000
    assert out["running"].max() == 4000.0


# -- boolean retrieval --------------------------------------------------------


def test_search_boolean_and_or(tmp_path):
    from pyfuseray.build import build_index
    from pyfuseray.query import IndexSearcher

    docs = [
        "fast scan merge fast",
        "query data stream",
        "fast data window",
        "merge scan",
        "",
        "fast merge scan extras",
    ]
    corpus = rd.from_arrow(pa.table({"doc_id": list(range(len(docs))), "text": docs}))
    ix = str(tmp_path / "ix")
    build_index(corpus, ix, num_buckets=2, analyzer="simple")
    s = IndexSearcher(ix)

    tok = lambda t: set(re.findall(r"[a-z0-9]+", t.lower()))
    for q in ["fast scan", "merge", "data stream", "fast zzz", "zzz"]:
        terms = tok(q)
        exp_and = sorted(i for i, d in enumerate(docs) if terms <= tok(d))
        exp_or = sorted(i for i, d in enumerate(docs) if terms & tok(d))
        assert s.search_boolean(q, mode="and").tolist() == exp_and, q
        assert s.search_boolean(q, mode="or").tolist() == exp_or, q


# -- contamination ------------------------------------------------------------


def test_contamination_routes_agree():
    from pyfuseray.extras.contamination import ngram_contamination

    rng = np.random.default_rng(23)
    vocab = [f"w{i}" for i in range(30)]
    texts = [" ".join(rng.choice(vocab, size=20)) for _ in range(60)]
    # plant exact contamination: train doc 3 copies eval doc 50's text,
    # train doc 4 shares a 5-gram window with eval doc 55
    texts[3] = texts[50]
    texts[4] = texts[4].split(" ", 5)[-1] + " " + " ".join(texts[55].split()[:5])
    docs = pd.DataFrame({"doc_id": np.arange(60), "text": texts})
    train = rd.from_pandas(docs[docs.doc_id < 50])
    ev = rd.from_pandas(docs[docs.doc_id >= 50])

    def serial():
        def gs(t):
            toks = re.findall(r"[a-z0-9]+", t.lower())
            if len(toks) < 5:
                return {" ".join(toks)} if toks else set()
            return {" ".join(toks[i : i + 5]) for i in range(len(toks) - 4)}

        rows = []
        for _, tr in docs[docs.doc_id < 50].iterrows():
            for _, evr in docs[docs.doc_id >= 50].iterrows():
                shared = len(gs(tr.text) & gs(evr.text))
                if shared:
                    rows.append((tr.doc_id, evr.doc_id, shared))
        return sorted(rows)

    exp = serial()
    for limit in (10**9, 0):  # broadcast, then forced distributed
        got = (
            ngram_contamination(train, ev, n=5, broadcast_limit=limit)
            .to_pandas()
            .sort_values(["train_id", "eval_id"])
            .reset_index(drop=True)
        )
        assert [tuple(r) for r in got.values.tolist()] == exp, limit
    assert any(r[0] == 3 and r[1] == 50 for r in exp)
    assert any(r[0] == 4 and r[1] == 55 for r in exp)


# -- repetition stats ---------------------------------------------------------


def test_repetition_stats_values():
    from pyfuseray.extras.textstats import repetition_stats

    docs = [
        "a b c a b c a b c",      # 7 trigrams, 3 distinct -> dup 4/7
        "x y z w",                # all distinct -> 0; top 1/4
        "q q q q",                # one trigram repeated -> dup 1/2; top 1
        "one two",                # <3 tokens -> dup 0
        "",                       # empty -> all 0
    ]
    ds = rd.from_arrow(pa.table({"doc_id": list(range(len(docs))), "text": docs}))
    out = repetition_stats(ds).to_pandas().sort_values("doc_id")
    assert out["n_tokens"].tolist() == [9, 4, 4, 2, 0]
    assert out["dup_3gram_frac"].tolist() == [
        round(1 - 3 / 7, 6), 0.0, 0.5, 0.0, 0.0
    ]
    assert out["top_token_frac"].tolist() == [
        round(3 / 9, 6), 0.25, 1.0, 0.5, 0.0
    ]


# -- bigram PMI ---------------------------------------------------------------


def test_top_bigrams_pmi_matches_serial():
    from pyfuseray.extras.collocations import top_bigrams_pmi

    rng = np.random.default_rng(17)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
    docs = []
    for _ in range(200):
        toks = list(rng.choice(vocab, size=12))
        # plant a strong collocation
        toks[3:5] = ["new", "york"]
        docs.append(" ".join(toks))
    ds = rd.from_arrow(pa.table({"doc_id": list(range(len(docs))), "text": docs}))
    got = top_bigrams_pmi(ds, min_count=3, k=10)

    # serial reference
    uni: Counter = Counter()
    bi: Counter = Counter()
    for d in docs:
        toks = re.findall(r"[a-z0-9]+", d.lower())
        uni.update(toks)
        bi.update(zip(toks, toks[1:]))
    n_uni, n_bi = sum(uni.values()), sum(bi.values())
    rows = [
        (a, b, c, round(math.log((c / n_bi) / ((uni[a] / n_uni) * (uni[b] / n_uni))), 6))
        for (a, b), c in bi.items()
        if c >= 3
    ]
    rows.sort(key=lambda r: (-r[3], r[0], r[1]))
    exp = rows[:10]
    assert got[["a", "b", "c_ab", "pmi"]].values.tolist() == [
        [a, b, c, p] for a, b, c, p in exp
    ]
    assert got["a"].iloc[0] == "new" and got["b"].iloc[0] == "york"
