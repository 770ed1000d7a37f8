"""Benchmark decontamination: train/eval n-gram overlap.

The standard LLM-training hygiene pass (GPT-3 appendix C / PaLM /
Llama): flag every training document that shares an n-gram of tokens
with an evaluation document. Output is pair-level — (train_id,
eval_id, n_shared) with n_shared = the number of DISTINCT shared
n-grams — so downstream can either drop train docs or mark eval rows.

Routes (size-gated, pinned identical by
``tests/test_ops_round3.py::test_contamination_routes_agree``):

- **broadcast** (eval grams <= ``broadcast_limit``; the typical shape —
  eval suites are tiny next to a training corpus): the eval (gram ->
  eval_id) table ships ONCE via ray.put as a sorted gram array +
  parallel id array; each train batch matches its grams with two
  searchsorteds and emits exact pair counts with NO shuffle — a train
  doc lives wholly inside one batch, and per-doc grams are distinct,
  so batch-local counts are globally exact.
- **distributed**: both gram streams flow through
  ``extras.joins.hash_join`` (ONE coarse-bucket shuffle each side,
  hot grams salted) and one combiner groupby sums pair counts.

Gram construction mirrors ``dedup._shingles`` (tokens = ``[a-z0-9]+``
of lower(text); docs shorter than n contribute the single whole-doc
gram; gram SETS per doc), kept as STRINGS so the DuckDB oracle
(contract ``contamination_pairs``) can reproduce them; at corpus scale
swap in 64-bit blake2b gram hashes to shrink the shuffle (the
collision probability note in ``dedup.py`` applies).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

BROADCAST_GRAM_LIMIT = 20_000_000  # eval grams; ~a few GB of strings


def _gram_table(batch: pa.Table, n: int) -> pa.Table:
    """(doc_id, gram): the DISTINCT token n-grams of every doc in the
    batch (dedup._shingles' construction, strings kept)."""
    from pyfuseray.extras.textstats import simple_tokens

    ids_out: list[int] = []
    grams_out: list[str] = []
    ids = batch.column("doc_id").to_pylist()
    for doc_id, text in zip(ids, batch.column("text").to_pylist()):
        toks = simple_tokens(text)
        if not toks:
            continue
        if len(toks) < n:
            gs = [" ".join(toks)]
        else:
            gs = list(
                dict.fromkeys(
                    " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
                )
            )
        ids_out.extend([doc_id] * len(gs))
        grams_out.extend(gs)
    return pa.table(
        {
            "doc_id": pa.array(ids_out, pa.int64()),
            "gram": pa.array(grams_out, pa.string()),
        }
    )


def ngram_contamination(
    train: rd.Dataset,
    eval_ds: rd.Dataset,
    *,
    n: int = 5,
    broadcast_limit: int = BROADCAST_GRAM_LIMIT,
) -> rd.Dataset:
    """(train_id, eval_id, n_shared): training docs sharing at least one
    token n-gram with an eval doc. Both inputs need (doc_id, text)."""

    def grams(batch: pa.Table) -> pa.Table:
        return _gram_table(batch, n)

    eval_grams = eval_ds.select_columns(["doc_id", "text"]).map_batches(
        grams, batch_format="pyarrow"
    )
    n_eval = eval_grams.count()

    if n_eval <= broadcast_limit:
        if n_eval == 0:
            eg = np.array([], dtype=object)
            ei = np.array([], dtype=np.int64)
        else:
            df = eval_grams.to_pandas()
            eg = df["gram"].to_numpy(dtype=object)
            ei = df["doc_id"].to_numpy(dtype=np.int64)
            order = np.argsort(eg, kind="stable")
            eg, ei = eg[order], ei[order]
        ref = ray.put((eg, ei))

        def match(batch: pa.Table) -> pa.Table:
            eg_s, ei_s = ray.get(ref)
            gt = _gram_table(batch, n)
            if gt.num_rows == 0 or eg_s.size == 0:
                return pa.table(
                    {
                        "train_id": pa.array([], pa.int64()),
                        "eval_id": pa.array([], pa.int64()),
                        "n_shared": pa.array([], pa.int64()),
                    }
                )
            g = gt.column("gram").to_numpy(zero_copy_only=False)
            t_ids = gt.column("doc_id").to_numpy(zero_copy_only=False)
            lo = np.searchsorted(eg_s, g, side="left")
            hi = np.searchsorted(eg_s, g, side="right")
            span = hi - lo
            hit = span > 0
            if not hit.any():
                return pa.table(
                    {
                        "train_id": pa.array([], pa.int64()),
                        "eval_id": pa.array([], pa.int64()),
                        "n_shared": pa.array([], pa.int64()),
                    }
                )
            # expand each matching gram to its eval_id span
            reps = span[hit]
            t_rep = np.repeat(t_ids[hit], reps)
            starts = lo[hit]
            idx = np.concatenate([np.arange(s, s + r) for s, r in zip(starts, reps)])
            e_rep = ei_s[idx]
            # exact per-batch counts: a train doc's grams are all here
            pairs = np.stack([t_rep, e_rep], axis=1)
            uniq, counts = np.unique(pairs, axis=0, return_counts=True)
            return pa.table(
                {
                    "train_id": pa.array(uniq[:, 0], pa.int64()),
                    "eval_id": pa.array(uniq[:, 1], pa.int64()),
                    "n_shared": pa.array(counts.astype(np.int64)),
                }
            )

        return train.select_columns(["doc_id", "text"]).map_batches(
            match, batch_format="pyarrow"
        )

    # distributed route: coarse-bucket join on gram + combiner groupby
    from ray.data.aggregate import Count

    from pyfuseray.extras.joins import hash_join

    train_grams = train.select_columns(["doc_id", "text"]).map_batches(
        grams, batch_format="pyarrow"
    )
    tg = train_grams.map_batches(
        lambda t: t.rename_columns(["train_id", "gram"]), batch_format="pyarrow"
    )
    eg_ds = eval_grams.map_batches(
        lambda t: t.rename_columns(["eval_id", "gram"]), batch_format="pyarrow"
    )
    joined = hash_join(tg, eg_ds, left_on="gram")
    return (
        joined.groupby(["train_id", "eval_id"])
        .aggregate(Count(alias_name="n_shared"))
    )
