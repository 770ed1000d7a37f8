"""Duplicated-span removal (extras/spandedup.py) + sequence packing
(extras/packing.py): serial equality, route identity, edge cases."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from pyfuseray.extras.packing import pack_sequences
from pyfuseray.extras.spandedup import dedup_spans, duplicated_chunks


def _serial_dedup_spans(rows: list[tuple[int, str]], k: int, min_docs: int):
    """Reference implementation: plain Python dicts."""
    chunks_of: dict[int, list[str]] = {}
    for doc_id, text in rows:
        ws = text.split(" ")
        chunks_of[doc_id] = [
            " ".join(ws[i : i + k]) for i in range(0, len(ws), k)
        ]
    docs_of: dict[str, set[int]] = {}
    for doc_id, chunks in chunks_of.items():
        for c in set(chunks):
            docs_of.setdefault(c, set()).add(doc_id)
    dup = {c for c, ds in docs_of.items() if len(ds) >= min_docs}
    out = {}
    for doc_id, chunks in chunks_of.items():
        kept = [c for c in chunks if c not in dup]
        out[doc_id] = (" ".join(kept), len(chunks), len(chunks) - len(kept))
    return out


def _corpus(n: int = 120, seed: int = 3) -> list[tuple[int, str]]:
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(40)]
    boiler = "w0 w1 w2 w3"  # planted duplicated chunk (aligned)
    rows = []
    for d in range(n):
        words = list(rng.choice(vocab, size=int(rng.integers(1, 40))))
        if d % 3 == 0:
            # insert the boilerplate at a chunk-aligned position
            pos = (len(words) // 4) * 4
            words[pos:pos] = boiler.split()
        rows.append((d, " ".join(words)))
    rows.append((n, ""))  # empty doc
    rows.append((n + 1, "solo"))  # single short doc
    return rows


def _to_ds(rows, parallelism=7):
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows]),
        }
    )
    return rd.from_arrow(tbl).repartition(parallelism)


def test_dedup_spans_matches_serial_and_routes_agree(ray_session):
    rows = _corpus()
    expect = _serial_dedup_spans(rows, k=4, min_docs=2)

    for route in ("broadcast", "distributed"):
        got = (
            dedup_spans(_to_ds(rows), k=4, min_docs=2, route=route)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert len(got) == len(rows), route
        for _, r in got.iterrows():
            ct, nc, nd = expect[int(r.doc_id)]
            assert r.clean_text == ct, (route, r.doc_id)
            assert int(r.n_chunks) == nc and int(r.n_dropped) == nd, (
                route,
                r.doc_id,
            )


def test_dedup_spans_batching_independent(ray_session):
    """Same answer whatever the block structure (partials are exact
    because docs never split across batches)."""
    rows = _corpus(80, seed=9)
    a = (
        dedup_spans(_to_ds(rows, parallelism=1))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        dedup_spans(_to_ds(rows, parallelism=13))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)


def test_duplicated_chunks_threshold(ray_session):
    rows = [
        (0, "a b c d x"),
        (1, "a b c d y"),
        (2, "a b c d z"),
        (3, "q r s t"),
    ]
    dup = duplicated_chunks(_to_ds(rows), k=4, min_docs=3).to_pandas()
    assert set(dup.chunk) == {"a b c d"}
    assert int(dup.nd.iloc[0]) == 3


def test_pack_sequences_matches_serial(ray_session):
    rng = np.random.default_rng(5)
    n = 500
    counts = rng.integers(0, 900, size=n).astype(np.int64)
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n), pa.int64()),
                "n_tokens": pa.array(counts, pa.int64()),
            }
        )
    ).repartition(11)
    got = (
        pack_sequences(ds, seq_len=512)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    start = np.concatenate(([0], np.cumsum(counts)[:-1]))
    assert (got.seq_id.values == start // 512).all()
    assert (got.seq_offset.values == start % 512).all()
    assert (got.n_tokens.values == counts).all()
