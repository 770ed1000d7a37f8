"""Deduplication operators for large-scale training-data pipelines.

Beyond the reference's exact dedup-by-key (reference
``app/DataLoader.py:40``), this module adds the near-dup family a
100 TB text pipeline needs. All of them follow the same Ray-Data-first
shape: a vectorized fingerprint stage in ``map_batches``, a
hash-partitioned ``groupby`` on the fingerprint/bucket key, and a tiny
driver-side post-pass only where the candidate set is provably small
(pair verification / union-find); the partitioning assumption each
relies on is stated in its docstring.
"""

from __future__ import annotations

import hashlib
import re
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

_TOKEN = re.compile(r"[a-z0-9]+")
_WS = re.compile(r"\s+")


def _normalize(text: str) -> str:
    return _WS.sub(" ", (text or "").lower()).strip()


def content_fingerprint(text: str) -> str:
    """md5 of whitespace-normalized lowercase text (exact-dup key)."""
    return hashlib.md5(_normalize(text).encode("utf-8", "replace")).hexdigest()


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(
    ds: rd.Dataset, *, text_col: str = "text", id_col: str = "doc_id"
) -> rd.Dataset:
    """Exact near-identity dedup: hash-partition on content fingerprint,
    keep the row with the smallest id per group. One shuffle keyed on the
    16-byte fingerprint; survivor choice is deterministic."""

    def add_fp(batch: pa.Table) -> pa.Table:
        fps = [content_fingerprint(t) for t in batch.column(text_col).to_pylist()]
        return batch.append_column("_fp", pa.array(fps, type=pa.string()))

    def keep_min(group: pd.DataFrame) -> pd.DataFrame:
        return group.loc[[group[id_col].idxmin()]]

    return (
        ds.map_batches(add_fp, batch_format="pyarrow")
        .groupby("_fp")
        .map_groups(keep_min, batch_format="pandas")
        .drop_columns(["_fp"])
    )


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _minhash_params(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


def _shingles(text: str, k: int) -> np.ndarray:
    toks = _TOKEN.findall((text or "").lower())
    if len(toks) < k:
        grams = [" ".join(toks)] if toks else []
    else:
        grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    return np.unique(
        np.fromiter((zlib.crc32(g.encode()) for g in grams), dtype=np.uint64,
                    count=len(grams))
    )


def _signature(shingle_hashes: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if shingle_hashes.size == 0:
        return np.full(a.size, np.uint64(_MERSENNE), dtype=np.uint64)
    # (num_perm, n_shingles) universal hashing, min per row — fully vectorized
    vals = (a[:, None] * shingle_hashes[None, :] + b[:, None]) % np.uint64(_MERSENNE)
    return vals.min(axis=1)


class MinHashStage:
    """Actor-pool stage: text -> LSH band rows (band_id, band_hash, doc_id).

    Permutation parameters are generated once per actor from a fixed seed
    (identical across actors, so signatures are globally consistent).
    """

    def __init__(self, num_perm: int = 64, bands: int = 16, shingle_k: int = 5):
        assert num_perm % bands == 0
        self.num_perm, self.bands, self.k = num_perm, bands, shingle_k
        self.rows_per_band = num_perm // bands
        self.a, self.b = _minhash_params(num_perm)

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out_band, out_hash, out_doc = [], [], []
        for doc_id, text in zip(doc_ids, texts):
            sig = _signature(_shingles(text, self.k), self.a, self.b)
            for band in range(self.bands):
                chunk = sig[band * self.rows_per_band : (band + 1) * self.rows_per_band]
                out_band.append(band)
                out_hash.append(int(zlib.crc32(chunk.tobytes())))
                out_doc.append(doc_id)
        return pa.table(
            {
                "band_id": pa.array(out_band, type=pa.int32()),
                "band_hash": pa.array(out_hash, type=pa.int64()),
                "doc_id": pa.array(out_doc, type=pa.int64()),
            }
        )


def minhash_candidate_pairs(
    ds: rd.Dataset,
    *,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    concurrency: int | tuple[int, int] = (1, 8),
) -> rd.Dataset:
    """(a, b) candidate near-dup pairs (a < b) via banded MinHash LSH.

    shingle->minhash->band rows, then ONE groupby on (band_id, band_hash);
    each bucket emits its pairs. Partitioning assumption: bucket sizes are
    small (hash of a quarter-signature); a pathological bucket is bounded
    by emitting at most ``_MAX_BUCKET`` ids per bucket.
    """

    def emit_pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(set(group["doc_id"].tolist()))[:_MAX_BUCKET]
        pairs = [(a, b) for i, a in enumerate(ids) for b in ids[i + 1 :]]
        if not pairs:
            return pd.DataFrame({"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64")})
        return pd.DataFrame(pairs, columns=["a", "b"])

    bands_ds = ds.map_batches(
        MinHashStage,
        fn_constructor_kwargs={"num_perm": num_perm, "bands": bands, "shingle_k": shingle_k},
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    pairs = bands_ds.groupby(["band_id", "band_hash"]).map_groups(
        emit_pairs, batch_format="pandas"
    )
    return pairs.groupby(["a", "b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )


_MAX_BUCKET = 256


def ngram_jaccard(text_a: str, text_b: str, k: int = 5) -> float:
    """Exact n-gram Jaccard similarity (the pair-verification metric)."""
    sa, sb = set(_shingles(text_a, k).tolist()), set(_shingles(text_b, k).tolist())
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def minhash_dedup(
    ds: rd.Dataset,
    *,
    threshold: float = 0.8,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
) -> tuple[list[tuple[int, int]], dict[int, int]]:
    """Full near-dup pass: candidates -> exact-Jaccard verify ->
    union-find clusters. Returns (verified_pairs, doc_id -> cluster_root).

    The verify + union-find post-pass runs on the driver and is valid
    when the candidate set is small relative to the corpus (the normal
    case at threshold >= 0.7); at larger candidate volumes the verify
    step becomes a broadcast-join map_batches stage instead.
    """
    cand = minhash_candidate_pairs(
        ds, num_perm=num_perm, bands=bands, shingle_k=shingle_k
    ).to_pandas()
    need_ids = sorted(set(cand["a"]).union(cand["b"])) if len(cand) else []
    texts: dict[int, str] = {}
    if need_ids:
        id_set = set(need_ids)
        for row in ds.select_columns(["doc_id", "text"]).iter_rows():
            if row["doc_id"] in id_set:
                texts[row["doc_id"]] = row["text"]
    verified = [
        (int(a), int(b))
        for a, b in zip(cand.get("a", []), cand.get("b", []))
        if ngram_jaccard(texts.get(int(a), ""), texts.get(int(b), ""), shingle_k)
        >= threshold
    ]
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in verified:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    clusters = {x: find(x) for x in parent}
    return verified, clusters


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash64(text: str) -> int:
    """64-bit SimHash over token crc64-ish hashes, deterministic."""
    toks = _TOKEN.findall((text or "").lower())
    if not toks:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    for t in toks:
        h = int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big")
        bits = np.array([(h >> i) & 1 for i in range(64)], dtype=np.int64)
        acc += bits * 2 - 1
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def add_simhash(ds: rd.Dataset, *, text_col: str = "text") -> rd.Dataset:
    def stage(batch: pa.Table) -> pa.Table:
        hs = [simhash64(t) for t in batch.column(text_col).to_pylist()]
        # store as 4x16-bit bands for hamming<=3 LSH grouping
        tbl = batch.append_column(
            "simhash", pa.array([h - (1 << 63) for h in hs], type=pa.int64())
        )
        for band in range(4):
            tbl = tbl.append_column(
                f"sim_band{band}",
                pa.array([(h >> (band * 16)) & 0xFFFF for h in hs], type=pa.int32()),
            )
        return tbl

    return ds.map_batches(stage, batch_format="pyarrow")


def simhash_candidates(ds: rd.Dataset) -> rd.Dataset:
    """Hamming<=3 candidates: two docs agreeing on any 16-bit band.

    (4 bands of 16 bits: any pair within hamming distance 3 shares at
    least one exact band — pigeonhole.) One groupby per band, unioned.
    """
    with_h = add_simhash(ds)

    def emit_pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(set(group["doc_id"].tolist()))[:_MAX_BUCKET]
        pairs = [(a, b) for i, a in enumerate(ids) for b in ids[i + 1 :]]
        if not pairs:
            return pd.DataFrame({"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64")})
        return pd.DataFrame(pairs, columns=["a", "b"])

    parts = []
    for band in range(4):
        parts.append(
            with_h.select_columns(["doc_id", f"sim_band{band}"])
            .groupby(f"sim_band{band}")
            .map_groups(emit_pairs, batch_format="pandas")
        )
    allp = parts[0].union(*parts[1:])
    return allp.groupby(["a", "b"]).map_groups(lambda g: g.head(1), batch_format="pandas")
