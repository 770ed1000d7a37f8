"""Text analysis stages for training-data pipelines: token counting,
language-ID, quality scoring, document fingerprinting.

All are vectorized-per-batch ``map_batches`` stages over the documents
table; every one of them (token counts, fingerprint, quality score,
and lang-ID including its tie-break order) is hash-checked against a
DuckDB SQL oracle in ``__ray_entry__``.
"""

from __future__ import annotations

import hashlib
import re

import pyarrow as pa
import ray.data as rd

_SIMPLE_TOKEN = re.compile(r"[a-z0-9]+")
_WS = re.compile(r"\s+")

# tiny per-language stopword marker sets for the n-gram/stopword heuristic
_LANG_MARKERS = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "it", "for", "with"},
    "es": {"el", "la", "de", "que", "y", "en", "los", "del", "las", "por"},
    "de": {"der", "die", "und", "das", "nicht", "von", "mit", "den", "ein", "zu"},
    "fr": {"le", "la", "les", "des", "est", "et", "une", "dans", "que", "pour"},
}


def simple_tokens(text: str) -> list[str]:
    return _SIMPLE_TOKEN.findall((text or "").lower())


def token_count_stage(batch: pa.Table) -> pa.Table:
    """(doc_id, n_tokens) with the simple [a-z0-9]+ tokenizer — the
    SQL-checkable token counter (DuckDB regexp_extract_all oracle)."""
    counts = [len(simple_tokens(t)) for t in batch.column("text").to_pylist()]
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_tokens": pa.array(counts, type=pa.int64()),
        }
    )


# GPT-2-style pretokenizer shape (contractions | space?-letter-run |
# space?-digit-run | space?-punct-run), restricted to constructs whose
# semantics are IDENTICAL in Python re and DuckDB's RE2 so the count is
# SQL-checkable: explicit ASCII whitespace classes (RE2's \s is
# ASCII-only while Python's is unicode — never use \s here) and
# disjoint-by-first-character alternatives (so leftmost-first vs
# leftmost-longest cannot disagree).
BPE_ISH_PATTERN = (
    r"'(?:s|t|re|ve|m|ll|d)"
    r"| ?[a-zA-Z]+"
    r"| ?[0-9]+"
    r"| ?[^ \t\n\r\f\va-zA-Z0-9]+"
)
_BPE_ISH = re.compile(BPE_ISH_PATTERN)
# "whitespace token" = maximal run of non-whitespace (ASCII classes only,
# same reason as above)
WS_TOKEN_PATTERN = r"[^ \t\n\r\f\v]+"
_WS_TOKEN = re.compile(WS_TOKEN_PATTERN)


def bpe_token_count_stage(batch: pa.Table) -> pa.Table:
    """(doc_id, n_tokens_ws, n_tokens_bpe): whitespace token count plus a
    BPE-ish pretokenizer match count — the two counts a training-data
    pipeline budgets by. Hash-checked against a DuckDB
    ``regexp_extract_all`` oracle (``token_counts_bpe``)."""
    texts = batch.column("text").to_pylist()
    ws = [len(_WS_TOKEN.findall(t or "")) for t in texts]
    bpe = [len(_BPE_ISH.findall(t or "")) for t in texts]
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_tokens_ws": pa.array(ws, type=pa.int64()),
            "n_tokens_bpe": pa.array(bpe, type=pa.int64()),
        }
    )


def fingerprint_stage(batch: pa.Table) -> pa.Table:
    """(doc_id, fingerprint): md5 of whitespace-normalized lowercased text."""
    fps = [
        hashlib.md5(_WS.sub(" ", (t or "").lower()).strip().encode("utf-8", "replace")).hexdigest()
        for t in batch.column("text").to_pylist()
    ]
    return pa.table(
        {"doc_id": batch.column("doc_id"), "fingerprint": pa.array(fps, type=pa.string())}
    )


def quality_stage(batch: pa.Table) -> pa.Table:
    """(doc_id, n_chars, n_tokens, mean_token_len, digit_ratio, quality).

    quality = clamped 0..1 combination of length and digit-noise signals,
    defined so a DuckDB oracle can reproduce it exactly (see
    __ray_entry__.oracle_sql['quality_score']); all floats rounded to 6dp.
    """
    texts = batch.column("text").to_pylist()
    n_chars, n_toks, mean_len, digit_ratio, quality = [], [], [], [], []
    for t in texts:
        t = t or ""
        toks = simple_tokens(t)
        nc, nt = len(t), len(toks)
        ml = (sum(len(x) for x in toks) / nt) if nt else 0.0
        nd = sum(ch.isdigit() for ch in t)
        dr = nd / nc if nc else 0.0
        q = min(1.0, nt / 100.0) * (1.0 - dr)
        n_chars.append(nc)
        n_toks.append(nt)
        mean_len.append(round(ml, 6))
        digit_ratio.append(round(dr, 6))
        quality.append(round(q, 6))
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_chars": pa.array(n_chars, type=pa.int64()),
            "n_tokens": pa.array(n_toks, type=pa.int64()),
            "mean_token_len": pa.array(mean_len, type=pa.float64()),
            "digit_ratio": pa.array(digit_ratio, type=pa.float64()),
            "quality": pa.array(quality, type=pa.float64()),
        }
    )


def repetition_stage(batch: pa.Table) -> pa.Table:
    """(doc_id, n_tokens, dup_3gram_frac, top_token_frac): Gopher-style
    within-document repetition signals — the fraction of duplicate
    token 3-grams and the mass of the single most frequent token. The
    standard web-corpus filters for machine-generated/boilerplate text
    (Rae et al. 2021 'Scaling Language Models' repetition rules).
    Hash-checked against a DuckDB list-adjacency oracle
    (``repetition_stats``); floats rounded to 6dp on both sides."""
    import numpy as np

    ids = batch.column("doc_id")
    n_toks, dup3, topf = [], [], []
    for t in batch.column("text").to_pylist():
        toks = simple_tokens(t)
        n = len(toks)
        n_toks.append(n)
        if n >= 3:
            grams = np.asarray(
                [" ".join(toks[i : i + 3]) for i in range(n - 2)], dtype=object
            )
            total = grams.size
            distinct = np.unique(grams).size
            dup3.append(round(1.0 - distinct / total, 6))
        else:
            dup3.append(0.0)
        if n > 0:
            _, counts = np.unique(np.asarray(toks, dtype=object), return_counts=True)
            topf.append(round(int(counts.max()) / n, 6))
        else:
            topf.append(0.0)
    return pa.table(
        {
            "doc_id": ids,
            "n_tokens": pa.array(n_toks, pa.int64()),
            "dup_3gram_frac": pa.array(dup3, pa.float64()),
            "top_token_frac": pa.array(topf, pa.float64()),
        }
    )


def repetition_stats(ds: rd.Dataset) -> rd.Dataset:
    return ds.map_batches(repetition_stage, batch_format="pyarrow")


class LangIdStage:
    """Actor-pool language-ID: stopword-marker hit ratio per language,
    argmax with 'und' (undetermined) fallback. Marker tables built once
    per actor."""

    def __init__(self):
        self.markers = {lang: frozenset(ws) for lang, ws in _LANG_MARKERS.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        langs = []
        for t in batch.column("text").to_pylist():
            toks = simple_tokens(t)
            if not toks:
                langs.append("und")
                continue
            scores = {
                lang: sum(tok in ws for tok in toks) for lang, ws in self.markers.items()
            }
            best = max(sorted(scores), key=lambda k: scores[k])
            langs.append(best if scores[best] > 0 else "und")
        return pa.table(
            {"doc_id": batch.column("doc_id"), "lang_pred": pa.array(langs, type=pa.string())}
        )


def rolling_hash_fingerprint(text: str, window: int = 16) -> int:
    """Winnowing-style document fingerprint: min rolling (Rabin-Karp)
    hash over character windows — stable under small appends."""
    t = _WS.sub(" ", (text or "").lower()).strip()
    if len(t) < window:
        return zlib_crc(t)
    base, mod = 257, (1 << 61) - 1
    h = 0
    power = pow(base, window - 1, mod)
    best = None
    for i, ch in enumerate(t):
        h = (h * base + ord(ch)) % mod
        if i >= window:
            h = (h - ord(t[i - window]) * power * base) % mod
        if i >= window - 1:
            best = h if best is None else min(best, h)
    return int(best)


def zlib_crc(t: str) -> int:
    import zlib

    return zlib.crc32(t.encode("utf-8", "replace"))


def token_counts(ds: rd.Dataset) -> rd.Dataset:
    return ds.map_batches(token_count_stage, batch_format="pyarrow")


def bpe_token_counts(ds: rd.Dataset) -> rd.Dataset:
    return ds.map_batches(bpe_token_count_stage, batch_format="pyarrow")


def fingerprints(ds: rd.Dataset) -> rd.Dataset:
    return ds.map_batches(fingerprint_stage, batch_format="pyarrow")


def quality_scores(ds: rd.Dataset) -> rd.Dataset:
    return ds.map_batches(quality_stage, batch_format="pyarrow")


def lang_id(ds: rd.Dataset, concurrency: int | tuple[int, int] = (1, 4)) -> rd.Dataset:
    return ds.map_batches(LangIdStage, batch_format="pyarrow", concurrency=concurrency)
