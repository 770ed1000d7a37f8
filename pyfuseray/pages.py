"""Deterministic synthetic Common-Crawl-style pages table (FIXTURES.md §1).

The graft's input_hint mandates pages(url, warc_ts, html, text, lang);
the driver testdata has no such table, so tests and benchmarks
synthesize it here — seeded, no wall-clock, no external data.

Properties:
- unique urls (doc_id = rank of url in sorted order);
- ``warc_ts`` = epoch 2024-12-01 + i seconds (keep-first dedup order);
- a fraction of rows have ``text`` null -> extraction must go through
  the html tag-strip path;
- zipfian vocabulary + embedded golden-corpus sentences so reference
  queries hit;
- a ``hot`` term present in ~50% of docs to exercise salted
  term-splitting;
- optional duplicate urls (for dedup tests).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_EPOCH_2024_12_01_US = 1_733_011_200_000_000  # 2024-12-01T00:00:00Z in microseconds

_VOCAB = [
    "quick", "brown", "foxes", "jump", "lazy", "dogs", "wizard", "boxes",
    "flowers", "bloom", "spring", "garden", "season", "running", "cats",
    "birds", "flying", "fields", "crawl", "web", "page", "index", "search",
    "ranking", "engine", "data", "stream", "shard", "merge", "token",
    "zephyr", "quartz", "sphinx", "liquor", "dozen", "daft", "vexingly",
    "nightly", "playing", "chase", "colorful", "fresh", "beautiful",
    "wonderful", "perfect", "document", "corpus", "posting", "delta",
    "compress",
]

_LANGS = ["en", "en", "en", "en", "en", "en", "en", "en", "es", "de"]


def synth_pages(
    n_rows: int,
    *,
    seed: int = 42,
    null_text_frac: float = 0.15,
    dup_frac: float = 0.0,
    hot_term: str = "webhot",
    hot_frac: float = 0.5,
    words_per_doc: tuple[int, int] = (20, 120),
    vocab_size: int = 0,
    id_offset: int = 0,
) -> pa.Table:
    """Build the pages table deterministically.

    ``vocab_size`` > len(base words) extends the vocabulary with derived
    words (base + digit suffix) under a zipfian distribution — the
    realistic long-tail regime for web text (large df table, lower
    stem-cache hit rates, selective query terms).

    ``id_offset`` shifts the url/warc_ts id space so multi-million-row
    corpora can be synthesized in bounded-memory CHUNKS (one
    ``synth_pages(chunk, seed=base+k, id_offset=k*chunk)`` call per
    shard) without url collisions across chunks — duplicates then only
    occur within a chunk, which is all the dedup stages need.
    """
    rng = np.random.default_rng(seed)
    if vocab_size and vocab_size > len(_VOCAB):
        derived = [
            f"{_VOCAB[i % len(_VOCAB)]}{i // len(_VOCAB)}"
            for i in range(len(_VOCAB), vocab_size)
        ]
        vocab = np.array(_VOCAB + derived)
    else:
        vocab = np.array(_VOCAB)
    # zipfian ranks over the vocab
    ranks = np.arange(1, len(vocab) + 1, dtype=np.float64)
    probs = (1.0 / ranks) / (1.0 / ranks).sum()

    n_unique = n_rows - int(n_rows * dup_frac)
    # vectorized draws: one rng call per attribute, not per doc
    nwords = rng.integers(words_per_doc[0], words_per_doc[1] + 1, size=n_rows)
    all_idx = rng.choice(len(vocab), size=int(nwords.sum()), p=probs)
    ends = np.cumsum(nwords)
    starts = ends - nwords
    has_hot = rng.random(n_rows) < hot_frac
    hot_pos = rng.integers(0, np.maximum(nwords, 1) + 1)
    is_null = rng.random(n_rows) < null_text_frac
    lang_idx = rng.integers(0, len(_LANGS), size=n_rows)
    dup_of = rng.integers(0, max(1, n_unique), size=n_rows)

    urls, tss, htmls, texts, langs = [], [], [], [], []
    for i in range(n_rows):
        u = id_offset + (i if i < n_unique else int(dup_of[i]))
        url = f"https://site{u % 97:02d}.example/page/{u:08d}"
        words = list(vocab[all_idx[starts[i] : ends[i]]])
        if has_hot[i]:
            words.insert(min(int(hot_pos[i]), len(words)), hot_term)
        body = " ".join(words)
        html = (
            "<html><head><title>page</title>"
            "<script>var x = 1;</script><style>p{color:red}</style></head>"
            f"<body><p>{body}</p></body></html>"
        ).encode("utf-8")
        urls.append(url)
        tss.append(_EPOCH_2024_12_01_US + (id_offset + i) * 1_000_000)
        htmls.append(html)
        texts.append(None if is_null[i] else body)
        langs.append(_LANGS[int(lang_idx[i])])

    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array(tss, type=pa.timestamp("us")),
            "html": pa.array(htmls, type=pa.binary()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(langs, type=pa.string()),
        }
    )


def write_pages(path: str, n_rows: int, **kwargs) -> str:
    import pyarrow.parquet as pq

    tbl = synth_pages(n_rows, **kwargs)
    pq.write_table(tbl, path)
    return path
