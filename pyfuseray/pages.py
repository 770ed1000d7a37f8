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
) -> pa.Table:
    """Build the pages table deterministically."""
    rng = np.random.default_rng(seed)
    vocab = np.array(_VOCAB)
    # zipfian ranks over the vocab
    ranks = np.arange(1, len(vocab) + 1, dtype=np.float64)
    probs = (1.0 / ranks) / (1.0 / ranks).sum()

    urls, tss, htmls, texts, langs = [], [], [], [], []
    n_unique = n_rows - int(n_rows * dup_frac)
    for i in range(n_rows):
        u = i if i < n_unique else rng.integers(0, n_unique)
        url = f"https://site{u % 97:02d}.example/page/{u:08d}"
        nwords = int(rng.integers(words_per_doc[0], words_per_doc[1] + 1))
        words = list(vocab[rng.choice(len(vocab), size=nwords, p=probs)])
        if rng.random() < hot_frac:
            words.insert(int(rng.integers(0, len(words) + 1)), hot_term)
        body = " ".join(words)
        is_null_text = rng.random() < null_text_frac
        html = (
            "<html><head><title>page</title>"
            "<script>var x = 1;</script><style>p{color:red}</style></head>"
            f"<body><p>{body}</p></body></html>"
        ).encode("utf-8")
        urls.append(url)
        tss.append(_EPOCH_2024_12_01_US + i * 1_000_000)
        htmls.append(html)
        texts.append(None if is_null_text else body)
        langs.append(_LANGS[int(rng.integers(0, len(_LANGS)))])

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
