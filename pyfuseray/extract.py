"""Text extraction from Common-Crawl-style page rows.

The reference's "extractor" concatenates 7 CSV text fields into
``texto_concatenado`` (reference ``app/data/afs/EdaAFS.ipynb``, consumed
at ``app/DataLoader.py:49``). For webtext pages the analogous stage maps
``(html, text)`` to the indexable document text, with the per-row
invariant that the distributed ``map_batches`` extraction is
byte-identical per url to this serial pure function (BASELINE.json
input_hint; tested in tests/test_pages.py).

Rule: use ``text`` when present; otherwise deterministically strip tags
from ``html`` (drop script/style bodies, replace tags with spaces,
unescape entities, collapse whitespace).
"""

from __future__ import annotations

import html as _htmllib
import re

import pyarrow as pa

_SCRIPT_STYLE = re.compile(
    rb"<\s*(script|style)\b.*?<\s*/\s*\1\s*>", re.IGNORECASE | re.DOTALL
)
_TAG = re.compile(rb"<[^>]*>")
_WS = re.compile(r"\s+")


def extract_text(html: bytes | None, text: str | None) -> str:
    """Pure, deterministic per-row extractor (the byte-identity anchor)."""
    if text is not None and text != "":
        return text
    if html is None or html == b"":
        return ""
    stripped = _SCRIPT_STYLE.sub(b" ", html)
    stripped = _TAG.sub(b" ", stripped)
    decoded = stripped.decode("utf-8", errors="replace")
    decoded = _htmllib.unescape(decoded)
    return _WS.sub(" ", decoded).strip()


def concat_text_columns(batch: pa.Table, columns: list[str],
                        out_col: str = "text") -> pa.Table:
    """Join several text columns with ' ' into one indexable column —
    the reference's ``texto_concatenado`` construction (7 song fields
    joined with ' ', consumed at reference ``app/DataLoader.py:49``).
    Nulls contribute empty strings; vectorized via Arrow kernels."""
    import pyarrow.compute as pc

    parts = [pc.fill_null(batch.column(c).cast(pa.string()), "") for c in columns]
    joined = parts[0]
    for p in parts[1:]:
        joined = pc.binary_join_element_wise(joined, p, " ")
    if out_col in batch.column_names:
        batch = batch.set_column(batch.column_names.index(out_col), out_col, joined)
    else:
        batch = batch.append_column(out_col, joined)
    return batch


def extract_batch(batch: pa.Table) -> pa.Table:
    """map_batches stage: pages(url, warc_ts, html, text, ...) ->
    (url, warc_ts, text). Drops the wide ``html`` column immediately so
    downstream shuffles never move raw HTML (SURVEY.md §7.6.5).

    Only rows with null/empty ``text`` take the per-row Python html
    strip (regexes can't vectorize); the rest pass through as Arrow —
    on the bench corpus 85% of rows need zero work, and round-tripping
    them through ``to_pylist`` dominated the stage."""
    import pyarrow.compute as pc

    n = batch.num_rows
    if "text" in batch.column_names:
        text = batch.column("text").combine_chunks()
        if isinstance(text, pa.ChunkedArray):
            text = pa.concat_arrays(text.chunks) if text.num_chunks else pa.array([], pa.string())
        text = text.cast(pa.string())
    else:
        text = pa.nulls(n, pa.string())
    need = pc.or_kleene(pc.is_null(text), pc.equal(text, ""))
    need = pc.fill_null(need, True)
    out_text = pc.fill_null(text, "")
    if "html" in batch.column_names and n:
        idx = pc.indices_nonzero(need)
        if len(idx):
            htmls = batch.column("html").take(idx).to_pylist()
            repl = pa.array([extract_text(h, None) for h in htmls], pa.string())
            out_text = pc.replace_with_mask(out_text, need, repl)
    cols: dict[str, pa.Array | pa.ChunkedArray] = {}
    if "doc_id" in batch.column_names:
        cols["doc_id"] = batch.column("doc_id")
    cols["url"] = batch.column("url")
    if "warc_ts" in batch.column_names:
        cols["warc_ts"] = batch.column("warc_ts")
    cols["text"] = out_text
    return pa.table(cols)
