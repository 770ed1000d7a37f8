"""Sliding-window token chunking == the serial rule (starts =
range(0, n, stride), final window short, zero-token docs emit nothing),
independent of batch structure."""

import pandas as pd
import pyarrow as pa
import ray.data as rd

from pyfuseray.extras.chunking import chunk_batch, chunk_token_windows
from pyfuseray.extras.textstats import simple_tokens


def _serial(docs: list[tuple[int, str]], window: int, stride: int):
    rows = []
    for did, t in docs:
        toks = simple_tokens(t)
        for s in range(0, len(toks), stride):
            piece = toks[s : s + window]
            rows.append(
                (did, s // stride, s, len(piece), " ".join(piece))
            )
    return rows


DOCS = [
    (1, "a b c d e f g h i j"),          # 10 tokens
    (2, ""),                              # zero tokens -> no chunks
    (3, "only-three tokens here"),        # shorter than the window
    (4, "x " * 7),                        # exact multiple boundaries
    (5, "Mixed CASE 123 sep,ar;ated"),    # tokenizer normalization
]


def test_chunk_rule_vs_serial(ray_session):
    for window, stride in [(4, 3), (4, 4), (3, 5), (1, 1)]:
        ds = rd.from_pandas(
            pd.DataFrame(DOCS, columns=["doc_id", "text"])
        ).repartition(3)
        got = (
            chunk_token_windows(ds, window=window, stride=stride)
            .to_pandas()
            .sort_values(["doc_id", "chunk_idx"])
            .reset_index(drop=True)
        )
        want = pd.DataFrame(
            _serial(DOCS, window, stride),
            columns=["doc_id", "chunk_idx", "tok_start", "n_tokens",
                     "chunk_text"],
        ).sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want)
        assert not (got["doc_id"] == 2).any()


def test_chunk_batch_structure_independent():
    one = chunk_batch(
        pa.table({"doc_id": [d for d, _ in DOCS],
                  "text": [t for _, t in DOCS]}),
        window=4, stride=3,
    )
    per_row = [
        chunk_batch(pa.table({"doc_id": [d], "text": [t]}),
                    window=4, stride=3)
        for d, t in DOCS
    ]
    merged = pa.concat_tables([p for p in per_row if p.num_rows])
    assert one.equals(merged)
