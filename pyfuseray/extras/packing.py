"""Sequence packing: assign documents to fixed-length training sequences.

The standard LLM pre-training data layout concatenates all documents in
a deterministic order into one token stream and cuts it every
``seq_len`` tokens; each document is then addressed by the sequence it
starts in and its offset within that sequence. ``pack_sequences``
computes that assignment distributed:

1. per-doc token counts are a vectorized batch-local stage (caller
   supplies any (id, n_tokens) Dataset — e.g.
   :func:`pyfuseray.extras.textstats.token_counts`);
2. the global prefix sum of token counts in ``id_col`` order runs
   through :func:`pyfuseray.extras.scan.running_sum` (sampled range
   cuts -> bucket totals -> driver exclusive scan over O(buckets)
   state -> one coarse shuffle + local cumsum — the corpus is shuffled
   exactly once and driver state never scales with corpus size);
3. ``seq_id`` / ``seq_offset`` are pure arithmetic on the scan output.

Token counts are integers, and integer sums are exact in float64 up to
2^53 (~9e15 tokens — far above a 100 TB corpus), so the result is
integer-exact, not approximate; the contract entry hash-matches a
``SUM() OVER (ORDER BY doc_id)`` DuckDB window oracle without rounding.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from pyfuseray.extras.scan import DEFAULT_BUCKETS, running_sum


def pack_sequences(
    counts: rd.Dataset,
    *,
    seq_len: int,
    id_col: str = "doc_id",
    count_col: str = "n_tokens",
    n_buckets: int = DEFAULT_BUCKETS,
) -> rd.Dataset:
    """(id_col, count_col, seq_id, seq_offset) for every document.

    ``counts``: a Dataset with one row per document carrying its token
    count. ``seq_id`` = index of the fixed-length sequence the doc's
    FIRST token lands in; ``seq_offset`` = that token's position within
    the sequence. Documents longer than ``seq_len`` simply span several
    sequences starting there (the training loader's concern, not the
    planner's)."""
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    scanned = running_sum(
        counts,
        order_cols=[id_col],
        value_col=count_col,
        out_col="_run",
        n_buckets=n_buckets,
    )

    def finish(batch: pa.Table) -> pa.Table:
        run = batch.column("_run").to_numpy(zero_copy_only=False)
        n = batch.column(count_col).to_numpy(zero_copy_only=False).astype(np.int64)
        start = np.rint(run).astype(np.int64) - n  # exact: integer-valued float64
        return pa.table(
            {
                id_col: batch.column(id_col),
                count_col: pa.array(n, pa.int64()),
                "seq_id": pa.array(start // seq_len, pa.int64()),
                "seq_offset": pa.array(start % seq_len, pa.int64()),
            }
        )

    return scanned.map_batches(finish, batch_format="pyarrow")
