"""Sessionization: gap-based session windows over an event log.

The "streaming window" custom operator the Dataset API lacks natively:
a session = a maximal run of one user's events where consecutive gaps
are <= ``gap``. Semantics allow the groupby + map_groups composition
(sessions never span users), so the plan is ONE shuffle keyed on a
COARSE user-hash bucket (bounded group count — same policy as the
dedup family) with the per-user segmentation fully vectorized inside
each group: one lexsort by (user, ts), one diff for the gap breaks,
reduceat for the per-session aggregates.

Partitioning assumption: all of one user's events co-locate via the
hash bucket (true by construction); a single user's event volume fits
in one group (pathological single-user logs would need time-range
sub-bucketing with boundary session stitching — documented, not
needed at these scales).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

COARSE_USER_GROUPS = 512


def sessionize(
    events: rd.Dataset,
    *,
    gap_us: int = 1_800_000_000,  # 30 min
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> rd.Dataset:
    """events -> one row per session:
    (user_id, session_id, session_start, n_events, sum_value).

    session_id is 1-based per user in time order; session_start is the
    first event's timestamp in microseconds; sum_value is summed in
    time order and rounded to 4dp (DuckDB-oracle-comparable).
    """

    def add_keys(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col).cast(pa.int64())
        uid = batch.column(user_col).to_numpy(zero_copy_only=False)
        cb = (uid.astype(np.uint64) % np.uint64(COARSE_USER_GROUPS)).astype(np.int64)
        return pa.table(
            {
                "user_id": batch.column(user_col),
                "t": ts,
                "value": batch.column(value_col),
                "_cb": pa.array(cb, pa.int64()),
            }
        )

    def sessions(group: pd.DataFrame) -> pd.DataFrame:
        u = group["user_id"].to_numpy()
        t = group["t"].to_numpy()
        v = group["value"].to_numpy()
        order = np.lexsort((t, u))
        u, t, v = u[order], t[order], v[order]
        new_user = np.concatenate(([True], u[1:] != u[:-1]))
        gaps = np.concatenate(([0], np.diff(t)))
        new_sess = new_user | (gaps > gap_us)
        starts = np.flatnonzero(new_sess)
        ends = np.concatenate((starts[1:], [u.size]))
        # 1-based session numbering per user
        cs = np.cumsum(new_sess)
        user_starts = np.flatnonzero(new_user)
        user_ends = np.concatenate((user_starts[1:], [u.size]))
        base = np.repeat(cs[user_starts] - 1, user_ends - user_starts)
        sid = (cs - base)[starts]
        return pd.DataFrame(
            {
                "user_id": u[starts],
                "session_id": sid.astype(np.int64),
                "session_start": t[starts],
                "n_events": (ends - starts).astype(np.int64),
                "sum_value": np.round(np.add.reduceat(v, starts), 4),
            }
        )

    out = (
        events.map_batches(add_keys, batch_format="pyarrow")
        .groupby("_cb")
        .map_groups(sessions, batch_format="pandas")
    )
    return out.map_batches(lambda t: t, batch_format="pyarrow")
