"""Grouped sliding-window aggregate == pandas rolling on the serially
sorted frame (ties on ts broken by id, short leading frames, window=1),
independent of partitioning."""

import numpy as np
import pandas as pd
import ray.data as rd

from pyfuseray.extras.window import grouped_moving_avg


def _serial(df: pd.DataFrame, w: int) -> pd.DataFrame:
    rows = []
    for _, sub in df.groupby("user_id"):
        sub = sub.sort_values(["ts", "event_id"], kind="stable")
        cents = np.floor(sub["value"].to_numpy() * 100.0 + 0.5).astype(
            np.int64
        )
        s = pd.Series(cents).rolling(w, min_periods=1)
        avg = np.round(
            s.sum().to_numpy() / (100.0 * s.count().to_numpy()), 6
        )
        rows.append(
            pd.DataFrame(
                {"event_id": sub["event_id"].to_numpy(), "mov_avg": avg}
            )
        )
    return (
        pd.concat(rows).sort_values("event_id").reset_index(drop=True)
    )


def test_grouped_moving_avg_vs_serial(ray_session):
    rng = np.random.default_rng(7)
    n = 4000
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            # coarse ts grid forces (ts, event_id) tie-breaks
            "ts": pd.to_datetime(
                rng.integers(0, 500, size=n), unit="s"
            ),
            "user_id": rng.integers(0, 37, size=n).astype(np.int64),
            "value": np.round(rng.random(size=n) * 100, 2),
        }
    )
    for w, parts in [(7, 11), (1, 3), (50, 5)]:
        got = (
            grouped_moving_avg(
                rd.from_pandas(df).repartition(parts),
                group_col="user_id",
                ts_col="ts",
                id_col="event_id",
                value_col="value",
                window_rows=w,
            )
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, _serial(df, w))


def test_window_rows_validation(ray_session):
    import pytest

    with pytest.raises(ValueError):
        grouped_moving_avg(
            rd.from_pandas(
                pd.DataFrame(
                    {"event_id": [1], "ts": pd.to_datetime([0], unit="s"),
                     "user_id": [1], "value": [1.0]}
                )
            ),
            group_col="user_id", ts_col="ts", id_col="event_id",
            value_col="value", window_rows=0,
        )
