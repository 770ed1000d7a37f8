"""Local replica of the driver's correctness gate: run every queries()
entry and compare with oracle_sql() via DuckDB (row count, column
names, order-insensitive value hash). Usage:

    python scripts/check_contract.py [sf_dir] [name ...]
"""

from __future__ import annotations

import hashlib
import sys

import duckdb
import pandas as pd


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd

    if isinstance(obj, rd.Dataset):
        return obj.to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    rows = sorted(
        df.astype(str).apply(lambda r: "\x00".join(r.values), axis=1).tolist()
    )
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def main() -> int:
    import ray

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"ok   {name}: rows-only ({len(got)} rows, cols={list(got.columns)})")
            continue
        try:
            want = con.execute(sql).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle raised {type(e).__name__}: {e}")
            failures += 1
            continue
        problems = []
        if len(got) != len(want):
            problems.append(f"rows {len(got)} != {len(want)}")
        if sorted(got.columns) != sorted(want.columns):
            problems.append(f"cols {sorted(got.columns)} != {sorted(want.columns)}")
        elif value_hash(got) != value_hash(want):
            problems.append("value-hash mismatch")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            if "value-hash mismatch" in problems:
                merged = got[sorted(got.columns)].merge(
                    want[sorted(want.columns)], how="outer", indicator=True
                )
                diff = merged[merged["_merge"] != "both"]
                print(diff.head(6).to_string())
            failures += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
    ray.shutdown()
    return failures


if __name__ == "__main__":
    raise SystemExit(main())
