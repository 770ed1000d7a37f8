"""Local replica of the driver's correctness gate: run every queries()
entry and compare with oracle_sql() via DuckDB (row count, column
names, order-insensitive value hash). Usage:

    python scripts/check_contract.py [sf_dir] [name ...] [--record out.json]

``--record`` writes a per-entry JSON artifact in the driver's
CORRECTNESS_r{N}.json shape so the committed claim "all entries pass"
always has a matching record (ADVICE r3)."""

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

    argv = list(sys.argv[1:])
    record_path = None
    if "--record" in argv:
        i = argv.index("--record")
        record_path = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
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
    record: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            record[name] = {"rows_match": False, "schema_match": False,
                            "hash_match": False, "spark_rows": None,
                            "oracle_rows": None,
                            "err": f"{type(e).__name__}: {e}"}
            failures += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"ok   {name}: rows-only ({len(got)} rows, cols={list(got.columns)})")
            record[name] = {"rows_match": len(got) >= 0, "schema_match": None,
                            "hash_match": None, "spark_rows": len(got),
                            "oracle_rows": None, "err": None,
                            "note": "rows-only (no SQL oracle)"}
            continue
        try:
            want = con.execute(sql).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle raised {type(e).__name__}: {e}")
            record[name] = {"rows_match": False, "schema_match": False,
                            "hash_match": False, "spark_rows": len(got),
                            "oracle_rows": None,
                            "err": f"oracle: {type(e).__name__}: {e}"}
            failures += 1
            continue
        rows_ok = len(got) == len(want)
        schema_ok = sorted(got.columns) == sorted(want.columns)
        hash_ok = schema_ok and value_hash(got) == value_hash(want)
        record[name] = {"rows_match": rows_ok, "schema_match": schema_ok,
                        "hash_match": hash_ok, "spark_rows": len(got),
                        "oracle_rows": len(want), "err": None}
        problems = []
        if not rows_ok:
            problems.append(f"rows {len(got)} != {len(want)}")
        if not schema_ok:
            problems.append(f"cols {sorted(got.columns)} != {sorted(want.columns)}")
        elif not hash_ok:
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
    if record_path:
        import json

        with open(record_path, "w") as fh:
            json.dump(record, fh, indent=2)
        print(f"record -> {record_path} ({len(record)} entries)")
    ray.shutdown()
    return failures


if __name__ == "__main__":
    raise SystemExit(main())
