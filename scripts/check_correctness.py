"""Local stand-in for the driver's CORRECTNESS gate: run every
``queries()`` entry and, where an ``oracle_sql()`` entry exists, compare
row count, column names, and a value hash (columns sorted by name, rows
sorted) against DuckDB over the same parquet views.

Usage: python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _to_df(obj) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def _value_hash(df: pd.DataFrame) -> int:
    df = _canon(df)
    parts = []
    for c in df.columns:
        col = df[c]
        if col.dtype == object:
            parts.append(pd.util.hash_pandas_object(col.astype(str), index=False))
        elif np.issubdtype(col.dtype, np.floating):
            parts.append(pd.util.hash_pandas_object(col.round(9), index=False))
        else:
            parts.append(pd.util.hash_pandas_object(col, index=False))
    if not parts:
        return 0
    acc = np.zeros(len(df), dtype=np.uint64)
    for p in parts:
        acc ^= p.to_numpy()
    return int(acc.sum() % np.uint64(1 << 61))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    # size the multimodal/sequence handoff-oracle tables to the sf we
    # actually compare at (ADVICE r4)
    os.environ["ANALITICCL_ORACLE_SF_DIR"] = sf_dir

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=8, include_dashboard=False,
            logging_level=logging.ERROR,
        )

    import __ray_entry__ as entry

    con = duckdb.connect()
    for t in TABLES:
        try:
            con.sql(
                f"create view {t} as select * from read_parquet('{sf_dir}/{t}.parquet')"
            )
        except Exception:
            pass

    qs = entry.queries()
    osql = entry.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = _to_df(fn(sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERROR {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in osql:
            print(f"{name}: rows={len(got)} (no oracle)")
            continue
        want = con.execute(osql[name]).df()
        rows_ok = len(got) == len(want)
        cols_ok = sorted(got.columns) == sorted(want.columns)
        hash_ok = cols_ok and _value_hash(got) == _value_hash(want)
        status = "OK" if (rows_ok and cols_ok and hash_ok) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(
            f"{name}: {status} rows {len(got)}/{len(want)} "
            f"cols_ok={cols_ok} hash_ok={hash_ok}"
        )
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
