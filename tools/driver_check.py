"""Driver-faithful oracle check: runs registry queries and their DuckDB
oracles side-by-side and compares rows / schema / value-hash the way the
driver does (sort columns by name, sort rows, hash the values INCLUDING
dtype — int64 vs float64 is a mismatch).

Usage: python tools/driver_check.py [query ...]   (default: all oracled)
       GRAFT_SF_DIR=/root/testdata/sf0.01 to change input.
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _to_pandas(res):
    import pyarrow as pa

    try:
        import ray.data as rd

        if isinstance(res, rd.Dataset):
            return res.to_pandas()
    except ImportError:
        pass
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def value_hash(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(list(df.columns)).reset_index(drop=True)
    h = hashlib.sha256()
    for c in df.columns:
        col = df[c]
        # width-normalise within kind (the driver does: int32==int64 passed
        # r01, int64-vs-float64 failed), keep the kind itself significant
        if col.dtype.kind == "f":
            vals = np.round(col.to_numpy(dtype="float64"), 6)
            h.update(b"float")
            h.update(vals.tobytes())
        elif col.dtype.kind in "iu":
            h.update(b"int")
            h.update(col.to_numpy(dtype="int64").tobytes())
        else:
            h.update(b"obj")
            h.update(str(col.tolist()).encode())
    return h.hexdigest()


def main() -> int:
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.01")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "8")),
                 include_dashboard=False, logging_level="ERROR")

    from kawa_ray.pipelines.registry import ORACLE_SQL, QUERIES

    names = sys.argv[1:] or sorted(ORACLE_SQL)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    bad = 0
    for name in names:
        try:
            got = _to_pandas(QUERIES[name](sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"ERROR      {name}: {e}")
            bad += 1
            continue
        sql = ORACLE_SQL.get(name)
        if sql is None:
            print(f"ROWS-ONLY  {name}: {len(got)} rows")
            continue
        want = con.execute(sql).df()
        rows = len(got) == len(want)
        schema = sorted(got.columns) == sorted(want.columns)
        hmatch = value_hash(got) == value_hash(want)
        ok = rows and schema and hmatch
        bad += 0 if ok else 1
        print(f"{'PASS' if ok else 'FAIL':10} {name} rows={rows} schema={schema} hash={hmatch}")
        if not ok and rows and schema:
            g = got.reindex(sorted(got.columns), axis=1)
            w = want.reindex(sorted(want.columns), axis=1)
            print("   ray dtypes:", dict(g.dtypes.astype(str)))
            print("   sql dtypes:", dict(w.dtypes.astype(str)))
    ray.shutdown()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
