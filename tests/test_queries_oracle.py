"""Driver-contract rehearsal: run every ``queries()`` entry at sf0.001
and compare SQL-oracled ones against DuckDB exactly the way the driver
does (row count + column names + order-insensitive value equality)."""

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    for c in df.columns:
        if df[c].dtype.kind in "fc":
            df[c] = df[c].astype(float).round(6)
        elif df[c].dtype.kind in "iu":
            df[c] = df[c].astype("int64")
    return df


def _to_pandas(res) -> pd.DataFrame:
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


def all_query_names():
    import sys, os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from kawa_ray.pipelines.registry import EXTRA_QUERIES, QUERIES

    return sorted(QUERIES) + sorted(EXTRA_QUERIES)


@pytest.mark.parametrize("name", all_query_names())
def test_query_against_oracle(name, oracle_con, ray_session):
    from kawa_ray.pipelines.registry import (
        EXTRA_ORACLE_SQL,
        EXTRA_QUERIES,
        ORACLE_SQL,
        QUERIES,
    )

    QUERIES = {**QUERIES, **EXTRA_QUERIES}
    ORACLE_SQL = {**ORACLE_SQL, **EXTRA_ORACLE_SQL}
    got = _to_pandas(QUERIES[name](SF_DIR))
    assert got is not None and len(got) >= 0
    sql = ORACLE_SQL.get(name)
    if sql is None:
        return  # rows-only contract
    want = oracle_con.execute(sql).df()
    got_n, want_n = _normalize(got), _normalize(want)
    assert list(got_n.columns) == list(want_n.columns), (
        f"{name}: columns {list(got_n.columns)} != {list(want_n.columns)}"
    )
    assert len(got_n) == len(want_n), f"{name}: {len(got_n)} rows != {len(want_n)}"
    pd.testing.assert_frame_equal(got_n, want_n, check_dtype=False, atol=1e-6)
