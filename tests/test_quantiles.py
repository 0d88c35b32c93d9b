"""Histogram-sketch quantiles: accuracy vs DuckDB exact quantile_cont."""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


def test_quantile_sketch_accuracy(ray_session):
    from kawa_ray.pipelines.relational import event_value_quantiles

    got = event_value_quantiles(SF)
    con = duckdb.connect()
    # discrete quantiles: the histogram's first-bin-at-rank semantics match
    # quantile_disc (ceil-rank), not the interpolated quantile_cont
    want = con.execute(f"""
        SELECT event_type,
               quantile_disc(value, 0.5) AS p50,
               quantile_disc(value, 0.9) AS p90,
               quantile_disc(value, 0.99) AS p99,
               MIN(value) AS lo, MAX(value) AS hi
        FROM read_parquet('{SF}/events.parquet') GROUP BY event_type
    """).df().set_index("event_type")
    for _, r in got.iterrows():
        w = want.loc[r["event_type"]]
        bin_w = (w["hi"] - w["lo"]) / 4096
        for q in ("p50", "p90", "p99"):
            assert abs(r[q] - w[q]) <= 2 * bin_w + 0.02, (r["event_type"], q, r[q], w[q])


def test_hll_distinct_accuracy(ray_session):
    from kawa_ray.pipelines.relational import approx_distinct_users

    got = approx_distinct_users(SF)
    con = duckdb.connect()
    want = con.execute(f"""
        SELECT event_type, COUNT(DISTINCT user_id) AS n
        FROM read_parquet('{SF}/events.parquet') GROUP BY event_type
    """).df().set_index("event_type")
    for _, r in got.iterrows():
        exact = int(want.loc[r["event_type"], "n"])
        assert abs(r["approx_users"] - exact) <= max(3, 0.05 * exact), (
            r["event_type"], r["approx_users"], exact)
