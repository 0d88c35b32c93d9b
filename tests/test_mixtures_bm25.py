"""Edge-case gates for the round-3 mixture / retrieval operators —
non-default parameters the sf0.001 oracle harness doesn't exercise."""

import duckdb
import numpy as np
import pytest

from kawa_ray.pipelines import bm25, mixtures

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')")
    return c


def test_quota_larger_than_group(ray_session, con):
    # quota above every language's size -> all docs selected, ranks
    # contiguous, and the order still matches the SQL definition
    got = mixtures.stratified_sample_quota(SF_DIR, quota=10_000)
    want = con.execute(mixtures._quota_sql(quota=10_000)).df()
    assert len(got) == con.execute("SELECT COUNT(*) FROM documents").fetchone()[0]
    assert (got["doc_id"].to_numpy() == want["doc_id"].to_numpy()).all()
    for _, grp in got.groupby("lang"):
        assert (grp["rk"].to_numpy() == np.arange(1, len(grp) + 1)).all()


def test_bm25_oov_query_token(ray_session, con):
    # a query token absent from the corpus contributes tf=0 everywhere
    # and must not break scoring; parity with the SQL at the same params
    q = ("table", "zzzz-not-a-token")
    got = bm25.bm25_topk(SF_DIR, query=q, k=5)
    want = con.execute(bm25._bm25_sql(query=q, k=5)).df()
    assert np.isfinite(got["score"].to_numpy()).all()
    assert (got["doc_id"].to_numpy() == want["doc_id"].to_numpy()).all()
    assert np.abs(got["score"].to_numpy() - want["score"].to_numpy()).max() == 0.0


def test_mixture_plan_invariants(ray_session):
    plan = mixtures.source_mixture_plan(SF_DIR)
    assert (plan["rate_micro"] <= 1_000_000).all()
    assert (plan["rate_micro"] > 0).all()
    total = int(plan["n_tokens"].sum())
    target = total // len(plan)
    # a down-sampled source lands at or below its equal share (up to
    # the floor-discretisation granularity of one token per micro step)
    sampled = plan["rate_micro"].to_numpy(np.int64) * plan["n_tokens"].to_numpy(np.int64)
    capped = plan["rate_micro"] < 1_000_000
    assert (sampled[capped.to_numpy()] <= (target + 1) * 1_000_000).all()
