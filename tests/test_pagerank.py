"""Edge cases for the integer-discretised PageRank (the DuckDB parity
check runs in test_queries_oracle.py)."""

from kawa_ray.pipelines.builder import user_pagerank

SF_DIR = "/root/testdata/sf0.001"


def test_pagerank_deterministic(ray_session):
    a = user_pagerank(SF_DIR)
    b = user_pagerank(SF_DIR)
    assert a.equals(b)


def test_pagerank_no_edges_uniform(ray_session):
    # cap every bucket out of existence -> empty graph -> every user
    # keeps exactly the teleport term (base), ranked by user_id
    out = user_pagerank(SF_DIR, max_members=1, k=5)
    assert len(out) == 5
    assert out["pr_nano"].nunique() == 1
    assert list(out["user_id"]) == sorted(out["user_id"])


def test_pagerank_mass_conservation_bound(ray_session):
    # discretised PR total mass <= 1e9 (floors only lose mass) and
    # every score >= the teleport term (floor from the TRUE user count,
    # not len(out) — k could truncate the output)
    import pyarrow.parquet as pq

    n_users = len(set(
        pq.read_table(f"{SF_DIR}/events.parquet", columns=["user_id"])
        .column("user_id").to_pylist()))
    out = user_pagerank(SF_DIR, k=10_000)
    assert len(out) == n_users  # k exceeds the fixture's user count
    assert (out["pr_nano"] >= (3 * 1_000_000_000) // (20 * n_users)).all()
    assert out["pr_nano"].sum() <= 1_000_000_000
