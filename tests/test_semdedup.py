"""SemDeDup census — semantic gates on top of the exact unrolled-SQL
oracle run by test_queries_oracle."""

SF_DIR = "/root/testdata/sf0.001"


def test_semdedup_nondegenerate(ray_session):
    from kawa_ray.pipelines.vectors import semdedup_census

    out = semdedup_census(SF_DIR)
    n_vecs = int(out["n_vecs"].sum())
    n_drop = int(out["n_dropped"].sum())
    assert n_vecs == 500
    assert 0 < n_drop < n_vecs
    assert (out["n_dropped"] <= out["n_vecs"]).all()


def test_semdedup_threshold_and_cap_zero_out(ray_session):
    from kawa_ray.pipelines.vectors import semdedup_census

    # cosine never exceeds 1, so a threshold above it drops nothing
    assert int(semdedup_census(SF_DIR, threshold=1.01)["n_dropped"].sum()) == 0
    # a cluster cap below any real cluster size skips every block
    assert int(semdedup_census(SF_DIR, cluster_cap=1)["n_dropped"].sum()) == 0


def test_semdedup_single_cluster_supersets_drops(ray_session):
    """k=1 puts everything in one block, so every within-cluster pair of
    the k=8 run is also checked — drops can only grow."""
    from kawa_ray.pipelines.vectors import semdedup_census

    d8 = int(semdedup_census(SF_DIR)["n_dropped"].sum())
    d1 = int(semdedup_census(SF_DIR, k=1, iters=2)["n_dropped"].sum())
    assert d1 >= d8
