"""CCNet head/middle/tail bucketing — semantic gates on top of the
exact DuckDB oracle run by test_queries_oracle."""


def test_ccnet_buckets_shape_and_ordering(ray_session):
    from kawa_ray.pipelines.lm_quality import ccnet_bucket_census

    out = ccnet_bucket_census("/root/testdata/sf0.001")
    # every language splits into exactly head/middle/tail
    per_lang = out.groupby("lang")["bucket"].apply(set)
    assert all(s == {"head", "middle", "tail"} for s in per_lang)
    # terciles: within a language the bucket sizes differ by at most 1
    sizes = out.pivot(index="lang", columns="bucket", values="n_docs")
    assert ((sizes.max(axis=1) - sizes.min(axis=1)) <= 1).all()
    # mean nll must be monotone head <= middle <= tail (rank-defined)
    nll = out.pivot(index="lang", columns="bucket", values="avg_nll_micro")
    assert (nll["head"] <= nll["middle"]).all()
    assert (nll["middle"] <= nll["tail"]).all()
