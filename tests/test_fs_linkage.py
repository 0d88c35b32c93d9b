"""Fellegi–Sunter EM operator: semantic gates for the pure EM function
plus the Ray pipeline's shape.  The bit-level correctness instrument is
the unrolled-EM DuckDB oracle run by tests/test_queries_oracle.py
(``fs_match_weights`` in the EXTRA tier)."""

import math

from kawa_ray.pipelines.fs_linkage import fs_em, fs_match_weights


def test_fs_em_separates_planted_clusters():
    # corpus dominated by two populations: true matches agree on all 3
    # fields, non-matches agree on (almost) none; EM must recover
    # m_j >> u_j, a small lambda, and a posterior ordering that ranks
    # all-agree far above all-disagree.
    patterns = [(0, 0, 0), (0, 1, 0), (1, 1, 1)]
    counts = [9000, 500, 100]
    lam, m, u, post, weight = fs_em(patterns, counts)
    assert 0.0 < lam < 0.2
    by_pat = dict(zip(patterns, post))
    assert by_pat[(1, 1, 1)] > 0.95
    assert by_pat[(0, 0, 0)] < 0.05
    w = dict(zip(patterns, weight))
    assert w[(1, 1, 1)] > 0 > w[(0, 0, 0)]
    for mj, uj in zip(m, u):
        assert 0.0 <= uj <= 1.0 and 0.0 <= mj <= 1.0


def test_fs_em_deterministic():
    patterns = [(0, 0, 0), (1, 0, 1), (1, 1, 1)]
    counts = [500, 40, 25]
    a = fs_em(patterns, counts)
    b = fs_em(patterns, counts)
    assert a == b


def test_fs_match_weights_shape(ray_session):
    out = fs_match_weights("/root/testdata/sf0.001")
    assert list(out.columns) == [
        "g_seg", "g_bal", "g_suf", "n_pairs",
        "posterior_micro", "weight_micro", "lambda_micro",
    ]
    assert 1 <= len(out) <= 8
    # pattern rows are distinct and sorted; counts positive
    assert out["n_pairs"].gt(0).all()
    assert not out.duplicated(["g_seg", "g_bal", "g_suf"]).any()
    # posteriors are probabilities; lambda consistent across rows
    assert out["posterior_micro"].between(0, 10**6).all()
    assert out["lambda_micro"].nunique() == 1
    # monotonicity: the all-agree pattern (if present) carries the top
    # posterior, the all-disagree the bottom
    full = out.set_index(["g_seg", "g_bal", "g_suf"])
    if (1, 1, 1) in full.index:
        assert full.loc[(1, 1, 1), "posterior_micro"] == out["posterior_micro"].max()
    if (0, 0, 0) in full.index:
        assert full.loc[(0, 0, 0), "posterior_micro"] == out["posterior_micro"].min()
