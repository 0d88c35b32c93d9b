"""DSIR importance-selection census — semantic gates on top of the
exact DuckDB oracle run by test_queries_oracle."""

import numpy as np

import kawa_ray.pipelines.dsir as dsir


def test_dsir_selection_nondegenerate(ray_session):
    out = dsir.dsir_selection_census("/root/testdata/sf0.001")
    n_sel = int(out["n_selected"].sum())
    n_docs = int(out["n_docs"].sum())
    assert n_docs == 500
    # the mean-relative cut is the resampling top-half: both sides
    # populated, roughly balanced
    assert 0 < n_sel < n_docs
    assert 0.2 < n_sel / n_docs < 0.8
    assert (out["n_selected"] <= out["n_docs"]).all()


def test_dsir_identical_target_selects_nothing(ray_session, monkeypatch):
    """With target == raw (every source in the target slice) each
    bucket's log-ratio collapses to ln(1) = 0, so every doc weighs 0,
    the mean threshold is 0, and nothing clears the strict cut."""
    monkeypatch.setattr(dsir, "_TARGET_SOURCES",
                        tuple(f"src{i}" for i in range(20)))
    out = dsir.dsir_selection_census("/root/testdata/sf0.001")
    assert int(out["n_selected"].sum()) == 0
    assert int(out["sum_weight_micro"].sum()) == 0


def test_doc_buckets_flat_layout():
    ids, lens = dsir._doc_buckets(["a b c", "", "x y"])
    # 3 unigrams + 2 bigrams, zero, 2 unigrams + 1 bigram
    assert lens.tolist() == [5, 0, 3]
    assert ids.shape == (8,)
    assert (ids >= 0).all() and (ids < dsir._BUCKETS).all()
    # same feature -> same bucket wherever it occurs
    ids2, _ = dsir._doc_buckets(["x y"])
    assert np.array_equal(ids[-3:], ids2)
