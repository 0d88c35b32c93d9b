"""K7 merge_with semantics: token mapping (## suffix + unused recycling
+ appends), zero-vector synthesis from positive neighbours, EMA blends,
negative repulsion, determinism."""

import numpy as np
import pytest

from kawa_ray.pipelines.embed_merge import (
    map_tokens,
    merge_embedding_spaces,
    topk_neighbors,
)


class TestMapTokens:
    def test_shared_tokens_keep_ids(self):
        m, toks, app, rec = map_tokens(["cat", "dog"], ["dog", "cat"])
        assert m == {0: 1, 1: 0} and not app and not rec

    def test_unknown_maps_through_suffix_form(self):
        # self only knows '##ing' -> src 'ing' maps to it
        m, toks, app, rec = map_tokens(["run", "##ing"], ["ing"])
        assert toks[m[0]] == "##ing" and not app

    def test_unused_recycled_before_append(self):
        # unknown src tokens take the ## form first (reference :1768-1771)
        m, toks, app, rec = map_tokens(["a", "b", "c"], ["x", "y"],
                                       unused_rows=[1])
        assert rec == [1] and toks[1] == "##x"
        assert app == [3] and toks[3] == "##y"

    def test_append_extends_vocab(self):
        m, toks, app, rec = map_tokens(["a"], ["a", "z"])
        assert m == {0: 0, 1: 1} and toks == ["a", "##z"]


class TestMerge:
    @pytest.fixture()
    def spaces(self):
        rng = np.random.default_rng(7)
        self_tokens = [f"t{i}" for i in range(6)]
        self_M = rng.standard_normal((6, 8))
        # src: 3 shared anchors + 2 new tokens near anchor clusters
        src_tokens = ["t0", "t1", "t2", "new_a", "new_b"]
        src_M = np.stack([
            self_M[0], self_M[1], self_M[2],
            self_M[0] + 0.05 * rng.standard_normal(8),
            self_M[2] + 0.05 * rng.standard_normal(8),
        ])
        return self_tokens, self_M, src_tokens, src_M

    def test_synthesized_vectors_near_neighbors(self, ray_session, spaces):
        self_tokens, self_M, src_tokens, src_M = spaces
        tokens, M, report = merge_embedding_spaces(
            self_tokens, self_M, src_tokens, src_M, topk=3
        )
        assert report["n_appended"] == 2 and report["n_zero_left"] == 0
        i_new = tokens.index("##new_a")
        cos = float(
            (M[i_new] / np.linalg.norm(M[i_new]))
            @ (M[0] / np.linalg.norm(M[0]))
        )
        assert cos > 0.8  # synthesized near its anchor's cluster

    def test_existing_vectors_blend_not_replaced(self, ray_session, spaces):
        self_tokens, self_M, src_tokens, src_M = spaces
        tokens, M, _ = merge_embedding_spaces(
            self_tokens, self_M, src_tokens, src_M, topk=3
        )
        # t0 is an anchor: updated by EMA, so it moves but stays close
        cos = float(
            (M[0] / np.linalg.norm(M[0]))
            @ (self_M[0] / np.linalg.norm(self_M[0]))
        )
        assert 0.7 < cos < 1.0 + 1e-9

    def test_deterministic(self, ray_session, spaces):
        a = merge_embedding_spaces(*spaces)
        b = merge_embedding_spaces(*spaces)
        assert a[0] == b[0]
        np.testing.assert_array_equal(a[1], b[1])

    def test_negative_repulsion_separates(self, ray_session):
        # two tight opposite clusters; a zero row mapped into cluster A
        # must end up FAR from cluster B (repulsion term)
        base = np.zeros((4, 4))
        base[0] = base[1] = [1, 0, 0, 0]
        base[2] = base[3] = [-1, 0.1, 0, 0]
        self_tokens = ["a1", "a2", "b1", "b2"]
        src_tokens = ["a1", "a2", "newa", "b1", "b2"]
        src_M = np.stack([base[0], base[1], [0.9, 0.05, 0, 0], base[2], base[3]])
        tokens, M, _ = merge_embedding_spaces(self_tokens, base, src_tokens,
                                              src_M, topk=2)
        i = tokens.index("##newa")
        v = M[i] / np.linalg.norm(M[i])
        assert float(v @ [1, 0, 0, 0]) > 0.9


class TestTopkNeighbors:
    def test_excludes_self_and_thresholds(self, ray_session):
        M = np.eye(3) + 0.5
        res = topk_neighbors(M, topk=2, min_score=0.01)
        for r, (nbrs, scores) in enumerate(res):
            assert r not in nbrs
            assert all(s >= 0.01 for s in scores)

    def test_negate_ranks_most_dissimilar(self, ray_session):
        M = np.array([[1.0, 0], [0.9, 0.1], [-1.0, 0]])
        res = topk_neighbors(M, topk=1, min_score=-np.inf, negate=True)
        assert res[0][0][0] == 2  # most negative cosine vs row 0


def test_suffix_form_created_when_absent():
    # review finding: ambiguous suffix tokens must get a fresh ## row,
    # never reuse the plain token's row (reference :1775-1805)
    m, toks, app, rec = map_tokens(["ing", "##ing2", "run"], ["ing"])
    # 'ing' is NOT a registered suffix here -> maps to plain row
    assert m[0] == 0
    m, toks, app, rec = map_tokens(["ing", "##ing", "run"], ["ing"])
    assert toks[m[0]] == "##ing"  # existing suffix row wins
    m, toks, app, rec = map_tokens(["ing", "##x", "x"], ["x"])
    # 'x' is a known suffix (##x exists) -> suffix row, not plain 'x'
    assert toks[m[0]] == "##x"
