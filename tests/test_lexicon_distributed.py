"""The distributed (Ray groupby) lexicon build must produce a
bit-identical artifact to the single-process ``LexiconIndex.build`` —
levels, residual dict, and bounds all equal, so detection behaves the
same no matter which build path produced the broadcast artifact."""

from __future__ import annotations

import pytest

from kawa_ray.sources.roster import build_roster, roster_word2ner
from kawa_ray.state.lexicon import LexiconIndex


@pytest.fixture(scope="module")
def word2ner():
    w2n = list(roster_word2ner(build_roster(120)))
    # inject label conflicts so the majority-vote/requeue path is exercised
    conflicted = [
        ["springfield", "GPE", 0.0, None],
        ["springfield", "ORG", 0.0, None],
        ["springfield", "GPE", 0.0, None],
        ["jordan", "PERSON", 0.0, None],
        ["jordan", "GPE", 0.0, None],
        ["paris_hotel_1", "FAC", 0.0, None],
        ["paris", "GPE", 0.0, None],
    ]
    rows = [list(r) + [None] * (4 - len(r)) for r in w2n] + conflicted
    return [[r[0], r[1], r[2] or 0.0, None] for r in rows]


def test_distributed_build_equals_single_process(ray_session, word2ner):
    from kawa_ray.pipelines.lexicon_build import build_lexicon_distributed

    single = LexiconIndex.build(word2ner)
    dist = build_lexicon_distributed(word2ner)

    assert len(dist.levels) == len(single.levels)
    for lv, (a, b) in enumerate(zip(dist.levels, single.levels)):
        assert a == b, f"level {lv} differs"
    assert dist.residual == single.residual
    assert dist.residual_bounds == single.residual_bounds

    # behavioural spot check incl. a conflicted surface
    for w in ("Springfield", "Jordan", "paris"):
        assert dist.lookup(w) == single.lookup(w)


def test_distributed_build_self_check_invariant(ray_session, word2ner):
    """The reference's own invariant (ontology_manager.py:528-547): after
    the build, every training word resolves to its label — via levels or
    the residual dict."""
    from kawa_ray.pipelines.lexicon_build import build_lexicon_distributed

    dist = build_lexicon_distributed(word2ner)
    last_label = {}
    for w, lab, *_ in word2ner:
        last_label.setdefault(w, set()).add(lab)
    for w, labels in last_label.items():
        _, got = dist.lookup(w, check_caps=False)
        assert got in labels or got is None and len(labels) > 1, (w, got, labels)
        if len(labels) == 1:
            assert got == next(iter(labels)), (w, got)
