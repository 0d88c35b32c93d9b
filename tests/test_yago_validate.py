"""Unit gates for the B8 hypernym-closure validation cascade
(yago_step2, reference ontology_builder.py:455-600) — every branch of
``yago_accept`` pinned with hand cases; the census query itself is
oracle-checked via the registry in test_queries_oracle.py."""

from __future__ import annotations

from kawa_ray.pipelines.yago_validate import (
    ANCHORS,
    LABELS,
    synth_candidate,
    yago_accept,
)

F = frozenset


def test_medical_condition_relabels_to_disease():
    ok, lab = yago_accept("a_b", "MEDICAL_CONDITION", True, False, F({"condition"}))
    assert (ok, lab) == (True, "DISEASE")


def test_work_of_art_gate():
    # ':' in word or > 1 underscore accepts; else dropped (no underscore gate)
    assert yago_accept("x:y", "WORK_OF_ART", False, False, F()) == (True, "WORK_OF_ART")
    assert yago_accept("a_b_c", "WORK_OF_ART", False, False, F()) == (True, "WORK_OF_ART")
    assert yago_accept("a_b", "WORK_OF_ART", True, True, F())[0] is False


def test_underscore_gate():
    assert yago_accept("word", "ORG", True, False, F({"group"}))[0] is False


def test_relabel_branches():
    assert yago_accept("a_b", "PRODUCT", True, False, F({"structure"})) == (True, "FAC")
    assert yago_accept("a_b", "PRODUCT", True, False, F({"food"})) == (True, "FOOD")
    assert yago_accept("a_b", "PRODUCT", True, False, F({"vehicle"})) == (True, "PRODUCT")
    assert yago_accept("a_b", "ANIMAL", True, False, F({"plant"})) == (True, "PLANT")
    assert yago_accept("a_b", "GPE", True, False, F({"fac"})) == (True, "FAC")
    # FAC at a location that is NOT itself a facility flips to LOCATION
    assert yago_accept("a_b", "FAC", True, False, F({"location"})) == (True, "LOCATION")
    # ... but a facility closure hits the generic drop list instead
    assert yago_accept("a_b", "FAC", True, False, F({"location", "fac"}))[0] is False


def test_person_and_job():
    assert yago_accept("a_b", "JOB", True, False, F({"scientist"})) == (True, "JOB")
    assert yago_accept("a_b", "JOB", True, False, F({"person"})) == (True, "JOB")
    # PERSON with a synset but no anchor at all: final PERSON accept
    assert yago_accept("a_b", "PERSON", True, False, F()) == (True, "PERSON")
    # PERSON whose closure hits the generic list is dropped
    assert yago_accept("a_b", "PERSON", True, False, F({"artifact"}))[0] is False


def test_no_synset_accepts_any_label():
    assert yago_accept("a_b", "EVENT", False, False, F()) == (True, "EVENT")
    # fallback lookup is skipped for PERSON (reference :514-516)
    assert yago_accept("a_b", "PERSON", False, True, F({"artifact"})) == (True, "PERSON")
    # ...but used for other labels
    assert yago_accept("a_b", "EVENT", False, True, F({"artifact"}))[0] is False


def test_generic_drop_vs_final_drop():
    # synset found, no branch match, no generic anchor, label != PERSON -> drop
    assert yago_accept("a_b", "ORG", True, False, F({"scientist"}))[0] is False
    # generic anchor -> drop
    assert yago_accept("a_b", "ORG", True, False, F({"molecule"}))[0] is False


def test_cjk_branch():
    # CJK word re-tokenised to subwords; multi-char result accepted
    ok, lab = yago_accept("東京都", "GPE", False, False, F())
    assert ok and lab == "GPE"


def test_synth_candidate_deterministic():
    a = synth_candidate(123)
    b = synth_candidate(123)
    assert a == b
    assert a[1] in LABELS
    assert a[4] <= frozenset(ANCHORS)
