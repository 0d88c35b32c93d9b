"""The no_oracle driver rows must be self-gating: a broken pipeline has
to RAISE (driver records ``err``), not return plausible rows (round-3
VERDICT item 1).  Fault-inject real failures and assert the gates fire.
"""

from __future__ import annotations

import pytest

from kawa_ray.gates import GateError, gate

SF = "/root/testdata/sf0.001"


def test_gate_helper():
    gate(True, "fine")
    with pytest.raises(GateError, match=r"broke \[x=3\]"):
        gate(False, "broke", x=3)


def test_er_eval_gate_fires_on_broken_edge_threshold(ray_session, monkeypatch):
    """The VERDICT's canonical injection: an absurd edge threshold kills
    every scored edge, clusters shatter to singletons, pairwise recall
    collapses — er_eval must raise, not emit a 1-row DataFrame."""
    from dataclasses import replace

    import kawa_ray.pipelines.er_queries as erq
    import kawa_ray.pipelines.linkage as linkage
    from kawa_ray.config import LinkageConfig

    def broken_cfg():
        return replace(LinkageConfig(), edge_threshold=999.0,
                       exact_match_is_edge=False, kb_blocking=False)

    monkeypatch.setattr(linkage, "LinkageConfig", broken_cfg)
    erq._LINK_CACHE.clear()
    try:
        with pytest.raises(GateError, match="pairwise F1"):
            erq.er_eval(SF)
    finally:
        erq._LINK_CACHE.clear()  # never leak the broken run to other tests


def test_er_extract_gate_fires_on_corrupted_extraction(ray_session, monkeypatch):
    import kawa_ray.functions.html as html_mod
    import kawa_ray.pipelines.er_queries as erq

    real = html_mod.extract_text
    monkeypatch.setattr(html_mod, "extract_text",
                        lambda h: real(h) + "CORRUPTED")
    with pytest.raises(GateError, match="byte-identity"):
        erq.er_extract_check(SF)


def test_green_path_still_returns_rows(ray_session):
    """Gates must be invisible on the healthy pipeline."""
    import kawa_ray.pipelines.er_queries as erq

    erq._LINK_CACHE.clear()
    try:
        out = erq.er_eval(SF)
        assert len(out) == 1 and float(out["f1"][0]) >= 0.99
        assert len(erq.er_extract_check(SF)) >= 1
    finally:
        erq._LINK_CACHE.clear()


def test_lang_resources_and_merge_gates_green():
    from kawa_ray.pipelines.lang_resources_query import lang_resources_census

    out = lang_resources_census(SF)
    assert len(out) >= 160  # union of all resource layers


def test_lang_resources_gate_fires_on_lost_breadth(monkeypatch):
    from kawa_ray.pipelines import lang_resources_query as lrq

    real = lrq.export_person_resources

    def dropped():
        res = {k: dict(v) for k, v in real().items()}
        res["en"]["ner_regexes"] = []  # lose English's PERSON regex
        return res

    monkeypatch.setattr(lrq, "export_person_resources", dropped)
    with pytest.raises(GateError, match="faker locale"):
        lrq.lang_resources_census(SF)
