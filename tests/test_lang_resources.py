"""Per-language resource files: build/save/load round-trip and the
target-language exact-lookup precedence they feed."""

from __future__ import annotations

from kawa_ray.state.lang_resources import (
    apply_target_lang,
    build_lang_resources,
    load_lang_resource,
    save_lang_resource,
)
from kawa_ray.state.lexicon import LexiconIndex


def test_build_and_roundtrip(tmp_path):
    res = build_lang_resources(120)
    assert "en" in res and res["en"]["FIRST_NAME"]
    for lang in ("zh", "ja", "ko", "ar"):
        assert lang in res and res[lang]["PERSON_NAME"], lang
    p = tmp_path / "en.json"
    save_lang_resource(res["en"], str(p))
    again = load_lang_resource(str(p))
    assert again == res["en"]


def test_target_lang_lookup_precedence():
    """Target-language exact entries win before shingle levels
    (reference ontology_manager.py:571-582)."""
    lex = LexiconIndex.build([["acme_corp", "ORG", 0.0, None]])
    res = {"PERSON_NAME": ["Acme Corp"]}
    apply_target_lang(lex, res, label="PERSON")
    _, label = lex.lookup("Acme Corp", check_caps=False)
    assert label == "PERSON"  # target-lang layer overrides the ORG levels


def test_mention_eval_query(ray_session):
    from kawa_ray.pipelines.er_queries import er_mention_eval

    df = er_mention_eval("/root/testdata/sf0.001")
    assert len(df) >= 5
    # gold mentions come from the roster the lexicon was built from:
    # recall must be perfect; precision high (distractor FPs possible)
    assert (df["recall"] >= 0.99).all(), df.to_string()
    assert (df["precision"] >= 0.9).all(), df.to_string()
