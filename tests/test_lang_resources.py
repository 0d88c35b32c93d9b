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


def test_stopword_breadth_matches_reference():
    """>= the reference's 134 stopword languages (stopwords.py:5)."""
    from kawa_ray.state.stopwords import ALL_STOPWORDS, REFERENCE_STOPWORD_LANGS

    assert len(REFERENCE_STOPWORD_LANGS) == 134
    missing = REFERENCE_STOPWORD_LANGS - set(ALL_STOPWORDS)
    assert not missing, sorted(missing)
    for lang in REFERENCE_STOPWORD_LANGS:
        assert len(ALL_STOPWORDS[lang]) >= 10, lang


def test_faker_locale_exports():
    """B10 export transform (ontology_builder.py:953-1021): every base
    language of the 57-locale list gets name lists + a PERSON regex."""
    from kawa_ray.state.faker_locales import (
        FAKER_LOCALES,
        export_person_resources,
        format_to_regex,
    )

    assert len(FAKER_LOCALES) == 57
    # the reference's exact string transform on a known format — NOTE the
    # reference applies .upper() AFTER splicing '\d+' in, so its exported
    # regexes really say '\D+' (ontology_builder.py:963); reproduced
    # as-documented, like the B12 parenthesisation quirk
    assert format_to_regex(["{{first_name}} {{last_name}}"]) == \
        "<FIRST_NAME>\\D+ <LAST_NAME>\\D+"
    res = export_person_resources()
    base_langs = {loc.split("_")[0] for loc in FAKER_LOCALES}
    assert set(res) == base_langs
    for lang, r in res.items():
        assert r.get("FIRST_NAME"), lang
        assert r.get("LAST_NAME"), lang
        regexes = r.get("ner_regexes", [])
        assert regexes and all(t[0] == "PERSON" for t in regexes), lang
    # multi-locale languages union their locales' regexes (one per locale)
    assert len(res["en"]["ner_regexes"]) == 6
    assert len(res["fr"]["ner_regexes"]) == 4


def test_lang_resources_census_breadth(ray_session):
    from kawa_ray.pipelines.lang_resources_query import lang_resources_census

    df = lang_resources_census("/root/testdata/sf0.001")
    assert len(df) >= 134
    en = df[df["lang"] == "en"].iloc[0]
    assert en["n_stopwords"] >= 10
    assert en["n_first_names"] > 0 and en["n_ner_regexes"] == 6
    assert en["has_gender_swap"] == 1


def test_lang_names_166():
    """B15: the 166-language code->name map matches the reference's
    coverage (ontology_builder_data.py:47)."""
    from kawa_ray.state.lang_names import LANG_NAMES, lang_name

    assert len(LANG_NAMES) == 166
    ref_codes = set(
        """af als am an ar arz as ast av az azb ba bar bcl be bg bh bn bo bpy
        br bs bxr ca cbk ce ceb ckb cs cv cy da de diq dsb dv el eml en eo es
        et eu fa fi fr frr fy ga gd gl gn gom gu he hi hr hsb ht hu hy ia id
        ie ilo io is it ja jbo jv ka kk km kn ko krc ku kv kw ky la lb lez li
        lmo lo lrc lt lv mai mg mhr min mk ml mn mr mrj ms mt mwl my myv mzn
        nah nap nds ne new nl nn no oc or os pa pam pl pms pnb ps pt qu rm ro
        ru sa sah scn sd sh si sk sl so sq sr su sv sw ta te tg th tk tl tr
        tt tyv ug uk ur uz vec vi vo wa war wuu xal xmf yi yo yue zh""".split()
    )
    assert set(LANG_NAMES) == ref_codes
    assert lang_name("hi_rom") == "Hindi"  # romanised variants resolve
    assert lang_name("xx") == "xx"
