"""B12 create_multilingual_map branches + stopword breadth gate."""

import pandas as pd

from kawa_ray.state.multilingual_map import (
    EN_EXAMPLES,
    TRANSLATIONS,
    build_graph,
    create_multilingual_map,
    multilingual_map,
)


class TestGraph:
    def test_shapes(self):
        en, word2en, word2lang = build_graph()
        assert en["water"] and "agua" in en["water"]
        assert word2en["casa"] == ["house", "home"]
        assert "es" in word2lang["agua"]


class TestDictOfListBranch:
    def test_projection_covers_languages(self):
        ret = create_multilingual_map(EN_EXAMPLES)
        assert len(ret) >= 14  # every fixture language + en
        assert set(ret["es"]["royalty"]) == {"rey", "reina"}
        # en rows are the raw example words (reference's en override)
        assert ret["en"]["people"] == ["man", "woman"]

    def test_allow_list_gates(self):
        ret = create_multilingual_map({"r": ["king"]}, allow_list=["roi"])
        assert ret["fr"]["r"] == ["roi"]
        # reference shape: filtered languages still get (empty) entries
        assert dict(ret["es"]) == {}


class TestDictOfDictBranch:
    def test_shortest_translation_chosen(self):
        ret = create_multilingual_map({"item": {"k": ["king"]}})
        # the branch keeps only the SHORTEST translation (reference
        # words2.sort(key=len)): '왕' (ko, 1 char) beats 're' (it)
        assert ret == {"ko": {"item": ["왕"]}}


class TestDictOfStrBranch:
    def test_deterministic_pairing(self):
        a = create_multilingual_map({"king": "queen"})
        b = create_multilingual_map({"king": "queen"})
        assert a == b
        assert a["es"]["rey"] == "reina"


def test_query_is_flat_and_sorted(ray_session):
    out = multilingual_map("/root/testdata/sf0.001")
    assert list(out.columns) == ["lang", "item", "word"]
    assert len(out) > 50
    assert out.equals(out.sort_values(["lang", "item", "word"]).reset_index(drop=True))


def test_stopword_breadth():
    """VERDICT round-1 item 8: >= 100 languages, each non-trivial."""
    from kawa_ray.state.stopwords import ALL_STOPWORDS

    assert len(ALL_STOPWORDS) >= 100
    assert all(len(v) >= 6 for v in ALL_STOPWORDS.values())
    # per-language sets are real words, not copies of one another
    assert ALL_STOPWORDS["sw"] != ALL_STOPWORDS["yo"]
