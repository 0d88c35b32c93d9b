"""B13 rule cascade: per-rule unit checks incl. the CJK branches the SQL
oracle can't express (module docstring of pipelines/word2ner_fix.py)."""

import pandas as pd

from kawa_ray.pipelines.word2ner_fix import (
    _clean_wikiann_row,
    fix_word2ner_batch,
    merge_with_overrides,
    word2ner_fix,
)


class TestWikiannRules:
    def test_cjk_space_removal_and_segmentation(self):
        # A2: zh entity loses inner spaces, then canonical_word segments
        # CJK codepoints with the connector (reference cjk path)
        out = _clean_wikiann_row("zh", "ORG", "東京 重工 株式会社")
        assert out is not None
        word, label = out
        assert " " not in word and label == "ORG"
        assert "_" in word  # per-codepoint segmentation joined by connector

    def test_year_edge_drop(self):
        assert _clean_wikiann_row("en", "ORG", "1921 Collective") is None
        assert _clean_wikiann_row("en", "ORG", "Uprising of 1848") is None

    def test_location_digit_edge_drop(self):
        assert _clean_wikiann_row("en", "LOC", "4711 Ridge") is None

    def test_location_multiword_becomes_gpe(self):
        assert _clean_wikiann_row("en", "LOC", "Mount Vereda")[1] == "GPE"

    def test_party_union(self):
        assert _clean_wikiann_row("en", "ORG", "Meridian Workers party")[1] == "POLITICAL_PARTY"
        assert _clean_wikiann_row("en", "ORG", "Dock Transport union")[1] == "UNION"


class TestWord2nerRules:
    def _fix(self, rows, w2l=(), stop=frozenset()):
        df = pd.DataFrame(rows, columns=["word", "label"])
        return fix_word2ner_batch(df, frozenset(w2l), frozenset(stop))

    def test_cjk_single_char_kept(self):
        out = self._fix([("山", "GPE")])
        assert out["word"].tolist() == ["山"]

    def test_cjk_person_promotion(self):
        # B4 with a CJK name: per-codepoint segmentation makes it
        # multi-part, so promotion fires via the multiword arm.  (The
        # pure cjk_detect arm needs multi-char subword tokens — rule B3
        # deletes all-single-char persons first, exactly as the
        # reference's rule order does at :1254 vs :1256.)
        out = self._fix([("田中tanaka", "PERSON")], w2l=("田_中_tanaka",))
        assert out["label"].tolist() == ["PUBLIC_FIGURE"]

    def test_cjk_all_single_char_person_deleted_first(self):
        # reference rule order: B3 single-char-parts delete beats B4
        out = self._fix([("田中", "PERSON")], w2l=("田_中",))
        assert len(out) == 0

    def test_single_char_parts_person_deleted(self):
        out = self._fix([("a_b_c", "PUBLIC_FIGURE")])
        assert len(out) == 0

    def test_event_year_exempt(self):
        out = self._fix([("battle_of_1066", "EVENT"), ("march_of_1066", "LOC")])
        assert out["word"].tolist() == ["battle_of_1066"]


class TestMerge:
    def test_override_guards(self):
        w2n = pd.DataFrame({"word": ["fort", "esp"], "label": ["FAC", "LANGUAGE"]})
        wa = pd.DataFrame({"word": ["fort", "esp"], "label": ["LOCATION", "ORG"]})
        out = merge_with_overrides(w2n, wa, ())
        got = dict(zip(out["word"], out["label"]))
        assert got == {"fort": "FAC", "esp": "LANGUAGE"}

    def test_plain_override_and_promotion(self):
        w2n = pd.DataFrame({"word": ["nils", "cast"], "label": ["PERSON", "PERSON"]})
        wa = pd.DataFrame({"word": ["nils"], "label": ["PUBLIC_FIGURE"]})
        out = merge_with_overrides(w2n, wa, ("cast",))
        got = dict(zip(out["word"], out["label"]))
        assert got == {"nils": "PUBLIC_FIGURE", "cast": "PUBLIC_FIGURE"}


def test_census_pipeline(ray_session):
    out = word2ner_fix("/root/testdata/sf0.001")
    # 20 inputs, 7 deleted by B1-B3, 9 new wikiann entities merged in
    assert (out["n_before"].sum(), out["n_after"].sum()) == (20, 22)
    assert int(out.loc[out["label"] == "PUBLIC_FIGURE", "n_after"].iloc[0]) >= 7
