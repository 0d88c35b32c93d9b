"""Lexicon build/lookup/detect tests — including the reference's own
self-check invariant (every trained word resolves to its label,
/root/reference/ontology/ontology_manager.py:528-547 made a test)."""

import pytest

from kawa_ray.functions.text import canonical_word
from kawa_ray.sources.roster import build_roster, roster_word2ner
from kawa_ray.state.lexicon import LexiconIndex


@pytest.fixture(scope="module")
def lex():
    return LexiconIndex.build(roster_word2ner(build_roster(300)))


class TestBuild:
    def test_selfcheck_invariant(self, lex):
        """After build, every training word resolves to its label."""
        for word, label, _w, _i in roster_word2ner(build_roster(300)):
            cw, _ = canonical_word(word, do_lower=True)
            _, got = lex.lookup(cw, check_caps=False)
            assert got == label.upper(), (word, got, label)

    def test_four_levels(self, lex):
        assert len(lex.levels) == 4

    def test_majority_vote_conflict(self):
        # same level-0 key ("foo",0) with conflicting labels: majority wins,
        # minority is requeued into a more precise level / residual
        w2n = [
            ["fool", "ANIMAL", 1.0, 0],
            ["food", "ANIMAL", 1.0, 1],
            ["foot", "FOOD", 1.0, 2],
        ]
        lx = LexiconIndex.build(w2n)
        assert lx.lookup("fool", check_caps=False)[1] == "ANIMAL"
        assert lx.lookup("foot", check_caps=False)[1] == "FOOD"

    def test_deterministic(self):
        a = LexiconIndex.build(roster_word2ner(build_roster(100)))
        b = LexiconIndex.build(roster_word2ner(build_roster(100)))
        assert a.levels == b.levels and a.residual == b.residual


class TestLookup:
    def test_caps_gating(self, lex):
        # PERSON labels require capitalised first+last in running text
        _, lab_caps = lex.lookup("John Smith")
        _, lab_lower = lex.lookup("john smith")
        assert lab_caps == "PERSON" and lab_lower is None

    def test_caps_gate_passes_caseless_scripts(self, lex):
        roster = build_roster(300)
        cjk = next(
            a for al in roster["aliases"].to_pylist() for a in al if "一" <= a[0] <= "鿿"
        )
        _, lab = lex.lookup(cjk)
        assert lab is not None

    def test_digit_folding(self, lex):
        # digits fold to 1 for lookup: any same-shape version number matches
        roster = build_roster(300)
        alias = next(
            a
            for al, lab in zip(roster["aliases"].to_pylist(), roster["label"].to_pylist())
            if lab == "PRODUCT"
            for a in al
        )
        swapped = "".join("9731846205"[int(c)] if c.isdigit() else c for c in alias)
        assert swapped != alias
        _, lab = lex.lookup(swapped, check_caps=False)
        assert lab == "PRODUCT", (alias, swapped)

    def test_unknown(self, lex):
        assert lex.lookup("zzzzxqwv unknownthing", check_caps=False)[1] is None


class TestDetect:
    def test_simple_sentence(self, lex):
        dets = lex.detect("I met Barack Obama yesterday", lang="en")
        # roster may or may not hold this exact name; use a roster alias
        roster = build_roster(300)
        alias = roster["aliases"].to_pylist()[0][0]
        dets = lex.detect(f"breaking news {alias} arrived today", lang="en")
        assert any(d[3] in ("PERSON", "PUBLIC_FIGURE") for d in dets)

    def test_greedy_longest_match(self, lex):
        dets = lex.detect("talks with John Smith continue", lang="en")
        surfaces = [d[0] for d in dets]
        assert "John_Smith" in surfaces and "Smith" not in surfaces

    def test_stopword_start_skipped(self, lex):
        dets = lex.detect("the and of while", lang="en")
        assert dets == []

    def test_cjk_detection(self, lex):
        roster = build_roster(300)
        cjk = next(
            a for al in roster["aliases"].to_pylist() for a in al if "一" <= a[0] <= "鿿"
        )
        dets = lex.detect(f"价格 上涨 {cjk} 委员 会", lang="zh")
        assert any(d[0].replace("_", "") == cjk for d in dets)

    def test_offsets_point_into_text(self, lex):
        text = "meeting with John Smith about trade"
        dets = lex.detect(text, lang="en")
        for surface, start, end, _ in dets:
            assert 0 <= start < end <= len(text) + len(surface)


class TestSerialise:
    def test_roundtrip(self, lex, tmp_path):
        p = str(tmp_path / "lex.json.gz")
        lex.save(p)
        lx = LexiconIndex.load(p)
        assert lx.lookup("John Smith")[1] == "PERSON"
        assert lx.levels == lex.levels
        assert lx.residual == lex.residual

    def test_bytes_roundtrip(self, lex):
        lx = LexiconIndex.from_bytes(lex.to_bytes())
        assert lx.lookup("John Smith")[1] == "PERSON"


def test_collapse_consecutive_spans():
    """Adjacent same-label spans merge into one compound mention
    (reference collapse_consecutive_ner, ontology_manager.py:738-754)."""
    from kawa_ray.state.lexicon import LexiconIndex

    lex = LexiconIndex.build(
        [["acme", "ORG", 0.0, None], ["global", "ORG", 0.0, None],
         ["paris", "GPE", 0.0, None]]
    )
    text = "meet Acme Global in Paris"
    plain = lex.detect(text, check_caps=False)
    collapsed = lex.detect(text, check_caps=False, collapse_consecutive=True)
    assert [m[3] for m in plain] == ["ORG", "ORG", "GPE"]
    assert [(m[0], m[3]) for m in collapsed] == [("Acme_Global", "ORG"), ("Paris", "GPE")]


def test_tokenize_splices_compounds():
    from kawa_ray.state.lexicon import LexiconIndex

    lex = LexiconIndex.build([["new_york", "GPE", 0.0, None]])
    res = lex.tokenize("visit New York today", check_caps=False)
    assert res["text"] == "visit New_York today"
    assert [(m[0], m[3]) for m in res["mentions"]] == [("New_York", "GPE")]
