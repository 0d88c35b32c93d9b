"""Regression tests for the detect-path memo caches (lexicon.py).

detect() keeps two bounded per-index caches — a start-word->ngram-bounds
memo and a (lang, caps, target-lexicon-id, surface)->lookup memo.  These
pin the properties the caches must preserve:

* warm-cache results are identical to a fresh index (cache-vs-fresh);
* the memo discriminates between target lexicons held simultaneously
  (the supported contract: stages/mentions.py holds every per-language
  lexicon for the actor's lifetime, so id() is a stable key);
* the bounded cache clears rather than grows past _LOOKUP_CACHE_MAX.
"""

from __future__ import annotations

from kawa_ray.sources.roster import build_roster, roster_word2ner
from kawa_ray.state.lexicon import LexiconIndex


def _fresh():
    return LexiconIndex.build(roster_word2ner(build_roster(300)))


def _texts():
    names = build_roster(300)["canonical"].to_pylist()[:40]
    return [f"a meeting with {n} was held today" for n in names] + [
        "no entities in this sentence at all",
        "the and of while",
    ]


class TestDetectMemo:
    def test_warm_cache_equals_fresh(self):
        warm = _fresh()
        texts = _texts()
        # first pass fills the caches, second pass reads them
        for t in texts:
            warm.detect(t, lang="en")
        warm_out = [warm.detect(t, lang="en") for t in texts]
        fresh_out = [_fresh().detect(t, lang="en") for t in texts]
        assert warm_out == fresh_out
        assert warm.__dict__.get("_lookup_cache"), "memo never populated"

    def test_caps_flag_discriminated(self):
        lex = _fresh()
        text = "a meeting with " + build_roster(300)["canonical"][0].as_py().lower()
        capsed = lex.detect(text, lang="en", check_caps=True)
        uncapsed = lex.detect(text, lang="en", check_caps=False)
        # warm re-reads must match the flag-specific first reads
        assert lex.detect(text, lang="en", check_caps=True) == capsed
        assert lex.detect(text, lang="en", check_caps=False) == uncapsed

    def test_target_lexicon_discriminated(self):
        # both surfaces exist in the index (the ngram-bounds gate only
        # probes known start words); the target lexicon overrides labels
        lex = LexiconIndex.build(
            [["zorbly", "NOUN", 0.0, None], ["plinth", "NOUN", 0.0, None]]
        )
        text = "report from zorbly plinth yesterday"
        tl_a = {"zorbly": "PERSON"}
        tl_b = {"plinth": "GPE"}
        # interleave the two live target lexicons twice so the second
        # round is served from the memo — results must stay per-lexicon
        for _ in range(2):
            a = lex.detect(text, lang="en", check_caps=False, target_lexicon=tl_a)
            b = lex.detect(text, lang="en", check_caps=False, target_lexicon=tl_b)
            assert ("zorbly", "PERSON") in [(s, l) for s, _, _, l in a]
            assert all(l != "GPE" for _, _, _, l in a)
            assert ("plinth", "GPE") in [(s, l) for s, _, _, l in b]
            assert all(l != "PERSON" for _, _, _, l in b)

    def test_lang_discriminated(self):
        # stopword sets differ by language; a surface cached under one
        # language must not leak into another
        lex = _fresh()
        text = "a meeting with " + build_roster(300)["canonical"][1].as_py()
        en = lex.detect(text, lang="en")
        de = lex.detect(text, lang="de")
        assert lex.detect(text, lang="en") == en
        assert lex.detect(text, lang="de") == de

    def test_token_memo_per_language(self):
        # the token-prep memo (raw token -> stopword-skip | ngram bounds)
        # is keyed per language: a token that is a stopword in one
        # language but an entity start word in another must resolve
        # differently even when both languages are warm in the memo
        from kawa_ray.state.stopwords import stopwords_for

        lex = LexiconIndex.build([["die_hard", "WORK_OF_ART", 0.0, None]])
        assert "die" in stopwords_for("de") and "die" not in stopwords_for("en")
        text = "watch Die Hard tonight"
        for _ in range(2):  # second round is served from the memo
            en = lex.detect(text, lang="en", check_caps=False)
            de = lex.detect(text, lang="de", check_caps=False)
            assert any(l == "WORK_OF_ART" for _, _, _, l in en), en
            assert de == []  # "die" stopword-skipped, scan never starts
        assert set(lex.__dict__["_tok_cache"]) == {"en", "de"}

    def test_token_memo_bounded(self):
        lex = LexiconIndex.build([["acme_corp", "ORG", 0.0, None]])
        lex._LOOKUP_CACHE_MAX = 8
        for i in range(100):
            lex.detect(f"tok{i} acme corp tok{i + 1000}", lang="en", check_caps=False)
        assert len(lex.__dict__["_tok_cache"]["en"]) <= 8
        dets = lex.detect("visit acme corp today", lang="en", check_caps=False)
        assert any(l == "ORG" for _, _, _, l in dets)

    def test_cache_bounded(self):
        lex = LexiconIndex.build([["acme_corp", "ORG", 0.0, None]])
        lex._LOOKUP_CACHE_MAX = 8  # shrink the bound for the test
        for i in range(100):
            lex.detect(f"word{i} acme corp word{i + 1000}", lang="en", check_caps=False)
        cache = lex.__dict__.get("_lookup_cache", {})
        assert len(cache) <= 8
        # still correct after many clears
        dets = lex.detect("visit acme corp today", lang="en", check_caps=False)
        assert any(l == "ORG" for _, _, _, l in dets)
