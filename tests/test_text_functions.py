"""Unit tests: canonicalisation, shingles, CJK, string sims, sketches."""

import numpy as np
import pytest

from kawa_ray.functions.text import (
    canonical_word,
    cjk_detect,
    cjk_segment_text,
    simple_word_count,
    word_shingles,
)
from kawa_ray.functions.strsim import jaro_winkler, levenshtein, levenshtein_norm
from kawa_ray.functions.minhash import (
    char_shingles,
    hamming64,
    jaccard,
    lsh_band_keys,
    minhash_signature,
    simhash64,
)


class TestCanonical:
    def test_basic(self):
        w, arr = canonical_word("Barack Obama", do_lower=True)
        assert w == "barack_obama" and arr == ["barack", "obama"]

    def test_strip_chars(self):
        w, _ = canonical_word('"Acme Corp!"', do_lower=True)
        assert w == "acme_corp"

    def test_leading_stopword_stripped(self):
        w, _ = canonical_word("the Acme Corp", stopwords=frozenset({"the"}), do_lower=True)
        assert w == "acme_corp"

    def test_all_stopwords_falls_back(self):
        w, arr = canonical_word("the of", stopwords=frozenset({"the", "of"}))
        assert w == "the_of" and arr == ["the", "of"]

    def test_trannum(self):
        w, _ = canonical_word("Quantum Phone 42", do_lower=True, do_trannum=True)
        assert w == "quantum_phone_11"

    def test_cjk_segmented(self):
        w, arr = canonical_word("奥巴马")
        # subword units (fixture vocab), connector-joined and lossless
        assert w.replace("_", "") == "奥巴马" and len(arr) >= 2
        assert w == "_".join(arr)


class TestShingles:
    def test_short_word(self):
        assert word_shingles(["obama"]) == [["oba"]]

    def test_two_words_has_suffix_variant(self):
        sh = word_shingles(["george", "bush"])
        assert ["geo", "bus"] in sh and ["geo", "*sh"] in sh

    def test_long_compound_patterns(self):
        sh = word_shingles(["a1", "b2", "c3", "d4", "e5"])
        # first-2+last and first+last-2 prefixes
        assert ["a1", "b2", "e5"] in sh and ["a1", "d4", "e5"] in sh

    def test_count_invariant(self):
        for arr in (["x"], ["aaaa", "bbbb"], ["aa", "bb", "cc", "dd"]):
            assert len(word_shingles(arr)) in (1, 2, 4)

    def test_cutoff_respected(self):
        for sh in word_shingles(["abcdefgh", "ijklmnop"], cutoff=3):
            assert all(len(w) <= 3 + 1 for w in sh)  # +1 for '*' marker


class TestCjk:
    def test_detect(self):
        assert cjk_detect("hello 世界") == "zh"
        assert cjk_detect("안녕하세요") == "ko"
        assert cjk_detect("こんにちは") == "ja"
        assert cjk_detect("plain latin") is None

    def test_segment_text(self):
        # subword units (deterministic fixture vocab): non-CJK runs stay
        # whole, CJK runs split into 1-3 codepoint pieces, and the
        # reassembly drops no characters
        out = cjk_segment_text("abc奥巴马 def")
        assert out.split()[0] == "abc" and out.split()[-1] == "def"
        assert out.replace(" ", "") == "abc奥巴马def"

    def test_segment_word_stable_and_reversible(self):
        from kawa_ray.functions.text import cjk_segment_word

        a = cjk_segment_word("市场报告")
        assert a == cjk_segment_word("市场报告")
        assert a.replace("_", "") == "市场报告"
        assert "_" in a  # genuinely segmented

    def test_word_and_text_segmentation_agree(self):
        # lexicon build (word path) and detection (text path) must
        # produce identical units for the same CJK surface
        from kawa_ray.functions.text import cjk_segment_word

        w = "田中角栄"
        assert cjk_segment_word(w).split("_") == cjk_segment_text(w).split()


class TestStrsim:
    def test_jw_identity(self):
        assert jaro_winkler("abc", "abc") == 1.0

    def test_jw_known(self):
        assert abs(jaro_winkler("martha", "marhta") - 0.9611) < 1e-3
        assert abs(jaro_winkler("dixon", "dicksonx") - 0.8133) < 1e-3

    def test_lev(self):
        assert levenshtein("kitten", "sitting") == 3
        assert levenshtein("", "abc") == 3
        assert levenshtein_norm("abc", "abc") == 0.0

    def test_lev_cap(self):
        assert levenshtein("aaaaaaaa", "bbbbbbbb", cap=2) == 3  # cap+1


class TestSketches:
    def test_minhash_similarity_monotone(self):
        a = minhash_signature(char_shingles("george bush president", 3), 128)
        b = minhash_signature(char_shingles("george bush presidents", 3), 128)
        c = minhash_signature(char_shingles("completely different text", 3), 128)
        sim_ab = float(np.mean(a == b))
        sim_ac = float(np.mean(a == c))
        assert sim_ab > 0.6 > sim_ac

    def test_minhash_deterministic(self):
        a1 = minhash_signature(["x", "y", "z"], 32)
        a2 = minhash_signature(["z", "y", "x", "x"], 32)  # set semantics
        assert (a1 == a2).all()

    def test_lsh_band_count(self):
        sig = minhash_signature(["a", "b"], 32)
        assert len(lsh_band_keys(sig, 8)) == 8

    def test_simhash_near(self):
        t1 = "the quick brown fox jumps over the lazy dog".split()
        t2 = "the quick brown fox jumped over the lazy dog".split()
        assert hamming64(simhash64(t1), simhash64(t2)) <= 12
        assert hamming64(simhash64(t1), simhash64(list("zyxwv"))) > 12

    def test_jaccard(self):
        assert jaccard({1, 2}, {2, 3}) == pytest.approx(1 / 3)


def test_simple_word_count():
    assert simple_word_count("  a  b\t c\n") == 3
    assert simple_word_count("") == 0


def test_winnow_fingerprints_census(ray_session):
    """Winnowing invariants: every doc long enough yields >=1 selected
    fingerprint, selections are a subset of gram hashes, and identical
    docs share identical fingerprint sets."""
    from kawa_ray.pipelines.docs import doc_winnow_fingerprints

    out = doc_winnow_fingerprints("/root/testdata/sf0.001")
    assert (out["n_docs"] > 0).all()
    assert (out["n_fingerprints"] >= out["n_docs"]).all()  # >=1 fp per doc
    assert (out["n_distinct"] <= out["n_fingerprints"]).all()


def test_bpe_token_pattern():
    """BPE-ish pre-tokenizer (GPT-2 shape): contractions split, letter /
    digit / other runs with optional leading space; RE2 on both engines
    (pyarrow + DuckDB) so the doc_profile_stats oracle is exact."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from kawa_ray.pipelines.docs import BPE_TOKEN_PAT

    counts = pc.count_substring_regex(
        pa.array(["I can't stop", "42 shops, 7 cats!", ""]), BPE_TOKEN_PAT
    ).to_pylist()
    # "I|" can|'t|" stop" = 4 ; "42|" shops|,|" 7"|" cats"|! = 6 ; "" = 0
    assert counts == [4, 6, 0]
