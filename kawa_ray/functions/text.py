"""Word canonicalisation, CJK segmentation and prefix/suffix shingles.

Pure functions — no Ray, no I/O.  Semantics follow the reference engine:

- ``cjk_detect``: /root/reference/ontology/cjk.py:3-19
- ``canonical_word``: /root/reference/ontology/ontology_manager.py:333-359
- ``word_shingles``: /root/reference/ontology/ontology_manager.py:258-294
- digit folding: ``trannum`` /root/reference/ontology/ontology_manager.py:70

Deviation from the reference: CJK segmentation.  The reference uses the
mt5-small subword tokenizer (ontology_manager.py:624-653); this sandbox
has no model weights, so CJK runs are segmented per code point instead.
Build and lookup share the segmenter, so the engine is self-consistent;
swapping in a subword tokenizer is a one-function change.
"""

from __future__ import annotations

import re
from collections import OrderedDict
from collections.abc import Sequence

from kawa_ray.config import (
    COMPOUND_WORD_STEP,
    CONNECTOR,
    STRIP_CHARS,
    TRANNUM,
    WORD_SHINGLE_CUTOFF,
)

_CJK_RANGES = [
    ("[一-鿿]", "zh"),
    ("[가-힣]", "ko"),
    ("[぀-ヿ]", "ja"),
    ("[ก-๛]", "th"),
    ("[ꦀ-꧟]", "jv_tr"),
]
_CJK_PATTERNS = [(re.compile(p), lang) for p, lang in _CJK_RANGES]
_CJK_ANY = re.compile("|".join(p for p, _ in _CJK_RANGES))
_CJK_CHAR = re.compile("(" + "|".join(p for p, _ in _CJK_RANGES) + ")")

CJK_LANGS = frozenset({"zh", "zh-classical", "zh-min-nan", "zh-yue", "ko", "ja", "th", "jv_tr"})


def cjk_detect(text: str) -> str | None:
    """Script sniffing; returns the first matching CJK script code or None
    (reference cjk.py:3-19)."""
    for pat, lang in _CJK_PATTERNS:
        if pat.search(text):
            return lang
    return None


def lang_is_cjk(lang: str) -> bool:
    return lang in CJK_LANGS


def cjk_segment_word(word: str, connector: str = CONNECTOR) -> str:
    """Subword-segment a CJK word, connector-joined — the reference's
    ``cjk_tokenize_word`` (ontology_manager.py:624-628) with the same
    join/collapse/strip sequence; the tokenizer is the real mt5 when
    transformers is installed, else the deterministic fixture subword
    model (functions/cjk_subword.py)."""
    from kawa_ray.functions.cjk_subword import MT5_UNDERSCORE, get_cjk_tokenizer

    tok = get_cjk_tokenizer()
    return (
        "_".join(tok.tokenize(word))
        .replace(MT5_UNDERSCORE, "_")
        .replace("__", "_")
        .replace("__", "_")
        .strip("_")
    )


def cjk_segment_text(text: str) -> str:
    """Subword-segment running CJK text so the whitespace tokenizer sees
    subword units as words — the reference's ``cjk_tokenize_text``
    (ontology_manager.py:631-653) incl. its rejoin of consecutive
    non-CJK pieces (space-joined after a strip char, concatenated
    otherwise)."""
    from kawa_ray.config import STRIP_CHARS_SET
    from kawa_ray.functions.cjk_subword import MT5_UNDERSCORE, get_cjk_tokenizer

    tok = get_cjk_tokenizer()
    words = tok.tokenize(text.replace("_", " ").replace("  ", " ").strip())
    words2: list[str] = []
    for word in words:
        if not words2:
            words2.append(word)
            continue
        if not cjk_detect(word):
            if not cjk_detect(words2[-1]):
                if words2[-1] in STRIP_CHARS_SET:
                    words2[-1] += " " + word
                else:
                    words2[-1] += word
                continue
        words2.append(word)
    return (
        " ".join(words2)
        .replace(MT5_UNDERSCORE, " ")
        .replace("  ", " ")
        .replace("  ", " ")
        .strip()
    )


def canonical_word(
    word: str,
    stopwords: frozenset[str] | set[str] = frozenset(),
    connector: str = CONNECTOR,
    strip_chars: str = STRIP_CHARS,
    suppress_cjk: bool = False,
    do_lower: bool = False,
    do_trannum: bool = False,
) -> tuple[str, list[str]]:
    """Normalise a (possibly compound) word -> (word, wordArr).

    Steps per the reference (ontology_manager.py:333-359): optional CJK
    segmentation; spaces -> connector; collapse double connectors; strip
    boundary punctuation; optional lower/digit-fold; strip *leading*
    stopword tokens (proper nouns often start with determiners).  Falls
    back to the un-stripped form when stripping empties the word.
    """
    if not suppress_cjk and cjk_detect(word):
        word = cjk_segment_word(word, connector)
    word = (
        word.replace(" ", connector)
        .replace(connector + connector, connector)
        .strip(strip_chars + connector)
        .replace("__", connector)
    )
    orig_word = word
    if do_lower:
        word = word.lower()
    if do_trannum:
        word = word.translate(TRANNUM)
    word_arr = [w for w in word.split(connector) if w]
    while word_arr and word_arr[0] in stopwords:
        word_arr = word_arr[1:]
    word = connector.join(word_arr)
    if not word:
        return orig_word, [w for w in orig_word.split(connector) if w]
    return word, word_arr


def has_nonstopword(word_arr: Sequence[str], stopwords: frozenset[str] | set[str],
                    strip_chars: str = STRIP_CHARS) -> bool:
    """Any token that is not a stopword (reference ontology_manager.py:252-256)."""
    return any(w.strip(strip_chars) not in stopwords for w in word_arr)


def word_shingles(
    word_arr: Sequence[str],
    cutoff: int = WORD_SHINGLE_CUTOFF,
    compound_word_step: int = COMPOUND_WORD_STEP,
    more_shingles: bool = True,
) -> list[list[str]]:
    """Prefix/suffix shingle patterns of a compound word — the lexicon
    blocking-key generator (reference _get_all_word_shingles,
    ontology_manager.py:258-294).

    Long compounds (> step words) yield "first words + last word" and
    "first word + last words" variants; ``more_shingles`` adds variants
    whose final word is suffix-truncated and tagged with a leading ``*``.
    Every word is truncated to ``cutoff`` chars.  Deviation: the reference
    randomises ``more_shingles`` by ``idx % 5 == 0``
    (ontology_manager.py:440) to save space; we always emit the full set
    for determinism.
    """
    words = [w.lower() for w in word_arr]
    n = len(words)
    out: OrderedDict[tuple[str, ...], int] = OrderedDict()

    def trunc(ws: list[str]) -> list[str]:
        return [w if len(w) <= cutoff else w[:cutoff] for w in ws]

    def suffix_last(ws: list[str]) -> list[str]:
        ws = list(ws)
        last = ws[-1]
        if len(last) > cutoff:
            ws[-1] = "*" + last[len(last) - cutoff + 1:]
        return ws

    if n > compound_word_step:
        arr1 = words[: compound_word_step - 1] + [words[-1]]
        arr2 = [words[0]] + words[1 - compound_word_step:]
        out[tuple(trunc(arr1))] = 1
        out[tuple(trunc(arr2))] = 1
        if more_shingles:
            out[tuple(trunc(suffix_last(arr1)))] = 1
            out[tuple(trunc(suffix_last(arr2)))] = 1
    else:
        out[tuple(trunc(words))] = 1
        if n > 1 and more_shingles:
            out[tuple(trunc(suffix_last(words)))] = 1
    return [list(t) for t in out.keys()]


_WS_RE = re.compile(r"\s+")


def simple_word_count(text: str) -> int:
    """Whitespace token count; must stay in lockstep with the DuckDB oracle
    ``array_length(regexp_split_to_array(trim(text), '\\s+'))``."""
    t = text.strip()
    if not t:
        return 0
    return len(_WS_RE.split(t))
