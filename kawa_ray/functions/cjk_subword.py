"""M11 — deterministic CJK subword segmentation.

The reference segments CJK text with the mt5-small subword tokenizer
(/root/reference/ontology/ontology_manager.py:624-653, class-level
singleton :105-106).  mt5 is network-gated in this container, so this
module provides a deterministic unigram-style stand-in with the SAME
surface (``tokenize(text) -> pieces`` with the ``▁`` word-start marker):
greedy longest-match over a hash-derived multi-character vocabulary —
CJK runs split into 1-3 codepoint units, non-CJK runs stay whole pieces.
Both our engine and the reference-under-test (bench_reference.py's
transformers stub) use this one tokenizer, so parity runs compare the
same segmentation, and a real mt5 drops in unchanged where transformers
is installed (get_cjk_tokenizer's import-try).
"""

from __future__ import annotations

MT5_UNDERSCORE = "▁"  # the sentencepiece word-start marker '▁'


def _is_cjk_char(c: str) -> bool:
    return (
        "一" <= c <= "鿿" or "가" <= c <= "힣" or "぀" <= c <= "ヿ"
        or "ก" <= c <= "๛" or "ꦀ" <= c <= "꧟"
    )


class FixtureSubwordTokenizer:
    """Deterministic mt5-surface subword segmenter (no model deps)."""

    def __init__(self, max_piece: int = 3):
        self.max_piece = max_piece
        self._vocab_cache: dict[str, bool] = {}

    def _in_vocab(self, piece: str) -> bool:
        """Hash-derived 'learned' vocabulary: ~1/4 of 2-char and ~1/8 of
        3-char CJK sequences are units (mimics a unigram LM keeping
        frequent multi-char pieces)."""
        hit = self._vocab_cache.get(piece)
        if hit is None:
            from kawa_ray.functions.minhash import hash64

            mod = 4 if len(piece) == 2 else 8
            hit = hash64("cjkvocab:" + piece) % mod == 0
            self._vocab_cache[piece] = hit
        return hit

    def segment_cjk_run(self, run: str) -> list[str]:
        """Greedy longest-match left-to-right (the unigram Viterbi
        approximation mt5-style segmenters converge to for short runs)."""
        out: list[str] = []
        i = 0
        n = len(run)
        while i < n:
            took = 1
            for size in range(min(self.max_piece, n - i), 1, -1):
                if self._in_vocab(run[i:i + size]):
                    took = size
                    break
            out.append(run[i:i + took])
            i += took
        return out

    def segment_word(self, word: str) -> list[str]:
        """CJK runs -> subword units; non-CJK runs stay whole."""
        pieces: list[str] = []
        buf = []
        buf_cjk = None
        for c in word:
            c_cjk = _is_cjk_char(c)
            if buf_cjk is None or c_cjk == buf_cjk:
                buf.append(c)
                buf_cjk = c_cjk
                continue
            run = "".join(buf)
            pieces.extend(self.segment_cjk_run(run) if buf_cjk else [run])
            buf, buf_cjk = [c], c_cjk
        if buf:
            run = "".join(buf)
            pieces.extend(self.segment_cjk_run(run) if buf_cjk else [run])
        return pieces or [""]

    def tokenize(self, text: str) -> list[str]:
        """mt5 surface: pieces with ``▁`` marking word starts."""
        out: list[str] = []
        for word in text.split():
            pieces = self.segment_word(word)
            out.append(MT5_UNDERSCORE + pieces[0])
            out.extend(pieces[1:])
        return out


_TOKENIZER: object | None = None


def get_cjk_tokenizer():
    """The real mt5 tokenizer when transformers is importable, the
    deterministic fixture otherwise — resolved once per process
    (reference class-level singleton, ontology_manager.py:105-106)."""
    global _TOKENIZER
    if _TOKENIZER is None:
        try:
            from transformers import AutoTokenizer

            _TOKENIZER = AutoTokenizer.from_pretrained("google/mt5-small")
        except Exception:
            _TOKENIZER = FixtureSubwordTokenizer()
    return _TOKENIZER
