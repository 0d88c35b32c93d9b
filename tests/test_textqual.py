"""Unit gates for kawa_ray/pipelines/textqual.py — the vectorized
repetition kernel vs a per-doc Counter brute force, the Misra–Gries
compression guarantee, and the top-k fallback's exactness.
(The DuckDB oracle comparisons run in test_queries_oracle.py.)"""

import random
from collections import Counter

import numpy as np
import pandas as pd

from kawa_ray.pipelines.textqual import (
    _MICRO,
    _REP_METRICS,
    _mg_compress,
    repetition_micro_frame,
    top_tokens_mg,
)

SF_DIR = "/root/testdata/sf0.001"


def _brute_micro(text: str) -> dict:
    toks = text.lower().split()
    out = {}
    for kind, n, _ in _REP_METRICS:
        grams = [tuple(toks[i:i + n]) for i in range(len(toks) - n + 1)]
        c = Counter(grams)
        if kind == "top":
            top = max(c.values()) if c else 0
            out[f"{kind}{n}_micro"] = (top * n * _MICRO) // max(len(toks), 1)
        else:
            dup = sum(v for v in c.values() if v > 1)
            out[f"{kind}{n}_micro"] = (dup * _MICRO) // max(len(grams), 1)
    return out


def test_repetition_micro_matches_brute_force():
    rng = random.Random(7)
    vocab = ["aa", "b", "ccc", "dd", "e"]
    texts = ["", "solo", "x " * 12, "a b a b a b a b a b a b"]
    for _ in range(60):
        n = rng.randint(1, 40)
        texts.append(" ".join(rng.choice(vocab) for _ in range(n)))
    df = pd.DataFrame({"text": texts, "lang": ["en"] * len(texts)})
    got = repetition_micro_frame(df)
    for i, text in enumerate(texts):
        want = _brute_micro(text)
        for col, val in want.items():
            assert got[col].iloc[i] == val, (i, col, text)
        want_pass = all(want[f"{k}{n}_micro"] <= thr for k, n, thr in _REP_METRICS)
        assert bool(got["gopher_pass"].iloc[i]) == want_pass, (i, text)


def test_mg_compress_retains_heavy_hitters():
    rng = np.random.default_rng(3)
    for _ in range(50):
        counts = rng.integers(1, 500, size=rng.integers(2, 300))
        tokens = np.array([f"t{i}" for i in range(counts.size)])
        m = int(rng.integers(1, 40))
        kept_t, kept_c = _mg_compress(tokens, counts.astype(np.int64), m)
        assert kept_t.size <= max(m, counts.size if counts.size <= m else m)
        total = int(counts.sum())
        kept = set(kept_t)
        for t, c in zip(tokens, counts):
            if int(c) > total / (m + 1):
                assert t in kept, (t, c, total, m)
        # retained counts never exceed the true counts
        true = dict(zip(tokens, counts))
        for t, c in zip(kept_t, kept_c):
            assert c <= true[t]


def test_top_tokens_uniform_lang_not_dropped(ray_session, tmp_path):
    """ADVICE round-3 (medium): a language whose counts are perfectly
    uniform compresses to an EMPTY MG summary — it has no topk group,
    so a check driven off topk.groupby would skip it and silently drop
    the language.  The totals-driven check must fall back and keep it."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    # 'uu': 40 distinct tokens, each exactly once -> MG summary empty at
    # capacity=8.  'en': skewed counts -> summary survives.
    uu_text = " ".join(f"tok{i}" for i in range(40))
    en_text = " ".join(["alpha"] * 30 + ["beta"] * 5 + ["gamma"] * 2)
    pq.write_table(
        pa.table({"doc_id": [1, 2], "lang": ["uu", "en"],
                  "text": [uu_text, en_text], "source": ["t", "t"]}),
        tmp_path / "documents.parquet")
    out = top_tokens_mg(str(tmp_path), k=3, capacity=8)
    assert set(out["lang"]) == {"en", "uu"}
    uu = out[out["lang"] == "uu"]
    assert len(uu) == 3 and uu["token"].tolist() == ["tok0", "tok1", "tok10"]
    en = out[out["lang"] == "en"]
    assert en["token"].tolist() == ["alpha", "beta", "gamma"]


def test_top_tokens_fallback_is_exact(ray_session):
    # capacity=1 forces the guarantee check to fail -> full-groupby
    # fallback; both paths must emit the identical exact top-k
    fast = top_tokens_mg(SF_DIR, k=5, capacity=64)
    slow = top_tokens_mg(SF_DIR, k=5, capacity=1)
    pd.testing.assert_frame_equal(
        fast.reset_index(drop=True), slow.reset_index(drop=True))
