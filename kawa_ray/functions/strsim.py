"""Batched string similarity kernels: Jaro-Winkler, Levenshtein.

Used by the pairwise scoring stage (SURVEY.md §7.1 S5).  The reference
scores candidates only by embedding cosine
(/root/reference/ontology/ontology_kb.py:1664,
/root/reference/extract_word_embeddings.py:79-92); the north rule adds
batched Jaro-Winkler/Levenshtein alongside it.

Pure Python per pair, batched over lists — pair volume is bounded by the
per-block pair cap, and pairs are generated over *distinct* normalised
surfaces (not raw mentions), so this is never the dominant cost.  A
vectorised rewrite (numpy byte matrices) is the documented scale path.
"""

from __future__ import annotations

import numpy as np


def jaro(a: str, b: str) -> float:
    if a == b:
        return 1.0
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0
    window = max(la, lb) // 2 - 1
    if window < 0:
        window = 0
    ma = [False] * la
    mb = [False] * lb
    matches = 0
    for i in range(la):
        lo = max(0, i - window)
        hi = min(lb, i + window + 1)
        for j in range(lo, hi):
            if not mb[j] and a[i] == b[j]:
                ma[i] = mb[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    # transpositions
    t = 0
    j = 0
    for i in range(la):
        if ma[i]:
            while not mb[j]:
                j += 1
            if a[i] != b[j]:
                t += 1
            j += 1
    t //= 2
    m = float(matches)
    return (m / la + m / lb + (m - t) / m) / 3.0


def jaro_winkler(a: str, b: str, prefix_weight: float = 0.1, max_prefix: int = 4) -> float:
    j = jaro(a, b)
    if j <= 0.7:
        return j
    p = 0
    for ca, cb in zip(a[:max_prefix], b[:max_prefix]):
        if ca != cb:
            break
        p += 1
    return j + p * prefix_weight * (1.0 - j)


def levenshtein(a: str, b: str, cap: int | None = None) -> int:
    """Edit distance with optional early-exit band cap."""
    la, lb = len(a), len(b)
    if a == b:
        return 0
    if la == 0:
        return lb
    if lb == 0:
        return la
    if la > lb:
        a, b, la, lb = b, a, lb, la
    if cap is not None and lb - la > cap:
        return cap + 1
    prev = list(range(la + 1))
    cur = [0] * (la + 1)
    for j in range(1, lb + 1):
        cur[0] = j
        cj = b[j - 1]
        best = cur[0]
        for i in range(1, la + 1):
            cost = 0 if a[i - 1] == cj else 1
            cur[i] = min(prev[i] + 1, cur[i - 1] + 1, prev[i - 1] + cost)
            if cur[i] < best:
                best = cur[i]
        if cap is not None and best > cap:
            return cap + 1
        prev, cur = cur, prev
    return prev[la]


def levenshtein_norm(a: str, b: str) -> float:
    """Edit distance normalised to [0,1] by max length (0 = identical)."""
    m = max(len(a), len(b))
    if m == 0:
        return 0.0
    return levenshtein(a, b) / m


def batch_jaro_winkler(av: list[str], bv: list[str]) -> np.ndarray:
    return np.fromiter((jaro_winkler(a, b) for a, b in zip(av, bv)), dtype=np.float32, count=len(av))


def batch_levenshtein_norm(av: list[str], bv: list[str]) -> np.ndarray:
    return np.fromiter((levenshtein_norm(a, b) for a, b in zip(av, bv)), dtype=np.float32, count=len(av))
