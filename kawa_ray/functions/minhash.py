"""MinHash / LSH, SimHash and n-gram Jaccard sketch kernels.

Vectorised with numpy; deterministic (fixed permutation seeds — the
"MinHash permutation seeds are constants" rule of SURVEY.md §7.4 S3).
Used for (a) mention blocking in the flagship linkage pipeline and
(b) the near-duplicate document suite (MinHash-LSH / SimHash /
n-gram-Jaccard dedup pipelines).

Published technique; see Broder (1997) for MinHash and Charikar (2002)
for SimHash.  No reference-code lineage (the reference blocks only via
lexicon prefix shingles, /root/reference/ontology/ontology_manager.py:258-294).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_MERSENNE = (1 << 61) - 1
_SEED = 42


def _perm_params(num_perm: int, seed: int = _SEED) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


_PERM_CACHE: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}


def perm_params(num_perm: int, seed: int = _SEED) -> tuple[np.ndarray, np.ndarray]:
    key = (num_perm, seed)
    if key not in _PERM_CACHE:
        _PERM_CACHE[key] = _perm_params(num_perm, seed)
    return _PERM_CACHE[key]


def hash64(s: str) -> int:
    return struct.unpack("<Q", hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest())[0]


def md5_low64(s: str) -> int:
    """Low 8 md5 bytes little-endian — bit-identical to DuckDB's
    ``md5_number_lower``, so sketches built on it carry exact SQL
    oracles (the near-dup census suite and the HLL use this)."""
    return struct.unpack("<Q", hashlib.md5(s.encode("utf-8")).digest()[8:])[0]


def md5_low64_many(strings) -> np.ndarray:
    """``md5_low64`` over a whole batch of strings with batch-level
    dedup: hash each DISTINCT string once (np.unique), gather the rest
    by inverse index.  Same md5 semantics (the SQL oracles stay exact);
    k-char / n-token grams of natural text repeat heavily within a
    batch, so this cuts the md5 call count — the single biggest CPU
    sink of the winnow/substring/gram-set stages — without changing a
    single output bit.  -> np.uint64 array aligned with the input."""
    arr = np.asarray(strings if isinstance(strings, (list, np.ndarray))
                     else list(strings), dtype=object)
    if arr.size == 0:
        return np.empty(0, dtype=np.uint64)
    # hash-based dedup (pandas factorize), NOT np.unique: sorting object
    # strings costs more than it saves (measured 0.129 s vs factorize's
    # 0.027 s on 147k grams at 7% uniqueness; direct hashing 0.124 s)
    import pandas as pd

    codes, uniq = pd.factorize(arr, sort=False)
    uh = np.fromiter((md5_low64(s) for s in uniq), dtype=np.uint64,
                     count=len(uniq))
    return uh[codes]


def md5_low64_per_doc(doc_grams, chunk_grams: int = 1 << 18) -> list[np.ndarray]:
    """Hash per-doc gram lists with the same batch dedup, in BOUNDED
    chunks: at most ~``chunk_grams`` gram strings are alive at once.
    Accumulating a whole Arrow batch's grams before hashing holds
    hundreds of MB of transient strings for fat-document blocks — this
    keeps peak memory ~16 MB per task while retaining most of the dedup
    win (gram repetition is dominated by within-doc/nearby-doc reuse).
    ``doc_grams`` is an iterable of per-doc string lists; returns one
    np.uint64 array per doc, aligned."""
    out: list[np.ndarray] = []
    buf: list[str] = []
    lens: list[int] = []

    def flush() -> None:
        if not lens:
            return
        all_h = md5_low64_many(buf)
        off = 0
        for ln in lens:
            out.append(all_h[off:off + ln])
            off += ln
        buf.clear()
        lens.clear()

    for gs in doc_grams:
        buf.extend(gs)
        lens.append(len(gs))
        if len(buf) >= chunk_grams:
            flush()
    flush()
    return out


def char_shingles(s: str, k: int = 3) -> list[str]:
    if len(s) <= k:
        return [s] if s else []
    return [s[i : i + k] for i in range(len(s) - k + 1)]


def word_ngrams(tokens: list[str], n: int = 3) -> list[str]:
    if len(tokens) <= n:
        return [" ".join(tokens)] if tokens else []
    return [" ".join(tokens[i : i + n]) for i in range(len(tokens) - n + 1)]


def minhash_signature(shingles: list[str], num_perm: int = 32, seed: int = _SEED,
                      hash_fn=hash64) -> np.ndarray:
    """uint64 signature of length num_perm (max-filled when empty)."""
    if not shingles:
        return np.full(num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
    a, b = perm_params(num_perm, seed)
    hv = np.fromiter((hash_fn(s) for s in set(shingles)), dtype=np.uint64)
    # (a * h + b) mod p, vectorised over perms x shingles
    prod = (a[:, None] * (hv[None, :] % _MERSENNE) + b[:, None]) % _MERSENNE
    return prod.min(axis=1).astype(np.uint64)


def lsh_band_keys(sig: np.ndarray, bands: int) -> list[str]:
    """Split a signature into ``bands`` bands; key = band idx + band hash."""
    rows = len(sig) // bands
    out = []
    for b in range(bands):
        chunk = sig[b * rows : (b + 1) * rows]
        h = hashlib.blake2b(chunk.tobytes(), digest_size=8).hexdigest()
        out.append(f"{b}:{h}")
    return out


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    u = len(a | b)
    return len(a & b) / u if u else 0.0


def simhash64(tokens: list[str], hash_fn=hash64) -> int:
    """64-bit SimHash over token hashes (Charikar 2002)."""
    if not tokens:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    for t in tokens:
        h = hash_fn(t)
        bits = np.unpackbits(np.frombuffer(struct.pack("<Q", h), dtype=np.uint8))
        acc += bits.astype(np.int64) * 2 - 1
    out = 0
    for i, v in enumerate(acc):
        if v > 0:
            out |= 1 << i
    return out


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def simhash_band_keys(h: int, bands: int = 4) -> list[str]:
    """Split 64 bits into ``bands`` chunks; near-dups (small Hamming
    distance) share at least one chunk by pigeonhole."""
    width = 64 // bands
    mask = (1 << width) - 1
    return [f"{b}:{(h >> (b * width)) & mask:x}" for b in range(bands)]
