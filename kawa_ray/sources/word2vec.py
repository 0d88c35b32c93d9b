"""word2vec text-format source with grouped weighted-mean merge
(reference ``load_word2vec_glove_format``,
/root/reference/ontology/ontology_kb.py:1155-1402).

Semantics reproduced Ray-Data-first:

- parse the ``word v1 v2 ...`` text format; the **file** is the parallel
  unit (word2vec shards parse line-sequentially because rank — the line
  number — carries the frequency prior, ontology_kb.py rank-derived
  counts); tasks fan out across files.
- per-word weighted mean of duplicate vectors, weight = 1/(1+rank)
  (frequency-sorted files put frequent words first).
- case collapse gated on cosine (``collapse_cutoff=0.5``,
  ontology_kb.py:1209-1221): a cased variant merges into the lower-cased
  word only when their vectors agree; otherwise it is kept as a distinct
  ``word#i`` sense (the reference's sense rows, ontology_kb.py:195-199).
- dimension pad/trim to ``dim`` (ontology_kb.py:1340-1345).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

COLLAPSE_CUTOFF = 0.5


def write_fixture_word2vec(path: str, n_words: int = 50, dim: int = 16,
                           seed: int = 42) -> str:
    """Deterministic fixture: frequency-sorted, with duplicate rows and
    cased variants (some cosine-close, some not)."""
    words = [f"word{i}" for i in range(n_words)]
    lines = []
    idx = 0
    import hashlib

    for i, w in enumerate(words):
        raw = b"".join(
            hashlib.blake2b(f"{seed}:{w}:{c}".encode(), digest_size=64).digest()
            for c in range((dim * 8 + 63) // 64)
        )[: dim * 8]
        h = np.frombuffer(raw, dtype=np.float64)
        v = (h % 1000) / 1000.0 - 0.5
        lines.append((w, v))
        idx += 1
        if i % 7 == 0:  # duplicate row, slightly different vector
            lines.append((w, v * 0.9 + 0.01))
        if i % 5 == 0:  # cosine-close cased variant -> collapses
            lines.append((w.capitalize(), v * 1.1))
        if i % 11 == 0:  # orthogonal-ish cased variant -> kept as sense
            lines.append((w.upper(), np.roll(v, dim // 2) * -1.0))
    with open(path, "w") as f:
        f.write(f"{len(lines)} {dim}\n")
        for w, v in lines:
            f.write(w + " " + " ".join(f"{x:.6f}" for x in v) + "\n")
    return path


def _parse_file(row: dict, dim: int) -> list[dict]:
    """One task per file: line-sequential parse with in-file rank."""
    text = row["bytes"].decode("utf-8", errors="replace")
    out = []
    rank = 0
    for ln, line in enumerate(text.splitlines()):
        parts = line.rstrip().split(" ")
        if ln == 0 and len(parts) == 2 and parts[0].isdigit():
            continue  # header "n dim"
        if len(parts) < 2:
            continue
        word = parts[0]
        vec = np.array(parts[1:], dtype=np.float32)
        if len(vec) < dim:  # pad/trim (ontology_kb.py:1340-1345)
            vec = np.pad(vec, (0, dim - len(vec)))
        else:
            vec = vec[:dim]
        out.append(
            {
                "word": word,
                "embedding": vec.tolist(),
                "weight": 1.0 / (1.0 + rank),
            }
        )
        rank += 1
    return out


def _merge_group(g: pd.DataFrame, dim: int) -> pd.DataFrame:
    """Per lower-cased key: weighted-mean duplicates, cosine-gate case
    variants, emit senses for disagreeing variants."""
    # 1. weighted mean per exact surface
    surfaces: dict[str, tuple[np.ndarray, float]] = {}
    for w, vec, wt in zip(g["word"], g["embedding"], g["weight"]):
        v = np.asarray(vec, dtype=np.float64) * wt
        if w in surfaces:
            sv, sw = surfaces[w]
            surfaces[w] = (sv + v, sw + wt)
        else:
            surfaces[w] = (v, wt)
    means = {w: (sv / sw, sw) for w, (sv, sw) in surfaces.items()}

    # 2. cosine-gated case collapse into the lower-cased anchor
    key = g["word"].iloc[0].lower()
    anchor = means.get(key)
    out_w, out_v, out_c = [], [], []
    senses: list[tuple[np.ndarray, float]] = []
    for w in sorted(means):  # deterministic order
        v, wt = means[w]
        if anchor is None:
            anchor = (v, 0.0)
            means[key] = anchor
        if w == key:
            continue
        av = anchor[0]
        denom = np.linalg.norm(av) * np.linalg.norm(v)
        cos = float(av @ v / denom) if denom > 0 else 0.0
        if cos >= COLLAPSE_CUTOFF:
            sv, sw = means[key]
            means[key] = ((sv * sw + v * wt) / (sw + wt), sw + wt)
        else:
            senses.append((v, wt))
    kv, kw = means[key]
    out_w.append(key)
    out_v.append(kv.astype(np.float32).tolist())
    out_c.append(kw)
    for i, (v, wt) in enumerate(senses):
        out_w.append(f"{key}#{i + 1}")
        out_v.append(v.astype(np.float32).tolist())
        out_c.append(wt)
    return pd.DataFrame({"word": out_w, "embedding": out_v, "cnt": out_c})


def load_word2vec(paths: str | list[str], dim: int = 16) -> rd.Dataset:
    """Parse + merge a word2vec text file (or directory of shards) into a
    Dataset (word, embedding, cnt)."""
    if isinstance(paths, str) and os.path.isdir(paths):
        paths = sorted(
            os.path.join(paths, f) for f in os.listdir(paths) if not f.startswith("_")
        )
    files = rd.read_binary_files(paths)
    parsed = files.flat_map(lambda row: _parse_file(row, dim))

    def add_key(df: pd.DataFrame) -> pd.DataFrame:
        df["key"] = df["word"].str.lower()
        return df

    # key is vocabulary-cardinality: hash-partitioned reduce (the
    # stages/distinct.py per-key rule) with the per-key merge run
    # in-batch instead of one Ray dispatch per word
    from kawa_ray.stages.distinct import partition_reduce

    def merge_part(g: pd.DataFrame) -> pd.DataFrame:
        return pd.concat(
            [_merge_group(sub, dim) for _, sub in g.groupby("key", sort=False)],
            ignore_index=True,
        )

    return partition_reduce(
        parsed.map_batches(add_key, batch_format="pandas"), "key", merge_part
    )
