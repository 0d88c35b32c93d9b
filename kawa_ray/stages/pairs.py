"""S4 — candidate pair generation: groupby(block_key) -> capped within-
block pair explosion, then exact pair dedup (SURVEY.md §7.5 shuffles 1-2).

Pairs are ordered ``(a, b) = (min(norm), max(norm))`` so the dedup key is
canonical.  Blocks larger than ``max_pairs_per_block`` after the cap
produce a deterministic prefix of the pair list (members sorted by
descending mention count, then lexicographically) — the cap is part of
the pipeline spec and the eval oracle honours the same keys.
"""

from __future__ import annotations

import pandas as pd


def pairs_for_block(members: list[str], max_pairs: int) -> list[tuple[str, str]]:
    """Deterministic capped pair list for one block's member norms."""
    ms = sorted(set(members))
    out = []
    n = len(ms)
    for i in range(n - 1):
        for j in range(i + 1, n):
            out.append((ms[i], ms[j]))
            if len(out) >= max_pairs:
                return out
    return out


def explode_block(group: pd.DataFrame, max_pairs: int) -> pd.DataFrame:
    """map_groups body: one block -> pair rows."""
    key = group["block_key"].iloc[0]
    # prioritise high-mention-count members so the cap keeps the pairs that
    # cover the most mention mass
    members = (
        group.sort_values(["n_mentions", "norm"], ascending=[False, True])["norm"].tolist()
    )
    pairs = pairs_for_block(members, max_pairs)
    if not pairs:
        return pd.DataFrame({"a": pd.Series(dtype=str), "b": pd.Series(dtype=str),
                             "block_key": pd.Series(dtype=str)})
    a, b = zip(*pairs)
    return pd.DataFrame({"a": list(a), "b": list(b), "block_key": key})


def dedup_pairs(group: pd.DataFrame) -> pd.DataFrame:
    """map_groups body on pair_key: keep first (hash-partitioned exact
    dedup — SURVEY.md §2.6 'exact dedup = hash partition + first')."""
    return group.head(1)


def explode_partition(group: pd.DataFrame, max_pairs: int) -> pd.DataFrame:
    """map_groups body over a HASH PARTITION of block keys (not a single
    block): one global sort + numpy segment splits, so per-block cost is
    a couple of python ops (a per-group pandas sort_values here cost
    ~0.7ms x 10k+ keys and dominated the stage; member order is
    irrelevant anyway — ``pairs_for_block`` canonicalises to sorted
    distinct norms, which is the frozen pair spec)."""
    import numpy as np

    if not len(group):
        return pd.DataFrame({"a": pd.Series(dtype=str), "b": pd.Series(dtype=str),
                             "block_key": pd.Series(dtype=str)})
    order = np.argsort(group["block_key"].to_numpy(), kind="stable")
    keys = group["block_key"].to_numpy()[order]
    norms = group["norm"].to_numpy()[order]
    out_a: list[str] = []
    out_b: list[str] = []
    out_k: list[str] = []
    seg_starts = np.flatnonzero(np.concatenate(([True], keys[1:] != keys[:-1])))
    seg_ends = np.concatenate((seg_starts[1:], [len(keys)]))
    for i, j in zip(seg_starts, seg_ends):
        if j - i < 2:
            continue
        for a, b in pairs_for_block(norms[i:j].tolist(), max_pairs):
            out_a.append(a)
            out_b.append(b)
            out_k.append(keys[i])
    return pd.DataFrame({"a": out_a, "b": out_b, "block_key": out_k})
