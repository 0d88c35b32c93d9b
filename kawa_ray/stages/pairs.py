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
    block): iterates blocks with an in-batch pandas groupby, so Ray-side
    per-group overhead is paid once per partition, not once per block key
    (10k+ keys x ~1.5ms map_groups dispatch dominated the stage)."""
    out_a: list[str] = []
    out_b: list[str] = []
    out_k: list[str] = []
    for key, g in group.groupby("block_key", sort=False):
        members = (
            g.sort_values(["n_mentions", "norm"], ascending=[False, True])["norm"].tolist()
        )
        for a, b in pairs_for_block(members, max_pairs):
            out_a.append(a)
            out_b.append(b)
            out_k.append(key)
    return pd.DataFrame({"a": out_a, "b": out_b, "block_key": out_k})
