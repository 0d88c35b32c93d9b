"""S3 — blocking: lexicon shingle keys + MinHash-LSH band keys, with
hot-key salting (SURVEY.md §7.5).

Blocking operates on **distinct normalised surfaces** ("nodes"), not raw
mentions: mentions sharing a norm are trivially same-entity (exact-match
edge), so the pair space is the distinct-norm space — the aggregation
from mentions to nodes is the skewed shuffle, and it is pre-aggregated
per batch (combiner) before the small ``groupby`` (ray_guide:
"Aggregation at scale").

Key spec (shared verbatim with the eval oracle — the north rule labels
pairs "at the same blocking key"):

- ``s:<shingle_join>``  for every level-0 prefix shingle of the norm
  (reference _get_all_word_shingles, ontology_manager.py:258-294)
- ``m:<band>:<hash>``   MinHash-LSH band keys over char-3 shingles

Hot keys (block size > cfg.hot_key_threshold) are salted
``<key>#<salt>``: each member lands in ONE deterministic salt bucket
(hash(norm) % n_salts), trading cross-salt recall for bounded block
size; the cap + salting is part of the blocking-key spec, so gold pairs
are generated against the same salted keys (SURVEY.md §7.6).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from kawa_ray.config import CONNECTOR, LinkageConfig
from kawa_ray.functions.minhash import char_shingles, hash64, lsh_band_keys, minhash_signature
from kawa_ray.functions.text import word_shingles

# labels eligible for entity linking (regex-typed PII spans are surfaced as
# mentions but do not enter the pair space)
LINKABLE_LABELS = frozenset(
    {"PERSON", "PUBLIC_FIGURE", "ORG", "GPE", "LOC", "PRODUCT", "FAC", "EVENT",
     "WORK_OF_ART", "ANIMAL", "FOOD", "PLANT", "JOB", "DISEASE", "RELIGION",
     "POLITICAL_PARTY", "UNION"}
)


def block_keys_for(norm: str, cfg: LinkageConfig,
                   ent_of: dict[str, int] | None = None) -> list[str]:
    """The frozen blocking-key spec for one normalised surface.

    ``ent_of`` is the KB alias dictionary (norm -> entity id): norms the
    KB knows additionally block on ``kb:<entity_id>``, which is the only
    channel that can co-block cross-script aliases (their shingle and
    char-3-MinHash key sets are disjoint).  The eval oracle receives the
    SAME dictionary so labeled pairs stay "at the same blocking key".
    """
    arr = norm.split(CONNECTOR)
    keys = [f"s:{CONNECTOR.join(sh)}" for sh in word_shingles(arr)]
    sig = minhash_signature(char_shingles(norm, cfg.char_shingle_k), cfg.minhash_num_perm)
    keys += [f"m:{k}" for k in lsh_band_keys(sig, cfg.minhash_bands)]
    if ent_of is not None and cfg.kb_blocking:
        eid = ent_of.get(norm)
        if eid is not None:
            keys.append(f"kb:{eid}")
    # dedup, stable order
    seen, out = set(), []
    for k in keys:
        if k not in seen:
            seen.add(k)
            out.append(k)
    return out


def partial_node_agg(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: mentions -> (norm, label, partial count)."""
    df = batch.select(["norm", "label"]).to_pandas()
    df = df[df["label"].isin(LINKABLE_LABELS)]
    g = df.groupby(["norm", "label"], sort=False).size().reset_index(name="n")
    return pa.Table.from_pandas(g, preserve_index=False)


def node_block_keys(batch: pa.Table, cfg: LinkageConfig,
                    ent_of: dict[str, int] | None = None) -> pa.Table:
    """nodes(norm) -> exploded (block_key, norm, n_mentions) rows."""
    norms = batch.column("norm").to_pylist()
    counts = batch.column("n_mentions").to_pylist()
    out_k, out_n, out_c = [], [], []
    for norm, n in zip(norms, counts):
        for k in block_keys_for(norm, cfg, ent_of):
            out_k.append(k)
            out_n.append(norm)
            out_c.append(n)
    return pa.table(
        {
            "block_key": pa.array(out_k, pa.string()),
            "norm": pa.array(out_n, pa.string()),
            "n_mentions": pa.array(out_c, pa.int64()),
        }
    )


def salt_block_keys(df: pd.DataFrame, hot_keys: dict[str, int], n_salts: int) -> pd.DataFrame:
    """Deterministically salt members of hot blocks into sub-blocks.

    ``kb:`` keys are exempt: salting bounds MEMBER-SET explosion in
    stopword-like lexical blocks (mention mass is the cheap proxy for
    that), but a KB block's member count is bounded by the entity's
    alias count regardless of mention mass — salting it would sever
    dictionary-known alias pairs for zero pair-budget benefit.  The eval
    oracle applies the identical exemption."""
    hot_keys = {k: v for k, v in hot_keys.items() if not k.startswith("kb:")}
    if not hot_keys:
        return df
    mask = df["block_key"].isin(hot_keys)
    if not mask.any():
        return df
    salted = df.loc[mask].copy()
    salts = [hash64(n) % n_salts for n in salted["norm"]]
    salted["block_key"] = [f"{k}#{s}" for k, s in zip(salted["block_key"], salts)]
    out = pd.concat([df.loc[~mask], salted], ignore_index=True)
    return out
