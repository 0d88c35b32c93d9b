"""Pairwise P/R/F1 eval harness (north rule: F1 >= 0.99 on labeled pairs
at the same blocking key).

Gold labeled pairs are derived from ``gold_mentions`` with the SAME
frozen blocking-key spec the pipeline uses (``block_keys_for`` incl. the
hot-key salting) — the north rule's "at the same blocking key".  Pairs
live in the distinct-norm space (mentions sharing a norm are the same
node by construction); ``is_same`` is the gold judgment that both norms
belong to one entity.  Compare semantics follow the reference's
set-based eval (/root/reference/eval.py:90-121) lifted to pairs.
"""

from __future__ import annotations

import itertools
from collections import defaultdict

import pyarrow as pa

from kawa_ray.config import LinkageConfig
from kawa_ray.functions.minhash import hash64
from kawa_ray.stages.blocking import block_keys_for


def gold_labeled_pairs(gold_mentions: pa.Table, cfg: LinkageConfig,
                       ent_of: dict[str, int] | None = None) -> list[tuple[str, str, str, bool]]:
    """-> [(norm_a, norm_b, block_key, is_same)] with norm_a < norm_b.

    Mirrors the pipeline's blocking: per-key member sets over distinct
    gold norms, hot keys salted with the identical hash buckets, and —
    when the pipeline runs with the KB-alias channel — the same
    ``kb:<entity_id>`` dictionary keys.
    """
    norm2ent: dict[str, int] = {}
    norm_mentions: dict[str, int] = defaultdict(int)
    for norm, ent in zip(
        gold_mentions.column("norm").to_pylist(), gold_mentions.column("entity_id").to_pylist()
    ):
        norm2ent[norm] = ent
        norm_mentions[norm] += 1

    blocks: dict[str, set[str]] = defaultdict(set)
    for norm in norm2ent:
        for k in block_keys_for(norm, cfg, ent_of):
            blocks[k].add(norm)

    # salt hot keys exactly like the pipeline: block "size" = mention mass;
    # kb: keys are exempt (member-bounded by the alias dictionary — see
    # stages/blocking.py::salt_block_keys)
    salted: dict[str, set[str]] = {}
    for k, members in blocks.items():
        mass = sum(norm_mentions[n] for n in members)
        if mass > cfg.hot_key_threshold and not k.startswith("kb:"):
            for n in members:
                salted.setdefault(f"{k}#{hash64(n) % cfg.n_salts}", set()).add(n)
        else:
            salted[k] = members

    seen: set[tuple[str, str]] = set()
    out: list[tuple[str, str, str, bool]] = []
    for k, members in salted.items():
        for a, b in itertools.combinations(sorted(members), 2):
            if (a, b) in seen:
                continue
            seen.add((a, b))
            out.append((a, b, k, norm2ent[a] == norm2ent[b]))
    return out


def pairwise_f1(labeled_pairs, norm2cluster: dict[str, str]) -> dict[str, float]:
    """Precision/recall/F1 of "same cluster" predictions over the labeled
    pair set (reference precision_recall_F1_helper, eval.py:109-121)."""
    tp = fp = fn = tn = 0
    for a, b, _k, is_same in labeled_pairs:
        ca, cb = norm2cluster.get(a), norm2cluster.get(b)
        pred = ca is not None and ca == cb
        if pred and is_same:
            tp += 1
        elif pred and not is_same:
            fp += 1
        elif not pred and is_same:
            fn += 1
        else:
            tn += 1
    precision = tp / (tp + fp) if tp + fp else 0.0
    recall = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {
        "tp": tp, "fp": fp, "fn": fn, "tn": tn,
        "precision": precision, "recall": recall, "f1": f1,
        "n_pairs": len(labeled_pairs),
    }


def bcubed_scores(gold_mentions: pa.Table, norm2cluster: dict[str, str]) -> dict[str, float]:
    """Mention-level B-cubed precision/recall/F1 (Bagga & Baldwin 1998)
    — the standard clustering complement to the pairwise gate: pairwise
    F1 weights big clusters quadratically, B³ weights every mention
    equally, so the two together catch both "merged giants" and
    "shattered tails".

    Computed from contingency counts, never pair enumeration:
    ``P = (1/N) Σ_{c,g} n_cg² / n_c`` and ``R = (1/N) Σ_{c,g} n_cg² / n_g``
    over the (predicted cluster, gold entity) co-occurrence table — an
    O(distinct pairs) pandas groupby, so at corpus scale it runs as the
    same partial-count aggregate every census in this repo uses.
    """
    import pandas as pd

    df = pd.DataFrame(
        {
            "norm": gold_mentions.column("norm").to_pylist(),
            "gold": gold_mentions.column("entity_id").to_pylist(),
        }
    )
    df["pred"] = [norm2cluster.get(n, n) for n in df["norm"]]
    n = len(df)
    if not n:
        return {"b3_precision": 0.0, "b3_recall": 0.0, "b3_f1": 0.0, "n_mentions": 0}
    cg = df.groupby(["pred", "gold"], sort=False).size().rename("n_cg").reset_index()
    n_c = df.groupby("pred", sort=False).size().rename("n_c")
    n_g = df.groupby("gold", sort=False).size().rename("n_g")
    cg = cg.join(n_c, on="pred").join(n_g, on="gold")
    p = float((cg["n_cg"] ** 2 / cg["n_c"]).sum() / n)
    r = float((cg["n_cg"] ** 2 / cg["n_g"]).sum() / n)
    f1 = 2 * p * r / (p + r) if p + r else 0.0
    return {"b3_precision": p, "b3_recall": r, "b3_f1": f1, "n_mentions": n}
