"""Flagship entity-resolution pipeline exposed as driver queries.

These run over the deterministic synthetic pages corpus (the
BASELINE.json ``input_hint`` table — generated at the scale factor
matching ``sf_dir``, cached under /tmp) and are rows-only checks: the
blocking/scoring/clustering semantics are not SQL-expressible, so the
correctness instrument is the pairwise-F1 row of ``er_eval`` plus the
pytest suite (byte-identity, golden clusters).
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow.parquet as pq

from kawa_ray.config import LinkageConfig
from kawa_ray.eval.pairwise import bcubed_scores, gold_labeled_pairs, pairwise_f1
from kawa_ray.gates import gate
from kawa_ray.sources.pages import ensure_pages, sf_of_dir

_LINK_CACHE: dict[str, dict] = {}


def _linked(sf_dir: str) -> tuple[str, dict]:
    """Run (once per process per sf) the full linkage pipeline."""
    from kawa_ray.pipelines.linkage import link_pages

    sf = sf_of_dir(sf_dir)
    if sf not in _LINK_CACHE:
        pages_dir = ensure_pages(sf)
        _LINK_CACHE[sf] = (pages_dir, link_pages(pages_dir))
    return _LINK_CACHE[sf]


def er_extract_check(sf_dir: str):
    """S1 byte-identity census: per lang, pages whose extracted text equals
    the golden ``text`` column (must equal n_pages)."""
    import pyarrow as pa
    import ray.data as rd

    from kawa_ray.functions.html import extract_text

    pages_dir = ensure_pages(sf_of_dir(sf_dir))
    ds = rd.read_parquet(os.path.join(pages_dir, "pages"))

    def check(t: pa.Table) -> pa.Table:
        ok = [int(extract_text(h) == x) for h, x in
              zip(t.column("html").to_pylist(), t.column("text").to_pylist())]
        df = pd.DataFrame({"lang": t.column("lang").to_pylist(), "ok": ok})
        g = df.groupby("lang", sort=False).agg(n_pages=("ok", "size"), n_identical=("ok", "sum"))
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False)

    from ray.data.aggregate import Sum

    out = (
        ds.map_batches(check, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("n_pages", alias_name="n_pages"), Sum("n_identical", alias_name="n_identical"))
        .to_pandas()
    )
    out = out.sort_values("lang").reset_index(drop=True)
    bad = out[out["n_identical"] != out["n_pages"]]
    gate(bad.empty, "byte-identity broken: extracted text != golden text",
         langs=bad["lang"].tolist())
    return out


def er_mention_stats(sf_dir: str):
    """Mentions per NER label (detection + regex extractors)."""
    pages_dir, res = _linked(sf_dir)
    df = res["mentions"].select_columns(["label"]).to_pandas()
    out = df.groupby("label").size().reset_index(name="n_mentions")
    out = out.sort_values("label").reset_index(drop=True)
    got = set(out["label"])
    # scale-aware gate: detection must cover every label the GOLD set
    # actually carries at this scale (hard-coding regex-typed labels
    # like EMAIL_ADDRESS would false-fire on a tiny corpus where no
    # hash-selected contact page exists)
    gold = pq.read_table(os.path.join(pages_dir, "gold_mentions.parquet"),
                         columns=["label"])
    core = set(gold.column("label").to_pylist())
    gate(core <= got, "detection lost a gold NER label entirely",
         missing=sorted(core - got))
    gate(bool((out["n_mentions"] > 0).all()), "zero-mention label row emitted")
    return out


def er_clusters(sf_dir: str):
    """Cluster census: distinct surfaces + mention mass per entity cluster
    (top 50 by mass for stability)."""
    _, res = _linked(sf_dir)
    df = res["clusters"].select_columns(["norm", "entity_cluster"]).to_pandas()
    g = df.groupby("entity_cluster").agg(
        n_mentions=("norm", "size"), n_surfaces=("norm", "nunique")
    ).reset_index()
    gate(len(g) > 0, "linkage produced zero entity clusters")
    gate(bool((g["n_mentions"] >= g["n_surfaces"]).all())
         and bool((g["n_surfaces"] >= 1).all()),
         "cluster census invariant broken (n_mentions >= n_surfaces >= 1)")
    # clustering must actually merge: at least one multi-surface cluster
    gate(int(g["n_surfaces"].max()) > 1,
         "no cluster groups more than one surface — closure did not run")
    g = g.sort_values(["n_mentions", "entity_cluster"], ascending=[False, True]).head(50)
    return g.reset_index(drop=True)


def er_eval(sf_dir: str):
    """THE north-rule gate: pairwise precision/recall/F1 on labeled pairs
    at the shared blocking keys (target F1 >= 0.99)."""
    pages_dir, res = _linked(sf_dir)
    gold = pq.read_table(os.path.join(pages_dir, "gold_mentions.parquet"))
    cfg = LinkageConfig()
    from kawa_ray.pipelines.linkage import kb_alias_lookup

    m = pairwise_f1(
        gold_labeled_pairs(gold, cfg, kb_alias_lookup() if cfg.kb_blocking else None),
        res["norm2cluster"],
    )
    b3 = bcubed_scores(gold, res["norm2cluster"])
    # THE self-gate (north rule): a sub-0.99 F1 must flip the driver row
    # to err, never pass silently (fault-injected in tests/test_gates.py)
    gate(m["f1"] >= 0.99, "north-rule pairwise F1 gate failed", f1=m["f1"],
         precision=m["precision"], recall=m["recall"])
    gate(b3["b3_f1"] >= 0.99, "B-cubed F1 gate failed", b3_f1=b3["b3_f1"])
    return pd.DataFrame(
        {
            "n_labeled_pairs": [m["n_pairs"]],
            "tp": [m["tp"]], "fp": [m["fp"]], "fn": [m["fn"]],
            "precision": [round(m["precision"], 4)],
            "recall": [round(m["recall"], 4)],
            "f1": [round(m["f1"], 4)],
            # mention-level B³ (equal weight per mention) alongside the
            # pairwise gate — catches shattered-tail/merged-giant failure
            # modes the quadratic pairwise metric underweights
            "b3_precision": [round(b3["b3_precision"], 4)],
            "b3_recall": [round(b3["b3_recall"], 4)],
            "b3_f1": [round(b3["b3_f1"], 4)],
        }
    )


def er_clusters_resumable(sf_dir: str):
    """Checkpointed/resumable flagship run (per-partition lineage +
    skew manifests under /tmp); returns the per-stage manifest summary so
    the driver sees lineage ids + throughput/skew metrics, not just rows."""
    import tempfile

    from kawa_ray.pipelines.linkage_ckpt import link_pages_checkpointed

    sf = sf_of_dir(sf_dir)
    pages_dir = ensure_pages(sf)
    root = os.path.join(tempfile.gettempdir(), "kawa_ray_ckpt", f"sf{sf}")
    res = link_pages_checkpointed(pages_dir, root)
    # resumable must be byte-identical to the direct in-memory run
    _, direct = _linked(sf_dir)
    gate(res["norm2cluster"] == direct["norm2cluster"],
         "checkpointed linkage diverged from the direct run",
         n_ckpt=len(res["norm2cluster"]), n_direct=len(direct["norm2cluster"]))
    rows = []
    for stage, m in res["manifests"].items():
        for pid, ent in sorted(m["partitions"].items(), key=lambda kv: int(kv[0])):
            rows.append(
                {
                    "stage": stage,
                    "pid": int(pid),
                    "lineage_id": ent["lineage_id"],
                    "rows_out": ent["rows_out"],
                    "straggler_factor": m["skew"]["straggler_factor"],
                }
            )
    return pd.DataFrame(rows)


def er_lexicon_build(sf_dir: str):
    """Distributed (Ray groupby) lexicon build census: per-level key and
    residual counts, asserted equal to the single-process build (the
    equality itself is gated in tests/test_lexicon_distributed.py)."""
    from kawa_ray.pipelines.lexicon_build import build_lexicon_distributed
    from kawa_ray.sources.roster import build_roster, roster_word2ner
    from kawa_ray.state.lexicon import LexiconIndex

    w2n = list(roster_word2ner(build_roster(300)))
    dist = build_lexicon_distributed(w2n)
    single = LexiconIndex.build(w2n)
    rows = [
        {
            "level": lv,
            "n_prefixes": len(d),
            "equal_to_single_process": d == s,
        }
        for lv, (d, s) in enumerate(zip(dist.levels, single.levels))
    ]
    rows.append(
        {
            "level": -1,  # residual exact dict
            "n_prefixes": len(dist.residual),
            "equal_to_single_process": dist.residual == single.residual,
        }
    )
    out = pd.DataFrame(rows)
    gate(bool(out["equal_to_single_process"].all()),
         "distributed lexicon build != single-process build",
         levels=out.loc[~out["equal_to_single_process"], "level"].tolist())
    return out


def er_word2ner_stats(sf_dir: str):
    """Per-label weighted counts over the word2ner exchange table
    (reference get_word2ner_stats, ontology_manager.py:296-327): weight =
    w + 1/(1+sqrt(len)) x label factor, summed per label via per-batch
    partials + one tiny groupby."""
    import math

    import pyarrow as pa
    import ray.data as rd
    from ray.data.aggregate import Sum

    from kawa_ray.config import LABEL_WEIGHT_FACTORS
    from kawa_ray.sources.roster import build_roster, roster_word2ner

    rows = list(roster_word2ner(build_roster(300)))
    tbl = pa.table(
        {
            "word": [r[0] for r in rows],
            "label": [r[1] for r in rows],
            "w": [float(r[2]) if len(r) > 2 and r[2] else 0.0 for r in rows],
        }
    )

    def partial(t: pa.Table) -> pa.Table:
        out: dict[str, list] = {"label": [], "weight": [], "n": []}
        agg: dict[str, tuple[float, int]] = {}
        for word, label, w in zip(
            t.column("word").to_pylist(), t.column("label").to_pylist(),
            t.column("w").to_pylist(),
        ):
            lens = len(word) + len(word.split("_"))
            wt = (w or 1.0) + 1.0 / (1.0 + math.sqrt(lens))
            wt *= LABEL_WEIGHT_FACTORS.get(label, 1.0)
            s, n = agg.get(label, (0.0, 0))
            agg[label] = (s + wt, n + 1)
        for label, (s, n) in agg.items():
            out["label"].append(label)
            out["weight"].append(s)
            out["n"].append(n)
        return pa.Table.from_pydict(out)

    out = (
        rd.from_arrow(tbl)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("label")
        .aggregate(Sum("weight", alias_name="weight"), Sum("n", alias_name="n_words"))
        .to_pandas()
    )
    # no rounding here: the driver compare rounds both sides to 6dp, and
    # the ~1e-13 float-summation-order delta vs the SQL oracle sits far
    # below that (rounding to 4dp on one side would REINTRODUCE a
    # half-even-vs-half-away divergence instead of removing one)
    return out.sort_values("label").reset_index(drop=True)


def _er_word2ner_stats_sql() -> str:
    """Exact SQL oracle for ``er_word2ner_stats``: the deterministic
    roster word2ner fixture inlined as VALUES (same generator call), the
    reference weight formula recomputed natively in SQL —
    weight = (w or 1) + 1/(1+sqrt(len(word)+n_underscore_parts)), scaled
    by the per-label factor — so the grouped sum is an independent
    recomputation, not a replay."""
    from kawa_ray.config import LABEL_WEIGHT_FACTORS
    from kawa_ray.sources.roster import build_roster, roster_word2ner

    rows = list(roster_word2ner(build_roster(300)))
    vals = ",\n    ".join(
        "('{}','{}',{})".format(
            r[0].replace("'", "''"), r[1].replace("'", "''"),
            float(r[2]) if len(r) > 2 and r[2] else 0.0,
        )
        for r in rows
    )
    factors = " ".join(
        f"WHEN '{lbl}' THEN {f}" for lbl, f in sorted(LABEL_WEIGHT_FACTORS.items())
    )
    return f"""
WITH w2n(word, label, w) AS (VALUES
    {vals}
), weighted AS (
  SELECT label,
         (CASE WHEN w = 0 THEN 1.0 ELSE w END
          + 1.0 / (1.0 + SQRT(LENGTH(word)
                              + LENGTH(word) - LENGTH(REPLACE(word, '_', '')) + 1)))
         * (CASE label {factors} ELSE 1.0 END) AS wt
  FROM w2n
)
SELECT label, SUM(wt) AS weight, COUNT(*) AS n_words
FROM weighted GROUP BY label ORDER BY label
"""


ER_WORD2NER_STATS_SQL = _er_word2ner_stats_sql()


def er_mention_eval(sf_dir: str):
    """Mention-level per-language eval — the reference's own harness
    (eval.py:90-121,128-254): set-based TP/FN/FP of predicted vs gold
    entity strings per document (type deliberately relaxed, eval.py:177-181),
    accumulated per language with P/R/F1.  Pure Ray: per-doc compare in
    map_batches against broadcast gold sets, per-lang sums in one groupby."""
    import pyarrow as pa
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    # "filter to relevant tags" exactly like the reference's
    # predict_with_ontology (eval.py:76-88): the gold roster labels only
    ROSTER_LABELS = frozenset(
        {"PERSON", "PUBLIC_FIGURE", "ORG", "GPE", "LOC", "PRODUCT"}
    )

    import pandas as pd_

    from kawa_ray.functions.minhash import hash64

    sf = sf_of_dir(sf_dir)
    pages_dir = ensure_pages(sf)
    _, res = _linked(sf_dir)

    # url-keyed hash-partition join of predictions, gold rows and the
    # per-page lang — NOT a broadcast gold dict (round-1 VERDICT item 9):
    # exact per-doc sets even when a doc's mentions span blocks, and
    # gold-only docs (zero predictions) still contribute their fn.
    P = 64

    def pred_rows(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.filter(pc.is_in(t.column("label"),
                              pa.array(sorted(ROSTER_LABELS))))
        return pa.table({
            "url": t.column("url"),
            "norm": pc.cast(t.column("norm"), pa.string()),
            "kind": pa.array(["pred"] * t.num_rows, pa.string()),
        })

    gold_ds = rd.read_parquet(
        os.path.join(pages_dir, "gold_mentions.parquet"), columns=["url", "norm"]
    ).map_batches(
        lambda t: pa.table({"url": t.column("url"), "norm": t.column("norm"),
                            "kind": pa.array(["gold"] * t.num_rows, pa.string())}),
        batch_format="pyarrow",
    )
    lang_ds = rd.read_parquet(
        os.path.join(pages_dir, "pages"), columns=["url", "lang"]
    ).map_batches(
        lambda t: pa.table({"url": t.column("url"), "norm": t.column("lang"),
                            "kind": pa.array(["lang"] * t.num_rows, pa.string())}),
        batch_format="pyarrow",
    )

    def compare(g: pd_.DataFrame) -> pd_.DataFrame:
        out = {"lang": [], "tp": [], "fp": [], "fn": []}
        for _url, grp in g.groupby("url", sort=False):
            pred = set(grp.loc[grp["kind"] == "pred", "norm"])
            want = set(grp.loc[grp["kind"] == "gold", "norm"])
            langs = grp.loc[grp["kind"] == "lang", "norm"]
            if langs.empty or (not pred and not want):
                continue
            out["lang"].append(langs.iloc[0])
            out["tp"].append(len(pred & want))
            out["fp"].append(len(pred - want))
            out["fn"].append(len(want - pred))
        return pd_.DataFrame(out)

    agg = (
        res["mentions"]
        .map_batches(pred_rows, batch_format="pyarrow")
        .union(gold_ds, lang_ds)
        .map_batches(
            lambda df: df.assign(part=[hash64(u) % P for u in df["url"]]),
            batch_format="pandas",
        )
        .groupby("part")
        .map_groups(compare, batch_format="pandas")
        .groupby("lang")
        .aggregate(Sum("tp", alias_name="tp"), Sum("fp", alias_name="fp"),
                   Sum("fn", alias_name="fn"))
        .to_pandas()
    )
    agg["precision"] = (agg["tp"] / (agg["tp"] + agg["fp"]).clip(lower=1)).round(4)
    agg["recall"] = (agg["tp"] / (agg["tp"] + agg["fn"]).clip(lower=1)).round(4)
    agg["f1"] = (
        2 * agg["precision"] * agg["recall"]
        / (agg["precision"] + agg["recall"]).clip(lower=1e-9)
    ).round(4)
    agg = agg.sort_values("lang").reset_index(drop=True)
    # every corpus language must be represented and score near-perfect on
    # the synthetic gold (observed minimum 0.9963 at sf0.01)
    weak = agg[agg["f1"] < 0.97]
    gate(weak.empty, "per-language mention F1 regressed below 0.97",
         langs=weak["lang"].tolist(), f1s=weak["f1"].tolist())
    gate(len(agg) >= 5, "mention eval lost corpus languages", n=len(agg))
    return agg


def er_incremental_check(sf_dir: str):
    """Streaming-shaped linkage: fold the corpus in as two increments and
    compare against the full rebuild (equivalence holds with caps/salting
    disabled — the increment-equivalence regime; rows-only check, the
    equality is also gated in tests/test_incremental.py)."""
    import shutil
    import tempfile
    from dataclasses import replace

    from kawa_ray.pipelines.incremental import empty_state, link_increment
    from kawa_ray.pipelines.linkage import link_pages

    sf = sf_of_dir(sf_dir)
    pages_dir = ensure_pages(sf)
    cfg = replace(LinkageConfig(), hot_key_threshold=10**9,
                  max_pairs_per_block=10**9)

    shards = sorted(os.listdir(os.path.join(pages_dir, "pages")))
    root = tempfile.mkdtemp(prefix="kawa_incr_")
    try:
        halves = []
        for i, grp in enumerate((shards[: len(shards) // 2],
                                 shards[len(shards) // 2:])):
            d = os.path.join(root, f"half{i}", )
            os.makedirs(os.path.join(d, "pages"))
            for sh in grp:
                shutil.copy(os.path.join(pages_dir, "pages", sh),
                            os.path.join(d, "pages", sh))
            halves.append(d)
        s = empty_state()
        rows = []
        for i, h in enumerate(halves):
            s = link_increment(s, h, cfg)
            rows.append({"step": f"increment_{i}", "n_norms": len(s["nodes"]),
                         "n_clusters": len(set(s["norm2cluster"].values())),
                         "n_new_pairs": s["n_new_pairs"],
                         "equals_full_rebuild": None})
        full = link_pages(pages_dir, cfg)
        rows.append({"step": "full_rebuild", "n_norms": len(full["norm2cluster"]),
                     "n_clusters": len(set(full["norm2cluster"].values())),
                     "n_new_pairs": full["n_pairs"],
                     "equals_full_rebuild": s["norm2cluster"] == full["norm2cluster"]})
        gate(bool(rows[-1]["equals_full_rebuild"]),
             "incremental fold diverged from the full rebuild",
             n_incr=rows[-2]["n_clusters"], n_full=rows[-1]["n_clusters"])
        return pd.DataFrame(rows)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def er_salting_report(sf_dir: str):
    """Quantifies the hot-key salting trade (north rule: salting
    stopword-like surfaces trades cross-salt recall for bounded block
    size): labeled positive pairs at unsalted vs salted blocking keys,
    and the share of pair volume the cap+salt spec removes."""
    from dataclasses import replace

    sf = sf_of_dir(sf_dir)
    pages_dir = ensure_pages(sf)
    gold = pq.read_table(os.path.join(pages_dir, "gold_mentions.parquet"))
    from kawa_ray.pipelines.linkage import kb_alias_lookup

    cfg = LinkageConfig()
    unsalted = replace(cfg, hot_key_threshold=10**9)
    ent_of = kb_alias_lookup() if cfg.kb_blocking else None
    p_salted = gold_labeled_pairs(gold, cfg, ent_of)
    p_unsalted = gold_labeled_pairs(gold, unsalted, ent_of)
    pos_s = {(a, b) for a, b, _k, same in p_salted if same}
    pos_u = {(a, b) for a, b, _k, same in p_unsalted if same}
    # retention of an empty positive set is vacuously 1.0 (a tiny corpus
    # with no unsalted positive pairs must not trip the gate)
    retained = len(pos_s & pos_u) / len(pos_u) if pos_u else 1.0
    # the salting trade must stay bounded: it may only REMOVE pair volume
    # and must keep nearly all positive recall (observed 1.0 at sf0.01)
    gate(retained >= 0.95, "salting dropped too many positive pairs",
         retained=round(retained, 4))
    gate(len(p_salted) <= len(p_unsalted),
         "salting INCREASED labeled pair volume",
         salted=len(p_salted), unsalted=len(p_unsalted))
    return pd.DataFrame(
        {
            "labeled_pairs_unsalted": [len(p_unsalted)],
            "labeled_pairs_salted": [len(p_salted)],
            "positive_pairs_unsalted": [len(pos_u)],
            "positive_pairs_salted": [len(pos_s)],
            "positive_recall_retained": [round(retained, 4)],
            "pair_volume_ratio": [
                round(len(p_salted) / max(len(p_unsalted), 1), 4)
            ],
        }
    )


def er_context_embeddings(sf_dir: str):
    """E1: span-pooled contextual embedding artifact over the corpus
    (stages/embedding.py — reference extract_word_embeddings.py:20-40
    semantics).  Reports per-norm occurrence counts and the leading
    vector component; rows-only (model output is not SQL-expressible)."""
    import numpy as np

    from kawa_ray.pipelines.linkage import default_artifacts, read_pages
    from kawa_ray.stages.embedding import context_embedding_artifact

    pages_dir = ensure_pages(sf_of_dir(sf_dir))
    lexicon, _ = default_artifacts()
    norm2row, matrix, _aux = context_embedding_artifact(
        read_pages(pages_dir), lexicon
    )
    norms = sorted(norm2row)
    out = pd.DataFrame(
        {
            "norm": norms,
            "l2": [round(float(np.linalg.norm(matrix[norm2row[n]])), 4)
                   for n in norms],
            "c0": [round(float(matrix[norm2row[n]][0]), 4) for n in norms],
        }
    )
    # inlined pytest gates (test_embedding_stage): artifact non-empty
    # (no absolute vocabulary floor — that would false-fire on corpora
    # smaller than the tested scales) and every vector L2-normalised
    gate(len(out) > 0, "context-embedding artifact is empty")
    gate(bool(((out["l2"] - 1.0).abs() <= 1e-3).all()),
         "span-pooled vectors are not L2-normalised",
         l2_min=float(out["l2"].min()), l2_max=float(out["l2"].max()))
    return out
