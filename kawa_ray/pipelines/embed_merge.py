"""K7 — ``merge_with``: align a source embedding space into the KB's
space (/root/reference/ontology/ontology_kb.py:1746-1883) — the last
uncovered operator of SURVEY.md §2.

Reference semantics reproduced:
* token mapping src -> self: shared tokens keep their self id; a token
  that is only known as a suffix maps through its ``##`` form
  (:1761-1778); unused self slots are recycled before new ids append
  (:1783-1805).
* vector synthesis for self rows with a zero vector: the score-weighted
  sum of the mapped positive neighbours' vectors (src-space cosine
  top-k, score >= 0.01) (:1823-1838).
* existing vectors blend 0.9*old + 0.1*neighbour-sum; rows that were
  JUST synthesised blend 0.5/0.5 on the next positive pass
  (``gpt_set_only``, :1820,1876-1880).
* negative-neighbour repulsion: v = 1.1*v - 0.1*neg-weighted-sum
  (:1858-1864).
* 2 refinement sweeps (:1819).

Divergence (documented): the reference updates the matrix IN PLACE while
iterating ids (Gauss-Seidel — results depend on id order); here each
sweep computes every update from the sweep-start snapshot (Jacobi), so
the sweep is a pure map over rows — deterministic and parallelisable as
``map_batches`` against the broadcast snapshot, which is what makes the
operator a Ray stage instead of a serial loop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _normalize_rows(M: np.ndarray) -> np.ndarray:
    return M / np.clip(np.linalg.norm(M, axis=1, keepdims=True), 1e-12, None)


def topk_neighbors(matrix: np.ndarray, topk: int = 8, min_score: float = 0.01,
                   negate: bool = False, batch_size: int = 1024):
    """Per-row cosine top-k within ``matrix`` via Ray map_batches: row
    batches stream against the ray.put-broadcast normalised matrix (the
    ann_topk shape).  ``negate=True`` ranks by most-NEGATIVE cosine (the
    reference's neg-search file).  -> list[(ids, scores)] per row."""
    import ray
    import ray.data as rd

    Mn = _normalize_rows(matrix.astype(np.float64))
    m_ref = ray.put(Mn)
    n = Mn.shape[0]

    def batch_topk(df: pd.DataFrame, _ref=m_ref) -> pd.DataFrame:
        M = ray.get(_ref)
        rows = df["row"].to_numpy()
        sims = M[rows] @ M.T
        if negate:
            sims = -sims
        out_rows, out_nbrs, out_scores = [], [], []
        for i, r in enumerate(rows):
            s = sims[i].copy()
            s[r] = -np.inf  # never own row (reference result[1:])
            k = min(topk, n - 1)
            idx = np.argpartition(-s, k - 1)[:k]
            idx = idx[np.argsort(-s[idx], kind="stable")]
            keep = idx[s[idx] >= min_score]
            out_rows.append(int(r))
            out_nbrs.append(keep.astype("int64").tobytes())
            out_scores.append(s[keep].astype("<f8").tobytes())
        return pd.DataFrame({"row": out_rows, "nbrs": out_nbrs,
                             "scores": out_scores})

    res = (
        rd.from_pandas(pd.DataFrame({"row": np.arange(n, dtype="int64")}))
        .map_batches(batch_topk, batch_format="pandas", batch_size=batch_size)
        .to_pandas()
        .sort_values("row")
    )
    return [
        (np.frombuffer(b, dtype="int64"), np.frombuffer(s, dtype="<f8"))
        for b, s in zip(res["nbrs"], res["scores"])
    ]


def map_tokens(self_tokens: list[str], src_tokens: list[str],
               unused_rows: list[int] | None = None):
    """src index -> self row id; recycle unused slots, then append.
    -> (src2self, new_self_tokens, appended_rows, recycled_rows)."""
    tok2id = {t: i for i, t in enumerate(self_tokens)}
    suffixes = {t[2:] for t in self_tokens if t.startswith("##")}
    out_tokens = list(self_tokens)
    unused = list(unused_rows or [])
    src2self: dict[int, int] = {}
    appended, recycled = [], []
    for sid, tok in enumerate(src_tokens):
        t = tok.strip()
        if t not in tok2id:
            t = "##" + t
        elif t in suffixes:
            # ambiguous prefix/suffix: the suffix form ALWAYS wins —
            # created below if absent (reference :1775-1805 allocates a
            # fresh ##-row rather than reusing the plain token's row)
            t = "##" + t
        if t in tok2id:
            src2self[sid] = tok2id[t]
            continue
        if unused:
            rid = unused.pop(0)
            out_tokens[rid] = t
            recycled.append(rid)
        else:
            rid = len(out_tokens)
            out_tokens.append(t)
            appended.append(rid)
        tok2id[t] = rid
        src2self[sid] = rid
    return src2self, out_tokens, appended, recycled


def merge_embedding_spaces(self_tokens: list[str], self_matrix: np.ndarray,
                           src_tokens: list[str], src_matrix: np.ndarray,
                           unused_rows: list[int] | None = None,
                           sweeps: int = 2, topk: int = 8,
                           min_score: float = 0.01,
                           pos_neighbors=None):
    """-> (tokens, matrix, report dict).  See module docstring.
    ``pos_neighbors`` lets callers reuse a precomputed positive top-k
    pass (it is also the report's sanity-metric input)."""
    dim = self_matrix.shape[1]
    src2self, tokens, appended, recycled = map_tokens(
        self_tokens, src_tokens, unused_rows
    )
    M = np.zeros((len(tokens), dim), dtype=np.float64)
    M[: len(self_tokens)] = self_matrix.astype(np.float64)
    for rid in recycled:
        M[rid] = 0.0

    pos = pos_neighbors if pos_neighbors is not None else topk_neighbors(
        src_matrix, topk=topk, min_score=min_score
    )
    neg = topk_neighbors(src_matrix, topk=topk, min_score=-np.inf, negate=True)

    zero = {i for i in range(len(tokens)) if not M[i].any()}
    synthesized: set[int] = set()
    for _ in range(sweeps):
        snap = M.copy()
        gpt_this_sweep: set[int] = set()
        # positive pass (:1823-1838)
        for sid, (nbrs, scores) in enumerate(pos):
            main = src2self[sid]
            mapped = [(src2self[j], s) for j, s in zip(nbrs, scores)
                      if src2self[j] not in zero]
            if len(mapped) <= 1:
                continue
            total = sum(s for _, s in mapped)
            agg = sum(snap[j] * (s / total) for j, s in mapped)
            if main in zero:
                M[main] = agg
                gpt_this_sweep.add(main)
                synthesized.add(main)
            else:
                M[main] = 0.9 * snap[main] + 0.1 * agg
        zero -= gpt_this_sweep
        # negative repulsion (:1858-1864)
        snap = M.copy()
        for sid, (nbrs, scores) in enumerate(neg):
            main = src2self[sid]
            if main in zero or not snap[main].any():
                continue
            mapped = [(src2self[j], -s) for j, s in zip(nbrs, scores)
                      if src2self[j] not in zero]
            total = sum(s for _, s in mapped)
            if not mapped or total == 0:
                continue
            M[main] = 1.1 * snap[main] - 0.1 * sum(
                snap[j] * (s / total) for j, s in mapped
            )
        # second positive pass with the gpt_set_only 0.5/0.5 blend
        # (:1866-1881)
        snap = M.copy()
        for sid, (nbrs, scores) in enumerate(pos):
            main = src2self[sid]
            mapped = [(src2self[j], s) for j, s in zip(nbrs, scores)
                      if src2self[j] not in zero]
            if not mapped:
                continue
            total = sum(s for _, s in mapped)
            agg = sum(snap[j] * (s / total) for j, s in mapped)
            if main in zero:
                M[main] = agg
                zero.discard(main)
                synthesized.add(main)
            elif main in gpt_this_sweep:
                M[main] = 0.5 * snap[main] + 0.5 * agg
            else:
                M[main] = 0.9 * snap[main] + 0.1 * agg
    report = {
        "n_self": len(self_tokens),
        "n_src": len(src_tokens),
        "n_shared": sum(1 for sid, rid in src2self.items()
                        if rid < len(self_tokens) and rid not in recycled),
        "n_appended": len(appended),
        "n_recycled": len(recycled),
        "n_synthesized": len(synthesized),
        "n_zero_left": len(zero),
    }
    return tokens, M, report


def embed_space_merge(sf_dir: str):
    """Registry query: merge the embeddings-table space (src) into the
    roster alias space (self) and report the alignment census plus the
    mean cosine of synthesized rows to their positive-neighbour means
    (sanity: synthesis points vectors at their neighbourhood)."""
    import pyarrow.parquet as pq
    import os

    from kawa_ray.sources.roster import build_roster, alias_embedding_table

    norm2row, self_M, _ = alias_embedding_table(build_roster(300))
    self_tokens = [t for t, _ in sorted(norm2row.items(), key=lambda kv: kv[1])]

    emb = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                        columns=["vec_id", "embedding"])
    src_M = np.stack([np.asarray(v, dtype=np.float64)
                      for v in emb.column("embedding").to_pylist()[:256]])
    # pad/trim src vectors to the self dim so the spaces are mergeable
    dim = self_M.shape[1]
    if src_M.shape[1] < dim:
        src_M = np.pad(src_M, ((0, 0), (0, dim - src_M.shape[1])))
    src_M = src_M[:, :dim]
    # src tokens: half overlap the self space (shared anchors), half new
    src_tokens = []
    for i, vid in enumerate(emb.column("vec_id").to_pylist()[:256]):
        if i % 2 == 0 and i // 2 < len(self_tokens):
            src_tokens.append(self_tokens[i // 2])
        else:
            src_tokens.append(f"srctok{int(vid)}")

    pos = topk_neighbors(src_M, topk=8, min_score=0.01)
    tokens, M, report = merge_embedding_spaces(
        self_tokens, self_M, src_tokens, src_M, pos_neighbors=pos
    )
    src2self, _, _, _ = map_tokens(self_tokens, src_tokens)
    coss = []
    Mn = _normalize_rows(M)
    for sid, (nbrs, scores) in enumerate(pos):
        main = src2self[sid]
        if main < len(self_tokens) or not len(nbrs):
            continue
        mean_nbr = np.mean([M[src2self[j]] for j in nbrs], axis=0)
        d = np.linalg.norm(mean_nbr)
        if d > 0 and M[main].any():
            coss.append(float(Mn[main] @ (mean_nbr / d)))
    report["synth_neighbor_cos"] = round(float(np.mean(coss)), 4) if coss else 0.0
    # self-gate (driver row is no_oracle): every src token must land —
    # nothing left zero — and synthesis must point vectors at their
    # positive neighbourhood (inlined test_embed_merge gate; observed
    # 0.9466 at sf0.01)
    from kawa_ray.gates import gate

    gate(report["n_zero_left"] == 0, "merge left zero-vector rows",
         n=report["n_zero_left"])
    gate(report["n_synthesized"] == 0 or report["synth_neighbor_cos"] >= 0.7,
         "synthesized vectors do not align with their neighbourhoods",
         cos=report["synth_neighbor_cos"])
    gate(report["n_shared"] + report["n_appended"] + report["n_recycled"]
         == report["n_src"], "token mapping census does not cover src space")
    return pd.DataFrame([report])
