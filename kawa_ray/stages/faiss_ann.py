"""FAISS-served shard-index ANN stage (import-try; exact numpy fallback).

The north-star pipeline serves embedding similarity "from actor-pool-
pinned embedding matrices and FAISS indexes".  FAISS is not installed in
this sandbox, so the adapter follows the repo's established optional-
dependency pattern (TransformersEncoder, mt5 subword): a real FAISS
branch taken when ``import faiss`` succeeds, and a deterministic exact
fallback — the same normalised-matmul the brute-force path uses — that
produces IDENTICAL output, so every test and oracle runs in both worlds.

Shape at scale (the part that matters at 10^12 docs): the TABLE side is
sharded by Ray Data blocks; each actor builds one inner-product index
per shard batch in ``__call__`` (cheap: IndexFlatIP build is a memcpy),
searches the broadcast query matrix against it, and emits per-shard
top-k partials.  The driver merges k·n_shards candidate rows — never
the table.  An IVF variant would train once per actor in ``__init__``
on a bounded sample; for the flat case there is no per-actor state
beyond the pinned query matrix, fetched once from the object store.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

try:  # pragma: no cover - faiss absent in the sandbox
    import faiss  # type: ignore

    HAVE_FAISS = True
except ImportError:
    faiss = None
    HAVE_FAISS = False


def _shard_topk(qn: np.ndarray, Mn: np.ndarray, k: int):
    """Top-k inner products of each query row against shard rows.

    Returns (scores, idx) with rows sorted descending — the layout
    ``faiss.IndexFlatIP.search`` emits, so both branches interchange.
    """
    if HAVE_FAISS:
        index = faiss.IndexFlatIP(Mn.shape[1])
        index.add(np.ascontiguousarray(Mn, dtype=np.float32))
        scores, idx = index.search(np.ascontiguousarray(qn, dtype=np.float32), k)
        return scores.astype(np.float64), idx
    sims = qn @ Mn.T  # (n_q, shard)
    k = min(k, sims.shape[1])
    part = np.argpartition(-sims, k - 1, axis=1)[:, :k]
    rows = np.arange(sims.shape[0])[:, None]
    order = np.argsort(-sims[rows, part], kind="stable", axis=1)
    idx = part[rows, order]
    return sims[rows, idx], idx


class ShardIndexTopK:
    """Actor-pool callable: per-shard FAISS (or exact) top-k partials.

    ``__init__`` pins the L2-normalised query matrix once per actor
    (object-store fetch); ``__call__`` indexes one table shard and emits
    (query_id, neighbor_id, cosine) candidate rows for the driver merge.
    """

    def __init__(self, q_ref=None, q_obj=None, k: int = 10):
        if q_obj is None:
            import ray

            q_obj = ray.get(q_ref)
        self.qids, self.qn = q_obj
        self.k = k

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
        M = np.stack(
            [np.asarray(v, dtype=np.float64) for v in t.column("embedding").to_pylist()]
        )
        Mn = M / np.clip(np.linalg.norm(M, axis=1, keepdims=True), 1e-12, None)
        # k+1 so a query's own row never crowds a true neighbor out
        scores, idx = _shard_topk(self.qn, Mn, min(self.k + 1, Mn.shape[0]))
        out_q, out_n, out_s = [], [], []
        for qi, qid in enumerate(self.qids):
            for j, s in zip(idx[qi], scores[qi]):
                out_q.append(qid)
                out_n.append(int(ids[j]))
                out_s.append(float(s))
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "cosine": pa.array(out_s, pa.float64()),
            }
        )
