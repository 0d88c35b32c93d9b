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
    assert sum(recalls) / len(recalls) >= 0.6, recalls  # LSH trades recall harder


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
