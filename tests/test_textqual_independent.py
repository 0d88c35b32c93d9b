"""Independent oracles for the second-wave text-quality operators —
computed straight from the parquet with pandas/python sets, sharing no
code (and no formula layout) with either the Ray pipelines or their
DuckDB mirrors, so bugs shared by both engines still get caught (the
PageRank teleport bug was found exactly this way)."""

import pandas as pd
import pyarrow.parquet as pq

from kawa_ray.functions.minhash import md5_low64, word_ngrams
from kawa_ray.pipelines.lm_quality import pmi_collocations
from kawa_ray.pipelines.mixtures import source_divergence
from kawa_ray.pipelines.textqual import (
    _BENCHMARK_SOURCES,
    decontam_overlap,
    top_tokens_mg,
)

SF_DIR = "/root/testdata/sf0.001"


def _docs() -> pd.DataFrame:
    return pq.read_table(f"{SF_DIR}/documents.parquet").to_pandas()


def test_decontam_matches_set_brute_force(ray_session):
    df = _docs()
    bench_grams: set[int] = set()
    for t in df.loc[df["source"].isin(_BENCHMARK_SOURCES), "text"]:
        bench_grams.update(md5_low64(g) for g in word_ngrams(t.lower().split(), 5))
    cand = df[~df["source"].isin(_BENCHMARK_SOURCES)]
    want: dict[str, list[int]] = {}
    for lang, text in zip(cand["lang"], cand["text"]):
        hit = any(md5_low64(g) in bench_grams
                  for g in word_ngrams(text.lower().split(), 5))
        a = want.setdefault(lang, [0, 0])
        a[0] += 1
        a[1] += int(hit)
    got = decontam_overlap(SF_DIR)
    for _, r in got.iterrows():
        assert want[r["lang"]] == [int(r["n_docs"]), int(r["n_contaminated"])]
    assert set(got["lang"]) == set(want)


def test_top_tokens_matches_value_counts(ray_session):
    df = _docs()
    toks = df.assign(tok=df["text"].str.lower().str.split()).explode("tok")
    got = top_tokens_mg(SF_DIR, k=5)
    for lang, grp in got.groupby("lang"):
        vc = toks.loc[toks["lang"] == lang, "tok"].value_counts()
        want = sorted(vc.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
        assert list(zip(grp["token"], grp["cnt"])) == [
            (t, int(c)) for t, c in want]


def test_source_divergence_nonnegative(ray_session):
    out = source_divergence(SF_DIR)
    # true KL >= 0; each per-token floor loses < 1 nano unit, so the
    # discretised sum can undershoot by at most the vocabulary size
    assert (out["kl_nano"] >= -10_000).all()
    assert (out["n_tokens"] > 0).all()


def test_pmi_symmetric_counts(ray_session):
    # every reported bigram's count must equal a direct pandas recount
    df = _docs()
    got = pmi_collocations(SF_DIR)
    toks = [t.lower().split() for t in df["text"]]
    from collections import Counter

    c = Counter()
    for ts in toks:
        c.update(zip(ts[:-1], ts[1:]))
    for _, r in got.iterrows():
        assert c[(r["prev"], r["cur"])] == int(r["c"])


def test_bloom_decontam_equals_exact(ray_session):
    """The Bloom gate is a pure pruning step: the gated operator's
    output must equal the exact broadcast-set operator's."""
    from kawa_ray.pipelines.textqual import decontam_overlap_bloom

    exact = decontam_overlap(SF_DIR)
    gated = decontam_overlap_bloom(SF_DIR)
    assert exact.reset_index(drop=True).equals(gated.reset_index(drop=True))
