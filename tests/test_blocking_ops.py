"""Brute-force property tests for the classic-ER blocking censuses.

The DuckDB oracles (tests/test_queries_oracle.py) pin blocking_ops to
SQL on the fixture corpora; these tests pin the DISTRIBUTED shapes —
bucket-offset global ranks, the rank-block ghost shuffle, the unioned
pair exchange — to a trivial single-process pandas reference on
adversarial corpora (tiny alphabets force massive sort-key ties, empty
texts, n smaller than the window)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from kawa_ray.pipelines.blocking_ops import (
    _MR_SIZE_BUCKET,
    _SNM_KEY_CHARS,
    snm_blocking_census,
)


def _make_docs(tmp_path, n: int, seed: int) -> str:
    rng = np.random.RandomState(seed)
    alpha = list("abAB ")
    texts = ["".join(rng.choice(alpha, size=rng.randint(0, 5)))
             for _ in range(n)]
    df = pd.DataFrame({
        "doc_id": np.arange(n, dtype="int64") * 7 + seed,
        "text": texts,
        "lang": rng.choice(["en", "fr", "zz"], size=n),
        "source": rng.choice(["web", "book"], size=n),
        "n_chars": rng.randint(0, 50, size=n).astype("int64"),
    })
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def _snm_brute(sf_dir: str, window: int) -> pd.DataFrame:
    df = pq.read_table(sf_dir + "/documents.parquet").to_pandas()
    df["skey"] = df["lang"].astype(str) + "|" + \
        df["text"].astype(str).str.slice(0, _SNM_KEY_CHARS)
    df = df.sort_values(["skey", "doc_id"], kind="mergesort").reset_index(drop=True)
    rows = []
    for i in range(len(df)):
        for j in range(i + 1, min(i + window, len(df))):
            rows.append((df["lang"][i] == df["lang"][j],
                         int(df["source"][i] == df["source"][j]),
                         abs(int(df["n_chars"][i]) - int(df["n_chars"][j]))))
    if not rows:
        return pd.DataFrame({"same_lang": pd.Series([], dtype="bool"),
                             "n_pairs": pd.Series([], dtype="int64"),
                             "n_same_source": pd.Series([], dtype="int64"),
                             "sum_abs_dchars": pd.Series([], dtype="int64")})
    p = pd.DataFrame(rows, columns=["same_lang", "ss", "dc"])
    out = p.groupby("same_lang", as_index=False).agg(
        n_pairs=("ss", "size"), n_same_source=("ss", "sum"),
        sum_abs_dchars=("dc", "sum"))
    for c in ("n_pairs", "n_same_source", "sum_abs_dchars"):
        out[c] = out[c].astype("int64")
    return out.sort_values("same_lang").reset_index(drop=True)


@pytest.mark.parametrize("n,seed,window", [
    (0, 1, 6), (1, 2, 6), (5, 3, 6), (4, 4, 9),  # n < window
    (37, 5, 6), (200, 6, 4), (200, 7, 11),
])
def test_snm_matches_brute_force(ray_session, tmp_path, n, seed, window):
    sf = _make_docs(tmp_path, n, seed)
    got = snm_blocking_census(sf, window=window, partitions=8)
    want = _snm_brute(sf, window)
    pd.testing.assert_frame_equal(got, want)


def test_multirule_size_rule_brute_force(ray_session, tmp_path):
    """The size rule (and the union accounting) against brute force on
    a corpus with no text at all — band and prefix rules then collapse
    to the same empty-text blocks, isolating the size-rule arithmetic
    and the distinct-union fold."""
    from kawa_ray.pipelines.blocking_ops import multirule_blocking_census

    rng = np.random.RandomState(11)
    n = 60
    df = pd.DataFrame({
        "doc_id": np.arange(n, dtype="int64"),
        "text": [""] * n,
        "lang": rng.choice(["en", "fr"], size=n),
        "source": ["web"] * n,
        "n_chars": rng.randint(0, 64, size=n).astype("int64"),
    })
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "documents.parquet"))

    got = multirule_blocking_census(str(tmp_path))
    got = dict(zip(got["rule"], got["n_pairs"]))

    # brute force: empty texts carry no grams -> no band pairs; every
    # same-lang pair shares the prefix key "lang|"; size pairs need the
    # same (lang, n_chars // bucket)
    def pairs(keyfn):
        ks = df.assign(k=keyfn(df)).groupby("k").size()
        return int(sum(m * (m - 1) // 2 for m in ks if m <= 64))

    exp_prefix = pairs(lambda d: d["lang"])
    exp_size = pairs(lambda d: d["lang"] + "|"
                     + (d["n_chars"] // _MR_SIZE_BUCKET).astype(str))
    assert got.get("band", 0) == 0 or "band" not in got
    assert got["prefix"] == exp_prefix
    assert got["size"] == exp_size
    # size blocks are sub-blocks of prefix blocks here, so the union
    # is exactly the prefix pair set
    assert got["union"] == exp_prefix
