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


def _band_blocks(df: pd.DataFrame, num_perm=64, bands=16) -> dict:
    """In-process MinHash banding (same kernels, no Ray) -> block key
    -> member doc_ids."""
    import re

    from kawa_ray.functions.minhash import (
        lsh_band_keys, md5_low64, minhash_signature, word_ngrams,
    )

    ws = re.compile(r"\s+")
    blocks: dict = {}
    for doc_id, text in zip(df["doc_id"], df["text"]):
        toks = ws.split(text.lower().strip()) if text.strip() else []
        sh = word_ngrams(toks, 3)
        if not sh:
            continue
        s = minhash_signature(sh, num_perm, hash_fn=md5_low64)
        for b in lsh_band_keys(s, bands):
            blocks.setdefault(b, set()).add(int(doc_id))
    return blocks


def _docs_with_dups(tmp_path, seed: int) -> pd.DataFrame:
    """Docs with engineered near-dups so band blocks are non-trivial."""
    rng = np.random.RandomState(seed)
    vocab = ["alpha", "beta", "gamma", "delta", "eps"]
    base = [" ".join(rng.choice(vocab, size=12)) for _ in range(12)]
    texts = []
    for i in range(40):
        t = base[i % len(base)]
        if i % 3 == 0:  # exact reuse; else a one-token twist
            texts.append(t)
        else:
            w = t.split()
            w[i % len(w)] = vocab[i % len(vocab)]
            texts.append(" ".join(w))
    df = pd.DataFrame({
        "doc_id": np.arange(40, dtype="int64"),
        "text": texts,
        "lang": rng.choice(["en", "fr"], size=40),
        "source": ["web"] * 40,
        "n_chars": rng.randint(0, 40, size=40).astype("int64"),
    })
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "documents.parquet"))
    return df


def test_metablocking_matches_brute_force(ray_session, tmp_path):
    from kawa_ray.pipelines.blocking_ops import metablocking_census

    df = _docs_with_dups(tmp_path, 21)
    got = metablocking_census(str(tmp_path))

    weights: dict = {}
    for mem in _band_blocks(df).values():
        mem = sorted(mem)
        if len(mem) < 2 or len(mem) > 64:
            continue
        for x in range(len(mem) - 1):
            for y in range(x + 1, len(mem)):
                weights[(mem[x], mem[y])] = weights.get((mem[x], mem[y]), 0) + 1
    hist: dict = {}
    for w in weights.values():
        hist[w] = hist.get(w, 0) + 1
    want = pd.DataFrame(sorted(hist.items()), columns=["weight", "n_pairs"])
    want["weight"] = want["weight"].astype("int64")
    want["n_pairs"] = want["n_pairs"].astype("int64")
    assert len(want) > 1  # non-degenerate: several weight levels
    pd.testing.assert_frame_equal(got, want)


def test_multirule_cluster_matches_brute_force(ray_session, tmp_path):
    from kawa_ray.pipelines.blocking_ops import (
        _MR_SIZE_BUCKET, multirule_cluster_census,
    )
    from kawa_ray.stages.clustering import union_find_components

    df = _docs_with_dups(tmp_path, 22)
    got = multirule_cluster_census(str(tmp_path))

    pairs: set = set()
    for mem in _band_blocks(df).values():
        mem = sorted(mem)
        if 2 <= len(mem) <= 64:
            pairs.update((a, b) for i, a in enumerate(mem) for b in mem[i + 1:])
    for key in (df["lang"] + "|" + df["text"].str.slice(0, 16),
                df["lang"] + "|" + (df["n_chars"] // _MR_SIZE_BUCKET).astype(str)):
        for _, grp in df.groupby(key):
            mem = sorted(int(d) for d in grp["doc_id"])
            if 2 <= len(mem) <= 64:
                pairs.update((a, b) for i, a in enumerate(mem)
                             for b in mem[i + 1:])
    groups = union_find_components((str(a), str(b)) for a, b in pairs)
    sizes = pd.Series(list(groups.values())).value_counts()
    hist: dict = dict(sizes.value_counts().astype(int))
    hist[1] = hist.get(1, 0) + len(df) - len(groups)
    want = pd.DataFrame(sorted(hist.items()), columns=["size", "n_clusters"])
    want["size"] = want["size"].astype("int64")
    want["n_clusters"] = want["n_clusters"].astype("int64")
    assert (want["size"] > 1).any()  # real clusters formed
    pd.testing.assert_frame_equal(got, want)


def test_multirule_zero_pairs_boundary(ray_session, tmp_path):
    """A corpus where every block is a singleton: the op must still
    emit the ('union', 0) row the oracle's UNION ALL arm always
    produces, and the cluster census must report every doc a
    singleton."""
    import duckdb

    from kawa_ray.pipelines.blocking_ops import (
        MULTIRULE_BLOCKING_SQL,
        MULTIRULE_CLUSTER_SQL,
        multirule_blocking_census,
        multirule_cluster_census,
    )

    n = 5
    df = pd.DataFrame({
        "doc_id": np.arange(n, dtype="int64"),
        # one unique token per doc: its only 3-gram is itself, so every
        # band bucket is a singleton; prefixes unique too
        "text": [f"uniqueword{i}" for i in range(n)],
        "lang": ["en"] * n,
        "source": ["web"] * n,
        "n_chars": (np.arange(n, dtype="int64") + 1) * 64,  # distinct buckets
    })
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "documents.parquet"))

    got = multirule_blocking_census(str(tmp_path))
    assert got.to_dict("records") == [{"rule": "union", "n_pairs": 0}]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    exp = con.execute(MULTIRULE_BLOCKING_SQL).df()
    pd.testing.assert_frame_equal(
        got.astype({"n_pairs": "int64"}),
        exp.astype({"n_pairs": "int64"}))

    clusters = multirule_cluster_census(str(tmp_path))
    assert clusters.to_dict("records") == [{"size": 1, "n_clusters": n}]
    exp_c = con.execute(MULTIRULE_CLUSTER_SQL).df()
    pd.testing.assert_frame_equal(
        clusters.astype({"size": "int64", "n_clusters": "int64"}),
        exp_c.astype({"size": "int64", "n_clusters": "int64"}))


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
    assert "band" not in got  # count_part never emits zero-count rules
    assert got["prefix"] == exp_prefix
    assert got["size"] == exp_size
    # size blocks are sub-blocks of prefix blocks here, so the union
    # is exactly the prefix pair set
    assert got["union"] == exp_prefix
