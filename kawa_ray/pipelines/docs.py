"""Text-analysis + deduplication suites over the ``documents`` table —
token counting, fingerprinting, quality scoring, language-ID, exact and
near-duplicate detection (MinHash-LSH / SimHash / n-gram Jaccard).

These are the training-data-pipeline operators the task brief mandates
beyond the reference's own inventory; each SQL-expressible one carries a
DuckDB oracle (kept in exact lockstep: whitespace tokenisation =
``regexp_split_to_array(trim(text), '\\s+')``, fingerprint = ``md5``).
"""

from __future__ import annotations

import hashlib
import os
import re

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Count, Sum

from kawa_ray.functions.minhash import (
    hamming64,
    hash64,
    jaccard,
    lsh_band_keys,
    minhash_signature,
    simhash64,
    simhash_band_keys,
    word_ngrams,
)
from kawa_ray.stages.clustering import union_find_components

_WS = re.compile(r"\s+")
_PUNCT = re.compile(r"[.!?,;:]")


def _read_docs(sf_dir: str, columns: list[str]) -> rd.Dataset:
    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=columns)


def docs_per_lang(sf_dir: str):
    ds = _read_docs(sf_dir, ["lang", "n_chars"])
    out = (
        ds.groupby("lang")
        .aggregate(Count(alias_name="n_docs"), Sum("n_chars", alias_name="total_chars"))
        .to_pandas()
    )
    return out.sort_values("lang").reset_index(drop=True)


DOCS_PER_LANG_SQL = """
SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY lang ORDER BY lang
"""


def token_count_stats(sf_dir: str):
    """Whitespace token counting (vectorised per batch) + grouped sums."""
    ds = _read_docs(sf_dir, ["lang", "text"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        counts = [len(_WS.split(s.strip())) if s.strip() else 0 for s in df["text"]]
        df2 = pd.DataFrame({"lang": df["lang"], "tokens": counts})
        g = df2.groupby("lang", sort=False)["tokens"].agg(["sum", "size"]).reset_index()
        g.columns = ["lang", "total_tokens", "n"]
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("total_tokens", alias_name="total_tokens"), Sum("n", alias_name="n_docs"))
        .to_pandas()
    )
    return out.sort_values("lang").reset_index(drop=True)


TOKEN_COUNT_SQL = """
SELECT lang,
       CAST(SUM(CASE WHEN TRIM(text) = '' THEN 0
                ELSE ARRAY_LENGTH(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\\s+')) END) AS BIGINT) AS total_tokens,
       COUNT(*) AS n_docs
FROM documents GROUP BY lang ORDER BY lang
"""


def doc_fingerprints(sf_dir: str):
    """Content fingerprinting (md5) + exact-dedup census per lang."""
    ds = _read_docs(sf_dir, ["doc_id", "lang", "text"])

    def fp(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["fingerprint"] = [hashlib.md5(s.encode("utf-8")).hexdigest() for s in df["text"]]
        return pa.Table.from_pandas(df[["lang", "fingerprint"]], preserve_index=False)

    out = (
        ds.map_batches(fp, batch_format="pyarrow")
        .groupby(["lang", "fingerprint"])
        .aggregate(Count(alias_name="_n"))
        .groupby("lang")
        .aggregate(Count(alias_name="n_distinct"))
        .to_pandas()
    )
    return out.sort_values("lang").reset_index(drop=True)


DOC_FINGERPRINTS_SQL = """
SELECT lang, COUNT(DISTINCT MD5(text)) AS n_distinct
FROM documents GROUP BY lang ORDER BY lang
"""


def exact_dedup_docs(sf_dir: str):
    """Exact dedup keep-min-doc_id per content hash; returns survivors
    count per lang + duplicate count (hash-partition + per-group first)."""
    ds = _read_docs(sf_dir, ["doc_id", "lang", "text"])

    def key(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["fingerprint"] = [hashlib.md5(s.encode("utf-8")).hexdigest() for s in df["text"]]
        return pa.Table.from_pandas(df[["doc_id", "lang", "fingerprint"]], preserve_index=False)

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")
        return pd.DataFrame(
            {"lang": [g["lang"].iloc[0]], "survivor": [int(g["doc_id"].iloc[0])],
             "n_dups": [len(g) - 1]}
        )

    out = (
        ds.map_batches(key, batch_format="pyarrow")
        .groupby("fingerprint")
        .map_groups(keep_first, batch_format="pandas")
        .groupby("lang")
        .aggregate(Count(alias_name="n_survivors"), Sum("n_dups", alias_name="n_duplicates"))
        .to_pandas()
    )
    return out.sort_values("lang").reset_index(drop=True)


EXACT_DEDUP_SQL = """
SELECT lang, COUNT(*) AS n_survivors, CAST(SUM(n - 1) AS BIGINT) AS n_duplicates
FROM (
  SELECT ARG_MIN(lang, doc_id) AS lang, COUNT(*) AS n
  FROM documents GROUP BY MD5(text)
)
GROUP BY lang ORDER BY lang
"""


def punctuation_stats(sf_dir: str):
    """Quality signal: punctuation-char counts per lang (SQL-checkable
    slice of the quality score)."""
    ds = _read_docs(sf_dir, ["lang", "text"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df2 = pd.DataFrame(
            {"lang": df["lang"], "punct": [len(_PUNCT.findall(s)) for s in df["text"]],
             "ws": [s.count(" ") for s in df["text"]],
             "chars": [len(s) for s in df["text"]]}
        )
        g = df2.groupby("lang", sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("punct", alias_name="punct_chars"),
                   Sum("ws", alias_name="space_chars"),
                   Sum("chars", alias_name="total_chars"))
        .to_pandas()
    )
    return out.sort_values("lang").reset_index(drop=True)


PUNCT_STATS_SQL = """
SELECT lang,
       CAST(SUM(LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[.!?,;:]', '', 'g'))) AS BIGINT) AS punct_chars,
       CAST(SUM(LENGTH(text) - LENGTH(REPLACE(text, ' ', ''))) AS BIGINT) AS space_chars,
       CAST(SUM(LENGTH(text)) AS BIGINT) AS total_chars
FROM documents GROUP BY lang ORDER BY lang
"""


# ----------------------------------------------------------------- non-SQL ops

_STOP_EN = frozenset("the a an and or of to in is are was for with on at it this that".split())


def quality_scores(sf_dir: str):
    """Composite quality score (length / punctuation / stopword-ratio /
    mean-word-length heuristics) — rows-only check (non-SQL)."""
    ds = _read_docs(sf_dir, ["doc_id", "lang", "text"])

    def score(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        rows = []
        for doc_id, lang, text in zip(df["doc_id"], df["lang"], df["text"]):
            toks = _WS.split(text.strip()) if text.strip() else []
            n = len(toks)
            stop_ratio = sum(1 for w in toks if w.lower() in _STOP_EN) / n if n else 0.0
            mean_len = float(np.mean([len(w) for w in toks])) if n else 0.0
            punct_ratio = len(_PUNCT.findall(text)) / max(1, len(text))
            length_score = min(1.0, n / 100.0)
            q = 0.4 * length_score + 0.2 * min(1.0, 4 * punct_ratio) + \
                0.2 * min(1.0, 2 * stop_ratio) + 0.2 * min(1.0, mean_len / 8.0)
            rows.append((doc_id, lang, n, round(stop_ratio, 4), round(q, 4)))
        out = pd.DataFrame(rows, columns=["doc_id", "lang", "n_tokens", "stop_ratio", "quality"])
        return pa.Table.from_pandas(out, preserve_index=False)

    return ds.map_batches(score, batch_format="pyarrow").to_pandas().sort_values(
        "doc_id"
    ).reset_index(drop=True)


# compact per-language character/stopword profiles for heuristic language ID
_LANG_HINTS = {
    "en": frozenset("the and of to is in that with for it".split()),
    "es": frozenset("el la los de que en un una por con".split()),
    "fr": frozenset("le la les de que en un une pour avec".split()),
    "de": frozenset("der die das und von zu mit für ist ein".split()),
    "pt": frozenset("o os de que em um uma por com não".split()),
}


def lang_id(sf_dir: str):
    """Heuristic n-gram/stopword language ID (rows-only): per doc the
    argmax language by stopword hits + script detection."""
    from kawa_ray.functions.text import cjk_detect

    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def ident(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        preds = []
        for text in df["text"]:
            cjk = cjk_detect(text[:400])
            if cjk:
                preds.append(cjk if cjk in ("zh", "ja", "ko", "th") else "other")
                continue
            toks = [w.lower() for w in _WS.split(text[:1000].strip())]
            best, best_n = "other", 0
            for lang, hints in _LANG_HINTS.items():
                hits = sum(1 for w in toks if w in hints)
                if hits > best_n:
                    best, best_n = lang, hits
            preds.append(best)
        return pa.table({"doc_id": pa.array(df["doc_id"], pa.int64()),
                         "lang_pred": pa.array(preds, pa.string())})

    out = ds.map_batches(ident, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _dedup_census(groups: dict[str, str], ids: list[str]) -> pd.DataFrame:
    comp: dict[str, int] = {}
    for d in ids:
        c = groups.get(d, d)
        comp[c] = comp.get(c, 0) + 1
    n_groups = len(comp)
    n_docs = len(ids)
    return pd.DataFrame(
        {"n_docs": [n_docs], "n_groups": [n_groups], "n_duplicates": [n_docs - n_groups]}
    )




def _partitioned_band_pairs(banded, key_col: str, max_members: int,
                            partitions: int | None = None,
                            sim_col: str | None = None,
                            max_hamming: int = 0) -> pd.DataFrame:
    """Candidate pairs from banded rows via hash-partitioned grouping:
    shuffle on hash(key) % P, then one numpy segment split per partition
    (groupby(key).map_groups paid ~1.5ms dispatch per group — mostly
    singleton bands, so dispatch dominated the stage).  With ``sim_col``
    set, pairs within a segment are Hamming-gated (SimHash verify)."""
    import numpy as np

    try:
        import ray as _ray

        cpus = int(_ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    P = partitions or 2 * cpus

    def addpart(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["part"] = [hash64(str(k)) % P for k in df[key_col]]
        return df

    def explode(g: pd.DataFrame) -> pd.DataFrame:
        order = np.argsort(g[key_col].to_numpy(), kind="stable")
        keys = g[key_col].to_numpy()[order]
        ids = g["doc_id"].to_numpy()[order]
        sims = g[sim_col].to_numpy()[order] if sim_col else None
        out_a: list[int] = []
        out_b: list[int] = []
        starts = np.flatnonzero(np.concatenate(([True], keys[1:] != keys[:-1])))
        ends = np.concatenate((starts[1:], [len(keys)]))
        for i, j in zip(starts, ends):
            if sim_col is None:
                mem = sorted(set(ids[i:j].tolist()))
                if len(mem) < 2 or len(mem) > max_members:
                    continue
                for x in range(len(mem) - 1):
                    for y in range(x + 1, len(mem)):
                        out_a.append(mem[x])
                        out_b.append(mem[y])
            else:
                rows = list({int(d): int(sv) for d, sv in
                             zip(ids[i:j], sims[i:j])}.items())
                if len(rows) < 2:
                    continue
                for x in range(len(rows) - 1):
                    if len(out_a) > max_members:
                        break
                    for y in range(x + 1, len(rows)):
                        ha = rows[x][1] + (1 << 63)
                        hb = rows[y][1] + (1 << 63)
                        if hamming64(ha, hb) <= max_hamming:
                            aa, bb = sorted((rows[x][0], rows[y][0]))
                            out_a.append(aa)
                            out_b.append(bb)
        return pd.DataFrame({"a": pd.Series(out_a, dtype="int64"),
                             "b": pd.Series(out_b, dtype="int64")})

    return (
        banded.map_batches(addpart, batch_format="pandas")
        .groupby("part")
        .map_groups(explode, batch_format="pandas")
        .to_pandas()
        .drop_duplicates()
    )


def _candidate_texts(sf_dir: str, ids: set) -> dict:
    """Fetch ONLY the candidate docs' texts (broadcast id-set filter +
    small take_all): the verify step needs the pair endpoints, never the
    corpus — collecting every text on the driver would materialise the
    whole table at 100 TB scale."""
    import ray

    ids_ref = ray.put(set(int(i) for i in ids))

    def pick(t: pa.Table, _ref=ids_ref) -> pa.Table:
        want = ray.get(_ref)
        mask = pa.array([int(d) in want for d in t.column("doc_id").to_pylist()])
        return t.filter(mask)

    rows = _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        pick, batch_format="pyarrow"
    ).take_all()
    return {r["doc_id"]: r["text"] for r in rows}


def _all_doc_ids(sf_dir: str) -> list:
    return sorted(int(d) for d in _read_docs(sf_dir, ["doc_id"]).unique("doc_id"))


def minhash_dedup_docs(sf_dir: str, num_perm: int = 64, bands: int = 16,
                       jaccard_threshold: float = 0.8):
    """MinHash-LSH near-dup detection: shingle -> minhash -> band buckets
    (groupby) -> candidate pairs -> Jaccard verify -> connected components
    (the canonical pipeline from ray_guide 'Aggregation at scale').
    Rows-only oracle (sketch-based, non-SQL)."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def sig(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        out_doc, out_band = [], []
        for doc_id, text in zip(df["doc_id"], df["text"]):
            toks = _WS.split(text.lower().strip()) if text.strip() else []
            sh = word_ngrams(toks, 3)
            s = minhash_signature(sh, num_perm)
            for b in lsh_band_keys(s, bands):
                out_doc.append(doc_id)
                out_band.append(b)
        return pa.table({"doc_id": pa.array(out_doc, pa.int64()),
                         "band": pa.array(out_band, pa.string())})

    banded = ds.map_batches(sig, batch_format="pyarrow")
    cand_pd = _partitioned_band_pairs(banded, "band", max_members=200)

    # verify candidates with true Jaccard over word 3-grams, fetching only
    # the candidate endpoints' texts
    texts = _candidate_texts(sf_dir, set(cand_pd["a"]) | set(cand_pd["b"]))
    edges = []
    for a, b in zip(cand_pd["a"], cand_pd["b"]):
        sa = set(word_ngrams(_WS.split(texts[a].lower().strip()), 3))
        sb = set(word_ngrams(_WS.split(texts[b].lower().strip()), 3))
        if jaccard(sa, sb) >= jaccard_threshold:
            edges.append((str(a), str(b)))
    all_ids = _all_doc_ids(sf_dir)
    groups = union_find_components(edges, [str(d) for d in all_ids])
    return _dedup_census(groups, [str(d) for d in all_ids])


def simhash_dedup_docs(sf_dir: str, max_hamming: int = 6):
    """SimHash near-dup: 64-bit fingerprints, banded buckets, Hamming
    verify, connected components.  Rows-only oracle."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def sig(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        out_doc, out_band, out_h = [], [], []
        for doc_id, text in zip(df["doc_id"], df["text"]):
            toks = _WS.split(text.lower().strip()) if text.strip() else []
            h = simhash64(toks)
            for b in simhash_band_keys(h, 4):
                out_doc.append(doc_id)
                out_band.append(b)
                out_h.append(h)
        return pa.table({"doc_id": pa.array(out_doc, pa.int64()),
                         "band": pa.array(out_band, pa.string()),
                         "sim": pa.array([x - (1 << 63) for x in out_h], pa.int64())})

    banded = ds.map_batches(sig, batch_format="pyarrow")
    cand = _partitioned_band_pairs(banded, "band", max_members=5000,
                                   sim_col="sim", max_hamming=max_hamming)
    edges = [(str(a), str(b)) for a, b in zip(cand["a"], cand["b"])]
    ids = [str(r["doc_id"]) for r in _read_docs(sf_dir, ["doc_id"]).take_all()]
    groups = union_find_components(edges, ids)
    return _dedup_census(groups, ids)


def ngram_jaccard_dedup_docs(sf_dir: str, n: int = 3, threshold: float = 0.8,
                             n_keys: int = 2):
    """n-gram Jaccard near-dup: block on each doc's ``n_keys`` smallest
    word-n-gram hashes (bottom-k sketch keys — near-dups share most
    n-grams, hence their minima), verify candidates with exact Jaccard,
    connected components, census.  Precision is exact by construction
    (every reported duplicate passed the exact-Jaccard gate); blocking
    recall is checked against the all-pairs oracle in
    tests/test_text_functions.py.  Rows-only driver check (sketch-based)."""
    from kawa_ray.functions.minhash import hash64, jaccard, word_ngrams
    from kawa_ray.stages.clustering import union_find_components

    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def keys(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        out_doc, out_key = [], []
        for doc_id, text in zip(df["doc_id"], df["text"]):
            toks = _WS.split(text.lower().strip()) if text.strip() else []
            hs = sorted(hash64(g) for g in set(word_ngrams(toks, n)))
            for h in hs[:n_keys]:
                out_doc.append(doc_id)
                out_key.append(h)
        return pa.table({"doc_id": pa.array(out_doc, pa.int64()),
                         "key": pa.array(out_key, pa.uint64())})

    cand = _partitioned_band_pairs(
        ds.map_batches(keys, batch_format="pyarrow"), "key", max_members=500
    )
    texts = _candidate_texts(sf_dir, set(cand["a"]) | set(cand["b"]))
    edges = []
    for a, b in zip(cand["a"], cand["b"]):
        sa = set(word_ngrams(_WS.split(texts[a].lower().strip()), n))
        sb = set(word_ngrams(_WS.split(texts[b].lower().strip()), n))
        if jaccard(sa, sb) >= threshold:
            edges.append((str(a), str(b)))
    all_ids = _all_doc_ids(sf_dir)
    groups = union_find_components(edges, [str(d) for d in all_ids])
    return _dedup_census(groups, [str(d) for d in all_ids])


def docs_split_assign(sf_dir: str):
    """Deterministic train/test split assignment (hash-free modulo so the
    oracle is SQL-expressible) + per (lang, split) census — the
    train-corpus partitioning shape."""
    ds = _read_docs(sf_dir, ["doc_id", "lang"])

    def assign(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        split = pc.if_else(
            pc.equal(pc.cast(pc.bit_wise_and(t.column("doc_id"), 7), pa.int64()), 0),
            pa.scalar("test"), pa.scalar("train"),
        )
        tt = pa.table({"lang": t.column("lang"), "split": split,
                       "n": pa.array([1] * t.num_rows, pa.int64())})
        return tt.group_by(["lang", "split"]).aggregate([("n", "sum")]).rename_columns(
            ["lang", "split", "n"]
        )

    from ray.data.aggregate import Sum

    out = (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby(["lang", "split"])
        .aggregate(Sum("n", alias_name="n_docs"))
        .to_pandas()
    )
    return out.sort_values(["lang", "split"]).reset_index(drop=True)


DOCS_SPLIT_SQL = """
SELECT lang,
       CASE WHEN doc_id % 8 = 0 THEN 'test' ELSE 'train' END AS split,
       COUNT(*) AS n_docs
FROM documents
GROUP BY 1, 2
ORDER BY lang, split
"""


def docs_sample_stats(sf_dir: str, modulo: int = 20):
    """Deterministic 1/20 sample (doc_id % 20 = 0) + token stats over the
    sample — the bounded-sample pattern used for profiling a 100 TB
    corpus without reading it all (sampling predicate pushes into the
    scan via an expression filter)."""
    ds = _read_docs(sf_dir, ["doc_id", "text", "lang"])

    def keep(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # vectorised modulo mask (Ray's expr filter can't parse `x % k`)
        mask = pc.equal(
            pc.subtract(t.column("doc_id"),
                        pc.multiply(pc.divide(t.column("doc_id"), modulo), modulo)),
            0,
        )
        return t.filter(mask)

    def stats(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        toks = pc.list_value_length(pc.split_pattern_regex(t.column("text"), r"\s+"))
        tt = pa.table({"lang": t.column("lang"),
                       "tok": pc.cast(toks, pa.int64()),
                       "n": pa.array([1] * t.num_rows, pa.int64())})
        return tt.group_by("lang").aggregate([("tok", "sum"), ("n", "sum")]).rename_columns(
            ["lang", "tok_sum", "n"]
        )

    from ray.data.aggregate import Sum

    out = (
        ds.map_batches(keep, batch_format="pyarrow")
        .map_batches(stats, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("tok_sum", alias_name="tok_sum"), Sum("n", alias_name="n_docs"))
        .to_pandas()
    )
    out["avg_tokens"] = (out["tok_sum"] / out["n_docs"]).round(4)
    return out[["lang", "n_docs", "avg_tokens"]].sort_values("lang").reset_index(drop=True)


DOCS_SAMPLE_SQL = """
SELECT lang, COUNT(*) AS n_docs,
       ROUND(AVG(len(regexp_split_to_array(text, '\s+'))), 4) AS avg_tokens
FROM documents
WHERE doc_id % 20 = 0
GROUP BY lang
ORDER BY lang
"""
