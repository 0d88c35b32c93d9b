"""BM25 lexical retrieval over the documents table — the sparse
counterpart of the ANN suite (Robertson & Zaragoza 2009, the Okapi /
Lucene BM25 variant with idf = ln(1 + (N - df + 0.5)/(df + 0.5))).

Two streaming passes, no shuffle:

1. **stats** — per-batch partials (doc count, total doc length, per-
   query-token document frequencies) summed on the driver: a handful
   of scalars, the global state BM25 needs.
2. **score** — per-batch vectorised term-frequency counting for the
   query tokens only (``np.bincount`` over exploded token codes), the
   BM25 formula evaluated with a FIXED operation order (mirrored
   symbol-for-symbol in the SQL oracle so both engines produce
   bit-identical doubles), and a per-batch partial top-k; the driver
   merges ≤ k rows per batch.

At 100 TB both passes stream: no stage holds more than (batch × k)
rows, the query's df/idf table is a broadcast of a few floats, and
top-k merge traffic is k rows per block.
"""

from __future__ import annotations

import math
import os

import numpy as np
import pandas as pd

import ray.data as rd

_K1 = 1.2
_B = 0.75
_DEFAULT_QUERY = ("table", "sort", "merge")


def _read_docs(sf_dir: str, columns: list[str]) -> rd.Dataset:
    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=columns)


def _tok(texts: pd.Series):
    toks = texts.str.lower().str.split()
    lens = toks.str.len().fillna(0).to_numpy(np.int64)
    return toks, lens


def bm25_topk(sf_dir: str, query: tuple[str, ...] = _DEFAULT_QUERY, k: int = 10):
    """Global top-k documents by BM25 score for ``query`` (whitespace
    tokens, lowercased).  Output: (doc_id, lang, score) ordered by
    score desc, doc_id asc."""
    q = tuple(w.lower() for w in query)
    ds = _read_docs(sf_dir, ["doc_id", "text", "lang"])

    def stats_partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.reset_index(drop=True)
        toks, lens = _tok(df["text"])
        row = {"n_docs": len(df), "sum_dl": int(lens.sum())}
        flat = toks.explode()
        flat = flat[flat.notna()]
        doc_idx = flat.index.to_numpy()
        vals = flat.to_numpy()
        for i, t in enumerate(q):
            hit_docs = np.unique(doc_idx[vals == t])
            row[f"df_{i}"] = int(hit_docs.size)
        return pd.DataFrame([row])

    stats = (
        ds.map_batches(stats_partial, batch_format="pandas")
        .to_pandas()
        .sum()
    )
    n = int(stats["n_docs"])
    avgdl = stats["sum_dl"] / n  # float64, same division in SQL
    idf = [math.log(1.0 + (n - int(stats[f"df_{i}"]) + 0.5)
                    / (int(stats[f"df_{i}"]) + 0.5))
           for i in range(len(q))]

    def score_partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.reset_index(drop=True)
        toks, lens = _tok(df["text"])
        flat = toks.explode()
        flat = flat[flat.notna()]
        doc_idx = flat.index.to_numpy()
        vals = flat.to_numpy()
        ndocs = len(df)
        tf = np.zeros((len(q), ndocs), dtype=np.int64)
        for i, t in enumerate(q):
            hits = doc_idx[vals == t]
            if hits.size:
                tf[i] = np.bincount(hits, minlength=ndocs)
        cand = tf.sum(axis=0) > 0
        if not cand.any():
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                 "lang": pd.Series([], dtype=object),
                                 "score": pd.Series([], dtype="float64")})
        dl = lens[cand].astype(np.float64)
        # fixed operation order, mirrored in the SQL oracle:
        # norm = 0.25 + 0.75 * dl / avgdl; term = idf * (tf*2.2) / (tf + 1.2*norm)
        norm = (1.0 - _B) + _B * dl / avgdl
        score = np.zeros(dl.size, dtype=np.float64)
        for i in range(len(q)):
            tfi = tf[i][cand].astype(np.float64)
            score = score + idf[i] * (tfi * (_K1 + 1.0)) / (tfi + _K1 * norm)
        out = pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(np.int64)[cand],
            "lang": df["lang"].to_numpy()[cand],
            "score": score,
        })
        out = out.sort_values(["score", "doc_id"], ascending=[False, True])
        return out.head(k)

    parts = ds.map_batches(score_partial, batch_format="pandas").to_pandas()
    top = parts.sort_values(["score", "doc_id"],
                            ascending=[False, True]).head(k)
    top["doc_id"] = top["doc_id"].astype("int64")
    return top[["doc_id", "lang", "score"]].reset_index(drop=True)


def _bm25_sql(query: tuple[str, ...] = _DEFAULT_QUERY, k: int = 10) -> str:
    q = tuple(w.lower() for w in query)
    tf_cols = ",\n         ".join(
        f"CAST(SUM(CASE WHEN w = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS tf_{i}"
        for i, t in enumerate(q))
    df_cols = ",\n         ".join(
        f"CAST(SUM(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_{i}"
        for i in range(len(q)))
    # same fixed operation order as the numpy kernel
    terms = " + ".join(
        f"LN(1.0 + (CAST(s.n AS DOUBLE) - CAST(d.df_{i} AS DOUBLE) + 0.5)"
        f" / (CAST(d.df_{i} AS DOUBLE) + 0.5))"
        f" * (CAST(tf_{i} AS DOUBLE) * ({_K1} + 1.0))"
        f" / (CAST(tf_{i} AS DOUBLE) + {_K1} * ((1.0 - {_B})"
        f" + {_B} * CAST(dl AS DOUBLE) / (CAST(s.sum_dl AS DOUBLE)"
        f" / CAST(s.n AS DOUBLE))))"
        for i in range(len(q)))
    any_tf = " + ".join(f"tf_{i}" for i in range(len(q)))
    return f"""
WITH toks AS (
  SELECT doc_id, lang,
         CASE WHEN TRIM(text, ' \t\n\r') = '' THEN CAST([] AS VARCHAR[])
              ELSE regexp_split_to_array(LOWER(TRIM(text, ' \t\n\r')), '\\s+')
              END AS t
  FROM documents
), dls AS (
  SELECT doc_id, lang, LEN(t) AS dl FROM toks
), s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(dl) AS BIGINT) AS sum_dl
  FROM dls
), u AS (
  SELECT doc_id, UNNEST(t) AS w FROM toks
), tf AS (
  SELECT doc_id,
         {tf_cols}
  FROM u GROUP BY doc_id
), d AS (
  SELECT {df_cols}
  FROM tf
)
SELECT tf.doc_id, dls.lang,
       {terms} AS score
FROM tf
JOIN dls USING (doc_id), s, d
WHERE {any_tf} > 0
ORDER BY score DESC, tf.doc_id ASC
LIMIT {k}
"""


BM25_TOPK_SQL = _bm25_sql()
