"""Batched edit-distance pair scoring — the cheap string-agreement
channel of a Fellegi-Sunter style match scorer (the north star's
"batched Jaro-Winkler/Levenshtein" scoring family; reference analogue:
kawa scores synonym candidates by surface agreement before the
embedding channel, ontology_builder.py's match counting).

``edit_distance_pairs_census`` blocks ``documents`` on the cheap
equality key ``lang | n_chars // 8`` (the multirule ``size`` rule made
finer), emits every within-block pair up to a block cap, and scores
each pair with the Levenshtein distance of the two 12-char text
prefixes.  Output: the distance histogram (distance, n_pairs) — the
score-distribution signal a linkage calibration step consumes.

DuckDB's ``levenshtein()`` is BYTE-level over UTF-8 (measured:
levenshtein('日本語テスト','日本語テキスト') = 3, the byte count of the
inserted キ, not 1), so the kernel here DPs over UTF-8 bytes to keep
the oracle exact; prefixes are sliced by CHARACTER first on both sides
(Python slicing == DuckDB SUBSTRING semantics).

Scale shape: ONE hash-partition exchange on the block key — pairs are
generated AND scored inside each partition, only per-distance partial
counts leave (histogram rows, never pairs); the DP is a numpy
(pairs x bytes x bytes) sweep vectorised across the pair axis, not a
per-pair Python loop.  Blocks above the cap are dropped whole
(replicated in the oracle — the standard stopword-block guard)."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

import ray.data as rd

from kawa_ray.stages.distinct import partition_reduce

_ED_BUCKET = 8       # n_chars // bucket joins lang in the block key
_ED_PREFIX = 12      # chars scored per document
_ED_MAX_MEMBERS = 40
_ED_PARTITIONS = 64


def lev_bytes_batch(sa: list[bytes], sb: list[bytes]) -> np.ndarray:
    """Levenshtein distance over byte strings, one DP sweep vectorised
    across the whole pair batch.  dp is a (n, lb_max+1) rolling row;
    each (i, j) step is O(n) numpy.  Cells past a pair's true lengths
    hold garbage but are never read: pair r's answer is taken at
    i == len(sa[r]), column len(sb[r]), which depends only on valid
    cells."""
    n = len(sa)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    la = np.fromiter((len(x) for x in sa), dtype=np.int64, count=n)
    lb = np.fromiter((len(x) for x in sb), dtype=np.int64, count=n)
    la_max, lb_max = int(la.max()), int(lb.max())
    res = np.where(la == 0, lb, 0).astype(np.int64)
    if la_max == 0:
        return res
    A = np.frombuffer(
        b"".join(x.ljust(la_max, b"\0") for x in sa), dtype=np.uint8
    ).reshape(n, la_max)
    B = np.frombuffer(
        b"".join(x.ljust(lb_max, b"\0") for x in sb), dtype=np.uint8
    ).reshape(n, lb_max) if lb_max else np.zeros((n, 0), dtype=np.uint8)
    prev = np.tile(np.arange(lb_max + 1, dtype=np.int32), (n, 1))
    cur = np.empty_like(prev)
    for i in range(1, la_max + 1):
        cur[:, 0] = i
        ai = A[:, i - 1]
        for j in range(1, lb_max + 1):
            sub = prev[:, j - 1] + (ai != B[:, j - 1])
            cur[:, j] = np.minimum(
                np.minimum(prev[:, j] + 1, cur[:, j - 1] + 1), sub)
        done = la == i
        if done.any():
            res[done] = cur[done, lb[done]]
        prev, cur = cur, prev
    return res


def edit_distance_pairs_census(sf_dir: str, bucket: int = _ED_BUCKET,
                               prefix_chars: int = _ED_PREFIX,
                               max_members: int = _ED_MAX_MEMBERS):
    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "lang", "text", "n_chars"])

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"k": pd.Series([], dtype="str"),
                                 "doc_id": pd.Series([], dtype="int64"),
                                 "p": pd.Series([], dtype="str")})
        return pd.DataFrame({
            "k": df["lang"].fillna("") + "|"
            + (df["n_chars"].astype("int64") // bucket).astype(str),
            "doc_id": df["doc_id"].astype("int64"),
            "p": df["text"].fillna("").str.slice(0, prefix_chars),
        })

    def score_part(g: pd.DataFrame) -> pd.DataFrame:
        order = np.argsort(g["k"].to_numpy(), kind="stable")
        k = g["k"].to_numpy()[order]
        did = g["doc_id"].to_numpy()[order]
        ps = g["p"].to_numpy()[order]
        pa_b: list[bytes] = []
        pb_b: list[bytes] = []
        starts = np.flatnonzero(np.concatenate(([True], k[1:] != k[:-1])))
        ends = np.concatenate((starts[1:], [len(k)]))
        for i, j in zip(starts, ends):
            m = j - i
            if m < 2 or m > max_members:
                continue
            mem = sorted(zip(did[i:j].tolist(), ps[i:j].tolist()))
            for x in range(m - 1):
                ebx = mem[x][1].encode("utf-8")
                for y in range(x + 1, m):
                    pa_b.append(ebx)
                    pb_b.append(mem[y][1].encode("utf-8"))
        d = lev_bytes_batch(pa_b, pb_b)
        if d.size == 0:
            return pd.DataFrame({"distance": pd.Series([], dtype="int64"),
                                 "n_pairs": pd.Series([], dtype="int64")})
        vals, cnts = np.unique(d, return_counts=True)
        return pd.DataFrame({"distance": vals.astype("int64"),
                             "n_pairs": cnts.astype("int64")})

    acc: dict[int, int] = {}
    for batch in partition_reduce(
            docs.map_batches(keyed, batch_format="pandas"), "k", score_part,
            partitions=_ED_PARTITIONS).iter_batches(batch_format="pandas"):
        for dv, n in zip(batch["distance"], batch["n_pairs"]):
            acc[int(dv)] = acc.get(int(dv), 0) + int(n)
    out = pd.DataFrame(sorted(acc.items()), columns=["distance", "n_pairs"])
    out["distance"] = out["distance"].astype("int64")
    out["n_pairs"] = out["n_pairs"].astype("int64")
    return out.reset_index(drop=True)


def _edit_distance_sql(bucket: int = _ED_BUCKET,
                       prefix_chars: int = _ED_PREFIX,
                       max_members: int = _ED_MAX_MEMBERS) -> str:
    return f"""
WITH keyed AS (
  SELECT doc_id,
         SUBSTRING(text, 1, {prefix_chars}) AS p,
         lang || '|' || CAST(n_chars // {bucket} AS VARCHAR) AS k
  FROM documents),
sized AS (SELECT *, COUNT(*) OVER (PARTITION BY k) AS m FROM keyed),
pairs AS (
  SELECT levenshtein(a.p, b.p) AS d
  FROM sized a JOIN sized b ON a.k = b.k AND a.doc_id < b.doc_id
  WHERE a.m BETWEEN 2 AND {max_members})
SELECT CAST(d AS BIGINT) AS distance, COUNT(*) AS n_pairs
FROM pairs GROUP BY d ORDER BY d
"""


EDIT_DISTANCE_SQL = _edit_distance_sql()
