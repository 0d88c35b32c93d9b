"""Gzipped N-triples source (reference B6: ``yago_step0`` stream-parses
gzipped N-triples with URL-decoded entities and camel→SNAKE categories,
/root/reference/ontology/ontology_builder.py:355-387).

Round-trip demonstration with an exact oracle: triples are GENERATED
from the driver's ``part`` table (``<part/{p_partkey}> <hasTypeToken>
"{token}"`` — one triple per whitespace token of ``p_type``), written
once per process as a real ``.nt.gz`` file, then read back with
``ray.data.read_text`` (arrow decompresses by extension), parsed with a
compiled regex inside ``map_batches``, and censused per object token.
The DuckDB oracle recomputes the census straight from ``part`` — if
serialisation, compression, reading or parsing dropped or mangled a
triple, the counts cannot match.

At scale this is the honest shape for third-party dump ingestion: the
files are line-splittable, ``read_text`` shards them across workers,
and the parse is one vectorisable regex per line batch.
"""

from __future__ import annotations

import gzip
import os
import re

import pandas as pd
import pyarrow.parquet as pq

import ray.data as rd

_LINE = re.compile(r'^<part/(\d+)> <hasTypeToken> "([^"]*)" \.$')


def write_fixture_ntriples(sf_dir: str, path: str) -> str:
    """Serialise part.p_type tokens as N-triples, gzipped; skip-if-built
    (keyed on the source file's identity via the path)."""
    if os.path.exists(path):
        return path
    os.makedirs(os.path.dirname(path), exist_ok=True)
    t = pq.read_table(os.path.join(sf_dir, "part.parquet"),
                      columns=["p_partkey", "p_type"])
    lines = []
    for key, ptype in zip(t.column("p_partkey").to_pylist(),
                          t.column("p_type").to_pylist()):
        for tok in ptype.split(" "):
            lines.append(f'<part/{key}> <hasTypeToken> "{tok}" .')
    tmp = f"{path}.tmp{os.getpid()}"
    with gzip.open(tmp, "wt", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
    os.replace(tmp, path)
    return path


def ntriples_census(sf_dir: str):
    """Per-object-token census of the round-tripped triples:
    (token, n_triples, n_subjects)."""
    base = os.path.basename(os.path.normpath(sf_dir))
    path = write_fixture_ntriples(sf_dir, f"/tmp/kawa_ray_nt/{base}/part_types.nt.gz")
    lines = rd.read_text(path)

    def parse(df: pd.DataFrame) -> pd.DataFrame:
        m = df["text"].str.extract(_LINE)
        m.columns = ["subject", "token"]
        m = m.dropna()
        m["subject"] = m["subject"].astype("int64")
        # per-batch partial: triple counts + distinct subjects per token
        g = m.groupby("token").agg(
            n_triples=("subject", "size"),
            subjects=("subject", lambda s: set(s)),
        ).reset_index()
        return g

    # driver fold (token-vocabulary sized — tiny)
    n_tri: dict[str, int] = {}
    subs: dict[str, set] = {}
    for b in lines.map_batches(parse, batch_format="pandas").iter_batches(
            batch_format="pandas"):
        for tok, nt, ss in zip(b["token"], b["n_triples"], b["subjects"]):
            n_tri[tok] = n_tri.get(tok, 0) + int(nt)
            subs.setdefault(tok, set()).update(ss)
    out = pd.DataFrame(
        [(t, n_tri[t], len(subs[t])) for t in sorted(n_tri)],
        columns=["token", "n_triples", "n_subjects"])
    for c in ("n_triples", "n_subjects"):
        out[c] = out[c].astype("int64")
    return out.reset_index(drop=True)


NTRIPLES_CENSUS_SQL = """
WITH toks AS (
  SELECT p_partkey, UNNEST(string_split(p_type, ' ')) AS token
  FROM part
)
SELECT token, COUNT(*) AS n_triples,
       CAST(COUNT(DISTINCT p_partkey) AS BIGINT) AS n_subjects
FROM toks
GROUP BY token
ORDER BY token
"""


# ----------------------------------------------------- gzipped JSONL source

def write_fixture_jsonl(sf_dir: str, path: str) -> str:
    """Serialise the events table as gzipped JSONL (one object per
    line), skip-if-built."""
    import json

    if os.path.exists(path):
        return path
    os.makedirs(os.path.dirname(path), exist_ok=True)
    t = pq.read_table(os.path.join(sf_dir, "events.parquet"),
                      columns=["event_id", "user_id", "event_type", "value"])
    tmp = f"{path}.tmp{os.getpid()}"
    with gzip.open(tmp, "wt", encoding="utf-8") as f:
        for r in t.to_pylist():
            f.write(json.dumps(r, sort_keys=True) + "\n")
    os.replace(tmp, path)
    return path


def jsonl_roundtrip_census(sf_dir: str):
    """Gzipped-JSONL round-trip with an exact oracle: events are
    serialised once per process as ``.jsonl.gz``, read back with
    ``ray.data.read_json`` (line-splittable, worker-sharded), and
    censused per event type (count, distinct users, value total in
    integer cents — floored per event BEFORE the order-free integer
    sum); the DuckDB oracle recomputes the census from the original
    table, so any row or field lost in the round trip breaks the
    match."""
    base = os.path.basename(os.path.normpath(sf_dir))
    path = write_fixture_jsonl(sf_dir, f"/tmp/kawa_ray_nt/{base}/events.jsonl.gz")
    ds = rd.read_json(path)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        df = df.assign(cents=np.floor(
            df["value"].to_numpy("float64") * 100.0).astype("int64"))
        g = df.groupby("event_type").agg(
            n=("event_id", "size"),
            value_cents=("cents", "sum"),
            users=("user_id", lambda s: set(int(x) for x in s)),
        ).reset_index()
        return g

    n: dict[str, int] = {}
    vs: dict[str, int] = {}
    us: dict[str, set] = {}
    for b in ds.map_batches(partial, batch_format="pandas").iter_batches(
            batch_format="pandas"):
        for et, cnt, v, uu in zip(b["event_type"], b["n"], b["value_cents"], b["users"]):
            n[et] = n.get(et, 0) + int(cnt)
            vs[et] = vs.get(et, 0) + int(v)
            us.setdefault(et, set()).update(uu)
    out = pd.DataFrame(
        [(et, n[et], len(us[et]), vs[et]) for et in sorted(n)],
        columns=["event_type", "n", "n_users", "value_cents"])
    for c in ("n", "n_users", "value_cents"):
        out[c] = out[c].astype("int64")
    return out.reset_index(drop=True)


JSONL_ROUNDTRIP_SQL = """
SELECT event_type, COUNT(*) AS n,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(SUM(CAST(FLOOR(value * 100.0) AS BIGINT)) AS BIGINT) AS value_cents
FROM events
GROUP BY event_type
ORDER BY event_type
"""
