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
