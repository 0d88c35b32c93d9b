"""CSV edge source + synonym clustering (reference B1/B3: wget + grep'd
ConceptNet CSV -> incremental synonym-cluster merge,
/root/reference/ontology/ontology_builder.py:81-181).

A deterministic ConceptNet-like edge CSV fixture is written once per
process; ``synonym_clusters`` reads it with ``ray.data.read_csv``,
filters to Synonym relations (the grep), and closes the word graph into
clusters — the same connected-components family the flagship S6 uses.
"""

from __future__ import annotations

import os

import ray.data as rd

_WORDS = ["fast", "quick", "rapid", "speedy", "slow", "sluggish", "big",
          "large", "huge", "tiny", "small", "little", "happy", "glad",
          "joyful", "sad", "blue", "down"]
# synonym rings (each ring one component)
_RINGS = [(0, 1, 2, 3), (4, 5), (6, 7, 8), (9, 10, 11), (12, 13, 14), (15, 16, 17)]


def write_fixture_edges_csv(path: str) -> str:
    if os.path.exists(path):
        return path
    os.makedirs(os.path.dirname(path), exist_ok=True)
    lines = ["rel,start,end,weight"]
    for ring in _RINGS:
        for i in range(len(ring) - 1):
            lines.append(f"Synonym,{_WORDS[ring[i]]},{_WORDS[ring[i + 1]]},1.0")
    # non-synonym noise edges the 'grep' must drop
    lines.append("Antonym,fast,slow,1.0")
    lines.append("RelatedTo,big,sad,0.5")
    tmp = path + f".tmp{os.getpid()}"
    with open(tmp, "w") as f:
        f.write("\n".join(lines) + "\n")
    os.replace(tmp, path)
    return path


def _synonym_clusters_sql() -> str:
    """Exact SQL oracle: the deterministic fixture edges inlined as
    VALUES (generated from the same ``_RINGS``/``_WORDS`` constants the
    CSV writer uses) + recursive min-label closure + per-cluster census
    with a sorted member list."""
    edge_rows = []
    for ring in _RINGS:
        for i in range(len(ring) - 1):
            edge_rows.append((_WORDS[ring[i]], _WORDS[ring[i + 1]]))
    edges_values = ",\n    ".join(
        f"('{a}','{b}'),('{b}','{a}')" for a, b in edge_rows
    )
    words_values = ",".join(f"('{w}')" for w in _WORDS)
    return f"""
WITH RECURSIVE words(w) AS (VALUES {words_values}),
edges(a, b) AS (VALUES
    {edges_values}
), reach(node, lbl) AS (
  SELECT w, w FROM words
  UNION
  SELECT e.b AS node, r.lbl FROM reach r JOIN edges e ON e.a = r.node
  WHERE r.lbl < e.b
), comp AS (
  SELECT node, MIN(lbl) AS lbl FROM reach GROUP BY node
)
SELECT lbl AS cluster, COUNT(*) AS n_words,
       STRING_AGG(node, ',' ORDER BY node) AS members
FROM comp GROUP BY lbl ORDER BY cluster
"""


SYNONYM_CLUSTERS_SQL = _synonym_clusters_sql()


def synonym_clusters(sf_dir: str):
    """read_csv -> relation filter -> connected components -> census."""
    import pandas as pd

    from kawa_ray.stages.clustering import union_find_components

    path = os.path.join("/tmp", "kawa_ray_csv", "edges.csv")
    write_fixture_edges_csv(path)
    ds = rd.read_csv(path)
    syn = ds.filter(expr="rel == 'Synonym'")
    edges = [(r["start"], r["end"]) for r in syn.select_columns(["start", "end"]).take_all()]
    comp = union_find_components(edges, _WORDS)
    census: dict[str, list[str]] = {}
    for w, c in comp.items():
        census.setdefault(c, []).append(w)
    out = pd.DataFrame(
        {
            "cluster": sorted(census),
            "n_words": [len(census[c]) for c in sorted(census)],
            "members": [",".join(sorted(census[c])) for c in sorted(census)],
        }
    )
    return out.reset_index(drop=True)
