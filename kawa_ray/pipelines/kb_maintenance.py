"""K2/K3 — entity-KB maintenance: batched point lookups, tombstoning,
id-remapping and defragmentation, Ray-Data-native.

Reference semantics (/root/reference/ontology/ontology_kb.py):

* ``get_word`` / ``get_word_iter`` (:468-679) — point and batched
  lookups, issued as SQL ``IN`` chunks of ``rng_step = 999`` (:598).
* ``del_word`` (:1028-1055) — tombstone: zero the embedding row and
  drop the id from the encoder/decoder maps.
* ``defragment`` (:951-996) — move tail records into deleted holes
  (holes ascending paired with the largest surviving ids descending,
  stopping when the survivor id falls at/below the hole), then shrink.
  DOCUMENTED DIVERGENCE: the reference sets ``resizeLen`` from the last
  *moved* record's new id (:987), which truncates surviving rows
  whenever holes sit low in the id space; this rebuild compacts densely
  (``new_size = n_survivors``, the clearly-intended post-state in which
  ids 0..n_survivors-1 are exactly occupied) and asserts that invariant
  in tests instead of reproducing a data-destroying edge case.
* ``remap_words`` (:999-1026) — rewrite id-array fields through
  ``{old_id: new_id}``; ids mapping to -1 (deleted) are dropped.

Ray shape: the KB table streams through ``map_batches``; the ONLY
driver-side state is deletion-space sized — the hole list and the
move map (``|moves| <= |deletions|``), never the KB. The k largest
surviving ids come from per-batch top-k partials merged on the driver
(k·n_blocks rows), not a global sort.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from kawa_ray.pipelines.vectors import _read_emb

# deterministic fixture rules (shared verbatim with the SQL oracles):
# the KB is the embeddings table; ids are vec_id (contiguous 0..N-1);
# each row's single parent ref is id-3 (absent below 3); ids with
# id % 7 == 3 are the tombstoned delta
_DEL_MOD, _DEL_REM = 7, 3
_PARENT_OFFSET = 3
RNG_STEP = 999  # reference ontology_kb.py:598 lookup chunk size


def _move_map(holes: list[int], tails_desc: list[int]) -> dict[int, int]:
    """Pair holes (ascending) with the largest surviving ids
    (descending) while the survivor sits above the hole — the
    reference's move loop (ontology_kb.py:969-985) minus its resize
    bug.  Returns {old_id: new_id}."""
    moves: dict[int, int] = {}
    for hole, tail in zip(sorted(holes), tails_desc):
        if tail <= hole:
            break
        moves[tail] = hole
    return moves


def kb_defragment(sf_dir: str):
    """Tombstone + defragment + remap census over the fixture KB.

    Census row: original size, deletions, moves, compacted size, the
    checksum of post-compaction ids (== 0+1+..+new_size-1 when the
    compaction is dense — asserted in tests), the sum of remapped
    parent refs and the count of parent refs dropped because they
    pointed at tombstoned rows."""
    ds = _read_emb(sf_dir, ["vec_id"])

    # deletion-space driver state: the hole list (each batch projects
    # only its deleted ids, so driver traffic is deletion-sized)
    def hole_ids(t: pa.Table) -> pa.Table:
        ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
        return pa.table({"vec_id": pa.array(ids[ids % _DEL_MOD == _DEL_REM], pa.int64())})

    holes = sorted(
        ds.map_batches(hole_ids, batch_format="pyarrow").to_pandas()["vec_id"].tolist()
    )
    k = len(holes)

    # k largest surviving ids via per-batch top-k partials (k·n_blocks
    # rows reach the driver, never the table)
    def topk_partial(t: pa.Table) -> pa.Table:
        ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
        ids = ids[ids % _DEL_MOD != _DEL_REM]
        ids = np.sort(ids)[::-1][:k]
        return pa.table({"vec_id": pa.array(ids, pa.int64())})

    if k:
        tail_parts = ds.map_batches(topk_partial, batch_format="pyarrow").to_pandas()
        tails_desc = tail_parts["vec_id"].sort_values(ascending=False).head(k).tolist()
    else:
        tails_desc = []
    moves = _move_map(holes, tails_desc)
    hole_set = frozenset(holes)

    def remap_census(t: pa.Table, _mv=moves, _del=hole_set) -> pa.Table:
        ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
        surv = ids[ids % _DEL_MOD != _DEL_REM]
        new_ids = np.asarray([_mv.get(int(i), int(i)) for i in surv], dtype=np.int64)
        parents = surv - _PARENT_OFFSET
        has_parent = parents >= 0
        parent_deleted = has_parent & np.asarray(
            [int(p) in _del for p in parents], dtype=bool
        )
        kept = has_parent & ~parent_deleted
        new_parents = np.asarray(
            [_mv.get(int(p), int(p)) for p in parents[kept]], dtype=np.int64
        )
        return pa.table({
            "n_rows": pa.array([len(ids)], pa.int64()),
            "n_survivors": pa.array([len(surv)], pa.int64()),
            "sum_new_ids": pa.array([int(new_ids.sum())], pa.int64()),
            "sum_parent_ids": pa.array([int(new_parents.sum())], pa.int64()),
            "n_parent_refs": pa.array([int(kept.sum())], pa.int64()),
            "n_dropped_parent_refs": pa.array([int(parent_deleted.sum())], pa.int64()),
        })

    parts = ds.map_batches(remap_census, batch_format="pyarrow").to_pandas().sum()
    out = pd.DataFrame([{
        "n_rows": int(parts["n_rows"]),
        "n_deleted": k,
        "n_moved": len(moves),
        "new_size": int(parts["n_survivors"]),
        "sum_new_ids": int(parts["sum_new_ids"]),
        "sum_parent_ids": int(parts["sum_parent_ids"]),
        "n_parent_refs": int(parts["n_parent_refs"]),
        "n_dropped_parent_refs": int(parts["n_dropped_parent_refs"]),
    }])
    return out


KB_DEFRAGMENT_SQL = f"""
WITH kb AS (
  SELECT vec_id AS id FROM embeddings
), del AS (
  SELECT id FROM kb WHERE id % {_DEL_MOD} = {_DEL_REM}
), surv AS (
  SELECT id FROM kb WHERE id % {_DEL_MOD} != {_DEL_REM}
), holes AS (
  SELECT id AS hole, ROW_NUMBER() OVER (ORDER BY id) AS rn FROM del
), tails AS (
  SELECT id AS tail, ROW_NUMBER() OVER (ORDER BY id DESC) AS rn FROM surv
  QUALIFY rn <= (SELECT COUNT(*) FROM del)
), moves AS (
  -- holes ascending x largest survivors descending, survivor above hole;
  -- the zip stops at the first non-qualifying pair, and because holes
  -- rise while tails fall, every later pair also fails the predicate —
  -- so the WHERE is equivalent to the reference's break
  SELECT h.hole, t.tail FROM holes h JOIN tails t USING (rn) WHERE t.tail > h.hole
), final AS (
  SELECT s.id,
         COALESCE(m.hole, s.id) AS new_id,
         CASE WHEN s.id >= {_PARENT_OFFSET} THEN s.id - {_PARENT_OFFSET} END AS parent
  FROM surv s LEFT JOIN moves m ON m.tail = s.id
), parents AS (
  SELECT f.id, f.parent,
         (f.parent % {_DEL_MOD} = {_DEL_REM}) AS parent_deleted,
         COALESCE(pm.hole, f.parent) AS new_parent
  FROM final f LEFT JOIN moves pm ON pm.tail = f.parent
  WHERE f.parent IS NOT NULL
)
SELECT (SELECT COUNT(*) FROM kb) AS n_rows,
       (SELECT COUNT(*) FROM del) AS n_deleted,
       (SELECT COUNT(*) FROM moves) AS n_moved,
       (SELECT COUNT(*) FROM surv) AS new_size,
       (SELECT CAST(SUM(new_id) AS BIGINT) FROM final) AS sum_new_ids,
       (SELECT CAST(COALESCE(SUM(new_parent) FILTER (WHERE NOT parent_deleted), 0) AS BIGINT)
        FROM parents) AS sum_parent_ids,
       (SELECT COUNT(*) FILTER (WHERE NOT parent_deleted) FROM parents) AS n_parent_refs,
       (SELECT COUNT(*) FILTER (WHERE parent_deleted) FROM parents) AS n_dropped_parent_refs
"""


class KBLookup:
    """K2 point-lookup service: an actor holding the id -> record map
    (entity-KB-space — bounded by the KB, never the corpus), serving
    batched lookups.  Mirrors the reference's encoder/decoder dicts
    (ontology_kb.py:468-539) with the vector norm computed serially in
    float64 (exact promotion from float32, left-to-right adds) so the
    SQL oracle's LIST_SUM over the cast list is bit-identical."""

    def __init__(self, parquet_path: str):
        import pyarrow.parquet as pq

        t = pq.read_table(parquet_path, columns=["vec_id", "embedding", "label"])
        self._rows: dict[int, tuple[int, float]] = {}
        for vid, emb, lab in zip(
            t.column("vec_id").to_pylist(),
            t.column("embedding").to_pylist(),
            t.column("label").to_pylist(),
        ):
            acc = 0.0
            for x in emb:
                acc += float(x) * float(x)
            self._rows[int(vid)] = (int(lab), math.sqrt(acc))

    def get_words(self, ids: list[int]) -> list[tuple[int, int, float, int]]:
        """One IN-chunk worth of lookups (present ids only)."""
        out = []
        for i in ids:
            rec = self._rows.get(int(i))
            if rec is not None:
                out.append((int(i), rec[0], rec[1], 1))
        return out


def kb_point_lookups(sf_dir: str):
    """Batched point lookups through the KBLookup actor, issued in the
    reference's rng_step=999 ``IN`` chunks (ontology_kb.py:598)."""
    import os

    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, "embeddings.parquet")
    n = pq.ParquetFile(path).metadata.num_rows
    ids = sorted({(i * 13) % n for i in range(30)})

    actor = ray.remote(KBLookup).remote(path)
    rows: list[tuple[int, int, float, int]] = []
    for at in range(0, len(ids), RNG_STEP):
        rows.extend(ray.get(actor.get_words.remote(ids[at:at + RNG_STEP])))
    ray.kill(actor)
    out = pd.DataFrame(rows, columns=["vec_id", "label", "l2_norm", "found"])
    out["l2_norm"] = out["l2_norm"].map(lambda x: math.floor(x * 10000) / 10000)
    return out.sort_values("vec_id").reset_index(drop=True)


KB_POINT_LOOKUPS_SQL = """
WITH n AS (SELECT COUNT(*) AS c FROM embeddings),
ids AS (SELECT DISTINCT (r.range * 13) % n.c AS id FROM range(0, 30) r, n)
SELECT e.vec_id, e.label,
       FLOOR(SQRT(LIST_SUM(LIST_TRANSFORM(CAST(e.embedding AS DOUBLE[]),
                                          x -> x * x))) * 10000) / 10000 AS l2_norm,
       1 AS found
FROM embeddings e JOIN ids ON e.vec_id = ids.id
ORDER BY e.vec_id
"""
