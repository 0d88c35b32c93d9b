"""K2/K3 — KB point lookups, tombstone + defragment + remap.

Reference semantics: ontology_kb.py get_word/:468-679 (999-chunked IN
lookups), del_word/:1028-1055 (tombstone), defragment/:951-996 (move
tail into holes), remap_words/:999-1026 (id-array rewrite).  The
dense-compaction divergence from the reference's resize bug is
documented in kawa_ray/pipelines/kb_maintenance.py."""

from __future__ import annotations

SF_DIR = "/root/testdata/sf0.001"


def test_move_map_hand_case():
    from kawa_ray.pipelines.kb_maintenance import _move_map

    # 10 ids, holes {3, 5}: survivors desc 9,8 -> 9->3, 8->5
    assert _move_map([3, 5], [9, 8]) == {9: 3, 8: 5}
    # hole above the tail stops the zip (reference's break):
    # survivors 0..3 with holes {4,5} -> nothing moves, shrink only
    assert _move_map([4, 5], [3, 2]) == {}
    # mixed: hole 1 takes tail 6; hole 7 is above survivor 5 -> stop
    assert _move_map([1, 7], [6, 5]) == {6: 1}
    # empty delta
    assert _move_map([], []) == {}


def test_kb_defragment_dense_compaction(ray_session):
    """Post-compaction ids must occupy exactly 0..new_size-1."""
    from kawa_ray.pipelines.kb_maintenance import kb_defragment

    out = kb_defragment(SF_DIR).iloc[0]
    assert out["new_size"] == out["n_rows"] - out["n_deleted"]
    n = int(out["new_size"])
    assert out["sum_new_ids"] == n * (n - 1) // 2
    assert out["n_moved"] <= out["n_deleted"]


def test_kb_point_lookups_chunking(ray_session):
    """The 999-chunk loop must cover id sets larger than one chunk and
    skip absent ids (reference get_word returns None for misses)."""
    import os

    import ray as _ray

    from kawa_ray.pipelines.kb_maintenance import RNG_STEP, KBLookup, kb_point_lookups

    out = kb_point_lookups(SF_DIR)
    assert len(out) == 30 and out["found"].eq(1).all()
    assert (out["l2_norm"] > 0).all()

    actor = _ray.remote(KBLookup).remote(os.path.join(SF_DIR, "embeddings.parquet"))
    ids = list(range(-5, RNG_STEP + 40))  # 2 chunks; negatives absent
    rows = []
    for at in range(0, len(ids), RNG_STEP):
        rows.extend(_ray.get(actor.get_words.remote(ids[at:at + RNG_STEP])))
    _ray.kill(actor)
    got_ids = [r[0] for r in rows]
    assert got_ids == [i for i in ids if 0 <= i < 500]
