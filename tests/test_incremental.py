"""Incremental linkage == full rebuild (with caps/salting disabled, the
increment-equivalence regime; see kawa_ray/pipelines/incremental.py)."""

from __future__ import annotations

import os
import shutil
from dataclasses import replace

import pytest

from kawa_ray.config import LinkageConfig
from kawa_ray.pipelines.incremental import empty_state, link_increment
from kawa_ray.pipelines.linkage import link_pages
from kawa_ray.sources.pages import ensure_pages

NO_CAP = replace(LinkageConfig(), hot_key_threshold=10**9,
                 max_pairs_per_block=10**9)


@pytest.fixture(scope="module")
def split_dirs(tmp_path_factory):
    """sf0.001 corpus split into two single-shard increments."""
    src = ensure_pages("0.001")
    shards = sorted(os.listdir(os.path.join(src, "pages")))
    assert len(shards) >= 2
    halves = []
    root = tmp_path_factory.mktemp("incr")
    for i, shard_group in enumerate((shards[: len(shards) // 2],
                                     shards[len(shards) // 2:])):
        d = root / f"half{i}"
        os.makedirs(d / "pages")
        for sh in shard_group:
            shutil.copy(os.path.join(src, "pages", sh), d / "pages" / sh)
        halves.append(str(d))
    return src, halves


def test_increments_equal_full_rebuild(ray_session, split_dirs):
    src, (h1, h2) = split_dirs
    s0 = empty_state()
    s1 = link_increment(s0, h1, NO_CAP)
    s2 = link_increment(s1, h2, NO_CAP)

    full = link_pages(src, NO_CAP)
    assert s2["norm2cluster"] == full["norm2cluster"]
    # the old state was not mutated (immutable snapshots)
    assert s0 == {"nodes": {}, "norm2cluster": {}}
    assert set(s1["nodes"]) <= set(s2["nodes"])


def test_second_increment_does_less_work(ray_session, split_dirs):
    _src, (h1, h2) = split_dirs
    s1 = link_increment(empty_state(), h1, NO_CAP)
    s2 = link_increment(s1, h2, NO_CAP)
    full = link_pages(_src, NO_CAP)
    # incremental pair work is bounded by blocks touched by new norms
    assert s2["n_new_pairs"] <= full["n_pairs"]
