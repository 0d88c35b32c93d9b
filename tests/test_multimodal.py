"""Multimodal stub-stage plumbing: deterministic fake decode, schema,
actor-pool stage, resize planning, and the NotImplementedError gate for
real payloads."""

from __future__ import annotations

import pyarrow as pa
import pytest

from kawa_ray.stages.multimodal import (
    FEATURE_SCHEMA,
    MediaFeatureExtractor,
    fake_media_payload,
    synth_media_table,
)

SF_DIR = "/root/testdata/sf0.001"


def test_fake_payload_roundtrip():
    ext = MediaFeatureExtractor()
    t = synth_media_table([0, 1, 2, 3, 4, 5])
    out = ext(t)
    assert out.schema == FEATURE_SCHEMA
    assert out.num_rows == 6
    rows = out.to_pylist()
    # kind cycles image/audio/video by id
    assert [r["media_type"] for r in rows] == ["image", "audio", "video"] * 2
    for r in rows:
        assert 16 <= r["width"] <= 255 and 16 <= r["height"] <= 255
        assert len(r["features"]) == 8
        assert all(0.0 <= f <= 1.0 for f in r["features"])
    # video frame sampling: stride-4 of n_frames
    assert all(r["n_frames"] >= 1 for r in rows)
    # determinism
    again = MediaFeatureExtractor()(synth_media_table([0, 1, 2, 3, 4, 5]))
    assert out.equals(again)


def test_real_payload_raises_not_implemented():
    ext = MediaFeatureExtractor()
    if ext.real_codecs is not None:
        pytest.skip("real codec present")
    t = pa.table(
        {
            "media_id": pa.array([1], pa.int64()),
            "media_type": pa.array(["image"], pa.string()),
            "payload": pa.array([b"\x89PNG\r\n\x1a\nfakebytes"], pa.binary()),
        }
    )
    with pytest.raises(NotImplementedError):
        ext(t)


def test_media_census_pipeline(ray_session):
    from kawa_ray.pipelines.media import media_feature_census, media_resize_plan

    census = media_feature_census(SF_DIR)
    assert sorted(census["media_type"]) == ["audio", "image", "video"]
    assert int(census["n_items"].sum()) == 500  # one media row per document
    plan = media_resize_plan(SF_DIR, max_side=64)
    assert (plan["n_resized"] <= plan["n_items"]).all()
    assert int(plan["n_items"].sum()) == 500
