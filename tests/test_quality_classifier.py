"""Write-path and resume semantics of the trained-quality-classifier
pipeline (the census-vs-oracle comparison runs in
test_queries_oracle.py)."""

import glob
import os
import shutil

from kawa_ray.pipelines.quality_classifier import (
    classify_corpus,
    quality_classifier_census,
)

SF_DIR = "/root/testdata/sf0.001"


def test_classify_corpus_matches_census_and_resumes(ray_session, tmp_path):
    out_root = str(tmp_path / "classify_out")
    r1 = classify_corpus(SF_DIR, out_root=out_root, n_shards=4, concurrency=2)

    # training moved the model off the origin
    assert any(abs(x) > 1e-9 for x in r1["w"])

    # the written corpus IS the census's selected set, per language
    census = quality_classifier_census(SF_DIR)
    want = {r["lang"]: int(r["n_selected"]) for _, r in census.iterrows()
            if int(r["n_selected"]) > 0}
    got = {r["lang"]: int(r["n_kept"]) for _, r in r1["census"].iterrows()}
    assert got == want
    assert 0 < sum(got.values()) < int(census["n_docs"].sum())

    parts = sorted(glob.glob(f"{out_root}/classify/part-*.parquet"))
    assert len(parts) == 4
    m1 = [os.path.getmtime(p) for p in parts]

    # second run: nothing recomputed (same weights -> same fingerprint)
    r2 = classify_corpus(SF_DIR, out_root=out_root, n_shards=4, concurrency=2)
    assert [os.path.getmtime(p) for p in parts] == m1
    assert r1["census"].equals(r2["census"])
    assert r1["w"] == r2["w"]

    # crash-resume: exactly the deleted part is recomputed
    os.remove(parts[2])
    r3 = classify_corpus(SF_DIR, out_root=out_root, n_shards=4, concurrency=2)
    m3 = [os.path.getmtime(p) for p in parts]
    assert m3[2] != m1[2]
    assert m3[:2] == m1[:2] and m3[3] == m1[3]
    assert r1["census"].equals(r3["census"])

    shutil.rmtree(out_root, ignore_errors=True)
