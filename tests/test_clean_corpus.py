"""Resume semantics of the clean-and-materialize write pipeline.
(The census-vs-oracle comparison runs in test_queries_oracle.py.)"""

import glob
import os
import shutil

from kawa_ray.pipelines.clean_corpus import clean_corpus

SF_DIR = "/root/testdata/sf0.001"


def test_clean_corpus_resume(ray_session, tmp_path):
    out_root = str(tmp_path / "clean_out")
    r1 = clean_corpus(SF_DIR, out_root=out_root, n_shards=4, concurrency=2)
    parts = sorted(glob.glob(f"{out_root}/clean/part-*.parquet"))
    assert len(parts) == 4
    m1 = [os.path.getmtime(p) for p in parts]
    skew = r1["manifest"]["skew"]
    assert skew["n_partitions"] == 4 and skew["straggler_factor"] >= 1.0

    # second run: nothing recomputed, census identical
    r2 = clean_corpus(SF_DIR, out_root=out_root, n_shards=4, concurrency=2)
    assert [os.path.getmtime(p) for p in parts] == m1
    assert r1["census"].equals(r2["census"])

    # crash-resume: exactly the deleted part is recomputed
    os.remove(parts[1])
    r3 = clean_corpus(SF_DIR, out_root=out_root, n_shards=4, concurrency=2)
    m3 = [os.path.getmtime(p) for p in parts]
    assert m3[1] != m1[1]
    assert m3[0] == m1[0] and m3[2:] == m1[2:]
    assert r1["census"].equals(r3["census"])

    shutil.rmtree(out_root, ignore_errors=True)
