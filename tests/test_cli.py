"""CLI smoke: the ray-job-submit surface (subprocess, own Ray session)."""

import json
import os
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_cli_link_direct(tmp_path):
    from kawa_ray.sources.pages import ensure_pages

    pages = ensure_pages("0.001")
    out = subprocess.run(
        [sys.executable, "-m", "kawa_ray.cli", "link", "--pages", pages,
         "--out", str(tmp_path), "--num-cpus", "4"],
        capture_output=True, text=True, timeout=240,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stderr[-800:]
    summary = json.loads(out.stdout.strip().splitlines()[-1])
    assert summary["mode"] == "direct" and summary["n_cluster_rows"] > 0
    assert os.path.isdir(os.path.join(str(tmp_path), "clusters"))
