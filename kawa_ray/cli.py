"""CLI entry point — the module a ``ray job submit`` invocation runs::

    ray job submit --working-dir . -- python -m kawa_ray.cli link \\
        --pages /data/pages --out /data/out --checkpointed

Owns its Ray session (guarded init + shutdown); the library itself never
calls ``ray.init`` (driver contract).  ``link`` runs the flagship
blocking + scoring + clustering pipeline and writes the clusters as
partitioned Parquet; ``--checkpointed`` routes through the per-partition
checkpoint layer so a resubmitted job resumes from finished shards.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _ray_up(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        kwargs = {"include_dashboard": False, "logging_level": "ERROR"}
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
            kwargs["address"] = "local"
        ray.init(**kwargs)
    return ray


def cmd_link(args) -> int:
    ray = _ray_up(args.num_cpus)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    t0 = time.time()
    if args.checkpointed:
        from kawa_ray.pipelines.linkage_ckpt import link_pages_checkpointed

        res = link_pages_checkpointed(args.pages, args.out)
        clusters = res["clusters"]
        summary = {
            "mode": "checkpointed",
            "out": args.out,
            "stages": {
                s: m["skew"] for s, m in res["manifests"].items() if "skew" in m
            },
        }
    else:
        from kawa_ray.pipelines.linkage import link_pages

        res = link_pages(args.pages)
        clusters = res["clusters"]
        out_dir = os.path.join(args.out, "clusters")
        clusters.write_parquet(out_dir)
        summary = {"mode": "direct", "out": out_dir, "n_pairs": res["n_pairs"]}
    summary["n_cluster_rows"] = clusters.count()
    summary["n_entities"] = len(set(res["norm2cluster"].values()))
    summary["seconds"] = round(time.time() - t0, 2)
    print(json.dumps(summary))
    ray.shutdown()
    return 0


def cmd_clean(args) -> int:
    ray = _ray_up(args.num_cpus)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from kawa_ray.pipelines.clean_corpus import clean_corpus

    t0 = time.time()
    res = clean_corpus(args.sf_dir, out_root=args.out, n_shards=args.n_shards)
    summary = {
        "mode": "clean",
        "out": res["out_root"],
        "census": {r["lang"]: int(r["n_kept"])
                   for _, r in res["census"].iterrows()},
        "skew": res["manifest"].get("skew", {}),
        "seconds": round(time.time() - t0, 2),
    }
    print(json.dumps(summary))
    ray.shutdown()
    return 0


def cmd_classify(args) -> int:
    ray = _ray_up(args.num_cpus)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from kawa_ray.pipelines.quality_classifier import classify_corpus

    t0 = time.time()
    res = classify_corpus(args.sf_dir, out_root=args.out,
                          n_shards=args.n_shards)
    summary = {
        "mode": "classify",
        "out": res["out_root"],
        "weights": [round(x, 6) for x in res["w"]],
        "census": {r["lang"]: int(r["n_kept"])
                   for _, r in res["census"].iterrows()},
        "seconds": round(time.time() - t0, 2),
    }
    print(json.dumps(summary))
    ray.shutdown()
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="kawa_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)
    link = sub.add_parser("link", help="run the flagship linkage pipeline")
    link.add_argument("--pages", required=True,
                      help="corpus dir containing pages/part-*.parquet")
    link.add_argument("--out", required=True, help="output root")
    link.add_argument("--checkpointed", action="store_true",
                      help="resume-capable per-partition checkpointed run")
    link.add_argument("--num-cpus", type=int, default=None,
                      help="local-mode CPU cap (omit on a real cluster)")
    link.set_defaults(fn=cmd_link)
    clean = sub.add_parser(
        "clean", help="materialize the quality-filtered corpus (resumable)")
    clean.add_argument("--sf-dir", required=True,
                       help="input dir containing documents.parquet")
    clean.add_argument("--out", default=None, help="output root (default /tmp)")
    clean.add_argument("--n-shards", type=int, default=8)
    clean.add_argument("--num-cpus", type=int, default=None)
    clean.set_defaults(fn=cmd_clean)
    cls = sub.add_parser(
        "classify",
        help="train the quality classifier and materialize the selected "
             "corpus (resumable)")
    cls.add_argument("--sf-dir", required=True,
                     help="input dir containing documents.parquet")
    cls.add_argument("--out", default=None, help="output root (default /tmp)")
    cls.add_argument("--n-shards", type=int, default=8)
    cls.add_argument("--num-cpus", type=int, default=None)
    cls.set_defaults(fn=cmd_classify)
    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
