"""Ray-free memory-bus probe for the scaling analysis (BASELINE.md).

Runs K INDEPENDENT single-process detection kernels (multiprocessing,
no Ray, no shuffle, no object store — each process detects its own
private copy of the same texts in a loop) and reports per-process
throughput at K = 1, 4, 8, 16, 32.  If per-process throughput degrades
as K grows on pure embarrassingly-parallel compute, the degradation is
a property of the HOST (shared memory bus / caches), not of the
pipeline's partitioning — the independent evidence behind defaulting
the N-vs-4N scaling pair to 4→16 (inside the knee) rather than 8→32.

Usage: python -m tools.bus_probe [seconds_per_level]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time


def _worker(texts_langs, seconds: float, out_q) -> None:
    from kawa_ray.pipelines.linkage import default_artifacts

    lexicon, _ = default_artifacts()
    # warm the per-process memos on a slice
    for x, lg in texts_langs[:100]:
        lexicon.detect(x, lang=lg)
    n, i, t0 = 0, 0, time.perf_counter()
    L = len(texts_langs)
    while time.perf_counter() - t0 < seconds:
        x, lg = texts_langs[i % L]
        lexicon.detect(x, lang=lg)
        i += 1
        n += 1
    out_q.put(n / (time.perf_counter() - t0))


def main() -> None:
    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 8.0

    import pyarrow.parquet as pq

    from kawa_ray.functions.html import extract_text
    from kawa_ray.sources.pages import ensure_pages

    pages_dir = ensure_pages("0.1")
    t = pq.read_table(os.path.join(pages_dir, "pages"),
                      columns=["html", "lang"]).slice(0, 2000)
    texts_langs = [(extract_text(h), lg)
                   for h, lg in zip(t.column("html").to_pylist(),
                                    t.column("lang").to_pylist())]

    res = {}
    for k in (1, 4, 8, 16, 32):
        q: mp.Queue = mp.Queue()
        procs = [mp.Process(target=_worker, args=(texts_langs, seconds, q))
                 for _ in range(k)]
        for p in procs:
            p.start()
        rates = [q.get() for _ in procs]
        for p in procs:
            p.join()
        per = sum(rates) / len(rates)
        res[k] = {"per_proc_docs_s": round(per, 1),
                  "total_docs_s": round(per * k, 1)}
        print(k, res[k], flush=True)
    base = res[1]["per_proc_docs_s"]
    for k, r in res.items():
        r["vs_1proc"] = round(r["per_proc_docs_s"] / base, 3)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
