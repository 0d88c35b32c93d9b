"""Measure the REFERENCE engine's single-node tagging throughput on the
same corpus + fixture lexicon our pipeline uses — the apples-to-apples
baseline for "matches-or-beats the reference's single-node throughput".

Runs /root/reference/ontology read-only (no code copied): the module is
imported from its own directory with ``transformers`` stubbed (the mt5
tokenizer is network-gated and only used for CJK segmentation; the stub
segments per code point, matching our engine's documented deviation).
The reference's published lexicon artifact is a missing large blob, so
the lexicon is built from the identical fixture word2ner via the
reference's own ``add_to_ontology`` — both engines then tag the same
extracted texts.

Usage:  python bench_reference.py [n_docs]            throughput compare
        python bench_reference.py --parity [n_docs]   mention-set agreement
Prints one JSON line.  Parity mode reports micro P/R of our mention sets
against the reference's on identical docs — differences are dominated by
(a) the reference emitting bare-digit mentions (its digit-folded exact
dict accidentally matches number tokens), (b) greedy compound-boundary
differences, (c) majority-vote level-placement variance; the rebuild is
judged against its own labeled-pair gold (pairwise F1 gate), not
bug-for-bug tagger parity (SURVEY.md §7.6).
"""

from __future__ import annotations

import json
import os
import sys
import time
import types

REF_DIR = "/root/reference/ontology"


def _stub_transformers():
    fake = types.ModuleType("transformers")

    class _FakeTok:
        """The SAME deterministic subword model our engine uses
        (kawa_ray/functions/cjk_subword.py) — both engines segment CJK
        identically, so parity measures tagging, not tokenizer drift."""

        def __init__(self):
            from kawa_ray.functions.cjk_subword import FixtureSubwordTokenizer

            self._tok = FixtureSubwordTokenizer()

        def tokenize(self, w):
            return self._tok.tokenize(w)

    class AutoTokenizer:  # noqa: D401 - mimics the real surface
        @staticmethod
        def from_pretrained(*a, **k):
            return _FakeTok()

    fake.AutoTokenizer = AutoTokenizer
    sys.modules["transformers"] = fake
    # other absent deps the reference imports at module level but does not
    # touch on the tagging path
    faker_pkg = types.ModuleType("faker")
    faker_pkg.__path__ = []  # mark as package
    faker_pkg.Faker = object
    providers = types.ModuleType("faker.providers")
    providers.person = types.ModuleType("faker.providers.person")
    providers.job = types.ModuleType("faker.providers.job")
    sys.modules["faker"] = faker_pkg
    sys.modules["faker.providers"] = providers
    sys.modules["faker.providers.person"] = providers.person
    sys.modules["faker.providers.job"] = providers.job
    tqdm_mod = types.ModuleType("tqdm")
    tqdm_mod.tqdm = lambda x=None, *a, **k: x
    sys.modules["tqdm"] = tqdm_mod
    for name in ("datasets", "torch", "nltk", "fsspec"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)


def run_parity(n_docs: int = 500) -> dict:
    from kawa_ray.pipelines.linkage import default_artifacts
    from kawa_ray.sources.pages import PageGenerator
    from kawa_ray.sources.roster import build_roster, normalize_surface, roster_word2ner

    _stub_transformers()
    sys.path.insert(0, REF_DIR)
    import ontology_manager  # noqa: E402

    om = ontology_manager.OntologyManager(
        target_lang="", data_dir="/tmp/ref_data", tmp_dir="/tmp/ref_tmp",
        ontology_file=None, target_lang_data_file=None,
    )
    om.add_to_ontology([[w, lab] for w, lab, *_ in roster_word2ner(build_roster(300))])
    lex, _ = default_artifacts(300)
    gen = PageGenerator(300)
    from kawa_ray.functions.text import lang_is_cjk

    import re as _re

    # the reference's digit-folded exact dict emits bare-number mentions
    # (digit-noise, see module docstring) — excluded from BOTH sides so
    # the metric measures entity tagging, not that artifact
    _digit_norm = _re.compile(r"^[\d_]+$")
    stats = {True: [0, 0, 0], False: [0, 0, 0]}  # is_cjk -> [agree, ref, ours]
    for i in range(n_docs):
        row, _m = gen.render(i)
        ref = {n for n in (normalize_surface(k[0]) for k in om.tokenize(row["text"])["chunk2ner"])
               if not _digit_norm.match(n)}
        ours = {n for n in (normalize_surface(sf) for sf, *_ in lex.detect(row["text"], lang=row["lang"]))
                if not _digit_norm.match(n)}
        b = stats[lang_is_cjk(row["lang"])]
        b[0] += len(ref & ours)
        b[1] += len(ref)
        b[2] += len(ours)
    agree, tot_ref, tot_ours = (sum(stats[k][j] for k in stats) for j in range(3))

    def block(b):
        return {
            "micro_recall_of_reference_mentions": round(b[0] / max(b[1], 1), 4),
            "micro_precision_vs_reference": round(b[0] / max(b[2], 1), 4),
            "reference_mentions": b[1],
            "ours_mentions": b[2],
        }

    return {
        "n_docs": n_docs,
        "micro_recall_of_reference_mentions": round(agree / max(tot_ref, 1), 4),
        "micro_precision_vs_reference": round(agree / max(tot_ours, 1), 4),
        "reference_mentions": tot_ref,
        "ours_mentions": tot_ours,
        "cjk": block(stats[True]),
        "non_cjk": block(stats[False]),
    }


def main() -> int:
    if "--parity" in sys.argv:
        args = [a for a in sys.argv[1:] if a != "--parity"]
        print(json.dumps(run_parity(int(args[0]) if args else 500)))
        return 0
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    if not os.path.isdir(REF_DIR):
        print(json.dumps({"error": "reference not present"}))
        return 0

    # identical inputs for both engines
    from kawa_ray.pipelines.linkage import default_artifacts
    from kawa_ray.sources.pages import PageGenerator
    from kawa_ray.sources.roster import build_roster, roster_word2ner

    gen = PageGenerator(300)
    docs = [gen.render(i)[0] for i in range(n_docs)]
    texts = [(d["text"], d["lang"]) for d in docs]
    word2ner = [[w, lab] for w, lab, *_ in roster_word2ner(build_roster(300))]

    # ---- reference engine (read-only import, stubbed mt5) ----
    _stub_transformers()
    sys.path.insert(0, REF_DIR)
    import ontology_manager  # noqa: E402

    om = ontology_manager.OntologyManager(
        target_lang="", data_dir="/tmp/ref_data", tmp_dir="/tmp/ref_tmp",
        ontology_file=None, target_lang_data_file=None,
    )
    t0 = time.time()
    om.add_to_ontology(word2ner)
    ref_build_s = time.time() - t0

    t0 = time.time()
    ref_mentions = 0
    for text, _lang in texts:
        res = om.tokenize(text)
        ref_mentions += len(res.get("chunk2ner", {}))
    ref_tag_s = time.time() - t0

    # ---- this engine, same single-process conditions ----
    lex, _ = default_artifacts(300)
    t0 = time.time()
    ours_mentions = 0
    for text, lang in texts:
        ours_mentions += len(lex.detect(text, lang=lang))
    ours_tag_s = time.time() - t0

    out = {
        "n_docs": n_docs,
        "reference_docs_per_sec": round(n_docs / ref_tag_s, 1),
        "ours_docs_per_sec_single_process": round(n_docs / ours_tag_s, 1),
        "speedup_single_process": round(ref_tag_s / ours_tag_s, 2),
        "reference_mentions": ref_mentions,
        "ours_mentions": ours_mentions,
        "reference_lexicon_build_sec": round(ref_build_s, 2),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
