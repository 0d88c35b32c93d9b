"""S2 — mention detection: stateful actor-pool map_batches stage.

The lexicon artifact is loaded ONCE per actor in ``__init__`` (mirroring
the reference's class-level lexicon cache,
/root/reference/ontology/ontology_manager.py:90-106) from either a
``ray.ObjectRef`` (broadcast via ``ray.put``) or an artifact path.
Per-batch work is a per-doc greedy detect (docs are the parallel unit —
never split across batches) plus the regex NER extractors.

Output mention schema (SURVEY.md §1.3):
``url, mention_id, surface, norm, start, end, label, lang``.
"""

from __future__ import annotations

import pyarrow as pa

from kawa_ray.functions.minhash import hash64
from kawa_ray.functions.regex_ner import regex_mentions
from kawa_ray.sources.roster import normalize_surface
from kawa_ray.state.lexicon import LexiconIndex

MENTION_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("mention_id", pa.int64()),
        ("surface", pa.string()),
        ("norm", pa.string()),
        ("start", pa.int32()),
        ("end", pa.int32()),
        ("label", pa.string()),
        ("lang", pa.string()),
    ]
)


def mention_id_of(url: str, norm: str, occ: int) -> int:
    """Stable mention identity: hash of (url, norm, occurrence index) —
    reproducible across runs and parallelism levels (FIXTURES.md §4)."""
    return hash64(f"{url}\x00{norm}\x00{occ}") & 0x7FFF_FFFF_FFFF_FFFF


class MentionDetector:
    """Actor-pool callable: lexicon pinned per worker."""

    def __init__(self, lexicon_ref=None, lexicon_path: str | None = None,
                 with_regex_ner: bool = True,
                 lang_lexicons: dict[str, dict] | None = None):
        if lexicon_ref is not None:
            import ray

            obj = ray.get(lexicon_ref)
            self.lexicon = obj if isinstance(obj, LexiconIndex) else LexiconIndex.from_bytes(obj)
        elif lexicon_path is not None:
            self.lexicon = LexiconIndex.load(lexicon_path)
        else:
            raise ValueError("need lexicon_ref or lexicon_path")
        self.with_regex_ner = with_regex_ner
        # per-language exact lexicons (reference per-lang {lang}.json files
        # loaded into the target-language lookup layer,
        # ontology_manager.py:140-144,571-582)
        self.lang_lexicons = lang_lexicons or {}
        # surface -> norm memo: surfaces repeat heavily across docs (same
        # entities); bounded so regex-typed surfaces (phone numbers, IPs —
        # unbounded vocab at corpus scale) can't grow the actor heap
        self._norm_cache: dict[str, str] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        texts = batch.column("text").to_pylist()
        langs = batch.column("lang").to_pylist()
        out = {k: [] for k in ("url", "mention_id", "surface", "norm", "start", "end", "label", "lang")}
        norm_cache = self._norm_cache
        if len(norm_cache) > 500_000:
            norm_cache.clear()
        for url, text, lang in zip(urls, texts, langs):
            occ: dict[str, int] = {}
            dets = self.lexicon.detect(
                text, lang=lang,
                target_lexicon=self.lang_lexicons.get(lang),
            )
            if self.with_regex_ner:
                dets = dets + regex_mentions(text)
            for surface, start, end, label in dets:
                norm = norm_cache.get(surface)
                if norm is None:
                    norm = normalize_surface(surface)
                    norm_cache[surface] = norm
                k = occ.get(norm, 0)
                occ[norm] = k + 1
                out["url"].append(url)
                out["mention_id"].append(mention_id_of(url, norm, k))
                out["surface"].append(surface)
                out["norm"].append(norm)
                out["start"].append(start)
                out["end"].append(end)
                out["label"].append(label)
                out["lang"].append(lang)
        return pa.Table.from_pydict(out, schema=MENTION_SCHEMA)


def mention_stage(ds, lexicon_ref, batch_size: int = 256, concurrency: int = 4,
                  with_regex_ner: bool = True,
                  lang_lexicons: dict[str, dict] | None = None):
    """Attach S2 to a (url, text, lang) Dataset as an actor pool."""
    return ds.map_batches(
        MentionDetector,
        fn_constructor_kwargs={"lexicon_ref": lexicon_ref,
                               "with_regex_ner": with_regex_ner,
                               "lang_lexicons": lang_lexicons},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
