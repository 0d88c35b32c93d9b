"""Deterministic entity roster — the gold linking table (FIXTURES.md §3).

Everything is a pure function of ``(seed, entity_id)`` via blake2 hashing,
so any scale factor is a strict prefix of a larger one and no RNG draw
order leaks into the data.

Roster columns: ``entity_id, canonical, label, aliases(list<string>),
embedding(list<float32> dim 64)``.  Confusable pairs (distinct entities
sharing first name + last-name prefix, e.g. "George Bush" / "George
Burns" — the reference's own example at
/root/reference/ontology/ontology_kb.py:195-199) are generated on
purpose so string similarity alone cannot reach F1 >= 0.99 and the
embedding-cosine channel is load-bearing.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa

from kawa_ray.functions.text import canonical_word

EMBED_DIM = 64
SEED = 42

FIRST_NAMES = [
    "George", "Barack", "Angela", "Emmanuel", "Luiz", "Nguyen", "Amina",
    "Wei", "Haruto", "Jisoo", "Maria", "John", "Fatima", "Pedro", "Sofia",
    "Elena", "Omar", "Chen", "Yuki", "Minjun", "Isabel", "Carlos", "Lucia",
    "Ahmed", "Ingrid", "Pierre", "Marta", "Diego", "Hana", "Viktor",
]
LAST_NAMES = [
    "Bush", "Burns", "Burton", "Obama", "Merkel", "Macron", "Silva",
    "Santos", "Martinez", "Schneider", "Dubois", "Moreau", "Ferreira",
    "Hoffmann", "Keller", "Vargas", "Romero", "Tanaka", "Nakamura", "Kim",
    "Park", "Haddad", "Mansour", "Nguyen", "Tran", "Weber", "Fischer",
    "Rossi", "Bianchi", "Costa",
]
ORG_STEMS = [
    "Acme", "Globex", "Initech", "Umbrella", "Stark", "Wayne", "Cyberdyne",
    "Tyrell", "Aperture", "Vesta", "Northwind", "Contoso", "Fabrikam",
    "Hooli", "Massive", "Soylent", "Wonka", "Oscorp", "Zorin", "Nakatomi",
]
ORG_SUFFIXES = ["Corp", "Corporation", "Industries", "Labs", "Group", "Holdings"]
GPE_NAMES = [
    "San Felipe", "Porto Verde", "Nova Lisboa", "Villa Real", "Monte Claro",
    "Santa Cruz del Norte", "Lakeview", "Riverton", "Eastport", "Westfield",
    "Kirkwall", "Dunmore", "Altenburg", "Neustadt", "Oberdorf", "Belle Rive",
    "Fontaine", "Clairmont", "Hai Phong Moi", "Binh Xuan",
]
PRODUCT_STEMS = [
    "Quantum Phone", "Nimbus Tablet", "Aurora Drive", "Falcon Router",
    "Pixelway Camera", "Solaris Watch", "Vortex Console", "Titan Charger",
    "Echo Speaker", "Lumen Display",
]

# small deterministic CJK syllable pools for per-language alias variants
_ZH_POOL = "安波城东风光华京兰明南平奇山天伟西扬州巴贝达菲高杰克拉马诺欧朴"
_JA_POOL = "アイウエオカキクケコサシスセソタチツテトナニヌネノハヒフヘホマミムメモ"
_KO_POOL = "가나다라마바사아자차카타파하간난단란만반산언전천컨턴펀헌"
_AR_POOL = ["جورج", "باراك", "انجيلا", "ماريا", "عمر", "احمد", "فاطمة", "بيدرو",
            "صوفيا", "شركة", "مدينة", "منتج"]


def _h(*parts) -> int:
    raw = ":".join(str(p) for p in parts).encode("utf-8")
    return struct.unpack("<Q", hashlib.blake2b(raw, digest_size=8).digest())[0]


def _cjk_name(pool: str, eid: int, lang: str, length: int) -> str:
    return "".join(pool[_h(SEED, "cjk", lang, eid, i) % len(pool)] for i in range(length))


def _entity_spec(eid: int) -> tuple[str, str, list[str]]:
    """(canonical, label, aliases) for one entity id."""
    kind = eid % 10
    if eid == 3:
        # the designated hot entity: its bare-surname alias appears in ~6%
        # of pages -> stopword-like hot blocking key (FIXTURES.md §4)
        return "John Smith", "PERSON", ["John Smith", "Smith", "J. Smith"]
    if kind < 5:  # persons / public figures — includes systematic confusables
        if kind == 0:
            # confusable triples: same first name, last names sharing the
            # 3-char prefix "bu" (Bush / Burns / Burton)
            g = eid // 10
            first = FIRST_NAMES[(g // 3) % len(FIRST_NAMES)]
            last = ("Bush", "Burns", "Burton")[g % 3]
            canonical = f"{first} {last}"
        else:
            first = FIRST_NAMES[_h(SEED, "fn", eid) % len(FIRST_NAMES)]
            last = LAST_NAMES[3 + _h(SEED, "ln", eid) % (len(LAST_NAMES) - 3)]
            mid = ""
            if _h(SEED, "mid", eid) % 3 == 0:
                mid = " " + "ABCDEFGH"[_h(SEED, "midc", eid) % 8] + "."
            canonical = f"{first}{mid} {last}"
        label = "PUBLIC_FIGURE" if eid % 2 == 0 else "PERSON"
        aliases = [
            canonical,
            f"{canonical.split()[0][0]}. {canonical.split()[-1]}",
            canonical.upper(),
        ]
        # accented variant
        if "e" in canonical:
            aliases.append(canonical.replace("e", "é", 1))
        # CJK variants
        aliases.append(_cjk_name(_ZH_POOL, eid, "zh", 3))
        aliases.append(_cjk_name(_JA_POOL, eid, "ja", 4))
        aliases.append(_cjk_name(_KO_POOL, eid, "ko", 3))
        aliases.append(_AR_POOL[eid % len(_AR_POOL)] + " " + _AR_POOL[(eid + 3) % len(_AR_POOL)])
        return canonical, label, aliases
    if kind < 7:
        stem = ORG_STEMS[_h(SEED, "org", eid) % len(ORG_STEMS)]
        suf = ORG_SUFFIXES[_h(SEED, "osuf", eid) % len(ORG_SUFFIXES)]
        canonical = f"{stem} {suf} {eid // 10}"
        aliases = [canonical, f"{stem} {suf}".upper() + f" {eid // 10}",
                   f"{stem} {eid // 10}"]
        aliases.append(_cjk_name(_ZH_POOL, eid, "zh", 2) + "公司")
        return canonical, "ORG", aliases
    if kind < 9:
        base = GPE_NAMES[_h(SEED, "gpe", eid) % len(GPE_NAMES)]
        canonical = f"{base} {eid // 10}"
        aliases = [canonical, canonical.upper(), f"{base.split()[0]} {eid // 10}"]
        aliases.append(_cjk_name(_ZH_POOL, eid, "zh", 2) + "市")
        return canonical, "GPE", aliases
    stem = PRODUCT_STEMS[_h(SEED, "prd", eid) % len(PRODUCT_STEMS)]
    ver = 10 + (eid // 10) % 90
    canonical = f"{stem} {ver} X{eid // 10}"
    aliases = [canonical, f"{stem.split()[0]} {ver} X{eid // 10}"]
    return canonical, "PRODUCT", aliases


def _unit_vec(rng_key: int) -> np.ndarray:
    rng = np.random.default_rng(rng_key)
    v = rng.standard_normal(EMBED_DIM).astype(np.float32)
    return v / np.linalg.norm(v)


def _alias_vec(entity_vec: np.ndarray, eid: int, alias_idx: int) -> np.ndarray:
    noise = np.random.default_rng(_h(SEED, "avec", eid, alias_idx) % (2**32)).standard_normal(
        EMBED_DIM
    ).astype(np.float32)
    # noise with total norm ~0.18 relative to the unit entity vector, so
    # same-entity alias pairs sit at cos ~ 1/(1+0.18^2) ~ 0.97
    v = entity_vec + (0.18 / np.sqrt(EMBED_DIM)) * noise
    return v / np.linalg.norm(v)


# Distractor common nouns: appear in the lexicon with non-ER labels and in
# page filler text, exercising majority-vote conflicts and ensuring the
# detector must discriminate (FIXTURES.md §2).
DISTRACTORS: list[tuple[str, str]] = (
    [(w, "ANIMAL") for w in "falcon heron badger otter lynx marten stork raven".split()]
    + [(w, "FOOD") for w in "quince saffron truffle polenta gnocchi paella tagine couscous".split()]
    + [(w, "PLANT") for w in "willow juniper bramble foxglove yarrow sorrel".split()]
    + [(w, "JOB") for w in "blacksmith archivist surveyor falconer miller cooper".split()]
    + [(w, "DISEASE") for w in "measles rickets scurvy anemia".split()]
)


def build_roster(n_entities: int = 300) -> pa.Table:
    """Deterministic roster table; uniqueness of alias surfaces is enforced
    by dropping later duplicates (alias -> exactly one entity)."""
    seen: set[str] = set()
    ids, canons, labels, aliases_col, vecs = [], [], [], [], []
    for eid in range(n_entities):
        canonical, label, aliases = _entity_spec(eid)
        if normalize_surface(canonical) in seen:
            continue  # canonical collision: drop the whole entity (alias -> entity stays a function)
        evec = _unit_vec(_h(SEED, "evec", eid) % (2**32))
        uniq = []
        for a in aliases:
            norm = normalize_surface(a)
            if not norm or norm in seen:
                continue
            seen.add(norm)
            uniq.append(a)
        if not uniq:
            continue
        ids.append(eid)
        canons.append(canonical)
        labels.append(label)
        aliases_col.append(uniq)
        vecs.append(evec)
    return pa.table(
        {
            "entity_id": pa.array(ids, pa.int64()),
            "canonical": pa.array(canons, pa.string()),
            "label": pa.array(labels, pa.string()),
            "aliases": pa.array(aliases_col, pa.list_(pa.string())),
            "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
        }
    )


def normalize_surface(surface: str) -> str:
    """Shared mention-normalisation used by lexicon build, detection output
    and the embedding lookup: canonical lower connector-joined form."""
    w, _ = canonical_word(surface, do_lower=True)
    return w


def roster_word2ner(roster: pa.Table) -> list[list]:
    """word2ner rows (reference exchange format,
    ontology_manager.py:394-411): every alias + the distractor nouns."""
    rows: list[list] = []
    idx = 0
    for eid, label, aliases in zip(
        roster["entity_id"].to_pylist(),
        roster["label"].to_pylist(),
        roster["aliases"].to_pylist(),
    ):
        for a in aliases:
            rows.append([a, label, 1.0, idx])
            idx += 1
    for w, lab in DISTRACTORS:
        rows.append([w, lab, 1.0, idx])
        idx += 1
    return rows


def alias_embedding_table(roster: pa.Table) -> tuple[dict[str, int], np.ndarray, np.ndarray]:
    """(norm -> row, matrix[n, EMBED_DIM] float32, entity_id[n]) — the
    broadcastable embedding artifact pinned in scoring actors (mirrors the
    reference's memmap embedding matrix,
    /root/reference/ontology/ontology_kb.py:282-285)."""
    norms: dict[str, int] = {}
    mats: list[np.ndarray] = []
    ents: list[int] = []
    for eid, aliases in zip(roster["entity_id"].to_pylist(), roster["aliases"].to_pylist()):
        evec = _unit_vec(_h(SEED, "evec", eid) % (2**32))
        for ai, a in enumerate(aliases):
            norm = normalize_surface(a)
            if norm in norms:
                continue
            norms[norm] = len(mats)
            mats.append(_alias_vec(evec, eid, ai))
            ents.append(eid)
    return norms, np.vstack(mats), np.asarray(ents, dtype=np.int64)
