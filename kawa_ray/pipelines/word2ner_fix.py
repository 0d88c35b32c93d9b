"""B13 — the ``fix_and_enhance_word2ner`` rule cascade
(/root/reference/ontology/ontology_builder.py:1209-2061), the
reference's main data-cleaning operator, re-expressed as a Ray Data
``map_batches`` cascade over a deterministic WikiANN-shaped fixture.

Rule inventory reproduced (reference line cites inline):

WikiANN-entity side (:1216-1243)
  A1 punctuation splice fixes + ``strip(' ,')``
  A2 CJK languages: drop inner spaces
  A3 length gates (<=4, >50) and ``List of`` prefix drop
  A4 label renames LOC->LOCATION, PER->PUBLIC_FIGURE
  A5 canonicalise + space/hyphen/en-dash -> connector
  A6 all-digit entity drop (incl. CJK numerals)
  A7 year-like first/last component drop
  A8 LOCATION with digit edge char -> dropped (ref flips to EVENT then
     ``continue``)
  A9 LOCATION with a connector -> GPE
  A10 ORG ``_party``/``_union`` -> POLITICAL_PARTY / UNION

word2ner side (:1247-1262)
  B1 keep (CJK or len>1) and not all-digit; canonical-lower key
  B2 non-EVENT year-like first/last component -> delete
  B3 PERSON/PUBLIC_FIGURE delete when len<=1, stopword, or every
     connector part is a single char
  B4 multilingual PERSON (in word2lang) with CJK / len>10 / multiword
     -> PUBLIC_FIGURE

Merge (:1264-1267)
  C1 WikiANN overrides word2ner EXCEPT LOCATION vs existing FAC/GPE and
     ORG vs existing LANGUAGE/RACE/RELIGION/NORP/UNION/SOC_ECO_CLASS/
     POLITICAL_PARTY
  C2 curated PUBLIC_FIGURE promotion list (:1269-…; a small fixture
     list here, not the reference's)

The fixture inputs stay inside the subset where ``canonical_word`` is
``lower + space->connector`` (no leading stopwords, no boundary strip
chars, no multi-codepoint CJK), so every Latin rule path has an exact
DuckDB oracle; the CJK branches are covered by unit tests instead
(tests/test_word2ner_fix.py).
"""

from __future__ import annotations

import re

import pandas as pd

from kawa_ray.functions.text import cjk_detect
from kawa_ray.state.stopwords import ALL_STOPWORDS

_DIGITS = re.compile(r"^[\d〇一二三四五六七八九]+$")
_DIGIT_CLASS = "[0-9〇一二三四五六七八九]"
CJK_WIKIANN_LANGS = ("zh", "ja", "ko", "th")

# deterministic WikiANN-shaped fixture: every row name encodes the rule
# it exercises
WIKIANN_FIXTURE: list[tuple[str, str, str]] = [
    ("en", "PER", "Amelia Stone Harper"),          # PER -> PUBLIC_FIGURE
    ("en", "PER", "Viktor , Malenko"),             # A1 comma splice
    ("en", "PER", "Dora 's Harbor Poet"),          # A1 quote splice
    ("en", "PER", "J . R . Kowalski"),             # A1 dot splice
    ("en", "LOC", "Mount Vereda"),                 # LOC -> LOCATION -> GPE (A9)
    ("en", "LOC", "Castora"),                      # LOCATION single word stays
    ("en", "LOC", "4711 Ridge"),                   # A8 digit edge -> dropped
    ("en", "LOC", "List of Vereda Peaks"),         # A3 prefix drop
    ("en", "LOC", "Oak"),                          # A3 short drop (<=4)
    ("en", "ORG", "Meridian Workers party"),       # A10 -> POLITICAL_PARTY
    ("en", "ORG", "Dockside Transport union"),     # A10 -> UNION
    ("en", "ORG", "Helix Assembly"),               # ORG stays
    ("en", "ORG", "1887 2034"),                    # A6 all-digit drop
    ("en", "ORG", "1921 Collective"),              # A7 year-first drop
    ("en", "ORG", "Uprising of 1848"),             # A7 year-last drop
    ("en", "EVENT", "Vereda Harvest Festival"),    # passes through
    ("zh", "ORG", "Hanbei Group Ltd"),             # A2 space removal ->
                                                   # "hanbeigroupltd" (no CJK
                                                   # chars so canonical is id)
    ("en", "LOC", "Fort Caldera"),                 # overrides w2n FAC? no ->
                                                   # C1 keeps FAC
    ("en", "ORG", "Esperano"),                     # C1 vs LANGUAGE -> kept
    ("en", "PER", "Nils Ardena"),                  # override PERSON -> PF
]

WORD2NER_FIXTURE: list[tuple[str, str]] = [
    ("amelia_ray_stone", "PERSON"),
    ("nils_ardena", "PERSON"),              # overridden by wikiann PF
    ("fort_caldera", "FAC"),                # C1: wikiann LOCATION must NOT win
    ("esperano", "LANGUAGE"),               # C1: wikiann ORG must NOT win
    ("x", "PERSON"),                        # B3 len<=1 delete
    ("the", "PERSON"),                      # B3 stopword delete
    ("a_b_c", "PUBLIC_FIGURE"),             # B3 all-single-char delete
    ("1984_overture", "WORK_OF_ART"),       # B2 year-first delete
    ("battle_of_1066", "EVENT"),            # B2 spared: EVENT exempt
    ("march_of_1066", "LOC"),               # B2 year-last delete
    ("山", "GPE"),                          # B1 CJK single char kept
    ("7", "CARDINAL"),                      # B1 all-digit drop
    ("q", "ORG"),                           # B1 len<=1 non-CJK drop
    ("marisol_benavente_cortez", "PERSON"), # B4 multiword in word2lang -> PF
    ("teodoro", "PERSON"),                  # in word2lang, short single -> stays
    ("huracanidoextra", "PERSON"),          # B4 len>10 in word2lang -> PF
    ("plain_person_name", "PERSON"),        # not in word2lang -> stays
    ("meridian_workers_party", "ORG"),      # overridden by wikiann POLITICAL_PARTY
    ("helix_assembly", "RELIGION"),         # C1 guard only for listed labels;
                                            # RELIGION blocks ORG override
    ("castora_resident", "PERSON"),         # survives untouched
]

WORD2LANG: tuple[str, ...] = (
    "marisol_benavente_cortez", "teodoro", "huracanidoextra",
)

PF_PROMOTE: tuple[str, ...] = ("castora_resident",)

_BLOCK_LOC = {"FAC", "GPE"}
_BLOCK_ORG = {"LANGUAGE", "RACE", "RELIGION", "NORP", "UNION",
              "SOC_ECO_CLASS", "POLITICAL_PARTY"}


def _clean_wikiann_row(lang: str, ent_type: str, ent: str) -> tuple[str, str] | None:
    """Rules A1-A10 for one row; None = dropped."""
    from kawa_ray.functions.text import canonical_word

    ent = ent.replace(" , ", ", ").replace(" '", "'").replace(" .", ".")
    ent = ent.strip(" ,")
    if lang in CJK_WIKIANN_LANGS:
        ent = ent.replace(" ", "")
    if len(ent) <= 4 or len(ent) > 50 or ent.startswith("List of "):
        return None
    ent = canonical_word(ent, do_lower=True)[0]
    label = ("LOCATION" if ent_type == "LOC"
             else "PUBLIC_FIGURE" if ent_type == "PER" else ent_type)
    ent = ent.replace(" ", "_").replace("-", "_").replace("–", "_")
    if _DIGITS.match(ent.replace("_", "").replace("/", "").replace(".", "")):
        return None
    arr = ent.split("_")
    if (len(arr[0]) == 4 and _DIGITS.match(arr[0])) or \
       (len(arr[-1]) == 4 and _DIGITS.match(arr[-1])):
        return None
    if label == "LOCATION" and (_DIGITS.match(ent[0]) or _DIGITS.match(ent[-1])):
        return None  # ref: -> EVENT then continue (:1238-1240)
    if label == "LOCATION" and ent.count("_") > 0:
        label = "GPE"
    elif label == "ORG" and ent.endswith("_party"):
        label = "POLITICAL_PARTY"
    elif label == "ORG" and ent.endswith("_union"):
        label = "UNION"
    return ent, label


def clean_wikiann_batch(df: pd.DataFrame) -> pd.DataFrame:
    out_w, out_l = [], []
    for lang, et, ent in zip(df["lang"], df["ent_type"], df["ent"]):
        r = _clean_wikiann_row(lang, et, ent)
        if r is not None:
            out_w.append(r[0])
            out_l.append(r[1])
    return pd.DataFrame({"word": out_w, "label": out_l})


def fix_word2ner_batch(df: pd.DataFrame,
                       word2lang: frozenset[str],
                       stop: frozenset[str]) -> pd.DataFrame:
    """Rules B1-B4 over (word, label) rows."""
    from kawa_ray.functions.text import canonical_word

    out_w, out_l = [], []
    for word, label in zip(df["word"], df["label"]):
        if not (cjk_detect(word) or len(word) > 1) or _DIGITS.match(word):
            continue  # B1
        w = canonical_word(word, do_lower=True)[0]
        arr = w.split("_")
        if label != "EVENT" and (
            (len(arr[0]) == 4 and _DIGITS.match(arr[0]))
            or (len(arr[-1]) == 4 and _DIGITS.match(arr[-1]))
        ):
            continue  # B2
        if label in ("PERSON", "PUBLIC_FIGURE") and (
            len(w) <= 1 or w in stop or len(arr) == sum(len(a) for a in arr)
        ):
            continue  # B3
        if label == "PERSON" and w in word2lang and (
            cjk_detect(w) or len(w) > 10 or w.count("_") > 0
        ):
            label = "PUBLIC_FIGURE"  # B4
        out_w.append(w)
        out_l.append(label)
    return pd.DataFrame({"word": out_w, "label": out_l})


def merge_with_overrides(w2n: pd.DataFrame, wikiann: pd.DataFrame,
                         pf_promote: tuple[str, ...]) -> pd.DataFrame:
    """C1 override join + C2 curated promotions (driver-side: both
    tables are lexicon-scale, the corpus never enters this operator)."""
    labels = dict(zip(w2n["word"], w2n["label"]))
    for w, lab in zip(wikiann["word"], wikiann["label"]):
        cur = labels.get(w)
        if lab == "LOCATION" and cur in _BLOCK_LOC:
            continue
        if lab == "ORG" and cur in _BLOCK_ORG:
            continue
        labels[w] = lab
    for w in pf_promote:
        if w in labels:
            labels[w] = "PUBLIC_FIGURE"
    words = sorted(labels)
    return pd.DataFrame({"word": words, "label": [labels[w] for w in words]})


def word2ner_fix(sf_dir: str):
    """The full cascade as a Ray pipeline + before/after label census.

    ``sf_dir`` is unused (fixture-driven operator, like the reference's
    file-driven builder step) but kept for the registry signature."""
    import ray.data as rd

    stop = ALL_STOPWORDS["en"]
    w2lang = frozenset(WORD2LANG)

    wikiann_ds = rd.from_items(
        [{"lang": l, "ent_type": t, "ent": e} for l, t, e in WIKIANN_FIXTURE]
    )
    w2n_ds = rd.from_items(
        [{"word": w, "label": l} for w, l in WORD2NER_FIXTURE]
    )
    cleaned = wikiann_ds.map_batches(clean_wikiann_batch, batch_format="pandas")
    fixed = w2n_ds.map_batches(
        lambda df: fix_word2ner_batch(df, w2lang, stop), batch_format="pandas"
    )
    merged = merge_with_overrides(fixed.to_pandas(), cleaned.to_pandas(),
                                  PF_PROMOTE)
    before = pd.Series([l for _, l in WORD2NER_FIXTURE]).value_counts()
    after = merged["label"].value_counts()
    labels = sorted(set(before.index) | set(after.index))
    return pd.DataFrame({
        "label": labels,
        "n_before": [int(before.get(l, 0)) for l in labels],
        "n_after": [int(after.get(l, 0)) for l in labels],
    })


def _values(rows) -> str:
    def lit(x):
        return "'" + str(x).replace("'", "''") + "'"

    return ",\n    ".join("(" + ",".join(lit(c) for c in r) + ")" for r in rows)


def _word2ner_fix_sql() -> str:
    """Exact DuckDB mirror of the cascade over the same inlined fixture
    (Latin rule paths; CJK branches are pytest-covered — see module
    docstring)."""
    stop = sorted(ALL_STOPWORDS["en"])
    stop_sql = ",".join(f"'{w}'" for w in stop)
    d = _DIGIT_CLASS
    return f"""
WITH wikiann_raw(lang, ent_type, ent) AS (VALUES
    {_values(WIKIANN_FIXTURE)}
), w2n_raw(word, label) AS (VALUES
    {_values(WORD2NER_FIXTURE)}
), word2lang(w) AS (VALUES {",".join(f"('{w}')" for w in WORD2LANG)}
), pf_promote(w) AS (VALUES {",".join(f"('{w}')" for w in PF_PROMOTE)}
), wa1 AS (
  SELECT lang, ent_type,
         TRIM(REPLACE(REPLACE(REPLACE(ent, ' , ', ', '), ' ''', ''''),
                      ' .', '.'), ' ,') AS e1
  FROM wikiann_raw
), wa2 AS (
  SELECT lang, ent_type,
         CASE WHEN lang IN ('zh','ja','ko','th')
              THEN REPLACE(e1, ' ', '') ELSE e1 END AS e1
  FROM wa1
), wa3 AS (
  SELECT REPLACE(REPLACE(REPLACE(LOWER(e1), ' ', '_'), '-', '_'), '–', '_') AS e2,
         CASE WHEN ent_type = 'LOC' THEN 'LOCATION'
              WHEN ent_type = 'PER' THEN 'PUBLIC_FIGURE'
              ELSE ent_type END AS lab
  FROM wa2
  WHERE LENGTH(e1) > 4 AND LENGTH(e1) <= 50 AND NOT starts_with(e1, 'List of ')
), wa4 AS (
  SELECT e2 AS word,
         CASE WHEN lab = 'LOCATION' AND contains(e2, '_') THEN 'GPE'
              WHEN lab = 'ORG' AND ends_with(e2, '_party') THEN 'POLITICAL_PARTY'
              WHEN lab = 'ORG' AND ends_with(e2, '_union') THEN 'UNION'
              ELSE lab END AS label
  FROM wa3
  WHERE NOT regexp_full_match(
          REPLACE(REPLACE(REPLACE(e2, '_', ''), '/', ''), '.', ''), '{d}+')
    AND NOT ((LENGTH(string_split(e2, '_')[1]) = 4
              AND regexp_full_match(string_split(e2, '_')[1], '{d}+'))
          OR (LENGTH(string_split(e2, '_')[-1]) = 4
              AND regexp_full_match(string_split(e2, '_')[-1], '{d}+')))
    AND NOT (lab = 'LOCATION'
             AND (regexp_full_match(substring(e2, 1, 1), '{d}')
               OR regexp_full_match(substring(e2, LENGTH(e2), 1), '{d}')))
), w1 AS (
  SELECT LOWER(word) AS w, label FROM w2n_raw
  WHERE (regexp_matches(word, '[一-鿿가-힣぀-ヿก-๛ꦀ-꧟]') OR LENGTH(word) > 1)
    AND NOT regexp_full_match(word, '{d}+')
), w2 AS (
  SELECT w, label FROM w1
  WHERE NOT (label <> 'EVENT'
             AND ((LENGTH(string_split(w, '_')[1]) = 4
                   AND regexp_full_match(string_split(w, '_')[1], '{d}+'))
               OR (LENGTH(string_split(w, '_')[-1]) = 4
                   AND regexp_full_match(string_split(w, '_')[-1], '{d}+'))))
    AND NOT (label IN ('PERSON', 'PUBLIC_FIGURE')
             AND (LENGTH(w) <= 1 OR w IN ({stop_sql})
                  OR LEN(string_split(w, '_')) = LENGTH(REPLACE(w, '_', ''))))
), w3 AS (
  SELECT w, CASE WHEN label = 'PERSON' AND w IN (SELECT w FROM word2lang)
                      AND (LENGTH(w) > 10 OR contains(w, '_')
                           OR regexp_matches(w, '[一-鿿가-힣぀-ヿก-๛ꦀ-꧟]'))
                 THEN 'PUBLIC_FIGURE' ELSE label END AS label
  FROM w2
), merged AS (
  SELECT COALESCE(wa.word, w3.w) AS w,
         CASE WHEN wa.word IS NULL THEN w3.label
              WHEN wa.label = 'LOCATION' AND w3.label IN ('FAC', 'GPE')
                   THEN w3.label
              WHEN wa.label = 'ORG' AND w3.label IN
                   ('LANGUAGE','RACE','RELIGION','NORP','UNION',
                    'SOC_ECO_CLASS','POLITICAL_PARTY') THEN w3.label
              ELSE wa.label END AS label
  FROM w3 FULL OUTER JOIN wa4 wa ON w3.w = wa.word
), final AS (
  SELECT w, CASE WHEN w IN (SELECT w FROM pf_promote)
                 THEN 'PUBLIC_FIGURE' ELSE label END AS label
  FROM merged
), before AS (
  SELECT label, COUNT(*) AS n FROM w2n_raw GROUP BY label
), after AS (
  SELECT label, COUNT(*) AS n FROM final GROUP BY label
)
SELECT COALESCE(b.label, a.label) AS label,
       COALESCE(b.n, 0) AS n_before,
       COALESCE(a.n, 0) AS n_after
FROM before b FULL OUTER JOIN after a ON b.label = a.label
ORDER BY label
"""


WORD2NER_FIX_SQL = _word2ner_fix_sql()
