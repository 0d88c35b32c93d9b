"""B12 — ``create_multilingual_map``: project English example structures
into every language via the synonym graph
(/root/reference/ontology/ontology_builder.py:1095-1170).

The graph is three maps the reference builds from its synonym CSV:
``en``   en word -> translations, ``word2en`` word -> en words,
``word2lang`` word -> languages.  Here they derive from a deterministic
public-vocabulary translation fixture (TRANSLATIONS).

Faithfulness notes:
* The reference's membership gate reads
  ``(word2 in word2en and len(word2en[word2])) <= cut_off_abs`` — the
  parenthesisation makes a missing word pass the gate
  (``False <= 4``).  Reproduced as-is (it is load-bearing: it is what
  admits the identity word when it has no translations).
* The dict-of-str branch uses ``random.choice``; here the choice is the
  lexicographically smallest candidate != word (deterministic engines
  can't ship RNG draw-order dependence).
"""

from __future__ import annotations

from collections import OrderedDict

# concept (en) -> {lang: word}; small public vocabulary, ~14 languages
TRANSLATIONS: dict[str, dict[str, str]] = {
    "water": {"es": "agua", "fr": "eau", "de": "wasser", "it": "acqua",
              "pt": "água", "nl": "water", "sv": "vatten", "pl": "woda",
              "ru": "вода", "tr": "su", "ar": "ماء", "zh": "水",
              "ja": "みず", "ko": "물"},
    "house": {"es": "casa", "fr": "maison", "de": "haus", "it": "casa",
              "pt": "casa", "nl": "huis", "sv": "hus", "pl": "dom",
              "ru": "дом", "tr": "ev", "ar": "بيت", "zh": "房子",
              "ja": "いえ", "ko": "집"},
    "man": {"es": "hombre", "fr": "homme", "de": "mann", "it": "uomo",
            "pt": "homem", "nl": "man", "sv": "man", "pl": "mężczyzna",
            "ru": "мужчина", "tr": "adam", "ar": "رجل", "zh": "男人",
            "ja": "おとこ", "ko": "남자"},
    "woman": {"es": "mujer", "fr": "femme", "de": "frau", "it": "donna",
              "pt": "mulher", "nl": "vrouw", "sv": "kvinna", "pl": "kobieta",
              "ru": "женщина", "tr": "kadın", "ar": "امرأة", "zh": "女人",
              "ja": "おんな", "ko": "여자"},
    "king": {"es": "rey", "fr": "roi", "de": "könig", "it": "re",
             "pt": "rei", "nl": "koning", "sv": "kung", "pl": "król",
             "ru": "король", "tr": "kral", "ar": "ملك", "zh": "国王",
             "ja": "おう", "ko": "왕"},
    "queen": {"es": "reina", "fr": "reine", "de": "königin", "it": "regina",
              "pt": "rainha", "nl": "koningin", "sv": "drottning",
              "pl": "królowa", "ru": "королева", "tr": "kraliçe",
              "ar": "ملكة", "zh": "女王", "ja": "じょおう", "ko": "여왕"},
    "doctor": {"es": "médico", "fr": "médecin", "de": "arzt", "it": "medico",
               "pt": "médico", "nl": "arts", "sv": "läkare", "pl": "lekarz",
               "ru": "врач", "tr": "doktor", "ar": "طبيب", "zh": "医生",
               "ja": "いしゃ", "ko": "의사"},
    "teacher": {"es": "maestro", "fr": "professeur", "de": "lehrer",
                "it": "insegnante", "pt": "professor", "nl": "leraar",
                "sv": "lärare", "pl": "nauczyciel", "ru": "учитель",
                "tr": "öğretmen", "ar": "معلم", "zh": "老师",
                "ja": "せんせい", "ko": "선생님"},
    # an ambiguous word: "casa" maps back to two en words -> exercises
    # the word2en cut_off_abs gate
    "home": {"es": "casa", "fr": "foyer", "de": "heim", "nl": "thuis"},
}


def build_graph() -> tuple[dict, dict, dict]:
    """-> (en, word2en, word2lang) exactly the reference's map shapes."""
    en: dict[str, list[str]] = {}
    word2en: dict[str, list[str]] = {}
    word2lang: dict[str, list[str]] = {}
    for en_word, per_lang in TRANSLATIONS.items():
        en.setdefault(en_word, [])
        for lang, w in sorted(per_lang.items()):
            if w not in en[en_word]:
                en[en_word].append(w)
            word2en.setdefault(w, [])
            if en_word not in word2en[w]:
                word2en[w].append(en_word)
            word2lang.setdefault(w, [])
            if lang not in word2lang[w]:
                word2lang[w].append(lang)
    return en, word2en, word2lang


def _norm(word: str) -> str:
    return word.replace(" ", "_").replace("-", "_").lower().strip(".")


def create_multilingual_map(en_examples, en=None, word2en=None, word2lang=None,
                            allow_list=None, cut_off_abs: int = 4):
    """The reference operator (:1095-1170), all three input shapes."""
    if en is None:
        en, word2en, word2lang = build_graph()
    allow = dict([(a, 1) for a in allow_list or []])
    keys = list(en_examples.keys())
    ret: dict[str, dict] = {}
    if not keys:
        return ret

    def admits(word2: str, key2: str) -> bool:
        # reference gate incl. its parenthesisation (module docstring)
        return word2 == key2 or (word2 in word2en and len(word2en[word2])) <= cut_off_abs

    first = en_examples[keys[0]]
    if isinstance(first, dict):  # dict-of-dict branch (:1104-1120)
        for item in keys:
            for key in en_examples[item]:
                words = [_norm(w) for w in en_examples[item][key]]
                for word in words:
                    if word not in en:
                        continue
                    words2 = [w2 for w2 in en[word] if len(word2en[w2]) <= cut_off_abs]
                    if not words2:
                        continue
                    words2.sort(key=len)
                    word2 = words2[0]
                    for lang in word2lang.get(word2, []):
                        if allow_list is not None and word2 not in allow:
                            continue
                        aHash = ret.setdefault(lang, OrderedDict())
                        aHash[item] = sorted(set(aHash.get(item, []) + [word2]))
    elif isinstance(first, list):  # dict-of-list branch (:1121-1140)
        for item, words in en_examples.items():
            lang2words: dict[str, list[str]] = {}
            for key2 in words:
                key2 = _norm(key2)
                for word2 in en.get(key2, []) + [key2]:
                    if not admits(word2, key2):
                        continue
                    for lang in word2lang.get(word2,
                                              ["en"] if word2 == key2 else []):
                        lang2words.setdefault(lang, []).append(word2)
            lang2words["en"] = list(words)
            for lang, words2 in lang2words.items():
                aHash = ret.setdefault(lang, OrderedDict())
                for word in words2:
                    if allow_list and word not in allow:
                        continue
                    aHash[item] = sorted(set(aHash.get(item, []) + [word]))
    else:  # dict-of-str branch (:1141-1170); deterministic choice here
        for key, key2 in en_examples.items():
            key = _norm(key)
            if key not in en:
                continue
            key2 = _norm(key2)

            def lang_words(k: str) -> dict[str, list[str]]:
                out: dict[str, list[str]] = {}
                for w in en.get(k, []) + [k]:
                    if not admits(w, k):
                        continue
                    for lang in word2lang.get(w, ["en"] if w == k else []):
                        out.setdefault(lang, []).append(w)
                out["en"] = [k]
                return out

            lw, lw2 = lang_words(key), lang_words(key2)
            for lang, words in lw.items():
                for word in words:
                    if allow_list and word not in allow:
                        continue
                    if lang not in lw2:
                        continue
                    cands = sorted(w for w in lw2[lang] if w != word)
                    if not cands:
                        continue
                    word2 = cands[0]
                    if allow_list and word2 not in allow:
                        continue
                    ret.setdefault(lang, OrderedDict())[word] = word2
    return ret


# the projected example structure for the registry query: occupation /
# gender example lists (the reference projects exactly such en example
# dicts when building per-language resources)
EN_EXAMPLES: dict[str, list[str]] = {
    "professions": ["doctor", "teacher"],
    "royalty": ["king", "queen"],
    "people": ["man", "woman"],
    "places": ["house", "home", "water"],
}


def multilingual_map(sf_dir: str):
    """Registry query: the dict-of-list projection flattened to rows
    (lang, item, word), fully deterministic — SQL-oracled."""
    import pandas as pd

    ret = create_multilingual_map(EN_EXAMPLES)
    rows = [
        (lang, item, word)
        for lang in sorted(ret)
        for item in sorted(ret[lang])
        for word in ret[lang][item]
    ]
    return pd.DataFrame(rows, columns=["lang", "item", "word"]).sort_values(
        ["lang", "item", "word"]
    ).reset_index(drop=True)


def _multilingual_map_sql() -> str:
    ex_rows = ",".join(
        f"('{item}','{w}')" for item, ws in EN_EXAMPLES.items() for w in ws
    )
    en, word2en, word2lang = build_graph()
    en_rows = ",".join(
        f"('{k}','{w}')" for k, ws in en.items() for w in ws
    )
    w2l_rows = ",".join(
        f"('{w}','{l}')" for w, ls in word2lang.items() for l in ls
    )
    w2en_rows = ",".join(
        f"('{w}',{len(ks)})" for w, ks in word2en.items()
    )
    return f"""
WITH examples(item, key2) AS (VALUES {ex_rows}),
en_map(key2, word2) AS (VALUES {en_rows}),
w2l(word, lang) AS (VALUES {w2l_rows}),
w2en_count(word, n) AS (VALUES {w2en_rows}),
cands AS (
  SELECT e.item, e.key2, m.word2 FROM examples e JOIN en_map m USING (key2)
  UNION ALL
  SELECT item, key2, key2 AS word2 FROM examples
), gated AS (
  SELECT c.item, c.key2, c.word2
  FROM cands c LEFT JOIN w2en_count wc ON wc.word = c.word2
  -- the reference admits word2 == key2 OR n <= cutoff OR word2 absent
  -- from word2en (its (bool and len) <= 4 parenthesisation)
  WHERE c.word2 = c.key2 OR COALESCE(wc.n, 0) <= 4
), projected AS (
  SELECT DISTINCT g.item, l.lang, g.word2 AS word
  FROM gated g JOIN w2l l ON l.word = g.word2
  WHERE l.lang <> 'en'
  UNION
  SELECT DISTINCT item, 'en' AS lang, key2 AS word FROM examples
)
SELECT lang, item, word FROM projected ORDER BY lang, item, word
"""


MULTILINGUAL_MAP_SQL = _multilingual_map_sql()
