"""B10/B15 — per-language resource census over the full resource build:
stopwords (134-language parity with the reference's
/root/reference/ontology/stopwords.py:5), the roster-derived resource
dicts (state/lang_resources.py), and the faker-style per-locale person
exports (state/faker_locales.py, mirroring ontology_builder.py:953-1021).

Rows-only driver check (the resources are deterministic in-repo
fixtures, not derivable from the driver's parquet tables); breadth is
gated in tests/test_lang_resources.py (>= the reference's 134 stopword
languages, every faker base language exporting names + a PERSON regex).
"""

from __future__ import annotations

import pandas as pd

from kawa_ray.state.faker_locales import export_person_resources
from kawa_ray.state.lang_names import LANG_NAMES, lang_name
from kawa_ray.state.lang_resources import BINARY_GENDER_SWAP, build_lang_resources
from kawa_ray.state.stopwords import ALL_STOPWORDS


def lang_resources_census(sf_dir: str) -> pd.DataFrame:
    """One row per language across all resource layers: English name
    (166-lang map parity, B15), stopword count, exported name-list
    sizes, PERSON-regex count, gender-swap presence.  ``sf_dir`` is
    unused (fixture-derived resources; the signature is the registry
    contract)."""
    roster_res = build_lang_resources()
    person_res = export_person_resources()
    langs = sorted(set(ALL_STOPWORDS) | set(roster_res) | set(person_res)
                   | set(LANG_NAMES))
    rows = []
    for lang in langs:
        r = roster_res.get(lang, {})
        p = person_res.get(lang, {})
        rows.append({
            "lang": lang,
            "lang_name": lang_name(lang),
            "n_stopwords": len(ALL_STOPWORDS.get(lang, ())),
            "n_first_names": len(set(p.get("FIRST_NAME", []))
                                 | set(r.get("FIRST_NAME", []))),
            "n_last_names": len(set(p.get("LAST_NAME", []))
                                | set(r.get("LAST_NAME", []))),
            "n_person_names": len(r.get("PERSON_NAME", [])),
            "n_ner_regexes": len(p.get("ner_regexes", [])),
            "has_gender_swap": int(lang in BINARY_GENDER_SWAP),
        })
    out = pd.DataFrame(rows)
    # self-gates (driver row is no_oracle): reference parity on breadth —
    # 134 stopword languages (stopwords.py:5), 166-language name map,
    # every faker base language exporting names + a PERSON regex
    # (inlined from tests/test_lang_resources.py)
    from kawa_ray.gates import gate
    from kawa_ray.state.faker_locales import FAKER_LOCALES

    gate(int((out["n_stopwords"] > 0).sum()) >= 134,
         "stopword language breadth below reference parity",
         n=int((out["n_stopwords"] > 0).sum()))
    gate(len(LANG_NAMES) >= 166, "language-name map lost entries",
         n=len(LANG_NAMES))
    base_langs = {loc.split("_")[0] for loc in FAKER_LOCALES}
    by_lang = out.set_index("lang")
    bad = [lg for lg in sorted(base_langs)
           if lg not in by_lang.index
           or by_lang.loc[lg, "n_first_names"] == 0
           or by_lang.loc[lg, "n_ner_regexes"] == 0]
    gate(not bad, "faker locale export lost names or PERSON regexes",
         langs=bad)
    return out
