"""Faker-style per-locale person providers (B10 breadth).

The reference walks python-faker's person providers for 57 locales
(ontology_builder_data.py:1056) and exports, per base language: the
provider's ``formats`` turned into a PERSON ner_regex
(``'{{first_name}} {{last_name}}'`` -> ``'<FIRST_NAME>\\d+ <LAST_NAME>\\d+'``,
ontology_builder.py:960-966) plus deduplicated
first/last-name and prefix lists (ontology_builder.py:967-1021).

The sandbox has no faker package, so each locale carries a compact
deterministic fixture provider with the same attribute shape (formats +
name lists synthesised from md5-picked syllables — NOT real names, the
export TRANSFORM is the operator under test); ``export_person_resources``
reimplements the reference's merge loop exactly: locales sharing a base
language union into one resource dict, every list set-deduplicated.
"""

from __future__ import annotations

from kawa_ray.functions.minhash import md5_low64

# the reference's locale list verbatim (public locale codes) — exactly
# 57 entries, programmatically diffed against the single `faker_list`
# assignment at ontology_builder_data.py:1056 (0 missing, 0 extra); a
# round-3 review note claiming 58 was a miscount
FAKER_LOCALES = [
    "ar_AA", "ar_PS", "ar_SA", "bg_BG", "cs_CZ", "de_AT", "de_CH", "de_DE",
    "dk_DK", "el_GR", "en_GB", "en_IE", "en_IN", "en_NZ", "en_TH", "en_US",
    "es_CA", "es_ES", "es_MX", "et_EE", "fa_IR", "fi_FI", "fr_CA", "fr_CH",
    "fr_FR", "fr_QC", "ga_IE", "he_IL", "hi_IN", "hr_HR", "hu_HU", "hy_AM",
    "id_ID", "it_IT", "ja_JP", "ka_GE", "ko_KR", "lt_LT", "lv_LV", "ne_NP",
    "nl_NL", "no_NO", "or_IN", "pl_PL", "pt_BR", "pt_PT", "ro_RO", "ru_RU",
    "sl_SI", "sv_SE", "ta_IN", "th_TH", "tr_TR", "tw_GH", "uk_UA", "zh_CN",
    "zh_TW",
]

_FORMAT_POOL = [
    "{{first_name}} {{last_name}}",
    "{{last_name}} {{first_name}}",
    "{{prefix}} {{first_name}} {{last_name}}",
    "{{first_name_female}} {{last_name}}",
    "{{first_name_male}} {{last_name}}",
    "{{last_name}}, {{first_name}}",
]

_SYL = ["an", "ka", "ri", "to", "mi", "la", "so", "ve", "du", "ne",
        "ol", "ba", "sha", "ur", "el", "ta"]


def _name(locale: str, kind: str, i: int) -> str:
    v = md5_low64(f"{locale}:{kind}:{i}")
    n_syl = 2 + v % 2
    return "".join(_SYL[(v >> (4 * (j + 1))) % len(_SYL)]
                   for j in range(n_syl)).capitalize()


def locale_provider(locale: str) -> dict:
    """Deterministic provider fixture: same attribute names as
    ``faker.providers.person.<locale>.Provider``."""
    v = md5_low64(f"provider:{locale}")
    n_fmt = 1 + v % 3
    fmts = [_FORMAT_POOL[(v >> (8 + 3 * i)) % len(_FORMAT_POOL)]
            for i in range(n_fmt)]
    # keep first occurrence order, dedup
    formats = list(dict.fromkeys(fmts))
    n_first = 6 + (v >> 20) % 6
    n_last = 6 + (v >> 24) % 6
    prov = {
        "formats": formats,
        "first_names_female": [_name(locale, "fnf", i) for i in range(n_first)],
        "first_names_male": [_name(locale, "fnm", i) for i in range(n_first)],
        "last_names": [_name(locale, "ln", i) for i in range(n_last)],
    }
    prov["first_names"] = sorted(set(prov["first_names_female"]
                                     + prov["first_names_male"]))
    if (v >> 30) & 1:
        prov["prefixes_female"] = ["Ms", "Dr"]
        prov["prefixes_male"] = ["Mr", "Dr"]
    return prov


def format_to_regex(formats: list[str]) -> str:
    """The reference's format -> regex transform, verbatim
    (ontology_builder.py:963): ``{{`` -> ``<``, ``}}`` -> ``>\\d+``,
    then uppercased.  The trailing ``.upper()`` turns the spliced
    ``\\d+`` into ``\\D+`` — a load-bearing quirk of the reference's
    exported regexes, reproduced as-documented."""
    return "|".join(
        f.replace("{{", "<").replace("}}", ">\\d+").upper() for f in formats
    )


def export_person_resources() -> dict[str, dict]:
    """lang -> person resource dict, merged across that language's
    locales exactly like ontology_builder.py:955-1021 (set-union per
    key; one PERSON ner_regex tuple appended per locale)."""
    lang2person: dict[str, dict] = {}
    for locale in FAKER_LOCALES:
        lang2 = locale.split("_")[0]
        a = lang2person.get(lang2, {})
        prov = locale_provider(locale)
        if "formats" in prov:
            regexes = a.get("ner_regexes", [])
            regexes = regexes + [("PERSON", format_to_regex(prov["formats"]),
                                  False, ())]
            a["ner_regexes"] = regexes
        for src, dst in (
            ("first_names_female", "FIRST_NAME_FEMALE"),
            ("first_names_male", "FIRST_NAME_MALE"),
            ("last_names", "LAST_NAME"),
            ("first_names", "FIRST_NAME"),
            ("prefixes_female", "PREFIX_FEMALE"),
            ("prefixes_male", "PREFIX_MALE"),
        ):
            if src in prov:
                a[dst] = sorted(set(a.get(dst, []) + list(prov[src])))
        lang2person[lang2] = a
    return lang2person
