"""Regex-typed entity extractors (pipeline stage S2b).

Same label coverage as the reference's ``default_ner_regexes``
(/root/reference/ontology/ontology_builder_data.py:23-41): DOMAIN_NAME,
EMAIL_ADDRESS, USER_NAME, DATE, TIME, PHONE_NUMBER, IP_ADDRESS (v4+v6),
PRICE, CREDIT_CARD, CRYPTO, STREET_ADDRESS (street / ZIP / PO Box
variants), GOVT_ID, ICD_CODE — written from scratch as compact patterns
(notably the domain matcher uses a generic TLD shape instead of the
reference's enumerated TLD list, and USER_NAME matches @handles anywhere
rather than only at line start).

Patterns are compiled once at import; the detection actor reuses them
per batch (stateful-setup-once rule).
"""

from __future__ import annotations

import re

_MONTH = (
    r"(?:jan(?:uary)?|feb(?:ruary)?|mar(?:ch)?|apr(?:il)?|may|jun(?:e)?|"
    r"jul(?:y)?|aug(?:ust)?|sep(?:tember)?|oct(?:ober)?|nov(?:ember)?|dec(?:ember)?)"
)

REGEX_NER: list[tuple[str, re.Pattern]] = [
    ("EMAIL_ADDRESS", re.compile(r"\b[a-z0-9!#$%&'*+/=?^_`{|}~.-]+@(?:[a-z0-9](?:[a-z0-9-]*[a-z0-9])?\.)+[a-z]{2,}\b", re.I)),
    ("USER_NAME", re.compile(r"(?<![\w@.])@[a-z0-9_](?:[a-z0-9_.]{1,28}[a-z0-9_])?\b", re.I)),
    ("ICD_CODE", re.compile(r"\b[A-TV-Z]\d[A-Z0-9]\.[A-Z0-9]{1,4}\b")),
    ("DOMAIN_NAME", re.compile(r"\b(?:https?://)?(?:www\.)?[a-z0-9][a-z0-9.-]*\.[a-z]{2,12}(?:/[^\s()<>\"']*[^\s()<>\"'.,;:!?])?", re.I)),
    ("IP_ADDRESS", re.compile(r"\b(?:(?:25[0-5]|2[0-4]\d|[01]?\d\d?)\.){3}(?:25[0-5]|2[0-4]\d|[01]?\d\d?)\b")),
    ("IP_ADDRESS", re.compile(r"\b(?:[0-9a-f]{1,4}:){7}[0-9a-f]{1,4}\b|\b(?:[0-9a-f]{1,4}:){1,6}:(?:[0-9a-f]{1,4}:?){0,6}[0-9a-f]{1,4}\b", re.I)),
    ("DATE", re.compile(
        rf"\b(?:[0-3]?\d(?:st|nd|rd|th)?\s+(?:of\s+)?{_MONTH}|{_MONTH}\s+[0-3]?\d(?:st|nd|rd|th)?)(?:,)?\s*(?:\d{{4}})?\b"
        r"|\b[0-3]?\d[-/.][0-3]?\d[-/.]\d{2,4}\b", re.I)),
    ("TIME", re.compile(r"\b\d{1,2}:\d{2}(?::\d{2})?\s?(?:[ap]\.?m\.?)?\b|\b\d{1,2}\s?[ap]\.?m\.?\b", re.I)),
    ("PRICE", re.compile(r"[$€£]\s?[+-]?\d{1,3}(?:,?\d{3})*(?:\.\d{1,2})?")),
    ("CRYPTO", re.compile(r"(?<![a-km-zA-HJ-NP-Z0-9])[13][a-km-zA-HJ-NP-Z0-9]{26,33}(?![a-km-zA-HJ-NP-Z0-9])")),
    ("CREDIT_CARD", re.compile(r"\b(?:\d{4}[- ]?){3}\d{4}\b|\b\d{15,16}\b")),
    ("PHONE_NUMBER", re.compile(r"(?<![\d-])(?:\+?\d{1,3}[-.\s]?)?(?:\(\d{2,4}\)[-.\s]?)?\d{3}[-.\s]?\d{3,4}[-.\s]?\d{0,4}(?![\d-])")),
    ("STREET_ADDRESS", re.compile(
        r"\b\d{1,4}\s+[\w .]{1,24}\b(?:street|st|avenue|ave|road|rd|highway|hwy|square|sq|"
        r"trail|trl|drive|dr|court|ct|parkway|pkwy|circle|cir|boulevard|blvd)\b\.?", re.I)),
    ("STREET_ADDRESS", re.compile(r"\bP\.?\s?O\.?\s?Box\s+\d+\b", re.I)),
    ("GOVT_ID", re.compile(r"\b(?!000|666)[0-8]\d{2}[- ](?!00)\d{2}[- ](?!0000)\d{4}\b")),
    ("STREET_ADDRESS", re.compile(r"\b\d{5}(?:-\d{4})?\b(?!-)")),
]



def regex_mentions(text: str) -> list[tuple[str, int, int, str]]:
    """Non-overlapping regex-typed spans, earlier-priority label wins."""
    spans: list[tuple[int, int, str, str]] = []
    taken: list[tuple[int, int]] = []
    for label, pat in REGEX_NER:
        for m in pat.finditer(text):
            s, e = m.span()
            if s == e:
                continue
            if any(s < te and e > ts for ts, te in taken):
                continue
            taken.append((s, e))
            spans.append((s, e, m.group(0), label))
    spans.sort()
    return [(surf, s, e, label) for s, e, surf, label in spans]
