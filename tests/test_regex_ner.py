"""Differential gate: the windowed fast scan in ``regex_mentions`` must
be byte-identical to the naive 16-full-scan reference implementation on
every input — generated corpus pages, adversarial window-boundary cases,
and random fuzz."""

import random
import string

from kawa_ray.functions.regex_ner import (
    _MERGE_GAP,
    _WINDOW_LEFT,
    _WINDOW_RIGHT,
    regex_mentions,
    regex_mentions_full,
)

ADVERSARIAL = [
    "",
    "no digits at all, just prose with dots. and @ alone",
    # ZIP-like run followed by word chars: trailing \b must still reject
    "12345abcdef" + "x" * 60,
    "12345-6789 ok but 12345-67890 has a trailing digit",
    # match ending near a window edge: digits then exactly-spaced letters
    "745 " + "a" * 22 + " blvd." + " " * 80 + "99",
    # two digit runs separated by just over / just under the merge gap
    "123" + "x" * (_MERGE_GAP + 1) + "456",
    "123" + "x" * _MERGE_GAP + "456",
    "123" + "x" * (_MERGE_GAP - 1) + "456",
    # date with month before day (left window reach)
    "meet me on september 25th, 2024 at noon",
    "deadline:   march    3   ",  # bounded \s{1,8} both paths
    "1st of may 1999 and 31st   of   december   2001",
    # PO box left reach
    "write to P. O. Box 4521 today",
    "write to P.O.Box 4521 today",
    # crypto address: long letter tail after the leading digit
    "pay 1BvBMSEYstWetqTFn5Au4m4GFg7xJaNVN2 now",
    "xx1BvBMSEYstWetqTFn5Au4m4GFg7xJaNVN2yy",  # lookbehind/lookahead reject
    # price symbol just left of the digit window
    "costs $ 1,234.56 or €9.99 or £ 42",
    # phone with +country and parens
    "call +1 (555) 123-4567 or 555.123.4567 soon",
    # time without colon
    "at 5 pm or 11:30:15 a.m. sharp",
    # ICD and GOVT_ID and credit card
    "dx A12.3X4 ssn 123-45-6789 card 4111 1111 1111 1111",
    "bad ssn 000-12-3456 and 666-12-3456 and 123-00-4567",
    # ipv4 / ipv6 (colon trigger)
    "host 192.168.0.255 and fe80::1ff:fe23:4567:890a end",
    "all-hex no-digit segments cafe:beef:cafe:beef:cafe:beef:cafe:beef",
    # emails and handles (at trigger)
    "mail bob.smith+tag@sub.example.co.uk or ping @bob_42 ok",
    # domain with path
    "see https://www.example.com/a/b?c=1 and example.io/x.",
    # street at the very start / very end of text
    "9 Main St",
    "end of text 123 Oak Avenue",
    # digits at text boundaries (window clipping)
    "7",
    "77777",
    "x" * 10 + "12345",
    "12345" + "x" * 10,
    # date numeric forms
    "on 03/04/2021 or 3-4-99 or 31.12.2024.",
]


def test_adversarial_differential():
    for text in ADVERSARIAL:
        assert regex_mentions(text) == regex_mentions_full(text), text


def test_generated_pages_differential():
    from kawa_ray.functions.html import extract_text
    from kawa_ray.sources.pages import generate_pages

    tbl, _gold = generate_pages(300)
    for h in tbl.column("html").to_pylist():
        text = extract_text(h)
        assert regex_mentions(text) == regex_mentions_full(text)


def test_fuzz_differential():
    rng = random.Random(421)
    alphabet = (
        string.ascii_letters + string.digits + " .,:-@$()/+\n"
        "september may box st blvd pm"
    )
    tokens = [
        "12345", "123-45-6789", "$1,234", "3:45 pm", "march 3, 2024",
        "P.O. Box 99", "10 Elm St", "a@b.co", "@user_1", "192.168.1.1",
        "4111111111111111", " ", "word", ".", "-", "\n",
    ]
    for _ in range(400):
        n = rng.randrange(0, 120)
        if rng.random() < 0.5:
            text = "".join(rng.choice(alphabet) for _ in range(n))
        else:
            text = "".join(rng.choice(tokens) for _ in range(rng.randrange(0, 24)))
        assert regex_mentions(text) == regex_mentions_full(text), repr(text)


def test_window_constants_consistent():
    assert _MERGE_GAP == _WINDOW_LEFT + _WINDOW_RIGHT
