"""S1 extraction: the per-row byte-identity invariant (BASELINE.json
input_hint) — single-process oracle vs the generator's golden text, and
the Ray map_batches stage vs the oracle."""

import pyarrow as pa

from kawa_ray.functions.html import extract_text
from kawa_ray.sources.pages import generate_pages
from kawa_ray.stages.extract import extract_batch


def test_byte_identity_single_process():
    pages, _ = generate_pages(300)
    for row in pages.to_pylist():
        assert extract_text(row["html"]) == row["text"], row["url"]


def test_extractor_features():
    html = (
        b"<html><head><title>T &amp; U</title><style>x{}</style></head><body>"
        b"<header><nav><ul><li>Home</li></ul></nav></header>"
        b"<h1>Head</h1><p>Hello <b>World</b> &#233;t\xc3\xa9</p>"
        b"<script>var x=1;</script><footer>drop me</footer></body></html>"
    )
    assert extract_text(html) == "T & U\n\nHead\n\nHello World été"


def test_extract_batch_matches_oracle():
    pages, _ = generate_pages(100)
    batch = pages.select(["url", "html", "lang"])
    out = extract_batch(batch)
    assert out.column_names == ["url", "text", "lang"]
    assert out.column("text").to_pylist() == pages.column("text").to_pylist()


def test_determinism_across_batch_splits():
    pages, _ = generate_pages(64)
    batch = pages.select(["url", "html", "lang"])
    whole = extract_batch(batch).column("text").to_pylist()
    parts = []
    for i in range(0, 64, 7):
        parts.extend(extract_batch(batch.slice(i, 7)).column("text").to_pylist())
    assert whole == parts
