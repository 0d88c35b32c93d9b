"""Determinism rules of the synthetic corpus (FIXTURES.md §7)."""

from kawa_ray.sources.pages import generate_pages, ensure_pages, sf_of_dir
from kawa_ray.sources.roster import build_roster


def test_prefix_property():
    """sf-small is a strict prefix of sf-large (hash-of-id assignment)."""
    small, _ = generate_pages(50)
    large, _ = generate_pages(120)
    assert large.slice(0, 50).equals(small)


def test_roster_alias_uniqueness():
    roster = build_roster(300)
    from kawa_ray.sources.roster import normalize_surface

    seen = set()
    for aliases in roster["aliases"].to_pylist():
        for a in aliases:
            n = normalize_surface(a)
            assert n not in seen
            seen.add(n)


def test_schema_matches_input_hint():
    pages, _ = generate_pages(10)
    import pyarrow as pa

    assert pages.schema.field("url").type == pa.string()
    assert pages.schema.field("warc_ts").type == pa.timestamp("us")
    assert pages.schema.field("html").type == pa.binary()
    assert pages.schema.field("text").type == pa.string()
    assert pages.schema.field("lang").type == pa.string()


def test_sf_of_dir():
    assert sf_of_dir("/root/testdata/sf0.01") == "0.01"
    assert sf_of_dir("/root/testdata/sf0.1/") == "0.1"


def test_ensure_pages_cached(tmp_path, monkeypatch):
    import kawa_ray.sources.pages as P

    monkeypatch.setattr(P, "CACHE_DIR", str(tmp_path))
    d1 = P.ensure_pages("0.001")
    d2 = P.ensure_pages("0.001")
    assert d1 == d2
    import os

    assert os.path.exists(os.path.join(d1, "gold_mentions.parquet"))
