"""Token-winnowing exact-substring duplicate spans (substring_dedup.py).

Pins the content-defined detection guarantee: any exact duplicated run
of >= K_TOKENS + W_WINDOW - 1 tokens is flagged in BOTH copies no matter
how the copies are aligned (the property fixed-stride chunking lacks),
and unique text is never flagged.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from kawa_ray.pipelines.substring_dedup import (
    K_TOKENS,
    W_WINDOW,
    doc_substring_dup_census,
)


def _corpus(tmp_path, texts):
    tbl = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "text": pa.array(texts, pa.string()),
    })
    pq.write_table(tbl, os.path.join(tmp_path, "documents.parquet"))
    return str(tmp_path)


def _uniq(prefix, n):
    return " ".join(f"{prefix}{i}" for i in range(n))


class TestSubstringDup:
    def test_cross_doc_run_detected_any_alignment(self, ray_session, tmp_path):
        # one shared run of exactly the guarantee length, embedded at
        # DIFFERENT offsets (1 vs 17 tokens in) — stride-based chunking
        # with stride > 1 would miss this; winnowing must not
        run = " ".join(f"shared{i}" for i in range(K_TOKENS + W_WINDOW - 1))
        doc_a = _uniq("aa", 1) + " " + run + " " + _uniq("ab", 30)
        doc_b = _uniq("ba", 17) + " " + run + " " + _uniq("bb", 30)
        out = doc_substring_dup_census(_corpus(tmp_path, [doc_a, doc_b]))
        assert int(out["docs_with_dups"].iloc[0]) == 2
        # flagged grams lie inside the run, so the merged span covers at
        # least one gram's K tokens in each doc and never exceeds the
        # run plus gram overhang on each side
        dup = int(out["dup_tokens"].iloc[0])
        assert 2 * K_TOKENS <= dup <= 2 * (K_TOKENS + W_WINDOW - 1 + 2 * K_TOKENS)

    def test_unique_text_not_flagged(self, ray_session, tmp_path):
        texts = [_uniq(f"d{j}w", 60) for j in range(4)]
        out = doc_substring_dup_census(_corpus(tmp_path, texts))
        assert int(out["docs_with_dups"].iloc[0]) == 0
        assert int(out["dup_tokens"].iloc[0]) == 0
        assert int(out["n_docs"].iloc[0]) == 4
        assert int(out["total_tokens"].iloc[0]) == 240

    def test_within_doc_repeat_detected(self, ray_session, tmp_path):
        run = " ".join(f"rep{i}" for i in range(K_TOKENS + W_WINDOW - 1))
        doc = run + " " + _uniq("mid", 25) + " " + run
        out = doc_substring_dup_census(_corpus(tmp_path, [doc]))
        assert int(out["docs_with_dups"].iloc[0]) == 1

    def test_short_docs_counted_not_scanned(self, ray_session, tmp_path):
        # below K+W-1 tokens a doc cannot be scanned but still counts
        out = doc_substring_dup_census(_corpus(tmp_path, ["a b c", "a b c"]))
        assert int(out["n_docs"].iloc[0]) == 2
        assert int(out["total_tokens"].iloc[0]) == 6
        assert int(out["docs_with_dups"].iloc[0]) == 0

    @pytest.mark.parametrize("offset", [0, 1, 3, 7])
    def test_alignment_sweep(self, ray_session, tmp_path, offset):
        run = " ".join(f"s{i}" for i in range(K_TOKENS + W_WINDOW - 1))
        doc_a = (_uniq("pa", offset) + " " + run).strip() + " " + _uniq("ta", 20)
        doc_b = _uniq("pb", 11) + " " + run + " " + _uniq("tb", 20)
        out = doc_substring_dup_census(_corpus(tmp_path, [doc_a, doc_b]))
        assert int(out["docs_with_dups"].iloc[0]) == 2, out
