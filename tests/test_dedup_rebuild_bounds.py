"""Regression: text_dedup_rebuild first-occurrence resolution has no
packed-key range assumption.

The r07 implementation packed the first-wins key as doc_id*2^20 + pos,
which silently corrupts ordering (BIGINT wrap) for doc_id >= 2^43 or
docs with >= 2^20 chunks -- and the oracle shared the packing, so the
oracle gate could not catch it.  r08 resolves first occurrence with a
lexicographic min(struct(doc_id, pos)) on both sides; this test pins
the semantics with a doc_id far beyond the old packed-safe range.
"""

from __future__ import annotations

import hashlib

from ushas_spark.operators.text import CHUNK_TOKENS, text_dedup_rebuild

HUGE_DOC_ID = 1 << 50  # old packing overflows BIGINT at doc_id*2^20


def _chunk(word: str) -> str:
    return " ".join(f"{word}{i}" for i in range(CHUNK_TOKENS))


def test_first_wins_beyond_packed_range(spark, tmp_path):
    dup = _chunk("dup")
    uniq = _chunk("uniq")
    docs = spark.createDataFrame(
        [
            # Same chunk in a tiny-id doc and a beyond-2^43 doc: first
            # occurrence is (1, 0) under (doc_id, pos) order.
            (1, dup),
            (HUGE_DOC_ID, dup),
            # Within-doc repeat: pos 0 survives, pos 1 removed.
            (2, f"{uniq} {uniq}"),
        ],
        "doc_id long, text string",
    )
    sf = str(tmp_path)
    docs.write.parquet(f"{sf}/documents.parquet")

    rows = {r["doc_id"]: r for r in text_dedup_rebuild(spark, sf).collect()}
    assert rows[1]["n_kept"] == 1 and rows[1]["n_removed"] == 0
    assert rows[1]["clean_md5"] == hashlib.md5(dup.encode()).hexdigest()
    # The huge-id doc loses the global tie: everything removed.
    big = rows[HUGE_DOC_ID]
    assert big["n_kept"] == 0 and big["n_removed"] == 1
    assert big["clean_chars"] == 0
    assert big["clean_md5"] == hashlib.md5(b"").hexdigest()
    # Within-doc: first position wins.
    assert rows[2]["n_kept"] == 1 and rows[2]["n_removed"] == 1
    assert rows[2]["clean_md5"] == hashlib.md5(uniq.encode()).hexdigest()
