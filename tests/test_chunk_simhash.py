"""Semantics of q49 token chunking and q68 simhash near-dup on toy
corpora (the DuckDB oracle covers cross-engine parity; these pin the
operator-level invariants on known inputs)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_candy_store_spark.operators.dedup import q68_simhash_neardup
from etl_pipeline_candy_store_spark.operators.text import (
    _CHUNK_S,
    _CHUNK_W,
    q49_token_chunking,
)


def _write_docs(spark, tmp_path, rows):
    d = str(tmp_path / "docs_sf")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{d}/documents.parquet")
    return d


def test_chunking_covers_and_overlaps(spark, tmp_path):
    n_tok = 150  # -> starts 0, 48, 96, 144
    text = " ".join(f"t{i}" for i in range(n_tok))
    sf = _write_docs(spark, tmp_path, [(1, text, "en", "web", len(text))])
    rows = sorted(
        q49_token_chunking(spark, sf).collect(), key=lambda r: r["chunk_idx"]
    )
    assert [r["chunk_idx"] for r in rows] == [0, 1, 2, 3]
    # full windows until the tail; tail is the remainder
    assert [r["n_chunk_tokens"] for r in rows] == [64, 64, 54, 6]
    toks0 = rows[0]["chunk_text"].split(" ")
    toks1 = rows[1]["chunk_text"].split(" ")
    assert toks0 == [f"t{i}" for i in range(_CHUNK_W)]
    # stride overlap: chunk 1 starts at token 48, re-covering 16 tokens
    assert toks1[0] == f"t{_CHUNK_S}"
    assert toks0[_CHUNK_S:] == toks1[: _CHUNK_W - _CHUNK_S]
    # chunks jointly cover every token
    covered = {t for r in rows for t in r["chunk_text"].split(" ")}
    assert len(covered) == n_tok


def test_chunking_short_doc_single_chunk(spark, tmp_path):
    sf = _write_docs(spark, tmp_path, [(7, "a b c", "en", "web", 5)])
    rows = q49_token_chunking(spark, sf).collect()
    assert len(rows) == 1
    assert (rows[0]["chunk_idx"], rows[0]["n_chunk_tokens"]) == (0, 3)
    assert rows[0]["chunk_text"] == "a b c"


def test_simhash_neardup_finds_identical_and_skips_distant(spark, tmp_path):
    same = " ".join(f"w{i}" for i in range(40))
    near = " ".join(f"w{i}" for i in range(39)) + " zz"  # 1 token swapped
    far = " ".join(f"x{i}" for i in range(40))
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (1, same, "en", "web", len(same)),
            (2, same, "en", "web", len(same)),
            (3, near, "en", "web", len(near)),
            (4, far, "en", "web", len(far)),
        ],
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in q68_simhash_neardup(spark, sf).collect()
    }
    # identical docs: hamming 0, always found
    assert got[(1, 2)] == 0
    # one-token change: few sign flips, found within the radius
    assert (1, 3) in got and (2, 3) in got
    assert got[(1, 3)] == got[(2, 3)] > 0
    # disjoint vocabulary: far in hamming space, not a near-dup
    assert all(4 not in pair for pair in got)
    assert all(h <= 3 and a < b for (a, b), h in got.items())
