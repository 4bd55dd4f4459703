"""Winnow fingerprints on texts with irregular whitespace (ADVICE r15).

The r15 composed-hash rewrite of winnow_fingerprints folds the
polynomial per DISTINCT token and composes shingle hashes as
h(t1 ' ' t2 ' ' t3). The composition is only correct if the EMPTY token
(produced by consecutive / leading / trailing spaces under
split(text, ' ')) contributes the identity (h=0, pw=1) — but Spark's
split('', '') returns [''] and the naive fold yields pw=31, silently
changing q48 fingerprints and q239 pairs on such texts. These tests pin
the fixed fold against a pure-Python replica of the q48 DuckDB oracle
(character fold over the materialized shingle strings), which is exact
integer arithmetic in all three implementations.
"""

from __future__ import annotations

from etl_pipeline_candy_store_spark.operators.text import winnow_fingerprints

_P = 1_000_000_007


def _char_fold(s: str) -> int:
    h = 0
    for ch in s:
        h = (h * 31 + ord(ch)) % _P
    return h


def _oracle_wmins(text: str) -> set[int]:
    """The q48 oracle's pipeline in Python: shingle strings from
    string_split(text, ' ') (empty tokens KEPT, exactly like both
    engines), char-fold hash per shingle, min per trailing 4-shingle
    window, distinct."""
    toks = text.split(" ")
    hs = [
        _char_fold(" ".join(toks[i : i + 3]))
        for i in range(len(toks) - 2)
    ]
    return {min(hs[i : i + 4]) for i in range(len(hs))}


_TEXTS = {
    1: "aa  bb cc dd",          # consecutive spaces -> empty token
    2: " leading spaces here",  # leading space -> empty first token
    3: "trailing spaces here ",  # trailing space -> empty last token
    4: "a  b  c  d",            # alternating empty tokens
    5: "plain single spaced text row",  # control: no empty tokens
    6: "x   y z",               # run of 3 spaces -> two empty tokens
}


def test_winnow_matches_oracle_char_fold_on_irregular_whitespace(spark):
    docs = spark.createDataFrame(
        sorted(_TEXTS.items()), "doc_id long, text string"
    )
    got: dict[int, set[int]] = {}
    for row in winnow_fingerprints(docs).collect():
        got.setdefault(row.doc_id, set()).add(row.wmin)
    want = {i: _oracle_wmins(t) for i, t in _TEXTS.items()}
    assert got == want


def test_empty_token_vocab_identity(spark):
    # the specific advisor counterexample: 'aa  bb cc dd' first shingle
    # is 'aa  bb' (double space), whose composed hash must equal the
    # character fold of that exact string
    docs = spark.createDataFrame([(1, "aa  bb cc dd")], "doc_id long, text string")
    wmins = {r.wmin for r in winnow_fingerprints(docs).collect()}
    # shingles: 'aa  bb', ' bb cc', 'bb cc dd' (tokens: aa, '', bb, cc, dd)
    hs = [_char_fold("aa  bb"), _char_fold(" bb cc"), _char_fold("bb cc dd")]
    want = {min(hs[i : i + 4]) for i in range(len(hs))}
    assert wmins == want
