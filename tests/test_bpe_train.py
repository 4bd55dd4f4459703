"""BPE training loop vs a pure-Python reference implementation.

The catalog oracle (q131) cross-checks Spark against DuckDB running the
SAME unrolled algorithm; this test is the independent third opinion — a
direct dict-based BPE trainer with the textbook greedy left-to-right
merge — so a shared encoding mistake in the sentinel-string trick would
still be caught."""

from __future__ import annotations

import pytest

from collections import Counter

from pyspark.sql import functions as F

from etl_pipeline_candy_store_spark.operators.text import bpe_train


def _ref_bpe(words: dict[str, int], n_merges: int):
    """Textbook BPE: words as symbol tuples, argmax pair by (count,
    then lexicographic), greedy L2R non-overlapping merge."""
    vocab = {tuple(w): n for w, n in words.items()}
    merges = []
    for step in range(1, n_merges + 1):
        counts: Counter = Counter()
        for syms, n in vocab.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += n
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), n_pair = best
        merges.append((step, a, b, n_pair))
        new_vocab: dict[tuple, int] = {}
        for syms, n in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + n
        vocab = new_vocab
    return merges


def test_bpe_train_matches_python_reference(spark):
    # overlapping-merge torture corpus: 'aaaa' exercises greedy L2R
    # ('aa' 'aa', not 'a' 'aa' 'a'), and later merges form multi-char
    # symbols whose substrings must NOT false-match
    docs = spark.createDataFrame(
        [
            (1, "aaaa aaaa aab banana banana bandana"),
            (2, "low lower lowest low low newer new"),
            (3, "aaaa banana low newer aab aab"),
        ],
        "doc_id INT, text STRING",
    )
    words = Counter(
        w
        for (t,) in docs.select("text").collect()
        for w in t.split(" ")
    )
    want = _ref_bpe(dict(words), 6)
    got = [
        (r["step"], r["sym_a"], r["sym_b"], r["n_pair"])
        for r in bpe_train(docs, 6).orderBy("step").collect()
    ]
    assert got == want


def test_bpe_train_deterministic_on_fixture(spark):
    from etl_pipeline_candy_store_spark.plans.catalog import load

    sf = "/root/testdata/sf0.001"
    d = load(spark, sf, "documents")
    a = [tuple(r) for r in bpe_train(d, 3).orderBy("step").collect()]
    b = [tuple(r) for r in bpe_train(d, 3).orderBy("step").collect()]
    assert a == b and len(a) == 3


try:
    from hypothesis import given, settings, strategies as st

    _corpus = st.lists(
        st.text(alphabet="abcde", min_size=1, max_size=6),
        min_size=3,
        max_size=40,
    )

    @given(words=_corpus)
    @settings(max_examples=10, deadline=None)
    @pytest.mark.slow
    def test_bpe_train_property_matches_reference(spark, words):
        """Random small corpora: the distributed trainer must replay the
        textbook algorithm exactly — same merges, same counts, same
        order — including heavy-overlap shapes ('aaaa') the strategy
        generates freely."""
        docs = spark.createDataFrame(
            [(1, " ".join(words))], "doc_id INT, text STRING"
        )
        want = _ref_bpe(dict(Counter(words)), 4)
        got = [
            (r["step"], r["sym_a"], r["sym_b"], r["n_pair"])
            for r in bpe_train(docs, 4).orderBy("step").collect()
        ]
        assert got == want[: len(got)]
        # fewer merges than asked only when candidates genuinely ran dry
        if len(got) < 4:
            assert len(want) == len(got)

except ImportError:  # pragma: no cover
    pass
