"""Unigram-LM tokenizer (q206-q208): the Spark fold DP must equal a
pure-Python Viterbi reference word-for-word (values AND extracted
segmentations), segmentations must be valid covers, the hard-EM usage
counts must match the reference exactly, and the fertility bake-off
must rank the two tokenizers the way the corpus demands."""

from __future__ import annotations

from collections import Counter

import pyspark.sql.functions as F

from etl_pipeline_candy_store_spark.operators.unigram import (
    _BT,
    _MAXP,
    _MAXW,
    _words_with_dp,
    q208_tokenizer_fertility_compare,
    unigram_em_step,
    unigram_encodings,
)
from etl_pipeline_candy_store_spark.plans.catalog import load

SF = "/root/testdata/sf0.001"


def _py_reference(texts: list[str]):
    """The module's exact semantics, reimplemented independently:
    substring seed vocab with integer log2-bin weights, Viterbi by
    (v desc, k asc), backward extraction by longest reconstructing
    piece."""
    words: Counter = Counter()
    for t in texts:
        for w in t.split(" "):
            if 1 <= len(w) <= _MAXW:
                words[w] += 1
    vocab: Counter = Counter()
    for w, n in words.items():
        for s in range(len(w)):
            for length in range(1, _MAXP + 1):
                if s + length <= len(w):
                    vocab[w[s : s + length]] += n
    b_tot = sum(vocab.values()).bit_length()
    wt = {p: c.bit_length() - b_tot for p, c in vocab.items()}
    enc: dict[str, tuple[int, int]] = {}
    seg: dict[str, list[str]] = {}
    for w in words:
        best: list[tuple[int, int]] = [(0, 0)]
        for i in range(1, len(w) + 1):
            cands = []
            for length in range(1, min(_MAXP, i) + 1):
                p = w[i - length : i]
                if p in wt:
                    v, k = best[i - length]
                    cands.append((v + wt[p], k + 1))
            best.append(max(cands, key=lambda x: (x[0], -x[1])))
        enc[w] = best[len(w)]
        pos, ps = len(w), []
        while pos > 0:
            for length in (4, 3, 2, 1):
                if length <= pos:
                    p = w[pos - length : pos]
                    if (
                        p in wt
                        and best[pos - length][0] + wt[p] == best[pos][0]
                        and best[pos - length][1] + 1 == best[pos][1]
                    ):
                        ps.append(p)
                        pos -= length
                        break
        seg[w] = ps
    return words, wt, enc, seg


def _texts(spark):
    return [r["text"] for r in load(spark, SF, "documents").collect()]


def test_viterbi_values_match_python_reference(spark):
    words, _, enc, _ = _py_reference(_texts(spark))
    got = {
        r["word"]: (r["v"], r["k"], r["n"])
        for r in unigram_encodings(load(spark, SF, "documents")).collect()
    }
    assert set(got) == set(words), "every distinct word must be encoded"
    for w, (v, k) in enc.items():
        assert got[w] == (v, k, words[w]), f"DP mismatch for {w!r}"


def test_segmentations_are_valid_and_match_reference(spark):
    _, wt, _, seg = _py_reference(_texts(spark))
    rows = (
        _words_with_dp(load(spark, SF, "documents"))
        .select("word", F.expr(_BT).alias("ps"))
        .collect()
    )
    assert rows
    for r in rows:
        pieces = list(r["ps"])
        # extraction walks right-to-left; pieces concatenate reversed
        assert "".join(reversed(pieces)) == r["word"]
        assert all(p in wt for p in pieces)
        assert pieces == seg[r["word"]], f"extraction mismatch for {r['word']!r}"


def test_em_usage_matches_python_reference(spark):
    words, wt, _, seg = _py_reference(_texts(spark))
    usage: Counter = Counter()
    for w, n in words.items():
        for p in seg[w]:
            usage[p] += n
    u_tot = sum(usage.values()).bit_length()
    got = {
        r["piece"]: (r["n_viterbi"], r["w_old"], r["w_new"])
        for r in unigram_em_step(
            load(spark, SF, "documents"), top=10**6
        ).collect()
    }
    assert set(got) == set(usage), "EM must count exactly the used pieces"
    for p, n in usage.items():
        assert got[p] == (n, wt[p], n.bit_length() - u_tot), p
    # the EM prune is real: the seed vocab is strictly larger than usage
    assert len(usage) < len(wt)


def test_fertility_compare(spark):
    rows = {
        r["method"]: r
        for r in q208_tokenizer_fertility_compare(spark, SF).collect()
    }
    assert set(rows) == {"bpe3", "unigram"}
    assert rows["bpe3"]["n_words"] == rows["unigram"]["n_words"]
    for r in rows.values():
        assert r["fert_micros"] == (r["n_subwords"] * 1_000_000) // r["n_words"]
    # 3 BPE merges barely compress; the substring-seeded unigram with
    # 4-char pieces must beat it on this corpus
    assert rows["unigram"]["fert_micros"] < rows["bpe3"]["fert_micros"]


def test_em2_encode_matches_python_reference(spark):
    """Iteration-2 encoding (full EM cycle: seed Viterbi -> usage ->
    re-binned pruned vocab -> re-Viterbi) must match an independent
    Python replay per word, and the hard-EM invariant must hold: every
    calibration word stays segmentable under the pruned vocab."""
    from etl_pipeline_candy_store_spark.operators.unigram import (
        unigram_encode_docs_em2,
    )

    texts = _texts(spark)
    words, wt, _, seg = _py_reference(texts)
    usage: Counter = Counter()
    for w, n in words.items():
        for p in seg[w]:
            usage[p] += n
    u_tot = sum(usage.values()).bit_length()
    wt2 = {p: c.bit_length() - u_tot for p, c in usage.items()}

    # iteration-2 Viterbi under the pruned vocab (same DP, partial)
    enc2: dict[str, tuple[int, int]] = {}
    for w in words:
        best: list[tuple[int, int] | None] = [(0, 0)]
        for i in range(1, len(w) + 1):
            cands = []
            for length in range(1, min(_MAXP, i) + 1):
                p = w[i - length : i]
                if p in wt2 and best[i - length] is not None:
                    v, k = best[i - length]
                    cands.append((v + wt2[p], k + 1))
            best.append(
                max(cands, key=lambda x: (x[0], -x[1])) if cands else None
            )
        assert best[len(w)] is not None, (
            f"hard-EM invariant violated: {w!r} unsegmentable"
        )
        enc2[w] = best[len(w)]

    # per-doc expectation from the word-level reference
    want: dict[int, tuple[int, int, int]] = {}
    docs = load(spark, SF, "documents").select("doc_id", "text").collect()
    for r in docs:
        n_words = n_pieces = ll = 0
        for w in r["text"].split(" "):
            if w in enc2:
                v, k = enc2[w]
                n_words += 1
                n_pieces += k
                ll += v
        if n_words:
            want[r["doc_id"]] = (n_words, n_pieces, ll)

    got = {
        r["doc_id"]: (r["n_words"], r["n_pieces"], r["ll_bits"])
        for r in unigram_encode_docs_em2(
            load(spark, SF, "documents")
        ).collect()
    }
    assert got == want
    # EM tightened the model: corpus log-likelihood must not decrease
    _, _, enc1 = (
        None,
        None,
        {w: e for w, e in _py_reference(texts)[2].items()},
    )
    ll1 = sum(words[w] * enc1[w][0] for w in words)
    ll2 = sum(words[w] * enc2[w][0] for w in words)
    assert ll2 >= ll1, "re-estimation must not reduce total likelihood"
