"""Exact duplicated-span detection (q251/q252): planted duplicates are
recovered at character-exact boundaries, reported spans are verbatim
substring equalities that cannot be extended (maximality), the bounds
(resolution floor, within-doc occurrence cap) drop exactly what they
document, and the per-doc profile unions overlapping intervals."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from etl_pipeline_candy_store_spark.operators.dedup import (
    _SPAN_L,
    dup_span_profile_exact,
    exact_dup_spans,
)


def _frame(spark, texts: dict[int, str]):
    return spark.createDataFrame(
        [(i, t, len(t)) for i, t in sorted(texts.items())],
        "doc_id long, text string, n_chars long",
    )


import string

_AB = string.ascii_uppercase + string.ascii_lowercase


def _uniq(seed: int, n: int) -> str:
    """Deterministic filler over a per-seed DISJOINT two-letter alphabet
    (so fillers from different seeds share no character, hence no
    window, and can never extend a planted span across its boundary),
    built from consecutive 7-digit binary counters (so every >=14-char
    window is unique WITHIN the filler too — no occ-cap interference)."""
    c0, c1 = _AB[2 * seed], _AB[2 * seed + 1]
    out = []
    i = 0
    while 7 * i < n + 7:
        out.append(format(i, "07b").replace("0", c0).replace("1", c1))
        i += 1
    return "".join(out)[:n]


def test_planted_span_exact_boundaries(spark):
    shared = "The quick brown fox jumps over the lazy dog!"  # 45 chars
    a = _uniq(1, 30) + shared + _uniq(2, 25)
    b = _uniq(3, 10) + shared + _uniq(4, 40)
    got = exact_dup_spans(_frame(spark, {1: a, 2: b})).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.doc_a, r.doc_b) == (1, 2)
    assert r.span_len == len(shared)
    # 1-indexed starts
    assert r.start_a == 31 and r.start_b == 11
    assert (
        a[r.start_a - 1 : r.start_a - 1 + r.span_len]
        == b[r.start_b - 1 : r.start_b - 1 + r.span_len]
        == shared
    )


def test_spans_are_maximal_verbatim_matches(spark):
    """Independent property check on a multi-pair corpus: every
    reported span is a verbatim substring equality, and extending it
    one character in either direction breaks the match or leaves a
    document (with unbinding caps, spans are true maximal common
    substrings)."""
    shared1 = "zero one two three four five six seven eight"
    shared2 = "pack my box with five dozen liquor jugs today"
    texts = {
        1: _uniq(1, 20) + shared1 + _uniq(2, 30),
        2: _uniq(3, 35) + shared1 + _uniq(4, 10) + shared2 + _uniq(5, 5),
        3: shared2 + _uniq(6, 50),
    }
    rows = exact_dup_spans(_frame(spark, texts)).collect()
    # pairs (1,2) via shared1 and (2,3) via shared2
    assert {(r.doc_a, r.doc_b) for r in rows} == {(1, 2), (2, 3)}
    for r in rows:
        ta, tb = texts[r.doc_a], texts[r.doc_b]
        ia, ib, n = r.start_a - 1, r.start_b - 1, r.span_len
        assert ta[ia : ia + n] == tb[ib : ib + n]
        # maximal: no extension matches
        if ia > 0 and ib > 0:
            assert ta[ia - 1] != tb[ib - 1]
        if ia + n < len(ta) and ib + n < len(tb):
            assert ta[ia + n] != tb[ib + n]


def test_resolution_floor(spark):
    shared = "only twenty characters"  # 22 < _SPAN_L = 24
    assert len(shared) < _SPAN_L
    a = _uniq(1, 30) + shared + _uniq(2, 30)
    b = _uniq(3, 30) + shared + _uniq(4, 30)
    assert exact_dup_spans(_frame(spark, {1: a, 2: b})).count() == 0


def test_within_doc_occurrence_cap(spark):
    """A window repeating more than occ_max times inside one doc is
    degenerate repetition: dropped at the default cap, recovered when
    the cap is lifted."""
    s = "this exact sentence repeats far too many times"
    a = "".join(_uniq(10 + i, 9) + s for i in range(6))  # 6 repeats
    b = _uniq(20, 30) + s + _uniq(21, 30)
    frame = _frame(spark, {1: a, 2: b})
    assert exact_dup_spans(frame).count() == 0
    lifted = exact_dup_spans(frame, occ_max=10).collect()
    assert len(lifted) == 6
    assert all(r.span_len == len(s) for r in lifted)


def test_df_band_drops_boilerplate_windows(spark):
    """A span shared by more docs than df_max is boilerplate-frequency
    and leaves the join (the q248 discipline)."""
    s = "standard boilerplate footer appended to every document"
    texts = {i: _uniq(i, 40) + s for i in range(1, 12)}  # df = 11 > 8
    assert exact_dup_spans(_frame(spark, texts)).count() == 0
    pair_only = {1: texts[1], 2: texts[2]}
    assert exact_dup_spans(_frame(spark, pair_only)).count() == 1


@pytest.mark.slow
def test_hot_window_band_prefilter_scales(spark):
    """r16 de-skew probe (VERDICT r15 #2): ONE boilerplate window
    planted in 50% of a 2000-doc corpus (df = 1000 >> df_max) must be
    dropped by the partial-agg band without ever clustering its
    positions into one task, and the one genuinely planted pair must
    still come out character-exact. Filler windows are globally unique
    (every 24-char window spans a full '<doc:06d>x<ctr:06d>y' group, so
    it embeds its doc id); the boilerplate string is non-periodic so
    the occ cap is not engaged."""
    hot = "the quick brown zebra vaults over the lazy boilerplate dog"
    shared = "EXACTLY-THIS-SPAN-IS-SHARED-BY-TWO-DOCS-ONLY!"

    def filler(doc: int, groups: int, tag: str) -> str:
        return "".join(f"{doc:06d}x{g:06d}{tag}" for g in range(groups))

    # docs 0/1: all-distinct-letter fillers (every window unique within
    # and across docs, occ cap untouched), so their ONLY shared
    # substring is the planted span
    texts = {
        0: "qwertyuiopasdfghjklzxcvbnmQWER" + shared,
        1: "MNBVCXZLKJHGFDSAPOIUYTREWQmnbv" + shared,
    }
    for i in range(2, 2000):
        t = filler(i, 4, "y")
        if i % 2 == 0:
            t += hot + filler(i, 2, "z")
        texts[i] = t
    rows = exact_dup_spans(_frame(spark, texts)).collect()
    planted = [r for r in rows if r.span_len == len(shared)]
    assert len(planted) == 1
    r = planted[0]
    assert (r.doc_a, r.doc_b) == (0, 1)
    a, b = texts[0], texts[1]
    assert (
        a[r.start_a - 1 : r.start_a - 1 + r.span_len]
        == b[r.start_b - 1 : r.start_b - 1 + r.span_len]
        == shared
    )
    # the hot window's interior (df = 999 >> df_max) must be banded
    # away: any surviving span between the even docs can only be a
    # single boundary window whose doc-id prefix/suffix happens to
    # recur in <= df_max docs — never longer than one window, and
    # never the hot string itself
    others = [x for x in rows if x is not r]
    assert all(x.span_len == _SPAN_L for x in others)
    for x in others:
        s = texts[x.doc_a][x.start_a - 1 : x.start_a - 1 + x.span_len]
        assert hot not in s


def test_repeated_occurrences_yield_one_span_each(spark):
    """A shared string occurring twice in doc A and once in doc B (both
    under the occ cap) yields two exact spans on two diagonals."""
    s = "twenty-five character span!!"
    a = _uniq(1, 12) + s + _uniq(2, 12) + s + _uniq(3, 12)
    b = _uniq(4, 12) + s + _uniq(5, 12)
    rows = exact_dup_spans(_frame(spark, {1: a, 2: b})).collect()
    assert len(rows) == 2
    assert sorted(r.start_a for r in rows) == [13, 12 + len(s) + 12 + 1]
    assert all(r.span_len == len(s) and r.start_b == 13 for r in rows)


def test_profile_unions_overlapping_intervals(spark):
    """dup_chars counts the UNION of a doc's duplicated intervals: doc 1
    shares [31, 80] with doc 2 and [61, 110] with doc 3 — 110-31+1 = 80
    chars, not 50+50."""
    base = _uniq(1, 140)
    texts = {
        1: base,
        2: _uniq(2, 25) + base[30:80],  # chars 31..80 of doc 1
        3: _uniq(3, 55) + base[60:110],  # chars 61..110 of doc 1
    }
    prof = {
        r.doc_id: r
        for r in dup_span_profile_exact(_frame(spark, texts)).collect()
    }
    assert prof[1].dup_chars == 80 and prof[1].n_regions == 1
    assert prof[1].longest_span == 50
    assert prof[1].dup_ppm == 1_000_000 * 80 // 140
    assert prof[2].dup_chars == 50 and prof[3].dup_chars == 50


def test_spans_match_batch_oracle_shape(spark):
    """sf0.001 smoke: the catalog builders return non-empty relations
    with the documented schemas (the value-level parity is the
    check_oracle/driver gate)."""
    from etl_pipeline_candy_store_spark.plans.catalog import (
        REGISTRY,
        _ensure_loaded,
    )

    _ensure_loaded()
    sf = "/root/testdata/sf0.001"
    spans = REGISTRY["q251_exact_dup_spans"].builder(spark, sf)
    assert spans.columns == [
        "doc_a",
        "doc_b",
        "start_a",
        "start_b",
        "span_len",
    ]
    n = spans.count()
    assert n > 0
    assert spans.filter(F.col("span_len") < _SPAN_L).count() == 0
    prof = REGISTRY["q252_dup_span_profile_exact"].builder(spark, sf)
    assert prof.columns == [
        "doc_id",
        "longest_span",
        "dup_chars",
        "n_regions",
        "dup_ppm",
    ]
    bad = prof.filter(
        (F.col("dup_chars") < F.col("longest_span"))
        | (F.col("dup_ppm") > 1_000_000)
    )
    assert bad.count() == 0


def test_scrub_removes_doc_b_span_keeps_canonical(spark):
    from etl_pipeline_candy_store_spark.operators.dedup import (
        exact_span_scrub,
    )

    shared = "The quick brown fox jumps over the lazy dog!"
    a = _uniq(1, 30) + shared + _uniq(2, 25)
    b = _uniq(3, 10) + shared + _uniq(4, 40)
    rows = {
        r.doc_id: r
        for r in exact_span_scrub(_frame(spark, {1: a, 2: b})).collect()
    }
    # canonical (lower doc_id) keeps its text whole
    assert rows[1].clean_text == a and rows[1].n_removed == 0
    # the other copy loses exactly the span
    assert rows[2].n_removed == len(shared)
    assert rows[2].clean_text == _uniq(3, 10) + _uniq(4, 40)
    assert rows[2].n_chars == len(b)


def test_scrub_merges_overlapping_cuts(spark):
    """Doc 3 shares overlapping regions with docs 1 and 2 — the cuts
    union before removal, so the clean text is the complement of the
    merged interval, not a double cut."""
    from etl_pipeline_candy_store_spark.operators.dedup import (
        exact_span_scrub,
    )

    base = _uniq(5, 140)
    texts = {
        1: _uniq(1, 25) + base[30:80],  # doc 3 chars 31..80
        2: _uniq(2, 55) + base[60:110],  # doc 3 chars 61..110
        3: base,
    }
    rows = {
        r.doc_id: r
        for r in exact_span_scrub(_frame(spark, texts)).collect()
    }
    # docs 1 and 2 are the LOWER ids of their pairs — untouched
    assert rows[1].n_removed == 0 and rows[1].clean_text == texts[1]
    assert rows[2].n_removed == 0 and rows[2].clean_text == texts[2]
    # doc 3 loses the union [31, 110] once
    assert rows[3].n_removed == 80
    assert rows[3].clean_text == base[:30] + base[110:]


def test_scrub_untouched_docs_pass_through(spark):
    from etl_pipeline_candy_store_spark.operators.dedup import (
        exact_span_scrub,
    )

    texts = {1: _uniq(1, 80), 2: _uniq(2, 80)}
    rows = {
        r.doc_id: r
        for r in exact_span_scrub(_frame(spark, texts)).collect()
    }
    for i in (1, 2):
        assert rows[i].clean_text == texts[i] and rows[i].n_removed == 0
