"""Parity tests for the round-5 curation additions: Gopher repetition
rules (operators/repetition.py) and C4 line filtering + URL
canonicalization (operators/curation.py). Each Spark operator is
checked cell-by-cell against its single-process twin on texts crafted
to fire every rule branch."""

from __future__ import annotations

import pytest

from neuscraper_spark.operators.curation import (
    c4_line_filter,
    c4_line_filter_py,
    url_dedup,
    url_norm_py,
    with_url_norm,
)
from neuscraper_spark.operators.repetition import (
    METRIC_COLS,
    repetition_py,
    with_repetition,
)

REP_TEXTS = [
    # every-line-duplicated
    "same line here\nsame line here\nsame line here",
    # duplicate paragraphs, unique lines
    "alpha beta gamma\n\ndelta epsilon\n\nalpha beta gamma",
    # heavy 2-gram repetition, no line dups
    "spark rocks spark rocks spark rocks spark rocks",
    # repeated 5-gram phrase embedded twice
    "one two three four five x y one two three four five z",
    # no repetition at all
    "a quick brown fox jumps over the lazy dog tonight",
    # whitespace handling: runs of blanks must not create empty words
    "  padded   words   padded   words  ",
    # single word / empty-ish edge cases
    "word",
    "   ",
    "",
    # mixed: dup lines AND dup grams
    "buy now buy now buy now\nunique middle line\nbuy now buy now buy now",
]


def test_repetition_spark_matches_twin(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(REP_TEXTS)], ["doc_id", "text"]
    )
    rows = {
        r["doc_id"]: r.asDict()
        for r in with_repetition(df).collect()
    }
    for i, t in enumerate(REP_TEXTS):
        want = repetition_py(t)
        got = rows[i]
        for k in [*METRIC_COLS, "repetition_pass"]:
            assert got[k] == pytest.approx(want[k]), (i, k, t)


def test_repetition_hashed_grams_identical(spark):
    """hash_grams=True (the constant-width-shuffle production setting)
    must produce the same metrics as exact gram strings."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(REP_TEXTS)], ["doc_id", "text"]
    )
    cols = ["doc_id", *METRIC_COLS, "repetition_pass"]
    exact = sorted(
        tuple(r[c] for c in cols) for r in with_repetition(df).collect()
    )
    hashed = sorted(
        tuple(r[c] for c in cols)
        for r in with_repetition(df, hash_grams=True).collect()
    )
    assert exact == hashed


def test_repetition_rule_boundaries():
    # a fully-duplicated doc fails the line rule; a clean one passes all
    bad = repetition_py("x y z a b\nx y z a b\nx y z a b")
    assert bad["dup_line_frac"] == round(2 / 3, 4)
    assert not bad["repetition_pass"]
    good = repetition_py(
        "the sun rose early today\nbirds sang in the garden\n"
        "children walked to school happily"
    )
    assert good["repetition_pass"]


def test_repetition_empty_doc_passes():
    m = repetition_py("")
    assert all(m[k] == 0.0 for k in METRIC_COLS)
    assert m["repetition_pass"]


C4_TEXTS = [
    # kept: punctuated, 5+ words; dropped: short / unpunctuated / js
    "this line ends with a period.\nshort one.\nno punctuation at all here\n"
    "please enable JavaScript to see this content.\n"
    'a quoted line with five words"',
    # page poisoned by lorem ipsum
    "a good long sentence that survives the filter.\nlorem ipsum dolor",
    # page poisoned by a brace
    "another good long sentence that survives here.\nfunction() { x }",
    # nothing kept
    "word\nanother\n",
    "",
]


def test_c4_line_filter_matches_twin(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(C4_TEXTS)], ["doc_id", "text"]
    )
    rows = {r["doc_id"]: r.asDict() for r in c4_line_filter(df).collect()}
    for i, t in enumerate(C4_TEXTS):
        want = c4_line_filter_py(t)
        got = rows[i]
        for k in ("n_lines_kept", "clean_text", "has_lorem", "has_brace", "page_pass"):
            assert got[k] == want[k], (i, k, t)


def test_c4_kept_lines_preserve_order(spark):
    text = "zz first kept line stays first.\nmiddle dropped\n" \
           "aa second kept line stays second."
    df = spark.createDataFrame([(0, text)], ["doc_id", "text"])
    row = c4_line_filter(df).collect()[0]
    assert row["clean_text"].split("\n") == [
        "zz first kept line stays first.",
        "aa second kept line stays second.",
    ]


URLS = [
    "https://WWW.Example.COM/Path/To/Page/?utm_source=x&utm_medium=y",
    "http://example.com/path/to/page",
    "https://example.com/path/to/page/",
    "example.com/path/to/page",
    "https://www.other.org/",
    "https://other.org?utm_campaign=z",
]


def test_url_norm_matches_twin(spark):
    df = spark.createDataFrame([(i, u) for i, u in enumerate(URLS)], ["doc_id", "url"])
    rows = {r["doc_id"]: r["url_norm"] for r in with_url_norm(df).collect()}
    for i, u in enumerate(URLS):
        assert rows[i] == url_norm_py(u), u


def test_url_dedup_collapses_variants(spark):
    df = spark.createDataFrame([(i, u) for i, u in enumerate(URLS)], ["doc_id", "url"])
    out = {r["url_norm"]: (r["n_docs"], r["keeper"]) for r in url_dedup(df).collect()}
    # the first four URLS are the same page in different disguises
    assert out["example.com/path/to/page"] == (4, 0)
    assert out["other.org"] == (2, 4)


def test_apply_corpus_filters_chain(spark):
    from neuscraper_spark.operators.curation import apply_corpus_filters

    clean = (
        "the sun rose early today over the quiet harbor\n"
        "fishing boats left before dawn with full nets expected"
    )
    spammy = "buy now " * 40  # fails every repetition n-gram rule
    rows = [
        # url variants of one page: dedup keeps the lexicographic min
        ("http://a.com/x", clean),
        ("https://a.com/x/", clean),
        ("https://www.a.com/x?utm_source=f", clean),
        # a distinct clean page survives everything
        ("https://b.com/y", clean + " and the tide turned at noon"),
        # repetitive page is dropped by the Gopher rules
        ("https://c.com/z", spammy),
    ]
    df = spark.createDataFrame(rows, ["url", "text"])
    out = apply_corpus_filters(df).collect()
    urls = sorted(r["url"] for r in out)
    assert urls == ["http://a.com/x", "https://b.com/y"]
    # filters must not add or rename columns
    assert sorted(out[0].asDict()) == ["text", "url"]


def test_apply_corpus_filters_near_dup(spark):
    base = (
        "a long shared paragraph about harbors boats tides and nets "
        "that appears nearly verbatim on two mirror pages with only "
        "tiny edits between them across many many words of overlap"
    )
    rows = [
        ("https://m1.com/p", base + " mirror one"),
        ("https://m2.com/p", base + " mirror two"),
        ("https://q.com/r", "completely different text about mountains and snow today"),
    ]
    from neuscraper_spark.operators.curation import apply_corpus_filters

    df = spark.createDataFrame(rows, ["url", "text"])
    out = sorted(
        r["url"]
        for r in apply_corpus_filters(
            df, dedup_urls=False, repetition=False, near_dup_threshold=0.5
        ).collect()
    )
    # exactly one mirror survives (the min hashed id — arbitrary but
    # deterministic), plus the unrelated page
    assert len(out) == 2 and "https://q.com/r" in out
    assert len([u for u in out if u.startswith("https://m")]) == 1
