"""Substring-level dedup (operators/substring_dedup.py)."""

import pytest
from pyspark.sql import functions as F

from neuscraper_spark.operators.substring_dedup import (
    duplicated_windows,
    remove_duplicate_windows,
    remove_duplicate_windows_py,
)

BOILER = "all rights reserved copyright notice follows here"  # 7 words


def _df(spark, texts: dict):
    return spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )


def _collect(df):
    return {r["doc_id"]: r.asDict() for r in df.collect()}


def test_matches_python_twin(spark):
    texts = {
        1: f"alpha beta gamma {BOILER} delta",
        2: f"one two {BOILER} three four five",
        3: "entirely unique words with no repeats at all anywhere",
        4: "short doc",
        5: f"{BOILER} {BOILER}",  # within-doc repeat
    }
    got = _collect(remove_duplicate_windows(_df(spark, texts), w=7))
    want = remove_duplicate_windows_py(texts, w=7)
    for i in texts:
        for k in ("n_words", "n_dup_windows", "n_removed", "clean_text"):
            assert got[i][k] == want[i][k], (i, k)


def test_cross_doc_boilerplate_excised(spark):
    texts = {
        1: f"intro words here {BOILER} closing remark",
        2: f"different opening {BOILER} another tail",
    }
    got = _collect(remove_duplicate_windows(_df(spark, texts), w=7))
    for i in (1, 2):
        assert got[i]["n_dup_windows"] == 1  # exactly the boilerplate window
        assert got[i]["n_removed"] == 7
        assert "copyright" not in got[i]["clean_text"]
    assert got[1]["clean_text"] == "intro words here closing remark"
    assert got[2]["clean_text"] == "different opening another tail"


def test_within_doc_repeat_counts(spark):
    texts = {1: f"{BOILER} filler {BOILER}"}  # same 7-gram twice in one doc
    flagged = duplicated_windows(_df(spark, texts), w=7).collect()
    assert {r["pos"] for r in flagged} == {1, 9}


def test_overlapping_windows_merge(spark):
    # 'a b c d' repeated: windows overlap; coverage is a distinct set,
    # so n_removed counts each position once
    texts = {1: "a b c d a b c d", 2: "x a b c d y"}
    got = _collect(remove_duplicate_windows(_df(spark, texts), w=3))
    want = remove_duplicate_windows_py(texts, w=3)
    for i in texts:
        assert got[i]["n_removed"] == want[i]["n_removed"]
        assert got[i]["clean_text"] == want[i]["clean_text"]


def test_short_docs_pass_through_normalized(spark):
    texts = {1: "  two   words  ", 2: "three  word doc"}
    got = _collect(remove_duplicate_windows(_df(spark, texts), w=8))
    assert got[1] == {
        "doc_id": 1, "n_words": 2, "n_dup_windows": 0, "n_removed": 0,
        "clean_text": "two words",
    }


def test_plan_has_no_cartesian_or_python(spark):
    texts = {i: f"word{i} common phrase tail {i}" for i in range(6)}
    plan = (
        remove_duplicate_windows(_df(spark, texts), w=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "EvalPython" not in plan and "MapInPandas" not in plan


def test_min_count_threshold(spark):
    texts = {1: f"{BOILER} x", 2: f"{BOILER} y", 3: f"{BOILER} z"}
    # the boilerplate window occurs 3 times; min_count=4 flags nothing
    assert duplicated_windows(_df(spark, texts), w=7, min_count=4).count() == 0
    assert duplicated_windows(_df(spark, texts), w=7, min_count=3).count() == 3


def test_corpus_filter_chain_excises_spans(spark):
    """apply_corpus_filters(substring_w=...) edits rows in place: text
    loses the duplicated span, every other column survives."""
    from neuscraper_spark.operators.curation import apply_corpus_filters

    # context words are PER-DOC unique: only the pure boilerplate
    # window repeats across docs (a shared word adjacent to the
    # boilerplate would legitimately extend the duplicated span)
    df = spark.createDataFrame(
        [
            (f"https://a.example.com/{i}",
             f"unique{i} open{i} {BOILER} close{i} tail{i}", i)
            for i in range(4)
        ],
        "url string, text string, score long",
    )
    out = apply_corpus_filters(
        df, dedup_urls=False, repetition=False, substring_w=7
    )
    rows = {r["url"]: r for r in out.collect()}
    assert len(rows) == 4
    for i in range(4):
        r = rows[f"https://a.example.com/{i}"]
        assert "copyright" not in r["text"]
        assert r["text"] == f"unique{i} open{i} close{i} tail{i}"
        assert r["score"] == i  # other columns intact
        assert r["n_dup_windows"] == 1 and r["n_removed"] == 7
