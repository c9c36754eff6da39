"""Expectations audit + write-audit-publish gate on TableWriter."""

import json
import os

import pytest
from pyspark.sql import functions as F

from neuscraper_spark.operators.expectations import (
    ExpectationError,
    audit,
    enforce,
)
from neuscraper_spark.sources.writer import TableWriter

RULES = {
    "url": [("not_null",), ("unique",), ("non_empty",)],
    "score": [("between", 0, 100)],
    "lang": [("in_set", ("en", "de"))],
}


def _df(spark, rows):
    return spark.createDataFrame(rows, "url string, score long, lang string, b string")


def test_audit_counts_each_violation(spark):
    df = _df(spark, [
        ("u1", 10, "en", "0"),
        ("u1", 20, "de", "0"),      # dup url
        (None, 30, "en", "1"),      # null url
        ("u3", 999, "fr", "1"),     # score range + lang set
        ("  ", 40, "en", "1"),      # blank url
    ])
    rep = audit(df, RULES)
    assert rep["n_rows"] == 5
    v = rep["violations"]
    assert v["url:not_null"] == 1
    assert v["url:unique"] == 1
    assert v["url:non_empty"] == 2  # the NULL and the blank
    assert v["score:between(0, 100)"] == 1
    assert v["lang:in_set(('en', 'de'))"] == 1


def test_enforce_passes_clean_data(spark):
    df = _df(spark, [("u1", 10, "en", "0"), ("u2", 20, "de", "1")])
    rep = enforce(df, RULES)
    assert rep["n_rows"] == 2
    assert not any(rep["violations"].values())


def test_audit_is_single_pass(spark):
    df = _df(spark, [("u1", 10, "en", "0")])
    # everything folds into one agg: no python eval, <= 2 exchanges
    # (partial/final agg + the count_distinct expand)
    plan = (
        df.agg(F.count(F.lit(1)))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan


def test_write_audit_publish_blocks_bad_batch(spark, tmp_path):
    root = str(tmp_path / "t")
    w = TableWriter(root, partition_col="b")
    bad = _df(spark, [("u1", 10, "en", "0"), ("u1", 999, "xx", "1")])
    with pytest.raises(ExpectationError) as ei:
        w.write(bad, mode="resume", expectations=RULES)
    assert ei.value.report["violations"]["url:unique"] == 1
    # nothing was published: reads see an empty table
    assert w.read(spark).count() == 0
    assert w.committed_partitions() == set()
    # the failed audit is on disk for the operator
    audits = os.listdir(os.path.join(root, "_audits"))
    assert len(audits) == 1
    with open(os.path.join(root, "_audits", audits[0])) as f:
        assert json.load(f)["passed"] is False


def test_write_audit_publish_then_clean_retry(spark, tmp_path):
    root = str(tmp_path / "t")
    w = TableWriter(root, partition_col="b")
    bad = _df(spark, [("u1", 10, "en", "0"), (None, 20, "de", "1")])
    with pytest.raises(ExpectationError):
        w.write(bad, mode="resume", expectations=RULES)
    # the corrected batch publishes cleanly over the invisible leftovers
    good = _df(spark, [("u1", 10, "en", "0"), ("u2", 20, "de", "1")])
    snap = w.write(good, mode="resume", expectations=RULES)
    assert snap["rows_written"] == 2
    assert w.read(spark).count() == 2
    # both audits recorded, second one passed
    audits = sorted(os.listdir(os.path.join(root, "_audits")))
    assert len(audits) == 2


def test_audit_scans_written_bytes_not_input_plan(spark, tmp_path):
    """The audit reads the parquet that landed, so the report's row
    count equals what a reader would see — not what the plan claims."""
    root = str(tmp_path / "t")
    w = TableWriter(root, partition_col="b")
    df = _df(spark, [("u1", 10, "en", "0"), ("u2", 20, "en", "0")])
    w.write(df, mode="resume", expectations=RULES)
    with open(os.path.join(root, "_audits", "audit-0.json")) as f:
        rep = json.load(f)
    assert rep["n_rows"] == 2 and rep["passed"] and rep["partitions_audited"]
