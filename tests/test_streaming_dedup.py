"""Stateful streaming exact-dedup: batch equivalence on a single drop,
cross-micro-batch suppression, and state survival across restarts."""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from neuscraper_spark.operators.dedup import exact_dedup
from neuscraper_spark.streaming.dedup import run_dedup_stream

DOCS_DDL = "doc_id long, text string"


def _write_drop(spark, rows, path):
    spark.createDataFrame(pd.DataFrame(rows)).coalesce(1).write.mode(
        "append"
    ).parquet(path)


@pytest.fixture()
def drop_dir(spark, tmp_path):
    d = str(tmp_path / "drops")
    _write_drop(
        spark,
        [
            {"doc_id": 3, "text": "alpha body"},
            {"doc_id": 1, "text": "alpha body"},   # dup within the drop
            {"doc_id": 2, "text": "beta body"},
        ],
        d,
    )
    return d


def _memory_table(spark, name):
    return spark.sql(f"select * from {name}").toPandas()


def test_single_drop_matches_batch(spark, drop_dir, tmp_path):
    q = run_dedup_stream(
        spark, drop_dir, str(tmp_path / "ck"), "dd1", DOCS_DDL, max_files=8
    )
    q.awaitTermination(300)
    got = _memory_table(spark, "dd1").sort_values("content_hash").reset_index(drop=True)
    want = (
        exact_dedup(spark.read.parquet(drop_dir))
        .toPandas()
        .sort_values("content_hash")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)].astype({"keep_id": "int64", "n_dups": "int64"}),
        want[sorted(want.columns)].astype({"keep_id": "int64", "n_dups": "int64"}),
    )
    assert set(got["keep_id"]) == {1, 2}


def test_cross_batch_and_restart_suppression(spark, tmp_path):
    d = str(tmp_path / "drops2")
    ck = str(tmp_path / "ck2")
    out = str(tmp_path / "out2")
    _write_drop(
        spark,
        [{"doc_id": 10, "text": "gamma"}, {"doc_id": 11, "text": "delta"}],
        d,
    )
    q = run_dedup_stream(spark, d, ck, "dd2a", DOCS_DDL, max_files=1, output_dir=out)
    q.awaitTermination(300)
    first = spark.read.parquet(out).toPandas()
    assert set(first["keep_id"]) == {10, 11}

    # second run, same checkpoint: a dup of 'gamma' (lower id!) plus one
    # new hash arrive -> only the new hash is emitted; state from the
    # previous RUN (not just previous micro-batch) suppresses gamma
    _write_drop(
        spark,
        [{"doc_id": 5, "text": "gamma"}, {"doc_id": 12, "text": "epsilon"}],
        d,
    )
    q2 = run_dedup_stream(spark, d, ck, "dd2b", DOCS_DDL, max_files=1, output_dir=out)
    q2.awaitTermination(300)
    both = spark.read.parquet(out).toPandas()
    assert set(both["keep_id"]) == {10, 11, 12}
    assert 5 not in set(both["keep_id"])
    # each hash emitted exactly once across both runs
    assert both["content_hash"].is_unique


def test_state_ttl_accepts_config(spark, tmp_path):
    """TTL variant runs end-to-end (ProcessingTimeTimeout path)."""
    d = str(tmp_path / "drops3")
    _write_drop(spark, [{"doc_id": 1, "text": "zeta"}], d)
    q = run_dedup_stream(
        spark, d, str(tmp_path / "ck3"), "dd3", DOCS_DDL, ttl_minutes=10
    )
    q.awaitTermination(300)
    assert set(_memory_table(spark, "dd3")["keep_id"]) == {1}
