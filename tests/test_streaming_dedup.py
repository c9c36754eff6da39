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
        spark, d, str(tmp_path / "ck_ttl"), "dd_ttl", DOCS_DDL, ttl_minutes=10
    )
    # with a state TTL the ProcessingTimeTimeout keeps scheduling
    # triggers (timeout sweeps), so the availableNow query neither
    # self-terminates nor quiesces for processAllAvailable: poll the
    # sink for the emitted row, then stop the query explicitly
    import time

    for _ in range(240):
        if len(_memory_table(spark, "dd_ttl")) > 0:
            break
        time.sleep(0.5)
    try:
        assert set(_memory_table(spark, "dd_ttl")["keep_id"]) == {1}
    finally:
        q.stop()


def test_late_smaller_id_divergence_pinned(spark, tmp_path):
    """PINNED DIVERGENCE (default append mode): a smaller id for an
    already-seen hash arriving in a LATER micro-batch does not change
    the emitted winner — stream keeps the first-batch representative,
    batch exact_dedup keeps the global min. Dup detection identical."""
    import time

    d = str(tmp_path / "drops3")
    _write_drop(spark, [{"doc_id": 5, "text": "zeta"}], d)
    time.sleep(1.1)  # distinct file mtimes -> deterministic batch order
    _write_drop(spark, [{"doc_id": 3, "text": "zeta"}], d)

    q = run_dedup_stream(
        spark, d, str(tmp_path / "ck6"), "dd6", DOCS_DDL, max_files=1
    )
    q.awaitTermination(300)
    got = _memory_table(spark, "dd6")
    assert len(got) == 1
    assert int(got["keep_id"].iloc[0]) == 5  # first-batch winner kept
    assert int(got["n_dups"].iloc[0]) == 1  # count frozen at emission

    batch = exact_dedup(spark.read.parquet(d)).toPandas()
    assert int(batch["keep_id"].iloc[0]) == 3  # batch keeps global min


def test_emit_updates_batch_parity(spark, tmp_path):
    """Batch-parity mode: every micro-batch a hash appears in re-emits
    the running (min id, total count); the LAST emission per hash (=max
    n_dups, counts grow monotonically) equals the batch exact_dedup row
    even when the smaller id arrives late."""
    import time

    d = str(tmp_path / "drops4")
    _write_drop(
        spark,
        [{"doc_id": 5, "text": "zeta"}, {"doc_id": 9, "text": "eta"}],
        d,
    )
    time.sleep(1.1)
    _write_drop(spark, [{"doc_id": 3, "text": "zeta"}], d)

    q = run_dedup_stream(
        spark, d, str(tmp_path / "ck4"), "dd4", DOCS_DDL, max_files=1,
        emit_updates=True,
    )
    q.awaitTermination(300)
    got = _memory_table(spark, "dd4")
    # zeta emitted twice (initial + corrected), eta once
    assert len(got) == 3
    last = got.loc[got.groupby("content_hash")["n_dups"].idxmax()]
    want = exact_dedup(spark.read.parquet(d)).toPandas()
    merged = last.merge(want, on="content_hash", suffixes=("_s", "_b"))
    assert len(merged) == 2
    assert (merged["keep_id_s"] == merged["keep_id_b"]).all()
    assert (merged["n_dups_s"] == merged["n_dups_b"]).all()
    assert set(merged["keep_id_s"]) == {3, 9}

    # upsert stream + append-only file sink is a contract violation
    with pytest.raises(ValueError, match="append-only"):
        run_dedup_stream(
            spark, d, str(tmp_path / "ck5"), "dd5", DOCS_DDL,
            emit_updates=True, output_dir=str(tmp_path / "out5"),
        )
