"""Equality deletes on TableWriter: merge-on-read visibility,
time-travel interaction, global semantics across appends,
crash-orphan invisibility, and delete materialization."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from neuscraper_spark.sources.writer import TableWriter


@pytest.fixture()
def table(spark, tmp_path):
    root = str(tmp_path / "t")
    df = spark.range(0, 40).select(
        F.concat(F.lit("u"), F.col("id")).alias("url"),
        (F.col("id") % 4).cast("string").alias("bucket"),
        (F.col("id") * 10).alias("score"),
    )
    w = TableWriter(root, partition_col="bucket")
    w.write(df, mode="resume")
    return w


def _urls(df):
    return {r["url"] for r in df.select("url").collect()}


def test_delete_hides_rows_but_keeps_bytes(spark, table):
    before = table.read(spark).count()
    snap = table.delete_where(spark, "score >= 300", key_col="url")
    assert snap["delete"]["n_keys"] == 10
    after = table.read(spark)
    assert after.count() == before - 10
    assert not _urls(after) & {f"u{i}" for i in range(30, 40)}
    # merge-on-read: the data files still physically hold the rows
    raw = spark.read.parquet(table.data_dir).count()
    assert raw == before


def test_time_travel_straddles_the_delete(spark, table):
    pre = table.snapshots()[-1]["snapshot_id"]
    snap = table.delete_where(spark, "score < 100", key_col="url")
    # before the delete: full view; at the delete snapshot: filtered
    assert table.read(spark, snapshot_id=pre).count() == 40
    assert table.read(spark, snapshot_id=snap["snapshot_id"]).count() == 30


def test_deletes_are_global_across_appends(spark, table):
    """A key deleted once stays invisible even if a later append
    re-ingests it (takedown semantics — documented divergence from
    Iceberg sequence scoping)."""
    table.delete_where(spark, "url = 'u5'", key_col="url")
    re_crawl = spark.createDataFrame(
        [("u5", "9", 999), ("u99", "9", 1)], "url string, bucket string, score long"
    )
    table.write(re_crawl, mode="resume")
    got = _urls(table.read(spark))
    assert "u99" in got and "u5" not in got


def test_orphan_delete_dir_is_invisible_and_cleaned(spark, table):
    ddir = os.path.join(table.deletes_dir, "del-0")
    os.makedirs(ddir)
    spark.createDataFrame([("u1",)], "url string").write.mode(
        "overwrite"
    ).parquet(ddir)
    # no .json marker -> not committed: reads unaffected
    assert table.read(spark).count() == 40
    table.delete_where(spark, "url = 'u2'", key_col="url")  # entry cleans orphan
    names = [d["name"] for d in table.committed_deletes()]
    assert names == ["del-0"]  # the orphan's slot was reused cleanly
    assert _urls(table.read(spark)) == {f"u{i}" for i in range(40)} - {"u2"}


def test_read_pruned_applies_deletes(spark, table):
    table.delete_where(spark, "score = 100", key_col="url")
    out = table.read_pruned(spark, "score", lo=50, hi=150)
    assert "u10" not in _urls(out)


def test_materialize_deletes(spark, table):
    before = table.read(spark)
    table.delete_where(spark, "score >= 200", key_col="url")
    logical = table.read(spark).count()
    res = table.compact(spark, apply_deletes=True)
    assert res["materialized_deletes"] == ["del-0"]
    assert table.committed_deletes() == []
    # physically gone from storage now
    assert spark.read.parquet(table.data_dir).count() == logical
    assert table.read(spark).count() == logical
    # manifests reflect the new row counts
    total = sum(
        m["metrics"]["n_rows"] for m in table.partition_metrics().values()
    )
    assert total == logical
    # time-travel to the pre-delete snapshot no longer resurrects the
    # rows (erasure is complete), but it must not raise either
    assert table.read(spark, snapshot_id=0).count() == logical


def test_delete_then_plain_compact_keeps_merge_on_read(spark, table):
    table.delete_where(spark, "score < 50", key_col="url")
    logical = table.read(spark).count()
    table.compact(spark)  # no apply_deletes: layout-only rewrite
    assert table.committed_deletes() != []
    assert table.read(spark).count() == logical
