"""Position deletes on TableWriter: merge-on-read by (file, row)
address, contrast with equality semantics, compaction safety."""

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


def test_position_delete_hides_rows_keeps_bytes(spark, table):
    snap = table.delete_positions(spark, "score >= 300")
    assert snap["delete"]["kind"] == "position"
    assert snap["delete"]["n_keys"] == 10
    got = table.read(spark)
    assert got.count() == 30
    assert not _urls(got) & {f"u{i}" for i in range(30, 40)}
    assert "_file" not in got.columns and "_pos" not in got.columns
    # merge-on-read: bytes still on disk
    assert spark.read.parquet(table.data_dir).count() == 40


def test_position_delete_does_not_embargo_reingested_rows(spark, table):
    """The semantic contrast with equality deletes: a position delete
    pins the rows that matched NOW; re-appending identical content is
    unaffected (fix a bad batch without a takedown embargo)."""
    table.delete_positions(spark, "url = 'u5'")
    assert "u5" not in _urls(table.read(spark))
    re_crawl = spark.createDataFrame(
        [("u5", "9", 50)], "url string, bucket string, score long"
    )
    table.write(re_crawl, mode="resume")
    assert "u5" in _urls(table.read(spark))  # equality delete would hide it


def test_time_travel_straddles_position_delete(spark, table):
    pre = table.snapshots()[-1]["snapshot_id"]
    snap = table.delete_positions(spark, "score < 100")
    assert table.read(spark, snapshot_id=pre).count() == 40
    assert table.read(spark, snapshot_id=snap["snapshot_id"]).count() == 30


def test_compact_refuses_pending_position_deletes(spark, table):
    table.delete_positions(spark, "score = 0")
    with pytest.raises(ValueError, match="position deletes"):
        table.compact(spark)


def test_compact_materializes_position_deletes(spark, table):
    table.delete_positions(spark, "score >= 350")  # u35..u39: 5 rows
    table.compact(spark, apply_deletes=True, min_files=1)
    # physically gone: raw bytes no longer hold the rows
    assert spark.read.parquet(table.data_dir).count() == 35
    assert table.read(spark).count() == 35
    assert table.committed_deletes() == []  # retired
    # post-materialization compaction works again
    table.compact(spark, min_files=1)


def test_position_and_equality_deletes_compose(spark, table):
    table.delete_positions(spark, "score < 50")  # u0..u4 by address
    table.delete_where(spark, "url = 'u39'", key_col="url")  # by key
    got = _urls(table.read(spark))
    assert got == {f"u{i}" for i in range(5, 39)}
    # incremental read applies both delete flavors in force at `to`
    inc = table.read_incremental(spark)
    assert _urls(inc) == got


def test_position_delete_on_evolved_table(spark, table):
    """The with-meta scan runs through the per-generation projection:
    deleting on an evolved column's default still addresses the right
    physical rows."""
    evolved = spark.createDataFrame(
        [("u100", "7", 1, "en")],
        "url string, bucket string, score long, lang string",
    )
    table.write(evolved, mode="resume", evolve=True, defaults={"lang": "und"})
    snap = table.delete_positions(spark, "lang = 'und' AND score >= 380")
    assert snap["delete"]["n_keys"] == 2  # u38, u39 (pre-evolution rows)
    got = table.read(spark)
    assert "u100" in _urls(got) and "u39" not in _urls(got)
    assert got.count() == 39
