"""Per-file Bloom filters in manifests: point-lookup file skipping."""

import pytest
from pyspark.sql import functions as F

from neuscraper_spark.sources.writer import TableWriter, _bloom_positions


@pytest.fixture()
def table(spark, tmp_path):
    # 16 files of 64 urls each (4 buckets x 4 upstream partitions),
    # urls globally unique -> min/max stats are useless for a point
    # lookup but blooms are decisive
    w = TableWriter(str(tmp_path / "t"), partition_col="bucket")
    df = (
        spark.range(0, 1024)
        .repartition(4)
        .select(
            F.concat(F.lit("https://h"), F.col("id"), F.lit(".com/p")).alias("url"),
            (F.col("id") % 4).cast("string").alias("bucket"),
            F.col("id").alias("score"),
        )
    )
    w.write(df, mode="resume")
    w.add_blooms("url")
    return w


def test_bloom_positions_stable_and_in_range():
    a = _bloom_positions("https://x.com", 8192, 6)
    assert a == _bloom_positions("https://x.com", 8192, 6)
    assert len(a) == 6 and all(0 <= p < 8192 for p in a)
    assert a != _bloom_positions("https://y.com", 8192, 6)


def test_point_lookup_skips_most_files(spark, table):
    res = table.prune_files_eq("url", "https://h777.com/p")
    assert res["files_total"] == 16
    # the url lives in exactly one file; ~0.5% FP rate may keep a
    # stray extra file, never more than a few
    assert 1 <= res["files_kept"] <= 3
    # an absent key prunes everything (modulo the same FP allowance)
    res2 = table.prune_files_eq("url", "https://nowhere.example/")
    assert res2["files_kept"] <= 2
    # the kept set really contains the row
    paths = [f for fs in res["groups"].values() for f in fs]
    got = spark.read.parquet(*paths).filter("url = 'https://h777.com/p'")
    assert got.count() == 1


def test_min_max_still_applies_without_bloom(spark, table):
    # score has footer stats but no bloom: range exclusion still prunes
    res = table.prune_files_eq("score", 2000)  # outside [0, 1023]
    assert res["files_kept"] == 0
    res2 = table.prune_files_eq("score", 500)
    assert 1 <= res2["files_kept"] <= res2["files_total"]


def test_add_blooms_idempotent_and_rebuildable(spark, table):
    assert table.add_blooms("url")["files_built"] == 0  # already present
    assert table.add_blooms("url", force=True)["files_built"] == 16


def test_compaction_rebuilds_blooms(spark, table):
    before = table.prune_files_eq("url", "https://h777.com/p")["files_kept"]
    assert before >= 1
    table.compact(spark, min_files=1)
    res = table.prune_files_eq("url", "https://h777.com/p")
    assert res["files_total"] == 4  # coalesced to one file per bucket
    assert 1 <= res["files_kept"] <= 2
    # and the filters describe the NEW files (lookup still resolves)
    paths = [f for fs in res["groups"].values() for f in fs]
    assert spark.read.parquet(*paths).filter(
        "url = 'https://h777.com/p'"
    ).count() == 1


def test_nulls_and_missing_column_are_conservative(spark, tmp_path):
    w = TableWriter(str(tmp_path / "n"), partition_col="bucket")
    df = spark.createDataFrame(
        [(None, "0", 1), ("u1", "0", 2)], "url string, bucket string, score long"
    )
    w.write(df, mode="resume")
    w.add_blooms("url")
    # nulls don't enter the filter; looking up a value not present
    # still prunes, and a bloom over a nonexistent column is a no-op
    assert w.prune_files_eq("url", "u1")["files_kept"] >= 1
    assert w.add_blooms("nope")["files_built"] == 0
    res = w.prune_files_eq("nope", "x")  # no info at all: keep everything
    assert res["files_kept"] == res["files_total"]
