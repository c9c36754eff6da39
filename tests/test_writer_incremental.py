"""Incremental (CDC-style) reads on TableWriter: snapshot-diff append
scans, delete interaction, overwrite refusal, schema evolution."""

import pytest
from pyspark.sql import functions as F

from neuscraper_spark.sources.writer import TableWriter


def _batch(spark, lo, hi, bucket):
    return spark.range(lo, hi).select(
        F.concat(F.lit("u"), F.col("id")).alias("url"),
        F.lit(str(bucket)).alias("bucket"),
        (F.col("id") * 10).alias("score"),
    )


def _urls(df):
    return {r["url"] for r in df.select("url").collect()}


@pytest.fixture()
def table(spark, tmp_path):
    w = TableWriter(str(tmp_path / "t"), partition_col="bucket")
    w.write(_batch(spark, 0, 10, 0), mode="resume")  # snapshot 0
    w.write(_batch(spark, 10, 20, 1), mode="resume")  # snapshot 1
    w.write(_batch(spark, 20, 30, 2), mode="resume")  # snapshot 2
    return w


def test_increment_is_exactly_the_appended_rows(spark, table):
    snaps = [s["snapshot_id"] for s in table.snapshots()]
    inc = table.read_incremental(spark, from_snapshot_id=snaps[0],
                                 to_snapshot_id=snaps[1])
    assert _urls(inc) == {f"u{i}" for i in range(10, 20)}
    # from..latest (to=None)
    inc2 = table.read_incremental(spark, from_snapshot_id=snaps[1])
    assert _urls(inc2) == {f"u{i}" for i in range(20, 30)}


def test_from_none_equals_full_read_as_of_to(spark, table):
    snaps = [s["snapshot_id"] for s in table.snapshots()]
    inc = table.read_incremental(spark, to_snapshot_id=snaps[1])
    assert _urls(inc) == _urls(table.read(spark, snapshot_id=snaps[1]))


def test_empty_increment_keeps_schema(spark, table):
    last = table.snapshots()[-1]["snapshot_id"]
    inc = table.read_incremental(spark, from_snapshot_id=last,
                                 to_snapshot_id=last)
    assert inc.count() == 0
    assert set(inc.columns) == {"url", "bucket", "score"}


def test_increment_applies_deletes_in_force_at_to(spark, table):
    snaps = [s["snapshot_id"] for s in table.snapshots()]
    table.delete_where(spark, "url = 'u25'", key_col="url")
    inc = table.read_incremental(spark, from_snapshot_id=snaps[1])
    assert "u25" not in _urls(inc)
    raw = table.read_incremental(spark, from_snapshot_id=snaps[1],
                                 apply_deletes=False)
    assert "u25" in _urls(raw)


def test_increment_refuses_inverted_or_inconsistent_range(spark, table):
    """from's partitions must be a subset of to's — an inverted range
    (or a history where they aren't) has no well-defined diff."""
    snaps = [s["snapshot_id"] for s in table.snapshots()]
    with pytest.raises(ValueError, match="overwrite"):
        table.read_incremental(spark, from_snapshot_id=snaps[2],
                               to_snapshot_id=snaps[0])


def test_overwrite_resets_incremental_history(spark, table):
    """Overwrite expires ALL prior snapshots (ids restart at 0), so an
    incremental consumer naturally re-bootstraps: the old from-id either
    resolves inside the NEW history or is unknown — never a silent
    cross-overwrite diff."""
    table.write(_batch(spark, 100, 105, 7), mode="overwrite")
    snaps = [s["snapshot_id"] for s in table.snapshots()]
    assert snaps == [0]  # history reset
    inc = table.read_incremental(spark, from_snapshot_id=0)
    assert inc.count() == 0  # from==to in the new history: empty diff
    full = table.read_incremental(spark)
    assert _urls(full) == {f"u{i}" for i in range(100, 105)}


def test_increment_projects_evolved_schema(spark, table):
    """Time-travel semantics carry over: an increment read AS OF a
    pre-evolution snapshot must NOT leak the later column, while the
    same increment at the latest snapshot back-fills old partitions
    with the column's initial-default."""
    snaps = [s["snapshot_id"] for s in table.snapshots()]
    evolved = _batch(spark, 30, 35, 3).withColumn("lang", F.lit("en"))
    table.write(evolved, mode="resume", evolve=True, defaults={"lang": "und"})
    # as-of a pre-evolution snapshot: the added column is invisible
    pre = table.read_incremental(spark, from_snapshot_id=snaps[0],
                                 to_snapshot_id=snaps[1])
    assert "lang" not in pre.columns
    # at the latest snapshot: old partitions fill the initial-default
    inc = table.read_incremental(spark, from_snapshot_id=snaps[0])
    got = {r["url"]: r["lang"] for r in inc.select("url", "lang").collect()}
    assert got["u15"] == "und" and got["u30"] == "en"


def test_unknown_from_snapshot_raises(spark, table):
    with pytest.raises(ValueError, match="unknown from_snapshot_id"):
        table.read_incremental(spark, from_snapshot_id=99)


def test_empty_table_incremental(spark, tmp_path):
    w = TableWriter(str(tmp_path / "e"), partition_col="bucket")
    inc = w.read_incremental(spark)
    assert inc.count() == 0
