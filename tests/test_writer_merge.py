"""MERGE INTO (copy-on-write upsert) on TableWriter."""

import json
import os

import pytest
from pyspark.sql import functions as F

from neuscraper_spark.sources.writer import TableWriter


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "url string, bucket string, score long"
    )


@pytest.fixture()
def table(spark, tmp_path):
    w = TableWriter(str(tmp_path / "t"), partition_col="bucket")
    df = spark.range(0, 20).select(
        F.concat(F.lit("u"), F.col("id")).alias("url"),
        (F.col("id") % 2).cast("string").alias("bucket"),
        (F.col("id") * 10).alias("score"),
    )
    w.write(df, mode="resume")
    return w


def _rows(spark, w):
    return {
        r["url"]: (r["bucket"], r["score"])
        for r in w.read(spark).collect()
    }


def test_merge_updates_appends_and_reports(spark, table):
    snap = table.merge_into(
        spark,
        _batch(spark, [("u3", "1", 999),     # update in place
                       ("u4", "0", 888),     # update in place
                       ("u100", "0", 7),     # append into existing part
                       ("u200", "9", 5)]),   # append into NEW partition
        key_col="url",
    )
    got = _rows(spark, table)
    assert len(got) == 22
    assert got["u3"] == ("1", 999) and got["u4"] == ("0", 888)
    assert got["u100"] == ("0", 7) and got["u200"] == ("9", 5)
    assert got["u5"] == ("1", 50)  # untouched rows intact
    m = snap["merge"]
    assert m["rows_matched"] == 2
    assert m["partitions_added"] == ["9"]
    assert set(m["partitions_rewritten"]) == {"0", "1"}


def test_merge_moves_key_across_partitions(spark, table):
    """An updated row whose partition value changed must vanish from the
    old partition and appear only in the new one."""
    table.merge_into(spark, _batch(spark, [("u3", "0", 1)]), key_col="url")
    got = _rows(spark, table)
    assert got["u3"] == ("0", 1)
    assert len(got) == 20  # no duplicate left in bucket=1


def test_merge_expires_history_and_is_snapshot_root(spark, table):
    table.merge_into(spark, _batch(spark, [("u0", "0", 1)]), key_col="url")
    snaps = table.snapshots()
    assert [s["snapshot_id"] for s in snaps] == [0]
    assert "merge" in snaps[0]


def test_merge_cardinality_check(spark, table):
    with pytest.raises(ValueError, match="duplicate"):
        table.merge_into(
            spark,
            _batch(spark, [("u1", "1", 1), ("u1", "1", 2)]),
            key_col="url",
        )


def test_merge_schema_mismatch_raises(spark, table):
    bad = spark.createDataFrame([("u1", "1")], "url string, bucket string")
    with pytest.raises(ValueError, match="columns"):
        table.merge_into(spark, bad, key_col="url")


def test_merge_null_keys_append(spark, table):
    table.merge_into(spark, _batch(spark, [(None, "1", 42)]), key_col="url")
    got = table.read(spark)
    assert got.count() == 21
    assert got.filter("url IS NULL").collect()[0]["score"] == 42


def test_merge_refuses_pending_position_deletes(spark, table):
    table.delete_positions(spark, "score = 0")
    with pytest.raises(ValueError, match="position deletes"):
        table.merge_into(spark, _batch(spark, [("u1", "1", 1)]), key_col="url")


def test_merge_respects_equality_delete_embargo(spark, table):
    """A taken-down key stays hidden even if a merge re-introduces it —
    the documented global-delete semantics."""
    table.delete_where(spark, "url = 'u7'", key_col="url")
    table.merge_into(spark, _batch(spark, [("u7", "1", 1)]), key_col="url")
    assert "u7" not in _rows(spark, table)


def test_crashed_merge_rolls_forward(spark, table):
    """Simulate a crash between the write-ahead marker and the swaps:
    stage + marker on disk, swaps not executed. Any entry point must
    finish the merge (no duplicates, final snapshot)."""
    import shutil

    w = table
    # stage a fake rewrite of bucket='1' that drops u1 and adds u999
    pdirs = w._data_partitions()
    pdir = pdirs["1"]
    tmp = pdir + ".merge_tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    staged = (
        spark.read.parquet(pdir)
        .filter("url != 'u1'")
        .unionByName(spark.createDataFrame([("u999", 1)], "url string, score long"))
    )
    staged.write.parquet(tmp)
    import pyarrow.parquet as pq

    files, n_rows = [], 0
    from neuscraper_spark.sources.writer import _file_column_stats

    for fn in sorted(os.listdir(tmp)):
        if fn.endswith(".parquet"):
            meta = pq.ParquetFile(os.path.join(tmp, fn)).metadata
            n_rows += meta.num_rows
            files.append({"file": fn, "rows": meta.num_rows,
                          "stats": _file_column_stats(meta)})
    manifest = w.partition_metrics()["1"]
    manifest["metrics"] = {"n_rows": n_rows}
    manifest["lineage"]["files"] = files
    marker = {
        "swaps": [{"pdir": pdir, "partition": "1", "manifest": manifest}],
        "snapshot": {"merge": {"key_col": "url",
                               "partitions_rewritten": ["1"],
                               "partitions_added": [],
                               "rows_matched": 1},
                     "total_committed": sorted(w.committed_partitions()),
                     "rows_written": 0, "deletes": []},
    }
    with open(w._merge_marker, "w") as f:
        json.dump(marker, f)
    # ANY read rolls the merge forward
    got = _rows(spark, w)
    assert "u1" not in got and "u999" in got
    assert not os.path.exists(w._merge_marker)
    assert [s["snapshot_id"] for s in w.snapshots()] == [0]
    # roll-forward is idempotent
    assert not w._finish_merge()


def test_merge_then_normal_operations(spark, table):
    """Post-merge the table is a normal table: append, delete, compact,
    incremental all work from the new history root."""
    table.merge_into(spark, _batch(spark, [("u1", "1", 111)]), key_col="url")
    table.write(_batch(spark, [("u300", "3", 3)]), mode="resume")
    table.delete_where(spark, "url = 'u2'", key_col="url")
    table.compact(spark, apply_deletes=True, min_files=1)
    got = _rows(spark, table)
    assert got["u1"] == ("1", 111) and "u2" not in got and got["u300"] == ("3", 3)
    inc = table.read_incremental(spark, from_snapshot_id=0)
    assert {r["url"] for r in inc.collect()} == {"u300"}
