"""Streaming -> TableWriter sink: exactly-once commits, replay
idempotence, incremental consumption of the batch chain."""

import pytest
from pyspark.sql import functions as F

from neuscraper_spark.sources.writer import TableWriter
from neuscraper_spark.streaming.table_sink import (
    BATCH_COL,
    make_batch_committer,
    stream_to_table,
)


@pytest.fixture()
def event_dir(spark, tmp_path):
    d = str(tmp_path / "in")
    spark.range(0, 30).select(
        F.col("id").alias("event_id"), (F.col("id") * 2).alias("value")
    ).repartition(3).write.parquet(d)
    return d


def _read_stream(spark, d):
    return (
        spark.readStream.schema("event_id long, value long")
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )


def test_stream_lands_in_table_exactly_once(spark, event_dir, tmp_path):
    root = str(tmp_path / "t")
    q = stream_to_table(
        _read_stream(spark, event_dir), root, str(tmp_path / "ckpt")
    )
    q.awaitTermination(300)
    w = TableWriter(root, partition_col=BATCH_COL)
    got = w.read(spark)
    assert got.count() == 30
    ids = got.select("event_id").toPandas()["event_id"]
    assert ids.is_unique and set(ids) == set(range(30))
    # maxFilesPerTrigger=1 over 3 files -> one committed partition and
    # one snapshot per micro-batch
    assert len(w.committed_partitions()) == 3
    assert len(w.snapshots()) == 3


def test_restart_appends_only_new_batches(spark, event_dir, tmp_path):
    root = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    q = stream_to_table(_read_stream(spark, event_dir), root, ckpt)
    q.awaitTermination(300)
    w = TableWriter(root, partition_col=BATCH_COL)
    n1 = w.read(spark).count()
    snap1 = w.snapshots()[-1]["snapshot_id"]
    # drop a new file, restart from the same checkpoint
    spark.range(100, 110).select(
        F.col("id").alias("event_id"), (F.col("id") * 2).alias("value")
    ).coalesce(1).write.mode("append").parquet(event_dir)
    q2 = stream_to_table(_read_stream(spark, event_dir), root, ckpt)
    q2.awaitTermination(300)
    assert w.read(spark).count() == n1 + 10
    # the incremental consumer sees exactly the new batch
    inc = w.read_incremental(spark, from_snapshot_id=snap1)
    assert {r["event_id"] for r in inc.collect()} == set(range(100, 110))


def test_replayed_batch_is_a_noop(spark, tmp_path):
    root = str(tmp_path / "t")
    commit = make_batch_committer(root)
    df = spark.range(0, 5).select(
        F.col("id").alias("event_id"), F.lit(1).alias("value")
    )
    commit(df, 7)
    w = TableWriter(root, partition_col=BATCH_COL)
    n1 = w.read(spark).count()
    commit(df, 7)  # crash-replay: same batch id
    assert w.read(spark).count() == n1 == 5
    assert len(w.snapshots()) == 2  # replay snapshots, but adds no rows
    assert w.snapshots()[-1]["committed_now"] == []


def test_expectations_gate_streaming_batches(spark, tmp_path):
    from neuscraper_spark.operators.expectations import ExpectationError

    root = str(tmp_path / "t")
    commit = make_batch_committer(
        root, expectations={"value": [("not_null",)]}
    )
    bad = spark.createDataFrame(
        [(1, None), (2, 5)], "event_id long, value long"
    )
    with pytest.raises(ExpectationError):
        commit(bad, 0)
    # the violating batch published nothing
    assert TableWriter(root, partition_col=BATCH_COL).read(spark).count() == 0
