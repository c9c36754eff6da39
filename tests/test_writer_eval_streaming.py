"""Resumable writer, eval harness parity, parity JSON, streaming."""

import glob
import json
import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from neuscraper_spark.operators import evaluate as E
from neuscraper_spark.operators.parity import encode_chunks_json, page_chunk_jsons
from neuscraper_spark.sources.writer import TableWriter, salted_repartition, url_host


# ------------------------------------------------------------------- writer


@pytest.fixture()
def docs_df(spark):
    return spark.range(0, 100).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).cast("string").alias("bucket"),
        F.concat(F.lit("text-"), F.col("id")).alias("text"),
    )


def test_writer_roundtrip_and_metrics(spark, docs_df, tmp_path):
    w = TableWriter(str(tmp_path / "t"), partition_col="bucket")
    snap = w.write(docs_df)
    assert snap["rows_written"] == 100
    assert len(snap["committed_now"]) == 7
    back = w.read(spark)
    assert back.count() == 100
    m = w.partition_metrics()
    assert sum(v["metrics"]["n_rows"] for v in m.values()) == 100


def test_writer_resume_skips_committed(spark, docs_df, tmp_path):
    w = TableWriter(str(tmp_path / "t"), partition_col="bucket")
    w.write(docs_df.filter("bucket in ('0','1','2')"))
    snap2 = w.write(docs_df)  # resume: only 3..6 written now
    assert sorted(snap2["committed_now"]) == ["3", "4", "5", "6"]
    assert w.read(spark).count() == 100
    # idempotent: a third run writes nothing and data is unchanged
    snap3 = w.write(docs_df)
    assert snap3["committed_now"] == [] and w.read(spark).count() == 100


def test_writer_snapshot_time_travel(spark, docs_df, tmp_path):
    """read(snapshot_id=N) sees the table AS OF that snapshot across an
    append-only history; overwrite expires the history."""
    w = TableWriter(str(tmp_path / "t"), partition_col="bucket")
    s0 = w.write(docs_df.filter("bucket in ('0','1')"))
    s1 = w.write(docs_df)  # resume appends the rest

    full = w.read(spark)
    old = w.read(spark, snapshot_id=s0["snapshot_id"])
    assert full.count() == 100
    assert old.count() == docs_df.filter("bucket in ('0','1')").count()
    assert set(
        r["bucket"] for r in old.select("bucket").distinct().collect()
    ) == {"0", "1"}
    assert w.read(spark, snapshot_id=s1["snapshot_id"]).count() == 100
    assert [s["snapshot_id"] for s in w.snapshots()] == [
        s0["snapshot_id"], s1["snapshot_id"]
    ]

    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown snapshot_id"):
        w.read(spark, snapshot_id=99)

    # overwrite expires history: a fresh snapshot 0 exists, the old ids
    # cannot silently resolve to the new bytes
    w.write(docs_df.filter("bucket in ('3')"), mode="overwrite")
    snaps = w.snapshots()
    assert len(snaps) == 1 and snaps[0]["snapshot_id"] == 0
    assert w.read(spark, snapshot_id=0).count() == docs_df.filter(
        "bucket in ('3')"
    ).count()


def test_writer_uncommitted_invisible_and_recovered(spark, docs_df, tmp_path):
    w = TableWriter(str(tmp_path / "t"), partition_col="bucket")
    w.write(docs_df)
    # simulate a crash that wrote data but not the manifest for bucket 3
    os.unlink(os.path.join(w.manifest_dir, "partition=3.json"))
    assert w.read(spark).count() == 100 - len([i for i in range(100) if i % 7 == 3])
    snap = w.write(docs_df)  # resume recovers exactly bucket 3, no dupes
    assert snap["committed_now"] == ["3"]
    assert w.read(spark).count() == 100


def test_writer_executes_upstream_exactly_once(spark, tmp_path):
    # r1 fix: metrics used to come from a pre-write collect(), running the
    # whole upstream plan (the neural pipeline in production) twice.
    acc = spark.sparkContext.accumulator(0)

    @F.udf("string")
    def tick(s):
        acc.add(1)
        return s

    df = spark.range(0, 100).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).cast("string").alias("bucket"),
        tick(F.concat(F.lit("text-"), F.col("id"))).alias("text"),
    )
    w = TableWriter(str(tmp_path / "t"), partition_col="bucket")
    snap = w.write(df)
    assert snap["rows_written"] == 100
    assert acc.value == 100, f"upstream executed {acc.value / 100:.1f}x"


def test_writer_null_partition_kept(spark, tmp_path):
    # r1 fix: ~isin(done) is NULL for NULL partition values, which
    # silently dropped those rows from every resume write.
    df = spark.createDataFrame(
        [("a", None), ("b", "1"), ("c", None)], "text string, bucket string"
    )
    w = TableWriter(str(tmp_path / "t"), partition_col="bucket")
    snap = w.write(df)
    assert snap["rows_written"] == 3
    assert w.read(spark).count() == 3
    snap2 = w.write(df)  # resume: NULL partition already committed
    assert snap2["rows_written"] == 0 and snap2["committed_now"] == []
    assert w.read(spark).count() == 3


def test_writer_empty_read_has_table_schema(spark, docs_df, tmp_path):
    # r1 fix: read() on a table with no committed partitions returned a
    # partition-col-only schema, breaking downstream column references.
    w = TableWriter(str(tmp_path / "t"), partition_col="bucket")
    w.write(docs_df.filter("1=0"))
    back = w.read(spark)
    assert back.count() == 0
    assert back.columns == docs_df.columns
    assert back.schema == docs_df.schema
    # and a populated read() restores column order + partition-col type
    # (nullability is parquet's, hence compare names + types)
    w.write(docs_df)
    got = w.read(spark).schema
    assert [(f.name, f.dataType) for f in got.fields] == [
        (f.name, f.dataType) for f in docs_df.schema.fields
    ]


def test_salted_repartition_spreads_skew(spark):
    df = spark.range(0, 2000).select(
        F.when(F.col("id") < 1900, F.lit("https://hot.example/x"))
        .otherwise(F.concat(F.lit("https://cold"), F.col("id"), F.lit(".example/y")))
        .alias("url"),
        F.col("id"),
    ).withColumn("host", url_host(F.col("url")))
    plain = df.repartition(8, "host")
    salted = salted_repartition(df, "host", 8, salt=8)
    def sizes(d):
        return sorted(
            d.withColumn("p", F.spark_partition_id()).groupBy("p").count()
            .toPandas()["count"].tolist()
        )
    assert max(sizes(plain)) >= 1900  # hot host pins one partition
    assert max(sizes(salted)) < 1000  # salt spreads it


# --------------------------------------------------------------------- eval


def test_eval_matches_python_twin(spark):
    predictions = [
        ("u1", 5, "Primary"), ("u1", 3, "Primary"), ("u2", 9, "Primary"),
    ]
    text_nodes = [
        ("u1", 5, "hello "), ("u1", 3, "world"), ("u2", 9, "content"),
        ("u3", 1, "unpredicted"),
    ]
    gold = [
        ("u1", 5, "hello", True), ("u1", 3, "world", True),
        ("u1", 2, "nav bar", False), ("u2", 9, "content", True),
        ("u2", 8, "footer", False), ("u3", 1, "unpredicted", True),
        ("u1", 4, "hello world", True),  # crosses node boundary, needs order
        ("u1", 6, "world#TAB#x", False),  # unescape path
    ]
    p_df = spark.createDataFrame(predictions, "url string, text_node_id int, task string")
    t_df = spark.createDataFrame(text_nodes, "url string, text_node_id int, text string")
    g_df = spark.createDataFrame(
        gold, "url string, text_node_id int, text string, judgment_is_primary boolean"
    )
    got = E.evaluate(p_df, t_df, g_df).toPandas().iloc[0].to_dict()
    want = E.evaluate_py(predictions, text_nodes, gold)
    for k in ("tp", "tn", "fp", "fn"):
        assert got[k] == want[k], (k, got, want)
    assert abs(got["fscore"] - want["fscore"]) < 1e-12
    # sanity on the scenario itself
    assert want["fn"] >= 1  # u3 missing-url injection counted as miss


# ------------------------------------------------------------- parity JSON


def test_encoded_chunks_json_matches_python(spark, pages):
    sub = pages[:8]
    pdf = pd.DataFrame(sub)
    wp = spark.createDataFrame(pdf[["url", "html"]])
    got = encode_chunks_json(wp).toPandas().sort_values("url")
    want = []
    for p in sub:
        for line in page_chunk_jsons(p["url"], p["html"]):
            want.append((p["url"], line))
    want_df = pd.DataFrame(want, columns=["url", "json_line"]).sort_values("url")
    assert got["json_line"].tolist() == want_df["json_line"].tolist()
    rec = json.loads(got["json_line"].iloc[0])
    assert set(rec) == {"TokenId", "NodeIds", "Url"}
    assert all(len(row) == 50 for row in rec["TokenId"])


# ---------------------------------------------------------------- streaming


def test_stream_matches_batch(spark, tmp_path):
    from neuscraper_spark.streaming.events import (
        batch_tumbling_counts,
        read_event_stream,
        run_available_now,
        tumbling_counts,
    )

    src = "/root/testdata/sf0.001/events.parquet"
    events = spark.read.parquet(src)
    in_dir = str(tmp_path / "in")
    events.repartition(6).write.parquet(in_dir)

    stream = read_event_stream(spark, in_dir)
    assert stream.isStreaming
    q = run_available_now(
        tumbling_counts(stream), "ev_counts", str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    got = (
        spark.table("ev_counts").toPandas()
        .sort_values(["window_start", "event_type"]).reset_index(drop=True)
    )
    want = (
        batch_tumbling_counts(spark.read.parquet(in_dir)).toPandas()
        .sort_values(["window_start", "event_type"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_session_stream_matches_batch(spark, tmp_path):
    """Streaming session_window (complete mode) over the events table
    equals the batch twin — the same plan t5_session_window registers,
    so stream == batch == the DuckDB gaps-and-islands oracle."""
    from neuscraper_spark.streaming.events import (
        batch_session_sums,
        read_event_stream,
        run_available_now,
        session_sums,
    )

    src = "/root/testdata/sf0.001/events.parquet"
    in_dir = str(tmp_path / "in")
    spark.read.parquet(src).repartition(6).write.parquet(in_dir)

    stream = read_event_stream(spark, in_dir)
    q = run_available_now(
        session_sums(stream), "ev_sessions", str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    key = ["user_id", "session_start"]
    got = (
        spark.table("ev_sessions").toPandas()
        .sort_values(key).reset_index(drop=True)
    )
    want = (
        batch_session_sums(spark.read.parquet(in_dir)).toPandas()
        .sort_values(key).reset_index(drop=True)
    )
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, want)


def test_session_stream_append_finalized_only(spark, tmp_path):
    """Append mode: every emitted session row is byte-identical to a
    batch-twin row (no partial sessions leak), each session emits at
    most once, and sessions closed well before the final watermark do
    emit (state is actually flushed, not held forever)."""
    from neuscraper_spark.streaming.events import (
        batch_session_sums,
        read_event_stream,
        session_sums,
    )

    src = "/root/testdata/sf0.001/events.parquet"
    in_dir = str(tmp_path / "in")
    spark.read.parquet(src).repartition(6).write.parquet(in_dir)

    agg = session_sums(read_event_stream(spark, in_dir), watermark="2 hours")
    q = (
        agg.writeStream.format("memory")
        .queryName("ev_sessions_append")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    key = ["user_id", "session_start"]
    got = (
        spark.table("ev_sessions_append").toPandas()
        .sort_values(key).reset_index(drop=True)
    )
    want = batch_session_sums(spark.read.parquet(in_dir)).toPandas()
    # each emitted row is a finalized batch row, emitted exactly once
    assert not got.duplicated(subset=key).any()
    merged = got.merge(want, on=list(got.columns), how="left", indicator=True)
    assert (merged["_merge"] == "both").all(), "append emitted a partial session"
    # sessions that ended > watermark before the max event time must emit
    max_ts = spark.table("ev_sessions_append").sparkSession.read.parquet(
        in_dir
    ).agg(F.max("ts")).collect()[0][0]
    import pandas as pd_  # local alias to keep top-level imports stable

    horizon = pd_.Timestamp(max_ts) - pd_.Timedelta(hours=3)
    closed_early = want[want["session_end"] < horizon]
    have = set(map(tuple, got[key].itertuples(index=False)))
    missing = [
        k for k in map(tuple, closed_early[key].itertuples(index=False))
        if k not in have
    ]
    assert not missing, f"{len(missing)} finalized sessions never emitted"


def test_writer_compaction_merges_small_files(spark, tmp_path):
    """compact() rewrites each committed partition's many small parquet
    files into one: rows/read()/time-travel unchanged, manifests point
    at the new footers, a second compact is a no-op."""
    import os

    # 16 upstream partitions x 4 buckets -> many files per hive dir
    df = spark.range(0, 200, 1, 16).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 4).cast("string").alias("bucket"),
        F.concat(F.lit("text-"), F.col("id")).alias("text"),
    )
    w = TableWriter(str(tmp_path / "t"), partition_col="bucket")
    w.write(df)
    before = w.read(spark).toPandas().sort_values("doc_id").reset_index(drop=True)
    pdirs = w._data_partitions()
    files_before = {
        p: len([f for f in os.listdir(d) if f.endswith(".parquet")])
        for p, d in pdirs.items()
    }
    assert max(files_before.values()) > 1  # there IS something to compact

    snap = w.compact(spark)
    assert set(snap["compaction"]) == {p for p, n in files_before.items() if n > 1}
    for p, d in w._data_partitions().items():
        n = len([f for f in os.listdir(d) if f.endswith(".parquet")])
        assert n == 1, (p, n)
    after = w.read(spark).toPandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(before, after)
    # manifests describe the new files and keep the old row counts
    m = w.partition_metrics()
    assert sum(v["metrics"]["n_rows"] for v in m.values()) == 200
    for p in snap["compaction"]:
        assert len(m[p]["lineage"]["files"]) == 1
        assert m[p]["lineage"]["compacted_from_n_files"] == files_before[p]
    # idempotent: nothing left to rewrite
    assert w.compact(spark)["compaction"] == {}


def test_writer_compaction_crash_rolls_forward(spark, tmp_path):
    """Reconstructed crash window: replacement files on disk + marker
    written, but the swap not finished — the next read() rolls the swap
    forward instead of silently dropping the partition's rows."""
    import json
    import os
    import shutil

    df = spark.range(0, 60, 1, 8).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3).cast("string").alias("bucket"),
        F.concat(F.lit("text-"), F.col("id")).alias("text"),
    )
    w = TableWriter(str(tmp_path / "t"), partition_col="bucket")
    w.write(df)
    before = w.read(spark).toPandas().sort_values("doc_id").reset_index(drop=True)

    # build the crash state by hand for one partition: tmp dir complete,
    # marker present, original dir already renamed away (mid-swap crash)
    p, pdir = sorted(w._data_partitions().items())[0]
    tmp = pdir + ".compact_tmp"
    spark.read.parquet(pdir).coalesce(1).write.mode("overwrite").parquet(tmp)
    with open(w._compact_marker, "w") as f:
        json.dump({"pdir": pdir}, f)
    os.rename(pdir, pdir + ".old")

    after = w.read(spark).toPandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(before, after)  # no rows lost
    assert not os.path.exists(w._compact_marker)
    assert os.path.isdir(pdir) and not os.path.isdir(pdir + ".old")
    assert not os.path.isdir(tmp)


def test_writer_compaction_crash_completes_manifest_rewrite(spark, tmp_path):
    """Crash between the dir swap and the manifest rewrite (r4 ADVICE
    #2): the marker carries the new manifest payload, so recovery must
    finish step 4 — lineage.files lists the NEW footers, not the
    deleted small files."""
    import json
    import os

    import pyarrow.parquet as pq

    df = spark.range(0, 60, 1, 8).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3).cast("string").alias("bucket"),
        F.concat(F.lit("text-"), F.col("id")).alias("text"),
    )
    w = TableWriter(str(tmp_path / "t"), partition_col="bucket")
    w.write(df)
    before = w.read(spark).toPandas().sort_values("doc_id").reset_index(drop=True)

    # crash state for one partition: new files written + swap done +
    # marker (with manifest payload) present, manifest NOT rewritten
    p, pdir = sorted(w._data_partitions().items())[0]
    old_manifest = w.partition_metrics()[p]
    assert len(old_manifest["lineage"]["files"]) > 1
    tmp = pdir + ".compact_tmp"
    spark.read.parquet(pdir).coalesce(1).write.mode("overwrite").parquet(tmp)
    new_files = []
    for fn in sorted(os.listdir(tmp)):
        if fn.endswith(".parquet"):
            meta = pq.ParquetFile(os.path.join(tmp, fn)).metadata
            new_files.append({"file": fn, "rows": meta.num_rows})
    payload = dict(old_manifest)
    payload["lineage"] = dict(old_manifest["lineage"])
    payload["lineage"]["files"] = new_files
    payload["lineage"]["compacted_from_n_files"] = len(
        old_manifest["lineage"]["files"]
    )
    with open(w._compact_marker, "w") as f:
        json.dump({"pdir": pdir, "partition": p, "manifest": payload}, f)
    os.rename(pdir, pdir + ".old")
    os.rename(tmp, pdir)

    after = w.read(spark).toPandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(before, after)
    assert not os.path.exists(w._compact_marker)
    # the recovered manifest describes the files actually on disk
    m = w.partition_metrics()[p]
    on_disk = sorted(fn for fn in os.listdir(pdir) if fn.endswith(".parquet"))
    assert sorted(f["file"] for f in m["lineage"]["files"]) == on_disk
    assert m["metrics"]["n_rows"] == old_manifest["metrics"]["n_rows"]


# --------------------------------------------------------- schema evolution


def test_writer_schema_evolution_add_column_with_default(spark, docs_df, tmp_path):
    """Add-column-with-default on append (Iceberg v3 initial-default):
    pre-evolution rows read the default, new rows their written value;
    old snapshots time-travel to the OLD schema."""
    w = TableWriter(str(tmp_path / "t"), partition_col="bucket")
    s0 = w.write(docs_df.filter("bucket in ('0','1','2')"))

    widened = docs_df.withColumn("lang", F.lit("en")).withColumn(
        "score", (F.col("doc_id") % 10).cast("double")
    )
    # widened append without the flag is refused
    with pytest.raises(ValueError, match="evolve=True"):
        w.write(widened)
    s1 = w.write(widened, evolve=True, defaults={"lang": "und"})

    back = w.read(spark)
    assert [f.name for f in back.schema.fields] == [
        "doc_id", "bucket", "text", "lang", "score"
    ]
    rows = {r["doc_id"]: r for r in back.collect()}
    assert len(rows) == 100
    old_buckets = {"0", "1", "2"}
    for r in rows.values():
        if r["bucket"] in old_buckets:
            # pre-evolution partition: declared default / null default
            assert r["lang"] == "und" and r["score"] is None
        else:
            assert r["lang"] == "en" and r["score"] is not None

    # time-travel to the pre-evolution snapshot shows the old schema
    old = w.read(spark, snapshot_id=s0["snapshot_id"])
    assert [f.name for f in old.schema.fields] == ["doc_id", "bucket", "text"]
    assert old.count() == docs_df.filter("bucket in ('0','1','2')").count()
    assert s1["schema_id"] == s0["schema_id"] + 1


def test_writer_schema_evolution_rejects_drop_and_retype(spark, docs_df, tmp_path):
    w = TableWriter(str(tmp_path / "t"), partition_col="bucket")
    w.write(docs_df.filter("bucket = '0'"))
    with pytest.raises(ValueError, match="missing"):
        w.write(docs_df.drop("text"), evolve=True)
    with pytest.raises(ValueError, match="retyped"):
        w.write(docs_df.withColumn("doc_id", F.col("doc_id").cast("string")),
                evolve=True)
    # defaults naming a non-new column are a caller bug, not silence
    with pytest.raises(ValueError, match="defaults"):
        w.write(docs_df, evolve=True, defaults={"text": "x"})


def test_writer_schema_evolution_two_generations(spark, docs_df, tmp_path):
    """Two evolutions stack; each generation's rows get exactly the
    defaults for the columns their files predate."""
    w = TableWriter(str(tmp_path / "t"), partition_col="bucket")
    w.write(docs_df.filter("bucket = '0'"))
    g1 = docs_df.filter("bucket = '1'").withColumn("lang", F.lit("fr"))
    w.write(g1, evolve=True, defaults={"lang": "und"})
    g2 = (docs_df.filter("bucket = '2'")
          .withColumn("lang", F.lit("de"))
          .withColumn("stars", F.lit(3)))
    w.write(g2, evolve=True, defaults={"stars": 0})

    got = {r["bucket"]: r for r in w.read(spark).select(
        "bucket", "lang", "stars").distinct().collect()}
    assert got["0"]["lang"] == "und" and got["0"]["stars"] == 0
    assert got["1"]["lang"] == "fr" and got["1"]["stars"] == 0
    assert got["2"]["lang"] == "de" and got["2"]["stars"] == 3


def test_writer_overwrite_resets_schema_log(spark, docs_df, tmp_path):
    w = TableWriter(str(tmp_path / "t"), partition_col="bucket")
    w.write(docs_df.withColumn("lang", F.lit("en")))
    snap = w.write(docs_df, mode="overwrite")  # narrower schema is fine
    assert snap["schema_id"] == 0
    assert [f.name for f in w.read(spark).schema.fields] == [
        "doc_id", "bucket", "text"
    ]


def test_writer_legacy_bare_schema_file_upgrades(spark, docs_df, tmp_path):
    """A format-1 table (bare StructType json from before evolution
    support) reads and evolves in place."""
    w = TableWriter(str(tmp_path / "t"), partition_col="bucket")
    w.write(docs_df.filter("bucket = '0'"))
    # rewrite the schema file in the old bare format
    with open(w.schema_path) as f:
        reg = json.load(f)
    with open(w.schema_path, "w") as f:
        json.dump(reg["schemas"][0]["schema"], f)
    assert w.read(spark).count() == docs_df.filter("bucket = '0'").count()
    w.write(docs_df.filter("bucket = '1'").withColumn("v", F.lit(1)),
            evolve=True, defaults={"v": -1})
    got = {r["bucket"]: r["v"] for r in w.read(spark).select(
        "bucket", "v").distinct().collect()}
    assert got == {"0": -1, "1": 1}


# ------------------------------------------------- manifest file skipping


@pytest.fixture()
def ranged_df(spark):
    """4 buckets with disjoint doc_id ranges (0-24, 25-49, ...) so
    min/max pruning has real teeth."""
    return spark.range(0, 100).select(
        F.col("id").alias("doc_id"),
        (F.col("id") / 25).cast("int").cast("string").alias("bucket"),
        F.concat(F.lit("text-"), F.col("id")).alias("text"),
    )


def test_manifest_carries_file_stats(spark, ranged_df, tmp_path):
    w = TableWriter(str(tmp_path / "t"), partition_col="bucket")
    w.write(ranged_df)
    m = w.partition_metrics()
    st = m["0"]["lineage"]["files"][0]["stats"]
    assert st["doc_id"]["min"] == 0 and st["doc_id"]["max"] == 24
    assert st["doc_id"]["has_null"] is False
    assert st["text"]["min"].startswith("text-")


def test_prune_files_skips_out_of_range(spark, ranged_df, tmp_path):
    w = TableWriter(str(tmp_path / "t"), partition_col="bucket")
    w.write(ranged_df)
    pr = w.prune_files("doc_id", lo=30, hi=40)
    assert pr["files_total"] > pr["files_kept"]
    kept = [p for ps in pr["groups"].values() for p in ps]
    assert all("bucket=1" in p for p in kept)  # only 25-49 can match
    # open-ended bounds
    assert w.prune_files("doc_id", lo=75)["files_kept"] < pr["files_total"]
    assert w.prune_files("doc_id")["files_kept"] == pr["files_total"]


def test_read_pruned_equals_filtered_read(spark, ranged_df, tmp_path):
    w = TableWriter(str(tmp_path / "t"), partition_col="bucket")
    w.write(ranged_df)
    got = w.read_pruned(spark, "doc_id", lo=10, hi=60).toPandas()
    want = (w.read(spark).filter("doc_id between 10 and 60")).toPandas()
    pd.testing.assert_frame_equal(
        got.sort_values("doc_id").reset_index(drop=True),
        want.sort_values("doc_id").reset_index(drop=True),
    )
    # empty range -> empty df with the table schema, no files listed
    none = w.read_pruned(spark, "doc_id", lo=1000)
    assert none.count() == 0
    assert [f.name for f in none.schema.fields] == ["doc_id", "bucket", "text"]


def test_prune_is_conservative_without_stats(spark, ranged_df, tmp_path):
    """Legacy manifests (pre-stats) must never be skipped."""
    w = TableWriter(str(tmp_path / "t"), partition_col="bucket")
    w.write(ranged_df)
    # strip the stats from one manifest, as an old writer would have left it
    mp = w._manifest_path("0")
    with open(mp) as f:
        man = json.load(f)
    for finfo in man["lineage"]["files"]:
        finfo.pop("stats", None)
    with open(mp, "w") as f:
        json.dump(man, f)
    pr = w.prune_files("doc_id", lo=90, hi=99)  # only bucket 3 matches...
    kept = [p for ps in pr["groups"].values() for p in ps]
    # ...but the stat-less bucket-0 files must survive too
    assert any("bucket=0" in p for p in kept)
    assert any("bucket=3" in p for p in kept)
    assert not any("bucket=1" in p or "bucket=2" in p for p in kept)
    got = w.read_pruned(spark, "doc_id", lo=90, hi=99)
    assert got.count() == 10  # row-level filter still exact


def test_prune_files_across_schema_evolution(spark, ranged_df, tmp_path):
    """Pruning on a column added by evolution: pre-evolution files hold
    the initial-default in every row, so they survive iff the default is
    in range."""
    w = TableWriter(str(tmp_path / "t"), partition_col="bucket")
    w.write(ranged_df.filter("bucket in ('0','1')"))
    w.write(ranged_df.filter("bucket in ('2','3')")
            .withColumn("stars", (F.col("doc_id") % 5).cast("int")),
            evolve=True, defaults={"stars": 99})
    # default 99 out of [0,5] -> old-generation files pruned entirely
    pr = w.prune_files("stars", lo=0, hi=5)
    kept = [p for ps in pr["groups"].values() for p in ps]
    assert kept and not any("bucket=0" in p or "bucket=1" in p for p in kept)
    got = w.read_pruned(spark, "stars", lo=0, hi=5).toPandas()
    want = w.read(spark).filter("stars between 0 and 5").toPandas()
    pd.testing.assert_frame_equal(
        got.sort_values("doc_id").reset_index(drop=True),
        want.sort_values("doc_id").reset_index(drop=True),
    )
    # default IN range -> old files kept and defaults materialize
    pr99 = w.prune_files("stars", lo=99)
    kept99 = [p for ps in pr99["groups"].values() for p in ps]
    assert any("bucket=0" in p for p in kept99)
    assert w.read_pruned(spark, "stars", lo=99).count() == 50


def test_read_pruned_time_travel(spark, ranged_df, tmp_path):
    w = TableWriter(str(tmp_path / "t"), partition_col="bucket")
    s0 = w.write(ranged_df.filter("bucket in ('0','1')"))
    w.write(ranged_df.filter("bucket in ('2','3')")
            .withColumn("lang", F.lit("en")), evolve=True,
            defaults={"lang": "und"})
    old = w.read_pruned(spark, "doc_id", lo=30, hi=99,
                        snapshot_id=s0["snapshot_id"])
    # old snapshot: only buckets 0-1 visible, old schema, rows 30-49
    assert [f.name for f in old.schema.fields] == ["doc_id", "bucket", "text"]
    assert old.count() == 20
    # current read sees all four buckets and the evolved column
    assert w.read_pruned(spark, "doc_id", lo=30, hi=99).count() == 70


def test_compacted_manifest_keeps_stats(spark, tmp_path):
    df = spark.range(0, 200, 1, 16).select(
        F.col("id").alias("doc_id"),
        (F.col("id") / 50).cast("int").cast("string").alias("bucket"),
        F.concat(F.lit("text-"), F.col("id")).alias("text"),
    )
    w = TableWriter(str(tmp_path / "t"), partition_col="bucket")
    w.write(df)
    w.compact(spark)
    m = w.partition_metrics()
    st = m["0"]["lineage"]["files"][0]["stats"]["doc_id"]
    assert st["min"] == 0 and st["max"] == 49
    pr = w.prune_files("doc_id", lo=60, hi=70)
    kept = [p for ps in pr["groups"].values() for p in ps]
    assert kept and all("bucket=1" in p for p in kept)


# ------------------------------------------------- stream-stream interval join


def test_interval_join_stream_matches_batch(spark, tmp_path):
    """With a watermark wider than the corpus span nothing is evicted,
    so the stream-stream interval join must equal the batch twin
    exactly, across multiple micro-batches and any file arrival order."""
    from neuscraper_spark.streaming.events import (
        batch_interval_join,
        interval_join,
        read_event_stream,
    )

    src = "/root/testdata/sf0.001/events.parquet"
    in_dir = str(tmp_path / "in")
    spark.read.parquet(src).repartition(6).write.parquet(in_dir)

    joined = interval_join(
        read_event_stream(spark, in_dir),
        join_window="12 hours",
        watermark="40 days",  # > corpus span: no eviction, exact equality
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ev_ij_full")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    key = ["click_id", "view_id"]
    got = (
        spark.table("ev_ij_full").toPandas()
        .sort_values(key).reset_index(drop=True)
    )
    want = (
        batch_interval_join(spark.read.parquet(in_dir), join_window="12 hours")
        .toPandas().sort_values(key).reset_index(drop=True)
    )
    assert len(want) > 0
    pd.testing.assert_frame_equal(got, want)


def test_interval_join_bounded_state_emits_closed_pairs(spark, tmp_path):
    """Production setting (2h watermark << 30-day corpus): every emitted
    pair is a batch pair, emitted once; every pair whose window closed
    well before the final watermark DID emit (state is really flushed);
    and with time-ordered ingestion nothing legitimate is dropped."""
    import os

    from neuscraper_spark.streaming.events import (
        batch_interval_join,
        interval_join,
        read_event_stream,
    )

    import time

    src = "/root/testdata/sf0.001/events.parquet"
    events = spark.read.parquet(src).toPandas().sort_values("ts")
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    # sequential time slices with increasing mtimes -> in-order arrival
    n_slices = 5
    per = -(-len(events) // n_slices)
    for i in range(n_slices):
        events.iloc[i * per:(i + 1) * per].to_parquet(
            os.path.join(in_dir, f"slice_{i:03d}.parquet"),
            coerce_timestamps="us", allow_truncated_timestamps=True,
        )
        time.sleep(0.05)

    joined = interval_join(
        read_event_stream(spark, in_dir),
        join_window="12 hours",
        watermark="2 hours",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ev_ij_bounded")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    key = ["click_id", "view_id"]
    got = (
        spark.table("ev_ij_bounded").toPandas()
        .sort_values(key).reset_index(drop=True)
    )
    want = (
        batch_interval_join(spark.read.parquet(in_dir), join_window="12 hours")
        .toPandas().sort_values(key).reset_index(drop=True)
    )
    assert len(want) > 0
    assert not got.duplicated(subset=key).any()
    merged = got.merge(want, on=list(got.columns), how="left", indicator=True)
    assert (merged["_merge"] == "both").all(), "emitted a non-batch pair"
    # in-order arrival + watermark >> join window: nothing legitimate dropped
    pd.testing.assert_frame_equal(got, want)
