"""Structured Streaming over the events table (bonus — the reference is
strictly batch, SURVEY.md §2.10; this shows the engine's streaming
surface on the driver's ``events`` schema).

Pattern: file-source readStream -> watermarked tumbling-window agg ->
sink. Tests run with trigger(availableNow) against the batch result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_DDL = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def read_event_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(EVENTS_DDL)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
    )


def tumbling_counts(stream: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window counts per event_type: late rows
    beyond the watermark are dropped, state is bounded."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def run_available_now(agg: DataFrame, query_name: str, checkpoint_dir: str):
    """Drain everything currently available into an in-memory sink."""
    return (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def batch_tumbling_counts(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """The batch twin the stream must agree with."""
    return (
        events.groupBy(F.window("ts", window).alias("win"), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(F.col("win.start").alias("window_start"), "event_type", "n", "sum_value")
    )


def _session_agg(df: DataFrame, gap: str) -> DataFrame:
    """Shared shape for the streaming and batch session queries — the
    same plan the batch ``t5_session_window`` registry query runs, so
    stream == batch == DuckDB gaps-and-islands oracle."""
    return (
        df.groupBy(
            F.session_window(F.col("ts"), gap).alias("w"), F.col("user_id")
        )
        .agg(F.count("*").alias("n_events"),
             F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def session_sums(stream: DataFrame, gap: str = "30 minutes",
                 watermark: str = "2 hours") -> DataFrame:
    """Streaming session windows (dynamic-gap state): Spark merges an
    event into the open session when its gap to the previous event is
    <= ``gap``; the watermark closes sessions so state stays bounded.
    Run in append mode — a session row is emitted exactly once, when
    the watermark passes ``session_end`` (no partial sessions leak)."""
    return _session_agg(stream.withWatermark("ts", watermark), gap)


def batch_session_sums(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """The batch twin the session stream must agree with."""
    return _session_agg(events, gap)


def _attribution_join(clicks: DataFrame, views: DataFrame,
                      join_window: str) -> DataFrame:
    """Shared shape for the streaming and batch interval joins: each
    view within ``join_window`` AFTER a click by the same user (the
    classic attribution join; the batch ``t1_t2_temporal_joins`` registry
    query pins the same range-predicate semantics on DuckDB)."""
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    v = views.select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
        F.col("value").alias("view_value"),
    )
    cond = (
        (F.col("c_user") == F.col("v_user"))
        & (F.col("view_ts") >= F.col("click_ts"))
        & (F.col("view_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {join_window}"))
    )
    return c.join(v, cond, "inner").select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "view_id",
        "click_ts",
        "view_ts",
        "view_value",
    )


def interval_join(stream: DataFrame, join_window: str = "10 minutes",
                  watermark: str = "2 hours") -> DataFrame:
    """Stream-stream interval join (append mode): both sides are
    watermarked and the join carries an event-time range bound, so
    Spark can evict buffered rows once the other side's watermark
    passes ``ts + join_window`` — state stays bounded by
    (watermark + join_window) x arrival rate instead of growing with
    the corpus. Rows later than the watermark are dropped, exactly the
    documented stream-stream inner-join contract; the bounded-state
    test pins that every emitted pair is a batch pair and every pair
    closed well before the final watermark does emit."""
    clicks = stream.filter(F.col("event_type") == "click").withWatermark(
        "ts", watermark
    )
    views = stream.filter(F.col("event_type") == "view").withWatermark(
        "ts", watermark
    )
    return _attribution_join(clicks, views, join_window)


def batch_interval_join(events: DataFrame,
                        join_window: str = "10 minutes") -> DataFrame:
    """The batch twin the streaming interval join must agree with."""
    return _attribution_join(
        events.filter(F.col("event_type") == "click"),
        events.filter(F.col("event_type") == "view"),
        join_window,
    )
