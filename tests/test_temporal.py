"""As-of join: hand-built edge cases (the oracle cross-check runs in the
query battery against DuckDB's native ASOF JOIN)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from neuscraper_spark.operators.temporal import asof_join


def _t(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _t(5)),   # after right@3 and right@4 -> latest (4) wins
            (2, 10, _t(3)),   # EXACTLY at right@3 -> matches 3 ('>=')
            (3, 10, _t(2)),   # before any right -> NULL
            (4, 20, _t(9)),   # key 20: matches right@7 not right@3 of key 10
            (5, 30, _t(9)),   # key with no right rows at all -> NULL
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, _t(3), 100.0),
            (10, _t(4), 200.0),
            (20, _t(7), 300.0),
        ],
        "user_id long, ts timestamp, value double",
    )
    return left, right


def test_asof_semantics(spark, frames):
    left, right = frames
    out = asof_join(left, right, key="user_id", ts="ts").toPandas()
    got = out.set_index("event_id")[["value", "ts_right"]]
    assert got.loc[1, "value"] == 200.0 and got.loc[1, "ts_right"] == _t(4)
    assert got.loc[2, "value"] == 100.0  # inclusive >= at equal ts
    assert got.loc[3].isna().all()  # no prior right row
    assert got.loc[4, "value"] == 300.0  # per-key isolation
    assert got.loc[5].isna().all()  # key absent from right
    assert len(out) == 5  # every left row survives exactly once


def test_range_join_containment(spark):
    from neuscraper_spark.operators.temporal import range_join

    points = spark.createDataFrame(
        [
            (1, 10, _t(5)),   # inside [3, 8] -> session A
            (2, 10, _t(9)),   # after end 8 -> NULL
            (3, 10, _t(2)),   # before any range -> NULL
            (4, 10, _t(3)),   # exactly at start -> contained
            (5, 10, _t(8)),   # exactly at end -> contained
            (6, 20, _t(5)),   # key without ranges -> NULL
        ],
        "event_id long, user_id long, ts timestamp",
    )
    ranges = spark.createDataFrame(
        [("A", 10, _t(3), _t(8))],
        "session_id string, user_id long, start timestamp, end timestamp",
    )
    out = range_join(points, ranges, key="user_id", ts="ts").toPandas()
    got = out.set_index("event_id")["session_id"].to_dict()
    import math

    def val(x):
        return None if (x is None or (isinstance(x, float) and math.isnan(x))) else x

    assert {k: val(v) for k, v in got.items()} == {
        1: "A", 2: None, 3: None, 4: "A", 5: "A", 6: None,
    }


def test_range_join_overlap_latest_container_wins(spark):
    from neuscraper_spark.operators.temporal import range_join

    points = spark.createDataFrame(
        [(1, 10, _t(6))], "event_id long, user_id long, ts timestamp"
    )
    ranges = spark.createDataFrame(
        [("outer", 10, _t(1), _t(9)), ("inner", 10, _t(5), _t(7))],
        "session_id string, user_id long, start timestamp, end timestamp",
    )
    out = range_join(points, ranges, key="user_id", ts="ts").toPandas()
    assert out["session_id"].iloc[0] == "inner"  # nested session wins


def test_temporal_plans_no_nested_loop(spark):
    from neuscraper_spark.queries import all_queries

    # t1 + t2 share one variant-tagged driver row; the union plan must
    # still contain no nested-loop/cartesian join on either branch
    df = all_queries()["t1_t2_temporal_joins"](spark, "/root/testdata/sf0.01")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_rollup_cascade_scans_raw_once(spark):
    from neuscraper_spark.operators.temporal import rollup_cascade

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    df = rollup_cascade(events)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the raw scan ran ONCE while materializing the minute level; the
    # final plan reads only the checkpointed levels — no re-scan of raw
    assert plan.count("Scan parquet") + plan.count("FileScan") == 0
    assert plan.count("Scan ExistingRDD") >= 2
    # reaggregation correctness: day sums == direct day sums from raw
    got = (
        df.filter("level = 'day'")
        .toPandas()
        .sort_values(["bucket_start", "event_type"])
        .reset_index(drop=True)
    )
    from pyspark.sql import functions as FF

    want = (
        events.groupBy(
            FF.date_trunc("day", "ts").alias("bucket_start"), "event_type"
        )
        .agg(FF.count("*").alias("n"), FF.round(FF.sum("value"), 4).alias("sum_value"))
        .withColumn("level", FF.lit("day"))
        .select("level", "bucket_start", "event_type", "n", "sum_value")
        .toPandas()
        .sort_values(["bucket_start", "event_type"])
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(got, want)


def test_asof_latest_wins(spark, frames):
    left, right = frames
    l2 = spark.createDataFrame(
        [(9, 10, _t(6))], "event_id long, user_id long, ts timestamp"
    )
    out = asof_join(l2, right, key="user_id", ts="ts").toPandas()
    # two prior purchases (t=3, t=4): the LATEST one wins
    assert out["value"].iloc[0] == 200.0 and out["ts_right"].iloc[0] == _t(4)


def test_session_window_exact_gap_boundary(spark):
    """Pin Spark's session_window merge rule at the exact-gap boundary.

    Events exactly 30 minutes apart MERGE into one session (Spark treats
    an event landing exactly at the previous window's end as inside it);
    only a gap strictly greater than the timeout opens a new session.
    The t5 oracle's gaps-and-islands SQL must use the same strict-'>'
    condition, so the DuckDB twin is asserted on identical data here.
    """
    import duckdb
    import pandas as pd

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, 1, base),                                   # session A start
        (2, 1, base + dt.timedelta(minutes=30)),        # exactly gap -> merges
        (3, 1, base + dt.timedelta(minutes=60, seconds=1)),  # gap > 30m -> new
    ]
    ev = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    got = (
        ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .count()
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("count").alias("n_events"),
        )
        .toPandas()
        .sort_values("session_start")
        .reset_index(drop=True)
    )
    assert len(got) == 2
    assert got["n_events"].tolist() == [2, 1]
    assert got["session_start"].iloc[0] == base

    con = duckdb.connect()
    con.register("events", pd.DataFrame(rows, columns=["event_id", "user_id", "ts"]))
    oracle = con.execute(
        """
        WITH o AS (
          SELECT user_id, ts,
                 CASE WHEN lag(ts) OVER w IS NULL
                           OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                      THEN 1 ELSE 0 END AS new_s
          FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        s AS (
          SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                     ROWS UNBOUNDED PRECEDING) AS sid
          FROM o
        )
        SELECT min(ts) AS session_start, count(*) AS n_events
        FROM s GROUP BY user_id, sid ORDER BY 1
        """
    ).fetchdf()
    assert oracle["n_events"].tolist() == [2, 1]
