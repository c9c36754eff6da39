"""Stateful streaming exact-dedup: applyInPandasWithState over md5 keys.

A continuously-arriving corpus (new WARC drops) needs its exact dedup
to happen ON the stream — re-running the batch hash-groupBy over the
full history per drop is O(corpus) per increment. This operator keeps
one state row per distinct content hash and emits each hash's winner
exactly once, the streaming twin of ``operators.dedup.exact_dedup``
(same key: ``md5(text)``; same within-increment winner: min doc_id).

Semantics (documented, tested):
- Default (``emit_updates=False``, append mode): the FIRST micro-batch
  in which a hash appears emits ``(content_hash, keep_id, n_dups)``
  with keep_id = min(doc_id) within that micro-batch; later arrivals
  of the same hash emit nothing. When the whole input arrives before
  the first trigger, the kept set is byte-identical to the batch
  ``exact_dedup`` result. DIVERGENCE from batch (pinned by test): if a
  SMALLER id for an already-seen hash arrives in a later micro-batch,
  the stream keeps the first-batch winner while batch keeps the global
  min — dup *detection* is identical, the representative differs.
- Batch-parity (``emit_updates=True``, update mode): state tracks the
  RUNNING min id and total count, and every micro-batch in which a
  hash appears re-emits the current ``(keep_id, n_dups)`` — a CDC-style
  upsert stream. The LAST emission per hash always equals the batch
  ``exact_dedup`` row (keep_id = global min, n_dups = total), so a
  last-write-wins consumer converges to exact batch parity. File sinks
  are append-only and cannot express upserts; use the memory sink or a
  foreachBatch MERGE in production.
- State crosses micro-batches AND restarts (the state store lives in
  the checkpoint), so a resumed job keeps suppressing hashes it saw
  before the restart — exactly-once emission per hash across the
  stream's lifetime.
- 100 TB design: state is one (hash, id, count) row per DISTINCT
  document, hash-partitioned by Spark's state store across executors —
  the same shuffle key the batch groupBy uses, uniform by
  construction. ``ttl_minutes`` bounds state for windowed-dedup
  deployments (drop state for hashes idle longer than the TTL, i.e.
  dedup within a sliding freshness horizon); global dedup keeps the
  default unbounded state, which is what the batch job would hold in a
  shuffle anyway.

No reference counterpart (the reference is strictly batch; its corpus
dedup happens upstream — see operators/dedup.py header).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_DDL = "content_hash string, keep_id long, n_dups long"
STATE_DDL = "keep_id long, n long"


def dedup_stream(
    stream: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ttl_minutes: int | None = None,
    emit_updates: bool = False,
) -> DataFrame:
    """Streaming exact-dedup. Default: emits each content hash once
    (first micro-batch it appears in), winner = min id within that
    batch. ``emit_updates=True``: upsert stream whose last emission per
    hash equals the batch ``exact_dedup`` row (see module docstring)."""

    keyed = stream.select(
        F.md5(F.col(text_col)).alias("content_hash"),
        F.col(id_col).alias("doc_id"),
    )

    def first_wins(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        min_id, n = None, 0
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            n += len(pdf)
            m = int(pdf["doc_id"].min())
            min_id = m if min_id is None else min(min_id, m)
        if n == 0:
            return
        if state.exists:
            seen_id, seen_n = state.get
            if emit_updates:
                # batch-parity: track the RUNNING min and re-emit the
                # corrected row; last write wins downstream
                new_id, new_n = min(seen_id, min_id), seen_n + n
                state.update((new_id, new_n))
                yield pd.DataFrame(
                    {
                        "content_hash": [key[0]],
                        "keep_id": [new_id],
                        "n_dups": [new_n],
                    }
                )
            else:
                state.update((seen_id, seen_n + n))
        else:
            state.update((min_id, n))
            yield pd.DataFrame(
                {"content_hash": [key[0]], "keep_id": [min_id], "n_dups": [n]}
            )
        if ttl_minutes is not None:
            state.setTimeoutDuration(ttl_minutes * 60_000)

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_minutes is not None
        else GroupStateTimeout.NoTimeout
    )
    return keyed.groupBy("content_hash").applyInPandasWithState(
        first_wins,
        OUTPUT_DDL,
        STATE_DDL,
        "update" if emit_updates else "append",
        timeout,
    )


def run_dedup_stream(
    spark,
    input_dir: str,
    checkpoint_dir: str,
    query_name: str,
    schema: str,
    max_files: int = 1,
    ttl_minutes: int | None = None,
    output_dir: str | None = None,
    emit_updates: bool = False,
):
    """File-source drops -> stateful dedup -> sink, draining the
    current backlog (availableNow). With ``output_dir`` the sink is
    parquet (fault-tolerant: re-invoking with the same checkpoint
    RESUMES the state store, so hashes emitted in an earlier run stay
    suppressed); without it, an in-memory sink for single-run
    inspection (the memory sink cannot recover a checkpoint)."""
    if emit_updates and output_dir is not None:
        raise ValueError(
            "emit_updates produces an upsert stream; file sinks are "
            "append-only — use the memory sink or a foreachBatch MERGE"
        )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files)
        .parquet(input_dir)
    )
    writer = (
        dedup_stream(stream, ttl_minutes=ttl_minutes, emit_updates=emit_updates)
        .writeStream.queryName(query_name)
        .outputMode("update" if emit_updates else "append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )
    if output_dir is not None:
        writer = writer.format("parquet").option("path", output_dir)
    else:
        writer = writer.format("memory")
    return writer.start()
