"""Structured Streaming sink into TableWriter — exactly-once appends.

The parquet sink (streaming/curate.py) gives exactly-once files, but a
production curation stream lands in the GOVERNED table: snapshots,
time-travel, equality deletes, incremental consumers. This module
bridges the two subsystems with ``foreachBatch``:

- Each micro-batch commits as one immutable partition named by its
  batch id (``b<id>``, zero-padded so lexical order == commit order).
- Structured Streaming replays a batch after a crash WITH THE SAME
  batch id; ``TableWriter.write(mode='resume')`` skips partitions that
  already committed, so the replay is a no-op — exactly-once without a
  transactional sink, the same manifest protocol the batch writer uses
  (a crash between data-write and manifest-commit leaves an orphan dir
  that the next write clears before appending).
- Every batch takes a table snapshot, so ``read_incremental`` hands a
  downstream consumer exactly the new batches — a streaming CDC chain
  (stream -> table -> incremental index refresh) with no extra
  bookkeeping.

Content-based partitioning (url host, date) is a compaction-time
concern here: micro-batches are time-slices by nature, and re-keying
inflight would shuffle every batch. ``TableWriter.compact`` merges the
small per-batch partitions once the stream is quiesced.

No reference counterpart (the reference is strictly batch); composes
S9 (checkpoint/resume) with the streaming tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.writer import TableWriter

BATCH_COL = "_batch"


def batch_partition(batch_id: int) -> str:
    return f"b{batch_id:010d}"


def make_batch_committer(root: str, expectations: dict | None = None):
    """The foreachBatch callback: append one micro-batch as one
    committed partition, idempotently. Exposed separately so tests (and
    manual backfills) can drive replay semantics directly."""
    def commit(df: DataFrame, batch_id: int) -> None:
        writer = TableWriter(root, partition_col=BATCH_COL)
        writer.write(
            df.withColumn(BATCH_COL, F.lit(batch_partition(batch_id))),
            mode="resume",
            expectations=expectations,
        )

    return commit


def stream_to_table(
    out_stream: DataFrame,
    root: str,
    checkpoint_dir: str,
    query_name: str = "table_sink",
    available_now: bool = True,
    expectations: dict | None = None,
):
    """writeStream -> TableWriter with exactly-once batch commits.

    ``expectations`` (optional) forwards to the write-audit-publish
    gate: a violating micro-batch refuses to commit its partition and
    fails the streaming query loudly rather than publishing bad rows.
    """
    w = (
        out_stream.writeStream.foreachBatch(
            make_batch_committer(root, expectations)
        )
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()
