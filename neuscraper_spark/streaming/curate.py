"""The flagship curation pipeline as a Structured Streaming job.

A 100 TB corpus usually arrives continuously (new WARC drops), so the
same per-page chain that runs in batch — parse, neural score, ordered
assembly, langid, perplexity, heuristics, PII scrub, keep — also runs
as ``readStream -> transform -> writeStream``:

- The whole chain is STATELESS per page (one input row -> <=1 output
  row), so it passes through Structured Streaming unchanged — the same
  ``extract_curate_fused`` plan object the batch job uses, no
  watermarks or state stores needed.
- The file source + parquet sink + checkpointLocation give exactly-once
  output across restarts (Spark's own offset/commit log — the streaming
  analogue of TableWriter's manifests); a killed job resumes from the
  last committed batch.
- ``trigger(availableNow=True)`` drains the current backlog and stops —
  the batch-equivalence mode the tests compare byte-for-byte against
  the batch plan.

No reference counterpart (the reference is strictly batch); this is the
engine's streaming surface over the north rule's pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .. import config as C

WEB_PAGES_DDL = "url string, warc_ts timestamp, html binary, text string, lang string"


def read_page_stream(
    spark: SparkSession, input_dir: str, max_files: int = 8
) -> DataFrame:
    """File-source stream of web_pages parquet drops."""
    return (
        spark.readStream.schema(WEB_PAGES_DDL)
        .option("maxFilesPerTrigger", max_files)
        .parquet(input_dir)
    )


def curated_stream(
    spark: SparkSession, pages: DataFrame, threshold: float = C.PRIMARY_THRESHOLD
) -> DataFrame:
    """The batch flagship plan applied to a streaming DataFrame."""
    from ..operators.extract import extract_curate_fused

    return extract_curate_fused(spark, pages, threshold=threshold)


def run_curate_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    threshold: float = C.PRIMARY_THRESHOLD,
    available_now: bool = True,
):
    """readStream -> curate -> parquet sink with exactly-once checkpoint."""
    out = curated_stream(spark, read_page_stream(spark, input_dir), threshold)
    writer = (
        out.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
