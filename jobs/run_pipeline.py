"""spark-submit entry point for the full curation pipeline.

    spark-submit --py-files neuscraper_spark.zip jobs/run_pipeline.py \
        --input /path/web_pages_parquet --output /path/curated_table \
        [--partitions 2048] [--mode resume|overwrite] [--fused]

Packaging: `python jobs/package.py` zips the library for --py-files.
On a cluster the same script runs unchanged at N or 4N executors: the
input is one row per page (narrow python stages scale with executors),
model/vocab/LM tables broadcast once per executor, output commits
per-partition manifests so a preempted run resumes mid-corpus.
"""

from __future__ import annotations

import argparse
import os
import sys

# direct `python jobs/run_pipeline.py` runs resolve the library from the
# repo; under spark-submit the --py-files zip takes precedence anyway
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="web_pages parquet/iceberg path")
    ap.add_argument("--output", required=True, help="curated table root")
    ap.add_argument("--partitions", type=int, default=None)
    ap.add_argument("--mode", choices=["resume", "overwrite"], default="resume")
    ap.add_argument("--fused", action="store_true", help="zero-shuffle plan")
    ap.add_argument("--threshold", type=float, default=None)
    ap.add_argument(
        "--compact",
        action="store_true",
        help="after the write, merge each partition's small parquet "
        "files (Iceberg rewrite_data_files maintenance)",
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from neuscraper_spark import config as C
    from neuscraper_spark.operators.extract import extract_curate_fused, extract_pipeline
    from neuscraper_spark.operators.quality import quality_chain
    from neuscraper_spark.session import get_spark
    from neuscraper_spark.sources.writer import TableWriter, url_host

    spark = get_spark("neuscraper_pipeline")
    web_pages = spark.read.parquet(args.input)
    if args.partitions:
        web_pages = web_pages.repartition(args.partitions)

    thr = args.threshold if args.threshold is not None else C.PRIMARY_THRESHOLD
    if args.fused:
        # ONE python stage (parse+score+assemble+langid+ppl fused) +
        # native tail — byte-identical to the staged plan (tested)
        curated = extract_curate_fused(spark, web_pages, threshold=thr)
    else:
        curated = quality_chain(spark, extract_pipeline(spark, web_pages, threshold=thr))
    # partition the output by url-host bucket: stable, bounded
    # cardinality, and co-locates per-site reads downstream
    curated = curated.withColumn(
        "host_bucket", F.pmod(F.hash(url_host(F.col("url"))), F.lit(64))
    )

    writer = TableWriter(args.output, partition_col="host_bucket")
    snapshot = writer.write(curated, mode=args.mode)
    print(f"committed partitions: {len(snapshot['committed_now'])}, "
          f"rows: {snapshot['rows_written']}")
    if args.compact:
        comp = writer.compact(spark)
        print(f"compacted partitions: {len(comp['compaction'])}")
    spark.stop()


if __name__ == "__main__":
    main()
