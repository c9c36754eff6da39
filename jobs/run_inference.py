"""Inference CLI — drop-in for ``scripts/inference.sh`` ->
``src/scraper/inference.py``.

Reads the encoded-chunk JSON files a reference user already has
(``encoded/*.json`` lines {TokenId, NodeIds, Url[, Labels]},
processing.py:24-34), scores every chunk with the broadcast model, and
writes the Primary@0.9 prediction TSV ``Url<TAB>TextNodeId<TAB>Task``
(inference.py:77-144 writes temp/inference_test.tsv with those columns).

    spark-submit --py-files neuscraper_spark.zip jobs/run_inference.py \
        --input encoded_dir_or_glob --output predictions_dir \
        [--task Primary] [--threshold 0.9]

The output is a directory of part-TSVs (one per partition — cat them or
coalesce with --single-file for the reference's one-file shape).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="encoded chunk json file/dir/glob")
    ap.add_argument("--output", required=True, help="prediction TSV output dir")
    ap.add_argument("--task", default="Primary")
    ap.add_argument("--threshold", type=float, default=None)
    ap.add_argument(
        "--single-file", action="store_true",
        help="coalesce to one TSV part (driver-side funnel; small outputs only)",
    )
    args = ap.parse_args()

    from neuscraper_spark import config as C
    from neuscraper_spark.session import get_spark
    from neuscraper_spark.sources.chunks import read_encoded_chunks, score_encoded_chunks

    spark = get_spark("run_inference")
    thr = args.threshold if args.threshold is not None else C.PRIMARY_THRESHOLD
    chunks = read_encoded_chunks(spark, args.input)
    preds = score_encoded_chunks(spark, chunks, task=args.task, threshold=thr)
    # reference column names, no header (evaluator.py:7-13 reads headerless)
    out = preds.toDF("Url", "TextNodeId", "Task")
    if args.single_file:
        out = out.coalesce(1)
    out.write.mode("overwrite").csv(args.output, sep="\t", header=False)
    print(f"predictions written: {args.output}")
    spark.stop()


if __name__ == "__main__":
    main()
