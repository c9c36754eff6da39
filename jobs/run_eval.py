"""Eval CLI — drop-in for the reference's ``python src/eval/run_eval.py``.

Reads the same three files a reference user has today (prediction TSV
``Url<TAB>TextNodeId<TAB>Task``, text-node CSV ``Url,TextNodeId,Text``,
gold CSV ``Url,TextNodeId,Text,JudgmentIsPrimary`` — SURVEY.md §1.c),
runs the eval as one Spark job (operators/evaluate.py), and prints the
reference's metric line (src/eval/run_eval.py:51).

    python jobs/run_eval.py --predictions p.tsv --text-nodes t.csv --gold g.csv
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--predictions", required=True)
    ap.add_argument("--text-nodes", required=True)
    ap.add_argument("--gold", required=True)
    ap.add_argument("--task", default="Primary")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from neuscraper_spark.functions.text import unescape_gold
    from neuscraper_spark.operators.evaluate import evaluate
    from neuscraper_spark.session import get_spark

    spark = get_spark("run_eval")
    # reference readers: no-header TSV for predictions
    # (evaluator.py:7-13), headered CSVs for text nodes / gold
    pred = (
        spark.read.csv(args.predictions, sep="\t", header=False)
        .toDF("url", "text_node_id", "task")
        .withColumn("text_node_id", F.col("text_node_id").cast("int"))
        .filter(F.col("task") == args.task)
    )
    # text-node text is #N#/#TAB#/#R#-escaped in the files (so embedded
    # control chars survive single-line CSV); unescape on read so the
    # assembled prediction text is raw, exactly like the in-process
    # path (gold is unescaped inside evaluate(), evaluator.py:75,86)
    text_nodes = (
        spark.read.csv(args.text_nodes, header=True)
        .toDF("url", "text_node_id", "text")
        .withColumn("text_node_id", F.col("text_node_id").cast("int"))
        .withColumn("text", unescape_gold(F.col("text")))
    )
    gold = (
        spark.read.csv(args.gold, header=True)
        .toDF("url", "text_node_id", "text", "judgment_is_primary")
        .withColumn("text_node_id", F.col("text_node_id").cast("int"))
        .withColumn("judgment_is_primary", F.col("judgment_is_primary").cast("boolean"))
        .na.drop(subset=["text"])
    )
    m = evaluate(pred, text_nodes, gold).collect()[0]
    print(
        "Metrics for NeuScraper: Acc: %f Prec: %f Rec: %f F1: %f"
        % (m["accuracy"], m["precision"], m["recall"], m["fscore"])
    )
    spark.stop()


if __name__ == "__main__":
    main()
