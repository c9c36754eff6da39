"""Evaluation harness — the reference's fourth pipeline (SURVEY.md §3,
"eval path"): src/eval/run_eval.py + src/eval/evaluator.py re-expressed
as one declarative plan.

Inputs (reference CSV/TSV schemas, §1.c):
    predictions(url, text_node_id, task)          inference.py:143-144
    text_nodes(url, text_node_id, text)           build.py:155-165
    gold(url, text_node_id, text, judgment_is_primary)  build_test.py:170

Steps mapped 1:1:
    J1  predictions ⟕ text_nodes + dropna          (evaluator.py:23-25)
    A1  per-url desc-node-id ''-concat             (run_eval.py:44-45)
    J2+U1 inject urls absent from predictions with null text
                                                   (run_eval.py:13-22)
    C2  unescape gold #N#/#TAB#/#R#                (evaluator.py:75,86)
    C3  substring containment per gold snippet     (evaluator.py:77,87)
    A4  micro-summed tp/tn/fp/fn                   (evaluator.py:35-44)
    A5  precision/recall/accuracy/F1               (evaluator.py:27-33)

Everything is native Catalyst (the containment check is `contains`),
so the eval runs corpus-wide as one job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import unescape_gold


def ordered_concat_expr_tn():
    return F.array_join(
        F.transform(
            F.reverse(F.array_sort(F.collect_list(F.struct("text_node_id", "text")))),
            lambda x: x["text"],
        ),
        "",
    )


def assemble_predictions(predictions: DataFrame, text_nodes: DataFrame) -> DataFrame:
    """predictions + text_nodes -> (url, task, text): J1 + F7 + W1 + A1."""
    joined = predictions.join(text_nodes, ["url", "text_node_id"], "left").na.drop()
    return joined.groupBy("url", "task").agg(ordered_concat_expr_tn().alias("text"))


def inject_missing_urls(pred_text: DataFrame, gold: DataFrame) -> DataFrame:
    """Urls with gold rows but no predictions enter with null text so
    their positives count as misses (run_eval.py:13-22: J2 + U1)."""
    missing = (
        gold.select("url").distinct()
        .join(pred_text.select("url").distinct(), "url", "left_anti")
        .withColumn("task", F.lit("Primary"))
        .withColumn("text", F.lit(None).cast("string"))
    )
    return pred_text.unionByName(missing)


def confusion_counts(pred_text: DataFrame, gold: DataFrame) -> DataFrame:
    """One row: tp/tn/fp/fn over all gold snippets (A4)."""
    g = gold.select(
        "url",
        unescape_gold(F.col("text")).alias("gold_text"),
        F.col("judgment_is_primary").alias("is_primary"),
    )
    j = g.join(pred_text.select("url", "text"), "url", "left")
    hit = F.col("text").isNotNull() & F.col("text").contains(F.col("gold_text"))
    return j.agg(
        F.sum(F.when(F.col("is_primary") & hit, 1).otherwise(0)).alias("tp"),
        F.sum(F.when(~F.col("is_primary") & ~hit, 1).otherwise(0)).alias("tn"),
        F.sum(F.when(~F.col("is_primary") & hit, 1).otherwise(0)).alias("fp"),
        F.sum(F.when(F.col("is_primary") & ~hit, 1).otherwise(0)).alias("fn"),
    )


def metrics(conf: DataFrame) -> DataFrame:
    """A5 finalizer, exactly evaluator.py:27-33."""
    tp, tn, fp, fn = (F.col(c).cast("double") for c in ("tp", "tn", "fp", "fn"))
    return conf.select(
        "tp", "tn", "fp", "fn",
        (tp / (tp + fp)).alias("precision"),
        (tp / (tp + fn)).alias("recall"),
        ((tp + tn) / (tp + tn + fp + fn)).alias("accuracy"),
        ((2 * tp) / (2 * tp + fp + fn)).alias("fscore"),
    )


def evaluate(predictions: DataFrame, text_nodes: DataFrame, gold: DataFrame) -> DataFrame:
    pred_text = assemble_predictions(predictions, text_nodes)
    pred_text = inject_missing_urls(pred_text, gold)
    return metrics(confusion_counts(pred_text, gold))


# ------------------------------------------------------------- python twin


def evaluate_py(predictions, text_nodes, gold) -> dict:
    """pandas mirror following the reference's row-at-a-time logic."""
    import pandas as pd

    pred_df = pd.DataFrame(predictions, columns=["url", "text_node_id", "task"])
    tn_df = pd.DataFrame(text_nodes, columns=["url", "text_node_id", "text"])
    merged = pred_df.merge(tn_df, how="left", on=["url", "text_node_id"]).dropna()
    merged = merged.sort_values("text_node_id", ascending=False)
    pred_text = merged.groupby(["url", "task"], as_index=False).agg({"text": "".join})
    texts = dict(zip(pred_text["url"], pred_text["text"]))

    tp = tn = fp = fn = 0
    for url, _, gtext, is_primary in gold:
        gtext = gtext.replace("#N#", "\n").replace("#TAB#", "\t").replace("#R#", "\r")
        ptext = texts.get(url)
        hit = ptext is not None and gtext in ptext
        if is_primary:
            tp, fn = tp + hit, fn + (not hit)
        else:
            fp, tn = fp + hit, tn + (not hit)
    return {
        "tp": tp, "tn": tn, "fp": fp, "fn": fn,
        "precision": tp / (tp + fp) if tp + fp else float("nan"),
        "recall": tp / (tp + fn) if tp + fn else float("nan"),
        "accuracy": (tp + tn) / max(tp + tn + fp + fn, 1),
        "fscore": (2 * tp) / (2 * tp + fp + fn) if 2 * tp + fp + fn else float("nan"),
    }
