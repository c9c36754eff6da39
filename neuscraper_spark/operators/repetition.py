"""Gopher-style repetition filters — the missing family of the
heuristic quality chain (F11 covers the Gopher *outlier* rules;
this module adds the *repetition* rules of Rae et al. 2021,
"Scaling Language Models: Methods, Analysis & Insights from Training
Gopher", Table A1).

Reference parity note: the reference pipeline (NeuScraper) filters at
the node level only; repetition removal is the standard downstream
curation stage every Gopher/C4-lineage corpus applies after
extraction, so it is implemented here as a first-class oracle-checked
operator rather than a port of any reference file.

Pinned semantics (mirrored exactly by the DuckDB oracle in
queries.q_repetition and by ``repetition_py``):

* **lines**    — ``split(text, '\\n')``, each element ``trim``\\ med
  (ASCII space only, both engines), empties dropped.
* **paragraphs** — same, splitting on ``\\n{2,}``.
* ``dup_<unit>_frac``       = sum(cnt-1) / sum(cnt) over distinct
  units — the fraction of unit *occurrences* that are repeats.
* ``dup_<unit>_char_frac``  = sum((cnt-1)*len) / sum(cnt*len).
* **words**    — ``split(trim(lower(text)), '\\s+')``, empties
  dropped, re-indexed consecutively (so runs of whitespace cannot
  break n-gram adjacency).
* ``top{2,3,4}gram_char_frac`` = max over n-grams OCCURRING AT LEAST
  TWICE of (count * sum-of-word-chars-in-gram) / total word chars.
  This is the deterministic tie-free variant of Gopher's "fraction of
  characters contained in the most frequent n-gram": taking the max of
  the *product* needs no tie-break rule between equally-frequent
  grams, and the cnt>=2 floor keeps a phrase seen once from counting
  as repetition (otherwise every short clean document fails
  tautologically — Gopher applied the rule after a 50-word minimum).
* ``dup5gram_word_frac`` = distinct word positions covered by any
  5-gram occurring more than once, / word count (word-position
  coverage, the no-double-counting analogue of Gopher's duplicated
  n-gram character fraction).
* Every fraction is rounded to 4 decimals BEFORE thresholding
  (the repo-wide quantize-before-threshold invariant: executor count
  or engine cannot flip a rule decision).

Thresholds follow Gopher Table A1 where one exists.
"""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

REPETITION_RULES = {
    "max_dup_line_frac": 0.30,
    "max_dup_para_frac": 0.30,
    "max_dup_line_char_frac": 0.20,
    "max_dup_para_char_frac": 0.20,
    "max_top2gram_char_frac": 0.20,
    "max_top3gram_char_frac": 0.18,
    "max_top4gram_char_frac": 0.16,
    "max_dup5gram_word_frac": 0.15,
}

METRIC_COLS = [
    "dup_line_frac",
    "dup_line_char_frac",
    "dup_para_frac",
    "dup_para_char_frac",
    "top2gram_char_frac",
    "top3gram_char_frac",
    "top4gram_char_frac",
    "dup5gram_word_frac",
]

_THRESH = [REPETITION_RULES[f"max_{m}"] for m in METRIC_COLS]


def _unit_stats(df: DataFrame, id_col: str, text_col: str, sep: str,
                prefix: str) -> DataFrame:
    """Per-doc duplicate-unit stats for one unit type (line/para).

    Two-level aggregate, both keyed by (or prefixed by) the doc id —
    at scale these are ordinary hash aggregations whose partial
    (map-side) phase collapses each doc's units before the exchange.
    """
    units = (
        df.select(id_col, F.explode(F.split(F.col(text_col), sep)).alias("_u"))
        .select(id_col, F.trim(F.col("_u")).alias("_u"))
        .filter(F.col("_u") != "")
    )
    per_unit = units.groupBy(id_col, "_u").agg(F.count("*").alias("_cnt"))
    ln = F.length(F.col("_u"))
    return per_unit.groupBy(id_col).agg(
        ((F.sum(F.col("_cnt") - 1)) / F.sum("_cnt")).alias(f"{prefix}_frac"),
        (
            F.sum((F.col("_cnt") - 1) * ln) / F.sum(F.col("_cnt") * ln)
        ).alias(f"{prefix}_char_frac"),
    )


def with_repetition(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text",
                    hash_grams: bool = False) -> DataFrame:
    """Adds the eight repetition metrics + ``repetition_pass`` to
    ``df`` (one row per input row; docs with no words/lines score 0 on
    every metric, i.e. pass).

    Plan shape: explode → two-level hash agg per unit family, one
    doc-keyed window sort for word positions, (doc, gram)-keyed counts
    per n — the d2 n-gram family, no cross joins, nothing collected.

    Scale note: each word participates in n n-grams, so the exact gram
    string columns weigh ~(2+3+4)x the text through the partial-agg
    exchanges (map-side combine collapses the zipf head; the unique
    tail ships once per partition). ``hash_grams=True`` counts by
    ``xxhash64(gram)`` instead — constant 8 bytes per gram, metrics
    identical absent 64-bit collisions (pinned equal on fixtures by
    test) — the setting a 100 TB run uses. The driver oracle keeps
    exact grams (DuckDB has no xxhash64)."""
    base = df
    lines = _unit_stats(base, id_col, text_col, "\n", "dup_line")
    paras = _unit_stats(base, id_col, text_col, "\n{2,}", "dup_para")

    # words, consecutively re-indexed after dropping empties
    raw = base.select(
        id_col,
        F.posexplode(
            F.split(F.trim(F.lower(F.col(text_col))), "\\s+")
        ).alias("_pos", "_w"),
    ).filter(F.col("_w") != "")
    win = Window.partitionBy(id_col).orderBy("_pos")
    words = raw.select(
        id_col,
        F.col("_w"),
        (F.row_number().over(win) - 1).alias("_i"),
        F.lead("_w", 1).over(win).alias("_w1"),
        F.lead("_w", 2).over(win).alias("_w2"),
        F.lead("_w", 3).over(win).alias("_w3"),
        F.lead("_w", 4).over(win).alias("_w4"),
    )
    wstat = words.groupBy(id_col).agg(
        F.count("*").alias("_n_words"),
        F.sum(F.length("_w")).alias("_wchars"),
    )

    def _top_gram(n: int) -> DataFrame:
        parts = ["_w"] + [f"_w{k}" for k in range(1, n)]
        g = F.concat_ws(" ", *[F.col(p) for p in parts])
        if hash_grams:
            g = F.xxhash64(g)
        gch: Column = F.length("_w")
        for p in parts[1:]:
            gch = gch + F.length(p)
        per_gram = (
            words.filter(F.col(parts[-1]).isNotNull())
            .select(id_col, g.alias("_g"), gch.alias("_gch"))
            .groupBy(id_col, "_g")
            .agg(F.count("*").alias("_cnt"), F.min("_gch").alias("_gch"))
        )
        return per_gram.groupBy(id_col).agg(
            F.max(
                F.when(F.col("_cnt") >= 2, F.col("_cnt") * F.col("_gch"))
            ).alias(f"_best{n}")
        )

    tops = [_top_gram(n) for n in (2, 3, 4)]

    # 5-gram word-position coverage: occurrences of any duplicated
    # 5-gram stamp word positions [i, i+4]; distinct positions / words
    g5_expr = F.concat_ws(" ", "_w", "_w1", "_w2", "_w3", "_w4")
    if hash_grams:
        g5_expr = F.xxhash64(g5_expr)
    g5 = words.filter(F.col("_w4").isNotNull()).select(
        id_col, "_i", g5_expr.alias("_g")
    )
    gw = Window.partitionBy(id_col, "_g")
    cov = (
        g5.withColumn("_cnt", F.count("*").over(gw))
        .filter(F.col("_cnt") > 1)
        .select(id_col, F.explode(F.sequence(F.col("_i"), F.col("_i") + 4)).alias("_p"))
        .groupBy(id_col)
        .agg(F.countDistinct("_p").alias("_covered"))
    )

    out = base
    for side in [lines, paras, wstat, *tops, cov]:
        out = out.join(side, id_col, "left")

    def _r(c: Column) -> Column:
        return F.round(F.coalesce(c, F.lit(0.0)), 4)

    out = (
        out.withColumn("dup_line_frac", _r(F.col("dup_line_frac")))
        .withColumn("dup_line_char_frac", _r(F.col("dup_line_char_frac")))
        .withColumn("dup_para_frac", _r(F.col("dup_para_frac")))
        .withColumn("dup_para_char_frac", _r(F.col("dup_para_char_frac")))
        .withColumn("top2gram_char_frac", _r(F.col("_best2") / F.col("_wchars")))
        .withColumn("top3gram_char_frac", _r(F.col("_best3") / F.col("_wchars")))
        .withColumn("top4gram_char_frac", _r(F.col("_best4") / F.col("_wchars")))
        .withColumn("dup5gram_word_frac", _r(F.col("_covered") / F.col("_n_words")))
    )
    passes = [
        F.col(m) <= F.lit(t) for m, t in zip(METRIC_COLS, _THRESH)
    ]
    keep = passes[0]
    for p in passes[1:]:
        keep = keep & p
    return out.withColumn("repetition_pass", keep).drop(
        "_best2", "_best3", "_best4", "_wchars", "_n_words", "_covered"
    )


# ---------------------------------------------------------------------------
# single-process twin (pytest parity; same pinned semantics)
# ---------------------------------------------------------------------------


def _unit_stats_py(units: list[str]) -> tuple[float, float]:
    units = [u.strip() for u in units]
    units = [u for u in units if u]
    if not units:
        return 0.0, 0.0
    c = Counter(units)
    n = sum(c.values())
    dup = sum(v - 1 for v in c.values())
    ch = sum(v * len(u) for u, v in c.items())
    dch = sum((v - 1) * len(u) for u, v in c.items())
    return dup / n, (dch / ch) if ch else 0.0


def repetition_py(text: str) -> dict:
    """Reference twin of ``with_repetition`` for one document."""
    lf, lcf = _unit_stats_py(text.split("\n"))
    pf, pcf = _unit_stats_py(re.split(r"\n{2,}", text))
    words = [w for w in re.split(r"\s+", text.strip().lower()) if w]
    wchars = sum(len(w) for w in words)
    m = {
        "dup_line_frac": lf,
        "dup_line_char_frac": lcf,
        "dup_para_frac": pf,
        "dup_para_char_frac": pcf,
    }
    for n in (2, 3, 4):
        grams = Counter(
            tuple(words[i : i + n]) for i in range(len(words) - n + 1)
        )
        best = max(
            (cnt * sum(len(w) for w in g) for g, cnt in grams.items() if cnt >= 2),
            default=0,
        )
        m[f"top{n}gram_char_frac"] = (best / wchars) if wchars else 0.0
    g5 = Counter(tuple(words[i : i + 5]) for i in range(len(words) - 4))
    covered: set[int] = set()
    for i in range(len(words) - 4):
        if g5[tuple(words[i : i + 5])] > 1:
            covered.update(range(i, i + 5))
    m["dup5gram_word_frac"] = (len(covered) / len(words)) if words else 0.0
    m = {k: round(v, 4) for k, v in m.items()}
    m["repetition_pass"] = all(
        m[mc] <= t for mc, t in zip(METRIC_COLS, _THRESH)
    )
    return m
