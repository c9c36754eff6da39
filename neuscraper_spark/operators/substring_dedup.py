"""Substring-level (window) deduplication — Lee et al. 2022,
"Deduplicating Training Data Makes Language Models Better" (ExactSubstr).

Document-level dedup (d1-d5) misses the dominant real-web failure:
boilerplate PASSAGES — license blocks, navigation blurbs, quoted
articles — repeated across otherwise-distinct pages, which LMs then
memorize. Lee et al. remove every 50-token substring that occurs twice
anywhere in the corpus, via a single suffix array — inherently
single-machine. The distributed equivalent (the design Dolma /
SlimPajama-lineage pipelines run) slides a w-token window over every
document, finds window fingerprints occurring >= 2 times CORPUS-WIDE
(within-document repeats count — a doc quoting itself is still
duplication), and excises every covered token span.

Plan shape (no suffix array, no cross join, nothing collected):
  words:   posexplode + one doc-keyed window (consecutive re-index)
  grams:   w-1 lead() columns -> concat -> xxhash64 (constant 8-byte
           shuffle key at any w — the gram STRING never leaves the map
           side; the oracle joins on exact gram text instead and the
           results match absent 64-bit collisions, the q_repetition
           hash_grams contract)
  flags:   groupBy(gram_hash).count() — map-side combined; the zipf
           head collapses before the exchange — then an equi-join back
  excise:  flagged windows explode to covered positions, words
           anti-join them away, and the A1 array_sort-inside-agg
           reassembles the survivors in order.

Determinism: fingerprints are xxhash64 of exact gram text; positions
are consecutive word indexes — executor count and partitioning cannot
move a flag (no floats anywhere).

Reassembly normalizes whitespace (split on \\s+, join with single
spaces) — the same contract as the repetition metrics' word stream.
"""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _words(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, pos, w): non-empty words, pos re-indexed consecutively from
    1 (SQL row_number parity)."""
    raw = df.select(
        id_col,
        F.posexplode(F.split(F.trim(F.col(text_col)), "\\s+")).alias("_p", "w"),
    ).filter(F.col("w") != "")
    win = Window.partitionBy(id_col).orderBy("_p")
    return raw.select(id_col, F.row_number().over(win).alias("pos"), "w")


def duplicated_windows(
    df: DataFrame,
    w: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 2,
) -> DataFrame:
    """(id, pos) of every w-token window whose fingerprint occurs at
    least ``min_count`` times corpus-wide. ``pos`` is the 1-based index
    of the window's first word."""
    words = _words(df, id_col, text_col)
    win = Window.partitionBy(id_col).orderBy("pos")
    cols = [F.col("w")] + [
        F.lead("w", k).over(win).alias(f"_w{k}") for k in range(1, w)
    ]
    grams = (
        words.select(id_col, "pos", *cols)
        .filter(F.col(f"_w{w - 1}").isNotNull())
        .select(
            id_col,
            "pos",
            F.xxhash64(
                F.concat_ws(" ", "w", *[f"_w{k}" for k in range(1, w)])
            ).alias("_gh"),
        )
    )
    dup_hashes = (
        grams.groupBy("_gh")
        .agg(F.count("*").alias("_n"))
        .filter(F.col("_n") >= min_count)
        .select("_gh")
    )
    return grams.join(dup_hashes, "_gh").select(id_col, "pos")


def remove_duplicate_windows(
    df: DataFrame,
    w: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 2,
) -> DataFrame:
    """One row per input row: (id, n_words, n_dup_windows, n_removed,
    clean_text) — every word covered by any duplicated window excised,
    survivors re-joined in order with single spaces. Overlapping
    flagged windows merge naturally (coverage is a distinct-position
    set). Docs shorter than ``w`` words have no windows and pass
    through (whitespace-normalized) unchanged.

    Plan economy: ONE doc-keyed aggregation computes n_words,
    n_removed AND the reassembled text from the words⟕covered merge
    (collect_list skips the NULL elements the covered mark produces),
    and n_dup_windows rides a small agg off the flagged set — an
    earlier draft hung four independent agg branches off ``words`` and
    recomputed its parse/shuffle per branch."""
    words = _words(df, id_col, text_col)
    flagged = duplicated_windows(df, w, id_col, text_col, min_count)
    covered = flagged.select(
        id_col,
        F.explode(F.sequence(F.col("pos"), F.col("pos") + (w - 1))).alias("pos"),
    ).distinct().withColumn("_cov", F.lit(1))
    flag_stats = flagged.groupBy(id_col).agg(
        F.count("*").alias("n_dup_windows")
    )
    merged = words.join(covered, [id_col, "pos"], "left")
    stats = merged.groupBy(id_col).agg(
        F.count("*").alias("n_words"),
        F.count("_cov").alias("n_removed"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(  # skips NULLs: covered words drop out
                        F.when(F.col("_cov").isNull(), F.struct("pos", "w"))
                    )
                ),
                lambda x: x["w"],
            ),
            " ",
        ).alias("clean_text"),
    )
    out = df.select(id_col).join(stats, id_col, "left").join(
        flag_stats, id_col, "left"
    )
    return out.select(
        id_col,
        F.coalesce("n_words", F.lit(0)).alias("n_words"),
        F.coalesce("n_dup_windows", F.lit(0)).alias("n_dup_windows"),
        F.coalesce("n_removed", F.lit(0)).alias("n_removed"),
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
    )


# --------------------------------------------------------- python twin


def remove_duplicate_windows_py(
    texts: dict, w: int = 8, min_count: int = 2
) -> dict:
    """Single-process oracle twin over {id: text} with identical
    semantics (used by tests; the driver oracle is the DuckDB SQL)."""
    words = {i: [x for x in re.split(r"\s+", t.strip()) if x] for i, t in texts.items()}
    counts: Counter = Counter()
    for i, ws in words.items():
        for p in range(len(ws) - w + 1):
            counts[" ".join(ws[p : p + w])] += 1
    out = {}
    for i, ws in words.items():
        flagged = [
            p for p in range(len(ws) - w + 1)
            if counts[" ".join(ws[p : p + w])] >= min_count
        ]
        covered = {q for p in flagged for q in range(p, p + w)}
        out[i] = {
            "n_words": len(ws),
            "n_dup_windows": len(flagged),
            "n_removed": len(covered),
            "clean_text": " ".join(
                x for p, x in enumerate(ws) if p not in covered
            ),
        }
    return out
