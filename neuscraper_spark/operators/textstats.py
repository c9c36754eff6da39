"""Text analysis operators: token counting, quality scoring, document
fingerprinting, language stats — all Catalyst-native (no Python).

Complements the quality chain (quality.py) with the per-document
statistics a training-data pipeline tracks at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# whitespace tokens + BPE-ish subword pieces (word chars runs of <=4 +
# punctuation), both countable by the same regex in Spark and DuckDB
BPE_ISH_PATTERN = r"[A-Za-zÀ-ÿ0-9]{1,4}|[^A-Za-zÀ-ÿ0-9\s]"


def with_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    text = F.col(text_col)
    ws_tokens = F.size(F.filter(F.split(F.trim(text), r"\s+"), lambda w: w != F.lit("")))
    bpe_tokens = F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), F.lit(0)))
    return df.withColumn("ws_tokens", ws_tokens).withColumn("bpe_tokens", bpe_tokens)


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite [0,1] quality score from native signals: length band,
    punctuation presence, uppercase-start ratio, digit density."""
    text = F.col(text_col)
    n_chars = F.length(text)
    n_digits = n_chars - F.length(F.regexp_replace(text, r"[0-9]", ""))
    n_punct = n_chars - F.length(F.regexp_replace(text, r"[.!?]", ""))
    len_score = F.least(n_chars.cast("double") / 1000.0, F.lit(1.0))
    punct_score = F.least(n_punct.cast("double") / 10.0, F.lit(1.0))
    digit_penalty = F.least(
        n_digits.cast("double") / F.greatest(n_chars, F.lit(1)).cast("double") * 5.0,
        F.lit(1.0),
    )
    score = F.round(
        (len_score * 0.4 + punct_score * 0.3 + (1.0 - digit_penalty) * 0.3), 6
    )
    return df.withColumn("quality_score", score)


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stable content fingerprint of the *normalized* text: lowercase,
    collapse whitespace runs, strip leading/trailing — md5 so exact-dup
    detection survives whitespace-only edits and is oracle-checkable."""
    normalized = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    return df.withColumn("fingerprint", F.md5(normalized))


def lang_source_stats(df: DataFrame) -> DataFrame:
    """Per (lang, source) corpus statistics."""
    df = with_token_counts(df)
    return df.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("ws_tokens").alias("total_ws_tokens"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.min("doc_id").alias("first_doc"),
    )
