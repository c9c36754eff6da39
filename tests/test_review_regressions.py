"""Regression pins for the round-5 code-review findings (each verified
live before the fix; see the corresponding commit)."""

import pytest
from pyspark.sql import functions as F

from neuscraper_spark.sources.writer import TableWriter


def _batch(spark, rows):
    return spark.createDataFrame(rows, "url string, bucket string, score long")


@pytest.fixture()
def table(spark, tmp_path):
    w = TableWriter(str(tmp_path / "t"), partition_col="bucket")
    df = spark.range(0, 20).select(
        F.concat(F.lit("u"), F.col("id")).alias("url"),
        (F.col("id") % 2).cast("string").alias("bucket"),
        (F.col("id") * 10).alias("score"),
    )
    w.write(df, mode="resume")
    return w


def test_overwrite_clears_stale_deletes(spark, table):
    """Stale delete files must not apply to the replacement table: an
    equality delete would suppress same-keyed fresh rows, a position
    delete would reference deleted files and block compaction forever."""
    table.delete_where(spark, "url = 'u5'", key_col="url")
    table.delete_positions(spark, "score >= 150")
    table.write(_batch(spark, [("u5", "0", 1), ("u99", "0", 2)]),
                mode="overwrite")
    got = {r["url"] for r in table.read(spark).collect()}
    assert got == {"u5", "u99"}  # u5 NOT suppressed by the stale delete
    assert table.committed_deletes() == []
    table.compact(spark, min_files=1)  # no stale-position refusal


def test_failed_audit_does_not_publish_schema_evolution(spark, table):
    from neuscraper_spark.operators.expectations import ExpectationError

    bad = spark.createDataFrame(
        [("u100", "9", 5, None)],  # fresh partition: resume won't skip it
        "url string, bucket string, score long, lang string",
    )
    with pytest.raises(ExpectationError):
        table.write(bad, mode="resume", evolve=True, defaults={"lang": "und"},
                    expectations={"lang": [("not_null",)]})
    # the rejected batch published NOTHING: no new column, no new rows
    got = table.read(spark)
    assert "lang" not in got.columns
    assert got.count() == 20


def test_read_pruned_with_pending_position_deletes(spark, table):
    table.delete_positions(spark, "score >= 150")  # u15..u19
    out = table.read_pruned(spark, "score", lo=100, hi=190)
    urls = {r["url"] for r in out.collect()}
    assert urls == {f"u{i}" for i in range(10, 15)}
    assert "_file" not in out.columns and "_pos" not in out.columns


def test_merge_rows_matched_excludes_deleted_rows(spark, table):
    """rows_matched counts VISIBLE rows the source replaces; equality-
    deleted rows the rewrite incidentally materializes must not count."""
    table.delete_where(spark, "url = 'u3'", key_col="url")
    snap = table.merge_into(
        spark, _batch(spark, [("u5", "1", 999)]), key_col="url"
    )
    assert snap["merge"]["rows_matched"] == 1  # u5 only, not u3


def test_bpe_trains_on_unicode_words(spark):
    from neuscraper_spark.bpe import train_bpe_on

    df = spark.createDataFrame(
        [(i, "café für straße café") for i in range(10)],
        "doc_id long, text string",
    )
    tok = train_bpe_on(df, n_merges=64)
    # the dominant word must train to ONE piece — pre-fix the Java
    # ASCII-\w split fed 'caf'+'é' fragments that never merge with the
    # Python-side whole word
    assert tok.n_tokens("café") == 1


def test_repetition_filter_survives_duplicate_urls(spark):
    from neuscraper_spark.operators.curation import apply_corpus_filters

    clean = ("the quick brown fox jumps over one lazy dog today "
             "while seven other animals watch quietly from afar")
    df = spark.createDataFrame(
        [("https://a.com/x", clean, 1), ("https://a.com/x", clean, 2)],
        "url string, text string, batch long",
    )
    out = apply_corpus_filters(df, dedup_urls=False, repetition=True)
    # pre-fix: both copies aggregated as one doc, read ~50% duplicate
    # lines, and BOTH were dropped; each copy is clean on its own
    assert out.count() == 2
