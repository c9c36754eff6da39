"""Streaming flagship: stream output == batch output, resume exactly-once."""

import glob
import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from neuscraper_spark.corpus import web_pages_df
from neuscraper_spark.operators.extract import extract_curate_fused
from neuscraper_spark.streaming.curate import run_curate_stream


@pytest.fixture(scope="module")
def page_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("stream") / "pages")
    web_pages_df(spark, seed=31, n_pages=24, partitions=6).write.parquet(d)
    return d


def _sorted(pdf: pd.DataFrame) -> pd.DataFrame:
    return pdf.sort_values("url").reset_index(drop=True)


def test_stream_matches_batch(spark, page_dir, tmp_path):
    out = str(tmp_path / "out")
    q = run_curate_stream(spark, page_dir, out, str(tmp_path / "ckpt"))
    q.awaitTermination(300)
    got = _sorted(spark.read.parquet(out).toPandas())
    want = _sorted(
        extract_curate_fused(spark, spark.read.parquet(page_dir)).toPandas()
    )
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)]
    )
    assert len(got) > 0


def test_stream_resume_exactly_once(spark, page_dir, tmp_path):
    out = str(tmp_path / "out2")
    ckpt = str(tmp_path / "ckpt2")
    # drain once, then restart over the same input: checkpoint offsets
    # mean the restart processes nothing new and appends no duplicates
    q1 = run_curate_stream(spark, page_dir, out, ckpt)
    q1.awaitTermination(300)
    n1 = spark.read.parquet(out).count()
    q2 = run_curate_stream(spark, page_dir, out, ckpt)
    q2.awaitTermination(300)
    n2 = spark.read.parquet(out).count()
    assert n1 == n2 > 0
    urls = spark.read.parquet(out).select("url").toPandas()["url"]
    assert urls.is_unique
