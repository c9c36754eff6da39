"""S8 serving parity + fully-fused curate equality."""

import pandas as pd

from neuscraper_spark.operators.extract import extract_curate_fused, extract_pipeline
from neuscraper_spark.operators.quality import quality_chain
from neuscraper_spark.operators.serve import predict_page, predict_page_spark
from neuscraper_spark.corpus import web_pages_df


def test_serving_single_page_parity(spark, pages):
    for p in pages[:4]:
        served = predict_page(p["url"], p["html"])
        via_spark = predict_page_spark(spark, p["url"], p["html"])
        assert served["Text"] == via_spark["Text"], p["url"]
        assert served["Url"] == via_spark["Url"]


def test_fully_fused_curate_equals_staged(spark):
    wp = web_pages_df(spark, seed=11, n_pages=25, partitions=3).cache()
    cols = ["url", "text", "lang_pred", "lang_conf", "ppl", "quality_pass",
            "scrubbed_text", "toxicity_pass", "keep"]
    staged = (
        quality_chain(spark, extract_pipeline(spark, wp)).select(cols)
        .toPandas().sort_values("url").reset_index(drop=True)
    )
    fused = (
        extract_curate_fused(spark, wp).select(cols)
        .toPandas().sort_values("url").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(staged, fused)
    wp.unpersist()
