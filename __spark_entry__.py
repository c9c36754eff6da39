"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship curation pipeline (HTML parse ->
neural node scoring -> ordered assembly -> quality chain) over a
web_pages table synthesized deterministically from the sf0.001
``documents`` parquet. ``queries()``/``oracle_sql()`` expose one entry
per implemented operator from SURVEY.md §2 with a DuckDB oracle where
SQL-expressible; non-SQL operators (the neural pipeline itself, langid,
perplexity) appear without an oracle and get the driver's rows-only
check — their real gate is the byte-identity pytest suite
(tests/test_pipeline.py) against the single-process oracle.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# the package lives next to this file; make imports work regardless of
# the driver's cwd/sys.path
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

_SHIPPED: set[int] = set()


def _ensure_package_shipped(spark: SparkSession) -> None:
    """Make ``neuscraper_spark`` importable in executor python workers
    even when the driver's cwd is elsewhere: zip the package and
    sc.addPyFile it (the same artifact spark-submit --py-files ships)."""
    key = id(spark)
    if key in _SHIPPED:
        return
    sys.path.insert(0, os.path.join(_REPO_ROOT, "jobs"))
    from package import main as build_zip  # jobs/package.py

    spark.sparkContext.addPyFile(build_zip())
    _SHIPPED.add(key)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full extract + quality-filter chain at sf0.001."""
    _ensure_package_shipped(spark)
    from neuscraper_spark.corpus import web_pages_from_documents
    from neuscraper_spark.operators.extract import extract_pipeline
    from neuscraper_spark.operators.quality import (
        build_ppl_tables_from_texts,
        quality_chain,
    )

    sf_dir = "/root/testdata/sf0.001"
    web_pages = web_pages_from_documents(spark, sf_dir)
    extracted = extract_pipeline(spark, web_pages)
    # fit the perplexity LM on the domain sample (deterministic: doc_id
    # order), then broadcast — the "fit small, score wide" pattern
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sample = [r.text for r in docs.select("text").orderBy("doc_id").limit(200).collect()]
    curated = quality_chain(
        spark, extracted, text_col="text", ppl_tables=build_ppl_tables_from_texts(sample)
    )
    return curated.select(
        "url", "text", "lang_pred", "lang_conf", "ppl", "n_words",
        "quality_pass", "scrubbed_text", "pii_count", "toxicity_pass", "keep",
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from neuscraper_spark.queries import all_queries

    def shipped(fn):
        def wrapper(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ensure_package_shipped(spark)
            return fn(spark, sf_dir)

        return wrapper

    return {name: shipped(fn) for name, fn in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    from neuscraper_spark.queries import all_oracles

    return all_oracles()
