"""SparkSession factory with the scale-tuned defaults.

Local-mode settings mirror what a 1000-executor cluster job would set
(AQE on, skew-join on, Arrow batching sized to the model's inference
batch); the only local-specific knobs are master/driver memory.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from .config import INFERENCE_BATCH


def get_spark(
    app_name: str = "neuscraper_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_MASTER", None)
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    n_threads = 32
    if master.startswith("local[") and master[6:-1].isdigit():
        n_threads = int(master[6:-1])
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or max(n_threads, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Arrow batch ≈ the reference's DataLoader batch of 256 chunks
        # (src/scraper/commoncrawl.py:84)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(INFERENCE_BATCH))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        .config("spark.ui.enabled", "false")
        # keep python workers around between stages — model stays warm
        .config("spark.python.worker.reuse", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
