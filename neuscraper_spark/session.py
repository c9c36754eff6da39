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
        # keep AQE-coalesced partitions from dropping below real
        # parallelism for byte-small but python-CPU-heavy stages: the
        # floor is parallelism-first with a small min size, so big data
        # still coalesces toward the 64MB advisory.
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
        # CPU-granular input splits. The default packing (128MB target,
        # 4MB per-file open cost, target scaled by total parallelism)
        # sizes scan partitions for BYTE-heavy plans; this engine's scan
        # feeds a python-CPU-heavy stage (~ms/KB, not ns/KB), where
        # byte-sized splits quantize the stage into one or two waves of
        # giant tasks — measured on the bench corpus: 8 tasks for an
        # 8-slot cluster (a single wave, so every straggler lands on the
        # wall clock) and a 25% throughput loss vs 4 independent jobs.
        # 1MB splits keep tasks at a few hundred pages (~1-2s of python
        # work) at ANY executor count — at warehouse scale this floors
        # out at row-group granularity, which is the right floor for a
        # CPU-bound stage; AQE still coalesces byte-heavy shuffle
        # stages independently of this scan-side knob.
        .config("spark.sql.files.maxPartitionBytes", "1m")
        .config("spark.sql.files.openCostInBytes", "256k")
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
    # Pin BLAS to one thread *in the python workers*: N workers x M BLAS
    # threads thrashes the box and perturbs float32 reduction order.
    # (neuscraper_spark/__init__.py pins the driver; workers need it via
    # executorEnv because pyspark.worker imports numpy before user code.)
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        builder = builder.config(f"spark.executorEnv.{var}", "1")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def warm_python_workers(spark: SparkSession, n: int | None = None) -> None:
    """Force-spawn the full python worker pool and its heavy imports.

    Workers spawn lazily per concurrent task, so a job's first runs pay
    staggered numpy/pandas import + model-broadcast deserialization.
    One wide dummy stage (and worker reuse) moves that cost off the
    measured path — the local twin of executor warm-up on a cluster.
    """
    n = n or spark.sparkContext.defaultParallelism

    def _touch(batches):
        from .model import load_weights  # heavy imports inside workers
        from .operators.quality import _ppl_tables, _profiles

        _profiles()
        _ppl_tables()
        load_weights()
        for pdf in batches:
            yield pdf[["id"]]

    import time as _time

    def _stall(batches):
        _time.sleep(0.5)  # hold the slot so every task gets a fresh worker
        yield from _touch(batches)

    spark.range(0, n, 1, n).mapInPandas(_stall, "id long").count()
