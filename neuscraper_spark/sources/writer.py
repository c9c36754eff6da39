"""Iceberg-style table writer with per-partition lineage + resumability.

The north rule (BASELINE.json:14) requires reading/writing Iceberg
tables, checkpointing per-partition lineage and metrics so a run is
resumable mid-corpus (the batch twin of the reference's
checkpoint-resume training loop, src/scraper/trainer.py:106-189). No
Iceberg runtime jar ships in this sandbox, so the layout is
parquet-files + an owned manifest directory with the same properties an
Iceberg catalog would provide (atomic visibility via manifest commit,
partition-level stats, snapshot history); `TableWriter` is the single
seam where a real Iceberg catalog drops in (`writeTo(...).append()`).

Layout for table root T:
    T/data/<partition_key>=<value>/part-*.parquet     (hive-style dirs)
    T/_manifests/partition=<value>.json               (committed units)
    T/_snapshots/snap-<n>.json                        (run-level summary)

Resume protocol: a partition directory is visible iff its manifest
exists; `resume_missing` filters the input to partitions without a
manifest, so a killed job re-processes only incomplete partitions and
reruns converge to identical tables (writes are deterministic functions
of the partition's input rows).
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class TableWriter:
    root: str
    partition_col: str

    @property
    def data_dir(self) -> str:
        return os.path.join(self.root, "data")

    @property
    def manifest_dir(self) -> str:
        return os.path.join(self.root, "_manifests")

    @property
    def snapshot_dir(self) -> str:
        return os.path.join(self.root, "_snapshots")

    # ------------------------------------------------------------- manifests

    def committed_partitions(self) -> set[str]:
        if not os.path.isdir(self.manifest_dir):
            return set()
        out = set()
        for name in os.listdir(self.manifest_dir):
            if name.startswith("partition=") and name.endswith(".json"):
                out.add(name[len("partition=") : -len(".json")])
        return out

    def _manifest_path(self, value: str) -> str:
        return os.path.join(self.manifest_dir, f"partition={value}.json")

    # ---------------------------------------------------------------- write

    def write(self, df: DataFrame, mode: str = "resume") -> dict:
        """Write df partitioned by partition_col with per-partition
        manifests. mode: 'resume' skips committed partitions (idempotent
        restart); 'overwrite' recommits everything.

        Returns the snapshot dict (written to _snapshots too).
        """
        os.makedirs(self.manifest_dir, exist_ok=True)
        os.makedirs(self.snapshot_dir, exist_ok=True)
        pcol = self.partition_col

        done = self.committed_partitions() if mode == "resume" else set()
        if mode == "overwrite" and os.path.isdir(self.data_dir):
            shutil.rmtree(self.data_dir)
            for name in list(os.listdir(self.manifest_dir)):
                os.unlink(os.path.join(self.manifest_dir, name))

        todo = df.filter(~F.col(pcol).cast("string").isin(*done) if done else F.lit(True))

        # per-partition metrics computed in the same pass footprint as
        # the write (one extra agg job over the filtered input)
        metrics_rows = (
            todo.groupBy(F.col(pcol).cast("string").alias("p"))
            .agg(F.count("*").alias("n_rows"))
            .collect()
        )
        metrics = {r["p"]: {"n_rows": r["n_rows"]} for r in metrics_rows}

        # clear uncommitted leftovers (a crash after data-write but
        # before manifest-commit leaves orphan files) so the re-append
        # below cannot double rows
        for p in metrics:
            leftover = os.path.join(self.data_dir, f"{pcol}={p}")
            if os.path.isdir(leftover):
                shutil.rmtree(leftover)

        if metrics:
            (
                todo.write.mode("append")
                .partitionBy(pcol)
                .parquet(self.data_dir)
            )

        # commit manifests AFTER the data lands (write tmp, fsync,
        # rename): a crash in between leaves the partition uncommitted
        # and invisible to read(); the next resume rewrites it
        committed = []
        for p, m in metrics.items():
            path = self._manifest_path(p)
            tmp = path + ".tmp"
            payload = {
                "partition": p,
                "metrics": m,
                "lineage": {
                    "written_at": time.time(),
                    "partition_col": pcol,
                    "mode": mode,
                },
            }
            with open(tmp, "w") as f:
                json.dump(payload, f)
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, path)
            committed.append(p)

        snapshot = {
            "snapshot_id": len(os.listdir(self.snapshot_dir)),
            "committed_now": sorted(committed),
            "total_committed": sorted(self.committed_partitions()),
            "rows_written": sum(m["n_rows"] for m in metrics.values()),
        }
        with open(
            os.path.join(self.snapshot_dir, f"snap-{snapshot['snapshot_id']}.json"), "w"
        ) as f:
            json.dump(snapshot, f)
        return snapshot

    # ----------------------------------------------------------------- read

    def read(self, spark: SparkSession) -> DataFrame:
        """Committed partitions only — uncommitted data files (from a
        crashed run) are invisible, like an Iceberg snapshot read."""
        done = self.committed_partitions()
        if not done:
            return spark.createDataFrame([], schema=f"{self.partition_col} string")
        df = spark.read.parquet(self.data_dir)
        return df.filter(F.col(self.partition_col).cast("string").isin(*done))

    def partition_metrics(self) -> dict[str, dict]:
        out = {}
        for p in self.committed_partitions():
            with open(self._manifest_path(p)) as f:
                out[p] = json.load(f)
        return out


def salted_repartition(df: DataFrame, key_col: str, n_partitions: int, salt: int = 8) -> DataFrame:
    """Spread a skewed key (e.g. url host) over `salt` subpartitions:
    repartition(n, key, pmod(hash(row-unique), salt)) — the zipf-head
    host no longer pins one task (BASELINE.json:14 skew handling)."""
    return df.repartition(
        n_partitions, F.col(key_col), F.pmod(F.hash(*df.columns), F.lit(salt))
    )


def url_host(col) -> "F.Column":
    return F.regexp_extract(col, r"^https?://([^/]+)", 1)
