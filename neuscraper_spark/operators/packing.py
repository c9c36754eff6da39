"""Sequence packing: assign documents to fixed-budget training bins.

Every LLM training-data pipeline ends by packing variable-length
documents into fixed-length context windows (e.g. Raffel et al. 2020
§3.1.2 pack examples into 512-token batches; GPT-style pretraining
concatenates into 2048/4096-token sequences). The reference engine
stops at curated chunks; this is the downstream step its output feeds.

Semantics (deterministic, engine-independent — the DuckDB oracle in
queries.py replays them with a recursive CTE):

* shard = pmod(id, n_shards). Shards are the parallelism unit, exactly
  like a real packing job's output shards: bins never span shards.
* within a shard, documents are visited in ascending id order.
* greedy fill: a document joins the current bin unless that would
  exceed ``budget``, in which case it starts the next bin. A document
  larger than the budget therefore gets a bin of its own (it overflows
  whatever bin is open, and the next document overflows *it*).

Greedy-by-id is the industry default (deterministic, single pass, no
sort by length) — first-fit-decreasing packs ~tighter but reorders
documents, which changes shuffling-sensitive training curricula.

Scale shape: one hash exchange on ``shard``, then an embarrassingly
parallel per-shard pass (``applyInPandas``; the per-shard loop is
O(rows) with numpy row access, and shards bound memory: a shard's
(id, cost) pairs are ~16 bytes/row — 100 TB of documents at ~4 KB/doc
across 10k shards is ~40 MB per shard task). No driver-side state.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_greedy(
    df: DataFrame,
    budget: int,
    cost_col: str = "n_chars",
    id_col: str = "doc_id",
    n_shards: int = 8,
) -> DataFrame:
    """(shard, id, cost, seq_id): greedy fixed-budget bin assignment.

    ``cost_col`` is whatever the budget is denominated in — token
    counts in production (x1_token_counts produces them), characters
    when tokenization hasn't happened yet.
    """
    slim = df.select(
        F.pmod(F.col(id_col), F.lit(n_shards)).alias("shard"),
        F.col(id_col).alias("id"),
        F.col(cost_col).cast("long").alias("cost"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("id", kind="mergesort").reset_index(drop=True)
        costs = pdf["cost"].to_numpy()
        seqs = np.empty(len(costs), dtype=np.int64)
        fill, seq = 0, -1
        for i, c in enumerate(costs):
            if seq < 0 or fill + c > budget:
                seq += 1
                fill = c
            else:
                fill += c
            seqs[i] = seq
        pdf["seq_id"] = seqs
        return pdf

    return slim.groupBy("shard").applyInPandas(
        pack, schema="shard long, id long, cost long, seq_id long"
    )


def pack_greedy_py(
    rows: list[tuple[int, int]], budget: int, n_shards: int = 8
) -> list[tuple[int, int, int, int]]:
    """Single-process twin of pack_greedy over (id, cost) pairs."""
    out = []
    by_shard: dict[int, list[tuple[int, int]]] = {}
    for i, c in rows:
        by_shard.setdefault(i % n_shards, []).append((i, c))
    for shard, docs in by_shard.items():
        fill, seq = 0, -1
        for i, c in sorted(docs):
            if seq < 0 or fill + c > budget:
                seq, fill = seq + 1, c
            else:
                fill += c
            out.append((shard, i, c, seq))
    return out
