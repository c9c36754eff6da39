"""Distributed k-means over embedding columns (corpus domain tagging).

A curation pipeline clusters document embeddings to tag domains / topics
and to stratify sampling (mix_corpus weights per cluster). The existing
IVF trainer (similarity.py:_train_centroids) fits centroids on a bounded
driver-side sample — the right shape for index building. This module
adds the full-corpus pieces:

- ``kmeans_assign``: nearest-centroid assignment for EVERY row — a
  zero-shuffle, Arrow-batched map stage. Centroids ride the closure
  (k x dim floats — broadcast-sized by contract), each batch is one
  numpy matmul: ``d2 = |e|^2 - 2 E C^T + |c|^2``. This is the
  trillion-row shape: embarrassingly parallel, no exchange at all.
- ``kmeans_fit``: Lloyd's iterations at corpus scale. The E-step reuses
  the assignment stage; the M-step computes PER-PARTITION partial sums
  inside the same Arrow pass (``mapInPandas`` emits one (cluster,
  sum_vec, n) row per cluster per partition), so the only exchange per
  iteration is ~``n_partitions * k`` tiny rows — never the vectors.

Determinism: distances are rounded (ROUND_DECIMALS) BEFORE the argmin
and ties break toward the smaller centroid id, so executor count and
summation order cannot flip an assignment; the q_cluster_assign oracle
replicates the same rounded argmin in DuckDB with the same centroid
choice (vec_id < k), making the whole distributed pass value-checked.

Reference analogue: none (the reference has no clustering); this is
north-rule curation surface, same tier as dedup/sampling.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ROUND_DECIMALS = 6


def _as_matrix(centroids) -> np.ndarray:
    c = np.asarray(centroids, dtype=np.float64)
    if c.ndim != 2:
        raise ValueError(f"centroids must be (k, dim), got shape {c.shape}")
    return c


def _assign_batch(emb: np.ndarray, cmat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Rounded-argmin assignment for one Arrow batch.

    Returns (cluster ids, rounded squared distances). np.argmin picks the
    first minimum, which with rows ordered by centroid id IS the
    smaller-id tie-break the oracle uses.
    """
    d2 = (
        (emb * emb).sum(axis=1, keepdims=True)
        - 2.0 * (emb @ cmat.T)
        + (cmat * cmat).sum(axis=1)
    )
    # + 0.0 canonicalizes IEEE -0.0 (the numpy a-2b+c composition can
    # leave a -1e-16 residual on self-distances that rounds to -0.0,
    # which the oracle's sequential fold never produces)
    d2r = np.round(d2, ROUND_DECIMALS) + 0.0
    cl = d2r.argmin(axis=1)
    return cl, d2r[np.arange(len(cl)), cl]


def kmeans_assign(
    df: DataFrame,
    centroids,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cluster, dist2) for every row — zero shuffle, one Arrow stage."""
    cmat = _as_matrix(centroids)
    src = df.select(id_col, vec_col)

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            emb = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            cl, d2 = _assign_batch(emb, cmat)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "cluster": cl.astype(np.int32),
                    "dist2": d2,
                }
            )

    return src.mapInPandas(
        assign, schema=f"{id_col} long, cluster int, dist2 double"
    )


def kmeans_fit(
    df: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_iter: int = 10,
    tol: float = 1e-6,
    init: np.ndarray | None = None,
) -> tuple[np.ndarray, int]:
    """Lloyd's k-means over the full corpus. Per iteration: one narrow
    Arrow pass emitting per-partition partial sums (k rows each), one
    tiny groupBy over ~partitions*k rows, one driver-side divide. The
    vectors themselves are never shuffled. Empty clusters keep their
    previous centroid (standard Lloyd's fallback).

    ``init`` defaults to the k smallest-id rows (deterministic). Returns
    (centroids, iterations_run).

    Scale note: the M-step's groupBy builds one sum expression per
    vector element (dim expressions). Fine through a few hundred dims;
    for very wide embeddings swap the array agg for a posexplode ->
    (cluster, idx) sum — same exchange volume, linear expression count.
    """
    src = df.select(id_col, vec_col)
    if init is None:
        rows = src.orderBy(id_col).limit(k).collect()  # k rows by contract
        if len(rows) < k:
            raise ValueError(f"need >= {k} rows to seed {k} centroids")
        init = np.asarray([r[vec_col] for r in rows], dtype=np.float64)
    cmat = _as_matrix(init)
    if cmat.shape[0] != k:
        raise ValueError(f"init has {cmat.shape[0]} rows, expected k={k}")
    dim = cmat.shape[1]
    it = 0
    for it in range(1, max_iter + 1):
        closure = cmat  # rebind so the lambda pins this iteration's value

        def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            sums = np.zeros((k, dim), dtype=np.float64)
            counts = np.zeros(k, dtype=np.int64)
            for pdf in batches:
                if not len(pdf):
                    continue
                emb = np.asarray(
                    [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
                )
                cl, _ = _assign_batch(emb, closure)
                np.add.at(sums, cl, emb)
                counts += np.bincount(cl, minlength=k)
            live = np.nonzero(counts)[0]
            if len(live):
                yield pd.DataFrame(
                    {
                        "cluster": live.astype(np.int32),
                        "vsum": list(sums[live]),
                        "n": counts[live],
                    }
                )

        agg = (
            src.mapInPandas(
                partials, schema="cluster int, vsum array<double>, n long"
            )
            .groupBy("cluster")
            .agg(
                F.array(
                    *[
                        F.sum(F.col("vsum")[i]).alias(f"s{i}")
                        for i in range(dim)
                    ]
                ).alias("vsum"),
                F.sum("n").alias("n"),
            )
            .collect()
        )  # <= k rows by contract
        new = cmat.copy()
        for row in agg:
            new[row["cluster"]] = np.asarray(row["vsum"]) / row["n"]
        shift = float(np.sqrt(((new - cmat) ** 2).sum(axis=1)).max())
        cmat = new
        if shift <= tol:
            break
    return cmat, it


def cluster_sizes(assigned: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """(cluster, n, avg_dist2) — the report a mixing step consumes."""
    return assigned.groupBy("cluster").agg(
        F.count(id_col).alias("n"),
        F.round(F.avg("dist2"), ROUND_DECIMALS).alias("avg_dist2"),
    )
