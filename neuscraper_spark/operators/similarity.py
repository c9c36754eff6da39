"""Approximate nearest-neighbor search over embedding columns.

Baseline: exact brute-force cosine top-k with native expressions
(zip_with dot product — JVM-side, no Python). Scale path: random
hyperplane LSH (Charikar 2002) — signatures via one numpy Arrow stage,
bucket join native, exact rerank only within buckets; recall measured
against the brute-force baseline in tests.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

EMB_DIM = 64


def _norm(col):
    return F.sqrt(F.aggregate(col, F.lit(0.0), lambda acc, x: acc + x * x))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def brute_force_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query row.

    queries: (qid, qvec). The query side is broadcast (small); the
    corpus side streams — one narrow pass + a per-query top-k window.
    Vectors are cast to double before the fold so the arithmetic (and
    the DuckDB oracle) is engine-exact.
    """
    corpus = emb.select(
        F.col(id_col).alias("nid"),
        F.col(vec_col).cast("array<double>").alias("nvec"),
    ).withColumn("nn", _norm("nvec"))
    q = queries.select(
        F.col("qid"), F.col("qvec").cast("array<double>").alias("qvec")
    ).withColumn("qn", _norm("qvec"))
    scored = corpus.join(F.broadcast(q), F.col("nid") != F.col("qid")).withColumn(
        "cosine", F.round(_dot("nvec", "qvec") / (F.col("nn") * F.col("qn")), 6)
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "nid", "cosine", "rank")
    )


def queries_from_ids(emb: DataFrame, ids, vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    return emb.filter(F.col(id_col).isin(list(ids))).select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("qvec")
    )


# ------------------------------------------------------------------- LSH ANN

# Tuned for moderate-similarity corpora (best-neighbor cosine ~0.4 on
# the synthetic embeddings): P(bucket match) = (1 - θ/π)^PLANES per
# table; 6 planes × 24 tables gives ~0.75 recall on the top neighbor
# while scanning ~1/3 of the corpus per query (tests/test_similarity.py
# asserts recall vs the brute-force baseline).
LSH_PLANES = 6
LSH_TABLES = 24


def _planes(
    seed: int = 7, dim: int = EMB_DIM,
    tables: int = LSH_TABLES, planes: int = LSH_PLANES,
) -> np.ndarray:
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.standard_normal((tables, planes, dim)).astype(np.float32)


def lsh_signatures(
    emb: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id", seed: int = 7,
    tables: int = LSH_TABLES, n_planes: int = LSH_PLANES,
) -> DataFrame:
    """(id, table, bucket): one row per (vector, hash table).

    Deliberately vector-free: the signature rows are replicated
    ``tables``× through the bucket-join shuffle, so shipping the vector
    here multiplies the exchange payload by the embedding size
    (24 tables × 128-dim float = ~12 KB/vector at production dims).
    Consumers generate slim (id, id) candidate pairs from the bucket
    join, dedup, and only then rejoin the vectors for the exact rerank
    (tests/test_plans.py pins no vector column in the bucket exchange).
    """
    planes = _planes(seed, tables=tables, planes=n_planes)

    def sign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        weights = (1 << np.arange(n_planes, dtype=np.int64))
        for pdf in batches:
            vecs = np.array([list(v) for v in pdf[vec_col]], dtype=np.float32)
            out_id, out_table, out_bucket = [], [], []
            if len(vecs):
                for t in range(tables):
                    bits = (vecs @ planes[t].T) > 0  # [n, planes]
                    buckets = (bits.astype(np.int64) * weights).sum(axis=1)
                    out_id.extend(pdf[id_col].tolist())
                    out_table.extend([t] * len(vecs))
                    out_bucket.extend(buckets.tolist())
            yield pd.DataFrame(
                {"id": out_id, "table": out_table, "bucket": out_bucket}
            )

    return emb.select(id_col, vec_col).mapInPandas(
        sign, schema="id long, table int, bucket long"
    )


def train_ivf_centroids(
    emb: DataFrame,
    n_centroids: int = 16,
    sample: int = 4096,
    seed: int = 11,
    iters: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """IVF train phase: spherical k-means on a deterministic sample
    (public design: Jégou et al. 2011, IVFFlat; Faiss trains on a
    driver-side sample the same way). Returns L2-normalized
    [n_centroids, dim] float32 — broadcastable constant state.

    The sample is id-keyed (every ceil(N/sample)-th id), not a random
    split, so training is reproducible across runs and cluster sizes.
    """
    n_total = emb.count()
    # ceiling stride: pmod filter yields <= sample rows for dense ids, so
    # no order-dependent limit() truncation can occur; the explicit sort
    # pins collect order (k-means init indexes into X) regardless of
    # partitioning — reproducible across runs and cluster sizes.
    stride = max(1, -(-n_total // sample))
    rows = (
        emb.filter(F.pmod(F.col(id_col), F.lit(stride)) == 0)
        .orderBy(id_col)
        .limit(sample)
        .select(vec_col)
        .collect()
    )
    X = np.array([list(r[0]) for r in rows], dtype=np.float32)
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-9)
    k = min(n_centroids, len(X))
    rng = np.random.Generator(np.random.PCG64(seed))
    cents = X[rng.choice(len(X), size=k, replace=False)].copy()
    for _ in range(iters):
        assign = (X @ cents.T).argmax(axis=1)
        for c in range(k):
            members = X[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
        cents /= np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-9)
    return cents


def ivf_assign(
    df: DataFrame,
    centroids: np.ndarray,
    nprobe: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Adds `cell` (one row per probed cell). nprobe=1 for the corpus
    side (each vector lives in its nearest cell); queries probe the
    nprobe nearest cells. One numpy matmul per Arrow batch."""
    cents = centroids

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                yield pd.DataFrame({"id": [], "vec": [], "cell": []})
                continue
            X = np.array([list(v) for v in pdf[vec_col]], dtype=np.float32)
            Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-9)
            sims = Xn @ cents.T  # [n, k]
            top = np.argsort(-sims, axis=1)[:, :nprobe]  # deterministic order
            ids, vecs, cells = [], [], []
            for i in range(len(X)):
                for c in top[i]:
                    ids.append(pdf[id_col].iloc[i])
                    vecs.append(pdf[vec_col].iloc[i])
                    cells.append(int(c))
            yield pd.DataFrame({"id": ids, "vec": vecs, "cell": cells})

    return df.select(id_col, vec_col).mapInPandas(
        assign, schema="id long, vec array<float>, cell int"
    )


def _ivf_probe(corpus_cells: DataFrame, q_cells: DataFrame, k: int) -> DataFrame:
    """Shared IVF probe tail: native cell equi-join (query side
    broadcast) + exact cosine rerank + per-query top-k window."""
    cand = (
        corpus_cells.join(
            F.broadcast(q_cells),
            (corpus_cells["cell"] == q_cells["cell"])
            & (corpus_cells["id"] != q_cells["qid"]),
        )
        .select("qid", "qvec", F.col("id").alias("nid"), F.col("vec").alias("nvec"))
        .dropDuplicates(["qid", "nid"])
    )
    scored = cand.withColumn(
        "cosine", F.round(_dot("nvec", "qvec") / (_norm("nvec") * _norm("qvec")), 6)
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "nid", "cosine", "rank")
    )


def ann_ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    seed: int = 11,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF-Flat ANN top-k, self-contained (trains on the fly): corpus
    partitioned into centroid cells (narrow assign stage), queries probe
    their nprobe nearest cells, candidates joined natively on `cell`,
    exact cosine rerank.

    For repeated querying use the STORED index instead —
    ``build_ivf_index`` + ``ann_ivf_topk_indexed`` — which trains once,
    persists centroids + the cell-assigned corpus, and prunes unprobed
    cell partitions at scan time (an index you rebuild per query isn't
    an index)."""
    cents = train_ivf_centroids(
        emb, n_centroids=n_centroids, seed=seed, vec_col=vec_col, id_col=id_col
    )
    corpus_cells = ivf_assign(emb, cents, nprobe=1, vec_col=vec_col, id_col=id_col)
    q_src = queries.select(F.col("qid").alias(id_col), F.col("qvec").alias(vec_col))
    q_cells = ivf_assign(q_src, cents, nprobe=nprobe, vec_col=vec_col, id_col=id_col)
    q_cells = q_cells.withColumnsRenamed({"id": "qid", "vec": "qvec"})
    return _ivf_probe(corpus_cells, q_cells, k)


# ------------------------------------------------------- stored IVF index


def build_ivf_index(
    spark,
    emb: DataFrame,
    index_root: str,
    n_centroids: int = 16,
    seed: int = 11,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    mode: str = "overwrite",
) -> dict:
    """Train ONCE and persist the IVF index (Faiss builds, then serves —
    Jégou et al. 2011):

        <index_root>/centroids/          tiny parquet (cell, centroid)
        <index_root>/cells/              TableWriter table partitioned
                                         by `cell` — hive dirs are the
                                         inverted lists, with manifests,
                                         per-partition row counts and
                                         crash-resumable commit

    Returns the TableWriter snapshot dict. The cell partitioning is the
    scale design: each stored partition is one inverted list, so a probe
    reads only the nprobe/n_centroids slice of the corpus (partition
    pruning on the hive dirs).

    ``mode="resume"`` is CRASH RECOVERY of the same build only: centroid
    training is deterministic (id-strided sample, fixed seed), so
    re-running after a mid-write crash completes the identical index by
    filling in uncommitted cell partitions. It is NOT an append path —
    TableWriter's resume skips already-committed partitions, so new
    vectors falling into existing cells would be silently dropped.
    To grow a served index use ``append_ivf_index`` (assigns new
    vectors with the STORED centroids, no retrain); rebuild periodically
    when the corpus distribution drifts."""
    if mode not in ("overwrite", "resume"):
        raise ValueError(f"mode must be overwrite|resume, got {mode!r}")
    from ..sources.writer import TableWriter

    cents = train_ivf_centroids(
        emb, n_centroids=n_centroids, seed=seed, vec_col=vec_col, id_col=id_col
    )
    cent_rows = [(int(i), [float(x) for x in cents[i]]) for i in range(len(cents))]
    spark.createDataFrame(cent_rows, "cell int, centroid array<float>").coalesce(
        1
    ).write.mode("overwrite").parquet(f"{index_root}/centroids")
    corpus_cells = ivf_assign(emb, cents, nprobe=1, vec_col=vec_col, id_col=id_col)
    return TableWriter(root=f"{index_root}/cells", partition_col="cell").write(
        corpus_cells, mode=mode
    )


def load_ivf_centroids(spark, index_root: str) -> np.ndarray:
    rows = spark.read.parquet(f"{index_root}/centroids").orderBy("cell").collect()
    return np.array([list(r["centroid"]) for r in rows], dtype=np.float32)


def _delta_roots(index_root: str, committed_only: bool = True) -> list[str]:
    """Delta generation roots, oldest first. By default only COMMITTED
    generations (those carrying the ``_committed.json`` marker) are
    returned: probes and compaction must never read a generation whose
    append crashed mid-write, and a retried append must not double-count
    the partitions that crash did manage to manifest."""
    import os

    droot = f"{index_root}/deltas"
    if not os.path.isdir(droot):
        return []
    names = [
        d
        for d in os.listdir(droot)
        if d.startswith("g")
        and d[1:].isdigit()
        and os.path.isdir(os.path.join(droot, d))
    ]
    # numeric order: lexicographic would put g10 before g2
    roots = [os.path.join(droot, d) for d in sorted(names, key=lambda n: int(n[1:]))]
    if committed_only:
        roots = [r for r in roots if os.path.exists(os.path.join(r, "_committed.json"))]
    return roots


def _finish_compaction(index_root: str) -> bool:
    """Roll FORWARD an interrupted ``compact_ivf_index`` swap.

    The compaction marker (``_compacting.json``) is written only after
    the merged table is fully written and manifested in the sibling
    ``cells.compacting`` dir, so whenever the marker exists the merged
    bytes are complete and finishing the swap is always safe — the
    classic write-ahead commit-marker protocol (what an Iceberg catalog
    does with its metadata pointer swap). Called by every stored-index
    entry point; returns True if recovery work was done. Crash states
    and their resolution:

      marker + cells.compacting + cells (old) : swap not started — do it
      marker + cells.compacting, no cells     : crashed mid-swap — finish
      marker only, deltas/old still present   : crashed pre-cleanup —
                                                remove them (the merged
                                                table already contains
                                                the delta rows; leaving
                                                deltas would DOUBLE-COUNT
                                                every appended vector)
    """
    import os
    import shutil

    marker = os.path.join(index_root, "_compacting.json")
    if not os.path.exists(marker):
        return False
    cells = os.path.join(index_root, "cells")
    old = os.path.join(index_root, "cells.old")
    tmp = os.path.join(index_root, "cells.compacting")
    if os.path.isdir(tmp):
        if os.path.isdir(cells) and not os.path.isdir(old):
            os.rename(cells, old)
        if not os.path.isdir(cells):
            os.rename(tmp, cells)
    shutil.rmtree(os.path.join(index_root, "deltas"), ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)
    os.unlink(marker)
    return True


def compact_ivf_index(spark, index_root: str) -> dict:
    """Merge all delta generations into the base cell table.

    N committed deltas turn every probe into an (N+1)-way union scan;
    compaction restores the single-table probe plan (Iceberg's rewrite
    + expire maintenance cycle). Protocol, in commit-marker order:

      1. write base ∪ deltas to ``cells.compacting`` (TableWriter
         overwrite — fully manifested before anything is touched)
      2. write ``_compacting.json`` (the commit point: from here the
         swap ALWAYS rolls forward, see _finish_compaction)
      3. rename cells → cells.old, cells.compacting → cells
      4. remove deltas/ and cells.old/, delete the marker

    The upstream read is lazy but writes to a SIBLING directory, so the
    plan never reads files the swap is deleting. No-op (returns the
    current snapshot info) when there are no deltas."""
    import json as _json
    import os
    import shutil

    from ..sources.writer import TableWriter

    _finish_compaction(index_root)
    droots = _delta_roots(index_root)
    base = TableWriter(root=f"{index_root}/cells", partition_col="cell")
    if not droots:
        snaps = base.snapshots()
        return snaps[-1] if snaps else {}
    merged = base.read(spark)
    for droot in droots:
        merged = merged.unionByName(
            TableWriter(root=droot, partition_col="cell").read(spark)
        )
    tmp_root = f"{index_root}/cells.compacting"
    shutil.rmtree(tmp_root, ignore_errors=True)
    snap = TableWriter(root=tmp_root, partition_col="cell").write(
        merged, mode="overwrite"
    )
    marker = os.path.join(index_root, "_compacting.json")
    with open(marker + ".tmp", "w") as f:
        _json.dump({"merged_deltas": [os.path.basename(d) for d in droots]}, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(marker + ".tmp", marker)
    _finish_compaction(index_root)
    return snap


def append_ivf_index(spark, new_emb: DataFrame, index_root: str,
                     vec_col: str = "embedding", id_col: str = "vec_id") -> dict:
    """Grow a stored IVF index WITHOUT retraining: assign the new
    vectors with the STORED centroids and commit them as the next
    delta generation —

        <index_root>/deltas/g<N>/   its own cell-partitioned
                                    TableWriter table (manifests,
                                    crash-resumable like the base)

    Probes read base ∪ deltas with the same cell filter, so the
    inverted-list pruning is unchanged. Committed generations are
    immutable (the Iceberg append model: new snapshot, no rewrite of
    committed files); rebuild when the corpus distribution drifts far
    enough that stored centroids stop partitioning it well.

    Crash safety: a generation becomes visible only when its
    ``_committed.json`` marker lands (tmp + fsync + rename, after the
    full TableWriter write). A crashed append leaves an unmarked g<N>;
    the next append DELETES it and rewrites the same slot, so a retry
    resumes rather than duplicates — probes/compaction never read
    unmarked generations (``_delta_roots`` filters on the marker)."""
    import json as _json
    import os
    import shutil

    from ..sources.writer import TableWriter

    _finish_compaction(index_root)  # roll forward an interrupted compaction
    cents = load_ivf_centroids(spark, index_root)
    assigned = ivf_assign(new_emb, cents, nprobe=1, vec_col=vec_col, id_col=id_col)
    committed = _delta_roots(index_root)
    # scrub crashed appends (unmarked roots) — same orphan policy as
    # TableWriter.write's uncommitted-partition cleanup
    for root in _delta_roots(index_root, committed_only=False):
        if root not in committed:
            shutil.rmtree(root, ignore_errors=True)
    gen = (
        max(int(os.path.basename(r)[1:]) for r in committed) + 1 if committed else 0
    )
    os.makedirs(f"{index_root}/deltas", exist_ok=True)
    groot = f"{index_root}/deltas/g{gen}"
    snap = TableWriter(root=groot, partition_col="cell").write(
        assigned, mode="overwrite"
    )
    marker = os.path.join(groot, "_committed.json")
    with open(marker + ".tmp", "w") as f:
        _json.dump({"generation": gen, "n_rows": snap.get("rows_written")}, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(marker + ".tmp", marker)
    return snap


def ann_ivf_topk_indexed(
    spark,
    index_root: str,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 4,
) -> DataFrame:
    """Probe a STORED IVF index: no count(), no retrain, no full-corpus
    scan. Centroids load from the tiny parquet; queries (small by
    contract — they are broadcast) are assigned driver-side to their
    nprobe cells; the corpus scan is filtered to exactly those cell
    partitions, which the committed-partition read prunes at the
    parquet-directory level."""
    from ..sources.writer import TableWriter

    _finish_compaction(index_root)  # roll forward an interrupted compaction
    cents = load_ivf_centroids(spark, index_root)
    qrows = queries.select("qid", "qvec").collect()
    qids = [r["qid"] for r in qrows]
    qvecs = np.array([list(r["qvec"]) for r in qrows], dtype=np.float32)
    qn = qvecs / np.maximum(np.linalg.norm(qvecs, axis=1, keepdims=True), 1e-9)
    top = np.argsort(-(qn @ cents.T), axis=1)[:, :nprobe]
    q_cells = spark.createDataFrame(
        [
            (int(qids[i]), [float(x) for x in qvecs[i]], int(c))
            for i in range(len(qids))
            for c in top[i]
        ],
        "qid long, qvec array<float>, cell int",
    )
    probed = sorted({int(c) for row in top for c in row})
    corpus_cells = TableWriter(
        root=f"{index_root}/cells", partition_col="cell"
    ).read(spark)
    for droot in _delta_roots(index_root):
        corpus_cells = corpus_cells.unionByName(
            TableWriter(root=droot, partition_col="cell").read(spark)
        )
    corpus_cells = corpus_cells.filter(F.col("cell").isin(probed))
    return _ivf_probe(corpus_cells, q_cells, k)


def ann_lsh_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 7,
    tables: int = LSH_TABLES,
    n_planes: int = LSH_PLANES,
) -> DataFrame:
    """ANN top-k: LSH bucket join generates candidates (native equi-join
    on (table, bucket) — the quadratic scan never happens), exact cosine
    rerank within candidates.

    ``tables``/``n_planes`` trade candidate volume for recall: fewer
    planes widen buckets (higher recall, bigger scans). The defaults are
    the production ANN setting; the oracle-checked registration uses a
    coverage setting (see queries.s_ann_topk).

    Shuffle shape: the bucket join and the (qid, nid) dedup see only
    slim id rows; vectors are rejoined AFTER dedup — the corpus side by
    an id equi-join (one row per surviving candidate), the query side
    broadcast. At production embedding dims this is ~24× less exchange
    payload than signing (id, vec) rows."""
    corpus_sig = lsh_signatures(emb, vec_col, id_col, seed, tables, n_planes)
    q_sig = lsh_signatures(
        queries.select(F.col("qid").alias(id_col), F.col("qvec").alias(vec_col)),
        vec_col,
        id_col,
        seed,
        tables,
        n_planes,
    ).withColumnRenamed("id", "qid")
    pairs = (
        corpus_sig.join(
            F.broadcast(q_sig),
            (corpus_sig["table"] == q_sig["table"])
            & (corpus_sig["bucket"] == q_sig["bucket"])
            & (corpus_sig["id"] != q_sig["qid"]),
        )
        .select("qid", F.col("id").alias("nid"))
        .dropDuplicates(["qid", "nid"])
    )
    cand = pairs.join(
        emb.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("nvec")), "nid"
    ).join(F.broadcast(queries.select("qid", "qvec")), "qid")
    scored = cand.withColumn(
        "cosine", F.round(_dot("nvec", "qvec") / (_norm("nvec") * _norm("qvec")), 6)
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "nid", "cosine", "rank")
    )


# ------------------------------------------------------------------- PQ ANN

PQ_M = 8      # subspaces
PQ_K = 256    # centroids per subspace (1 byte/code at production scale)


def train_pq_codebooks(
    emb: DataFrame,
    m: int = PQ_M,
    k: int = PQ_K,
    sample: int = 4096,
    seed: int = 13,
    iters: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """Product-quantization train phase (Jégou et al. 2011, §II):
    split the vector into ``m`` subspaces and learn ``k`` centroids per
    subspace on the same deterministic id-strided driver sample the IVF
    trainer uses. Returns float64 ``[m, k, d/m]``.

    Exact-codebook mode: when a subspace's distinct subvectors fit in
    ``k``, its codebook IS those subvectors (quantization error exactly
    zero for sampled rows). With ``sample >= corpus`` this makes
    PQ-ADC scores equal exact scores — the provable setting the driver
    oracle runs (precedent: s2's coverage setting, s3/s4's
    exhaustive-probe setting); production uses k=256 and takes the
    usual lossy-ADC recall, which stays pytest-gated.
    """
    n_total = emb.count()
    stride = max(1, -(-n_total // sample))
    rows = (
        emb.filter(F.pmod(F.col(id_col), F.lit(stride)) == 0)
        .orderBy(id_col)
        .limit(sample)
        .select(vec_col)
        .collect()
    )
    X = np.array([list(r[0]) for r in rows], dtype=np.float64)
    d = X.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    rng = np.random.Generator(np.random.PCG64(seed))
    books = np.empty((m, k, sub), dtype=np.float64)
    for mi in range(m):
        Xm = X[:, mi * sub : (mi + 1) * sub]
        uniq = np.unique(Xm, axis=0)
        if len(uniq) <= k:
            # exact codebook, padded by repeating the first row
            books[mi] = np.concatenate(
                [uniq, np.repeat(uniq[:1], k - len(uniq), axis=0)]
            )
            continue
        cents = Xm[rng.choice(len(Xm), size=k, replace=False)].copy()
        for _ in range(iters):
            d2 = ((Xm[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(k):
                members = Xm[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        books[mi] = cents
    return books


def pq_encode(
    emb: DataFrame,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(nid, codes[m], nn): each vector compressed to m subspace code
    ids plus its exact L2 norm (needed to turn ADC inner products into
    cosine). At PQ_K=256 this is m bytes + 8 of payload per vector —
    the representation a 10^12-vector corpus stores and shuffles
    instead of d*4 bytes of floats (64x smaller at d=128, m=8)."""
    m, k, sub = codebooks.shape
    sc = emb.sparkSession.sparkContext
    bc = sc.broadcast(codebooks)

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        books = bc.value
        cn2 = [(books[mi] ** 2).sum(axis=1) for mi in range(m)]
        for pdf in batches:
            if pdf.empty:
                yield pd.DataFrame({"nid": [], "codes": [], "nn": []})
                continue
            X = np.array([list(v) for v in pdf[vec_col]], dtype=np.float64)
            codes = np.empty((len(X), m), dtype=np.int32)
            for mi in range(m):
                Xm = X[:, mi * sub : (mi + 1) * sub]
                # argmin ||x - c||^2 = argmin (||c||^2 - 2 x.c); ties ->
                # first index (deterministic)
                codes[:, mi] = (cn2[mi][None, :] - 2.0 * (Xm @ books[mi].T)).argmin(
                    axis=1
                )
            yield pd.DataFrame(
                {
                    "nid": pdf[id_col].to_numpy(),
                    "codes": list(codes),
                    "nn": np.linalg.norm(X, axis=1),
                }
            )

    return emb.select(id_col, vec_col).mapInPandas(
        enc, schema="nid long, codes array<int>, nn double"
    )


def ann_pq_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    m: int = PQ_M,
    k_pq: int = PQ_K,
    rerank: int = 4,
    sample: int = 4096,
    seed: int = 13,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """PQ-ADC candidate generation + exact rerank (the IVF-PQ scale
    path minus the cell filter, which composes via ivf_assign):

    1. train codebooks (driver sample), encode the corpus to
       (nid, m codes, norm) — the compressed table is what streams.
    2. asymmetric distance computation: per query a [m, k_pq] LUT of
       subspace inner products is broadcast; each Arrow batch scores
       all queries with m table lookups per vector and emits only its
       batch-local top ``k*rerank`` candidates per query — the shuffle
       carries (qid, nid) pairs, never vectors or scores.
    3. exact rerank over the candidate union (same expressions and
       rounding as brute_force_topk), top-k per query.

    With the exact codebook (k_pq >= distinct subvectors, sample >=
    corpus) ADC equals the exact inner product up to float association
    (~1e-15 relative), so candidates contain the true top-k at any
    sane ``rerank`` margin and the result is bit-equal to the exact
    oracle. Lossy settings are recall-tested in pytest.
    """
    books = train_pq_codebooks(
        emb, m=m, k=k_pq, sample=sample, seed=seed, vec_col=vec_col, id_col=id_col
    )
    codes = pq_encode(emb, books, vec_col=vec_col, id_col=id_col)
    qrows = queries.select("qid", "qvec").collect()  # broadcast side by contract
    qids = np.array([r["qid"] for r in qrows], dtype=np.int64)
    Q = np.array([list(r["qvec"]) for r in qrows], dtype=np.float64)
    sub = books.shape[2]
    luts = np.stack(
        [
            np.stack(
                [books[mi] @ Q[qi, mi * sub : (mi + 1) * sub] for mi in range(m)]
            )
            for qi in range(len(Q))
        ]
    )  # [nq, m, k_pq]
    sc = emb.sparkSession.sparkContext
    bc = sc.broadcast((qids, luts))
    kk = k * rerank

    def adc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bqids, bluts = bc.value
        nq = len(bqids)
        for pdf in batches:
            if pdf.empty:
                yield pd.DataFrame({"qid": [], "nid": []})
                continue
            C = np.array(list(pdf["codes"]), dtype=np.int64)  # [n, m]
            nn = pdf["nn"].to_numpy()
            nids = pdf["nid"].to_numpy()
            est = np.zeros((nq, len(C)))
            for mi in range(C.shape[1]):
                est += bluts[:, mi, C[:, mi]]
            est /= np.maximum(nn, 1e-12)[None, :]  # qn constant per query
            top = min(kk, len(C))
            out_q, out_n = [], []
            for qi in range(nq):
                idx = np.argpartition(-est[qi], top - 1)[:top]
                out_q.extend([bqids[qi]] * top)
                out_n.extend(nids[idx].tolist())
            yield pd.DataFrame({"qid": out_q, "nid": out_n})

    cand = codes.mapInPandas(adc, schema="qid long, nid long")
    return _exact_rerank(cand, emb, queries, k, vec_col=vec_col, id_col=id_col)


def _exact_rerank(
    cand: DataFrame,
    emb: DataFrame,
    queries: DataFrame,
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Shared ANN tail: (qid, nid) candidates rejoin full vectors, get
    exactly the brute_force_topk cosine expression and rounding, and
    keep the per-query top-k."""
    corpus = emb.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("nvec"))
    scored = (
        cand.dropDuplicates(["qid", "nid"])
        .filter(F.col("nid") != F.col("qid"))
        .join(corpus, "nid")
        .join(F.broadcast(queries.select("qid", "qvec")), "qid")
        .withColumn(
            "cosine", F.round(_dot("nvec", "qvec") / (_norm("nvec") * _norm("qvec")), 6)
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "nid", "cosine", "rank")
    )


def ivfpq_encode(
    emb: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(nid, cell, codes[m], nn) in ONE narrow pass: each vector is
    assigned to its nearest IVF cell and PQ-compressed in the same
    Arrow batch, so the full float vector is read exactly once and
    never leaves its scan task. This is the table a production index
    persists, hive-partitioned by `cell` like build_ivf_index's —
    m+1 codes + a norm per vector instead of d floats."""
    m, k, sub = codebooks.shape
    sc = emb.sparkSession.sparkContext
    bc = sc.broadcast((centroids, codebooks))

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cents, books = bc.value
        cn2 = [(books[mi] ** 2).sum(axis=1) for mi in range(m)]
        for pdf in batches:
            if pdf.empty:
                yield pd.DataFrame({"nid": [], "cell": [], "codes": [], "nn": []})
                continue
            X = np.array([list(v) for v in pdf[vec_col]], dtype=np.float64)
            Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-9)
            cells = (Xn @ cents.T).argmax(axis=1).astype(np.int32)
            codes = np.empty((len(X), m), dtype=np.int32)
            for mi in range(m):
                Xm = X[:, mi * sub : (mi + 1) * sub]
                codes[:, mi] = (cn2[mi][None, :] - 2.0 * (Xm @ books[mi].T)).argmin(
                    axis=1
                )
            yield pd.DataFrame(
                {
                    "nid": pdf[id_col].to_numpy(),
                    "cell": cells,
                    "codes": list(codes),
                    "nn": np.linalg.norm(X, axis=1),
                }
            )

    return emb.select(id_col, vec_col).mapInPandas(
        enc, schema="nid long, cell int, codes array<int>, nn double"
    )


def ann_ivfpq_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    m: int = PQ_M,
    k_pq: int = PQ_K,
    rerank: int = 4,
    sample: int = 4096,
    seed: int = 11,
    pq_seed: int = 13,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF-PQ: the composed trillion-vector shape (Jégou et al. 2011
    §V; Faiss IndexIVFPQ with by_residual=False — for inner-product /
    cosine metrics the ADC lookup table is cell-independent, so raw-
    vector codebooks compose with the cell filter without residual
    re-encoding):

    - corpus: one narrow pass assigns the cell AND compresses to m
      codes + a norm (`ivfpq_encode`); at scale this table is
      hive-partitioned by cell so unprobed cells prune at scan time
      (build_ivf_index's layout, 24-48x less I/O than float vectors).
    - queries: driver-side nprobe-cell assignment + per-query ADC
      LUTs, broadcast together.
    - scan: each Arrow batch masks rows to each query's probed cells
      (one fancy-index into a [nq, n_cells] bool table), ADC-scores
      the survivors with m table lookups, and emits its batch-local
      top k*rerank (qid, nid) pairs — the only shuffle payload.
    - exact rerank tail shared with every other ANN path.

    Exact setting (nprobe == n_centroids, exact codebooks): the cell
    mask passes everything and ADC equals the exact inner product, so
    the result is bit-equal to the exact top-k oracle — the driver
    runs that setting; lossy recall is pytest-gated.
    """
    cents = train_ivf_centroids(
        emb, n_centroids=n_centroids, seed=seed, vec_col=vec_col, id_col=id_col
    )
    books = train_pq_codebooks(
        emb, m=m, k=k_pq, sample=sample, seed=pq_seed, vec_col=vec_col, id_col=id_col
    )
    codes = ivfpq_encode(emb, cents, books, vec_col=vec_col, id_col=id_col)

    qrows = queries.select("qid", "qvec").collect()  # broadcast side by contract
    qids = np.array([r["qid"] for r in qrows], dtype=np.int64)
    Q = np.array([list(r["qvec"]) for r in qrows], dtype=np.float64)
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-9)
    n_cells = len(cents)
    nprobe = min(nprobe, n_cells)
    probed = np.argsort(-(Qn.astype(np.float32) @ cents.T), axis=1)[:, :nprobe]
    allow = np.zeros((len(Q), n_cells), dtype=bool)
    for qi in range(len(Q)):
        allow[qi, probed[qi]] = True
    sub = books.shape[2]
    luts = np.stack(
        [
            np.stack(
                [books[mi] @ Q[qi, mi * sub : (mi + 1) * sub] for mi in range(m)]
            )
            for qi in range(len(Q))
        ]
    )  # [nq, m, k_pq]
    sc = emb.sparkSession.sparkContext
    bc = sc.broadcast((qids, luts, allow))
    kk = k * rerank

    def adc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bqids, bluts, ballow = bc.value
        nq = len(bqids)
        for pdf in batches:
            if pdf.empty:
                yield pd.DataFrame({"qid": [], "nid": []})
                continue
            C = np.array(list(pdf["codes"]), dtype=np.int64)  # [n, m]
            cells = pdf["cell"].to_numpy()
            nn = pdf["nn"].to_numpy()
            nids = pdf["nid"].to_numpy()
            est = np.zeros((nq, len(C)))
            for mi in range(C.shape[1]):
                est += bluts[:, mi, C[:, mi]]
            est /= np.maximum(nn, 1e-12)[None, :]
            est[~ballow[:, cells]] = -np.inf  # cell filter, [nq, n]
            out_q, out_n = [], []
            for qi in range(nq):
                top = min(kk, len(C))
                idx = np.argpartition(-est[qi], top - 1)[:top]
                idx = idx[np.isfinite(est[qi, idx])]  # drop masked cells
                out_q.extend([bqids[qi]] * len(idx))
                out_n.extend(nids[idx].tolist())
            yield pd.DataFrame({"qid": out_q, "nid": out_n})

    cand = codes.mapInPandas(adc, schema="qid long, nid long")
    return _exact_rerank(cand, emb, queries, k, vec_col=vec_col, id_col=id_col)
