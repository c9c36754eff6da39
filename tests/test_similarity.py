"""ANN: brute-force correctness + LSH recall vs the exact baseline."""

import numpy as np
import pytest

from neuscraper_spark.operators import similarity as S

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


def test_brute_force_matches_numpy(spark, emb):
    pdf = emb.toPandas()
    vecs = np.array([list(v) for v in pdf["embedding"]], dtype=np.float64)
    ids = pdf["vec_id"].to_numpy()
    q = vecs[ids == 0][0]
    sims = (vecs @ q) / (np.linalg.norm(vecs, axis=1) * np.linalg.norm(q))
    sims[ids == 0] = -np.inf
    want = set(ids[np.argsort(-np.round(sims, 6))][:10].tolist())

    got = S.brute_force_topk(emb, S.queries_from_ids(emb, [0]), k=10).toPandas()
    # allow rounded-cosine ties to reorder at the boundary
    overlap = len(want & set(got["nid"])) / 10
    assert overlap >= 0.9


def test_lsh_recall(spark, emb):
    qs = S.queries_from_ids(emb, range(10))
    exact = S.brute_force_topk(emb, qs, k=10).toPandas()
    approx = S.ann_lsh_topk(emb, qs, k=10).toPandas()
    recalls = []
    for qid in range(10):
        want = set(exact[exact.qid == qid]["nid"])
        got = set(approx[approx.qid == qid]["nid"])
        recalls.append(len(want & got) / max(len(want), 1))
    assert np.mean(recalls) >= 0.5, recalls


def test_ivf_recall(spark, emb):
    qs = S.queries_from_ids(emb, range(10))
    exact = S.brute_force_topk(emb, qs, k=10).toPandas()
    approx = S.ann_ivf_topk(emb, qs, k=10, n_centroids=16, nprobe=4).toPandas()
    recalls = []
    for qid in range(10):
        want = set(exact[exact.qid == qid]["nid"])
        got = set(approx[approx.qid == qid]["nid"])
        recalls.append(len(want & got) / max(len(want), 1))
    assert np.mean(recalls) >= 0.5, recalls
    # probing every cell = exact search (sanity on the mechanism)
    full = S.ann_ivf_topk(emb, qs, k=10, n_centroids=16, nprobe=16).toPandas()
    full_recalls = []
    for qid in range(10):
        want = set(exact[exact.qid == qid]["nid"])
        got = set(full[full.qid == qid]["nid"])
        full_recalls.append(len(want & got) / max(len(want), 1))
    assert np.mean(full_recalls) >= 0.95, full_recalls


def test_ivf_deterministic_centroids(spark, emb):
    a = S.train_ivf_centroids(emb, n_centroids=8, seed=11)
    b = S.train_ivf_centroids(emb, n_centroids=8, seed=11)
    assert np.array_equal(a, b)
    assert np.allclose(np.linalg.norm(a, axis=1), 1.0, atol=1e-5)


def test_lsh_deterministic(spark, emb):
    a = S.lsh_signatures(emb.limit(50)).toPandas().sort_values(["id", "table"])
    b = S.lsh_signatures(emb.limit(50)).toPandas().sort_values(["id", "table"])
    assert a["bucket"].tolist() == b["bucket"].tolist()
