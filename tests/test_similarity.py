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


def test_lsh_deterministic(spark, emb):
    a = S.lsh_signatures(emb.limit(50)).toPandas().sort_values(["id", "table"])
    b = S.lsh_signatures(emb.limit(50)).toPandas().sort_values(["id", "table"])
    assert a["bucket"].tolist() == b["bucket"].tolist()
