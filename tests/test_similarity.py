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


def test_ivf_stored_index_matches_on_the_fly(spark, tmp_path):
    """build once + probe (no retrain) == the self-contained path at the
    same seed, and probe-all == brute force (VERDICT r2 #7)."""
    from neuscraper_spark.operators.similarity import (
        ann_ivf_topk,
        ann_ivf_topk_indexed,
        brute_force_topk,
        build_ivf_index,
        queries_from_ids,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = queries_from_ids(emb, range(3))
    root = str(tmp_path / "ivf_index")
    snap = build_ivf_index(spark, emb, root, n_centroids=8)
    assert snap["rows_written"] == emb.count()

    got = ann_ivf_topk_indexed(spark, root, q, k=5, nprobe=3).collect()
    want = ann_ivf_topk(emb, q, k=5, n_centroids=8, nprobe=3).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))

    all_probed = ann_ivf_topk_indexed(spark, root, q, k=5, nprobe=8).collect()
    bf = brute_force_topk(emb, q, k=5).collect()
    assert sorted(map(tuple, all_probed)) == sorted(map(tuple, bf))


def test_ivf_index_append_generation(spark, tmp_path):
    """append_ivf_index grows the stored index without retraining: an
    appended vector is findable (its own query returns it at sim 1.0),
    probe-all over base+delta == brute force over the grown corpus."""
    from pyspark.sql import functions as F

    from neuscraper_spark.operators.similarity import (
        append_ivf_index,
        brute_force_topk,
        build_ivf_index,
        ann_ivf_topk_indexed,
        queries_from_ids,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    root = str(tmp_path / "ivf_index")
    build_ivf_index(spark, emb, root, n_centroids=8)

    # new batch = existing vectors with shifted ids (so they land in
    # known cells and their nearest neighbour is their source vector)
    max_id = emb.agg(F.max("vec_id")).collect()[0][0]
    new = emb.limit(4).select(
        (F.col("vec_id") + max_id + 1).alias("vec_id"), "embedding", "label"
    )
    snap = append_ivf_index(spark, new, root)
    assert snap["rows_written"] == 4

    new_ids = [r["vec_id"] for r in new.select("vec_id").collect()]
    q = queries_from_ids(new, new_ids[:2])
    got = ann_ivf_topk_indexed(spark, root, q, k=3, nprobe=8).collect()
    grown = emb.unionByName(new)
    bf = brute_force_topk(grown, q, k=3).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, bf))
    # each appended vector's nearest (non-self) hit is its source
    # vector — identical embedding, cosine 1.0 — proving the delta
    # generation actually participates in the probe
    by_q = {}
    for r in got:
        by_q.setdefault(r["qid"], []).append(r)
    for qid, rows in by_q.items():
        best = min(rows, key=lambda r: r["rank"])
        assert best["nid"] == qid - max_id - 1
        assert best["cosine"] == 1.0


def test_ivf_compaction_e2e_and_crash_recovery(spark, tmp_path):
    """build -> append -> compact: probe results unchanged, the probe
    plan scans ONE table (no deltas left), and an interrupted swap rolls
    forward without double-counting appended vectors."""
    import json
    import os
    import shutil

    from pyspark.sql import functions as F

    from neuscraper_spark.operators.similarity import (
        _delta_roots,
        append_ivf_index,
        brute_force_topk,
        build_ivf_index,
        ann_ivf_topk_indexed,
        compact_ivf_index,
        queries_from_ids,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    root = str(tmp_path / "ivf_index")
    build_ivf_index(spark, emb, root, n_centroids=8)
    max_id = emb.agg(F.max("vec_id")).collect()[0][0]
    new = emb.limit(4).select(
        (F.col("vec_id") + max_id + 1).alias("vec_id"), "embedding", "label"
    )
    append_ivf_index(spark, new, root)
    append_ivf_index(
        spark,
        new.select((F.col("vec_id") + 100).alias("vec_id"), "embedding", "label"),
        root,
    )
    assert len(_delta_roots(root)) == 2
    grown = emb.count() + 8

    q = queries_from_ids(emb, range(3))
    before = sorted(map(tuple, ann_ivf_topk_indexed(spark, root, q, k=5, nprobe=8).collect()))

    # keep a copy of the deltas to reconstruct the crash window later
    deltas_copy = str(tmp_path / "deltas_copy")
    shutil.copytree(os.path.join(root, "deltas"), deltas_copy)

    snap = compact_ivf_index(spark, root)
    assert snap["rows_written"] == grown
    # single-table probe plan: no deltas, no leftover swap dirs
    assert _delta_roots(root) == []
    assert not os.path.isdir(os.path.join(root, "cells.compacting"))
    assert not os.path.isdir(os.path.join(root, "cells.old"))
    assert not os.path.exists(os.path.join(root, "_compacting.json"))
    after = sorted(map(tuple, ann_ivf_topk_indexed(spark, root, q, k=5, nprobe=8).collect()))
    assert after == before
    # compacting again is a no-op
    compact_ivf_index(spark, root)

    # ---- crash window: marker written, cells already swapped to the
    # compacted table, but deltas/ not yet removed. A naive probe would
    # count every appended vector TWICE; _finish_compaction must remove
    # the stale deltas before the scan.
    shutil.copytree(deltas_copy, os.path.join(root, "deltas"))
    with open(os.path.join(root, "_compacting.json"), "w") as f:
        json.dump({"merged_deltas": ["g0", "g1"]}, f)
    recovered = sorted(map(tuple, ann_ivf_topk_indexed(spark, root, q, k=5, nprobe=8).collect()))
    assert recovered == before
    assert _delta_roots(root) == []
    assert not os.path.exists(os.path.join(root, "_compacting.json"))

    # and exhaustive probe of the compacted index == brute force over
    # the grown corpus (nothing lost, nothing duplicated)
    bf = sorted(
        map(
            tuple,
            brute_force_topk(
                emb.unionByName(new).unionByName(
                    new.select(
                        (F.col("vec_id") + 100).alias("vec_id"),
                        "embedding",
                        "label",
                    )
                ),
                q,
                k=5,
            ).collect(),
        )
    )
    assert recovered == bf


def test_ivf_append_crash_retry_no_duplicates(spark, tmp_path):
    """A crashed append (delta data written, no _committed.json marker)
    must be invisible to probes/compaction and must be scrubbed —
    not double-counted — when the append is retried (r4 ADVICE #1)."""
    import os

    from pyspark.sql import functions as F

    from neuscraper_spark.operators.similarity import (
        _delta_roots,
        ann_ivf_topk_indexed,
        append_ivf_index,
        brute_force_topk,
        build_ivf_index,
        compact_ivf_index,
        queries_from_ids,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    root = str(tmp_path / "ivf_index")
    build_ivf_index(spark, emb, root, n_centroids=8)
    max_id = emb.agg(F.max("vec_id")).collect()[0][0]
    new = emb.limit(4).select(
        (F.col("vec_id") + max_id + 1).alias("vec_id"), "embedding", "label"
    )

    # simulate the crash: a full append whose commit marker never landed
    append_ivf_index(spark, new, root)
    g0 = _delta_roots(root)[0]
    os.unlink(os.path.join(g0, "_committed.json"))
    assert _delta_roots(root) == []  # uncommitted -> invisible to probes

    # retry lands in the SAME slot (scrub + rewrite), not a new one
    snap = append_ivf_index(spark, new, root)
    assert snap["rows_written"] == 4
    roots = _delta_roots(root)
    assert [os.path.basename(r) for r in roots] == ["g0"]

    # no duplicates anywhere: probe-all == brute force over the grown
    # corpus (a double-counted vector would shift ranks/rows)
    grown = emb.unionByName(new)
    q = queries_from_ids(new, [max_id + 1])
    got = sorted(map(tuple, ann_ivf_topk_indexed(spark, root, q, k=5, nprobe=8).collect()))
    bf = sorted(map(tuple, brute_force_topk(grown, q, k=5).collect()))
    assert got == bf
    # and compaction of the recovered index preserves exact row count
    snap = compact_ivf_index(spark, root)
    assert snap["rows_written"] == emb.count() + 4


def test_ivf_delta_roots_numeric_order(tmp_path):
    """g10 must sort after g2 (lexicographic listing would interleave
    them and mis-assign the next generation number)."""
    import json
    import os

    from neuscraper_spark.operators.similarity import _delta_roots

    droot = tmp_path / "idx" / "deltas"
    for g in (0, 1, 2, 10):
        gdir = droot / f"g{g}"
        gdir.mkdir(parents=True)
        (gdir / "_committed.json").write_text(json.dumps({"generation": g}))
    (droot / "gX").mkdir()  # non-numeric junk is ignored
    roots = _delta_roots(str(tmp_path / "idx"))
    assert [os.path.basename(r) for r in roots] == ["g0", "g1", "g2", "g10"]


def test_pq_exact_setting_equals_brute_force(spark, emb):
    """Exact-codebook PQ (k_pq >= distinct subvectors, sample >= corpus)
    must reproduce brute-force top-k bit-for-bit — the driver-oracle
    setting of the 'pq' variant."""
    from neuscraper_spark.operators.similarity import ann_pq_topk

    q = S.queries_from_ids(emb, range(3))
    want = {
        (r["qid"], r["rank"]): (r["nid"], r["cosine"])
        for r in S.brute_force_topk(emb, q, k=10).collect()
    }
    got = {
        (r["qid"], r["rank"]): (r["nid"], r["cosine"])
        for r in ann_pq_topk(emb, q, k=10, m=8, k_pq=512, sample=1 << 20).collect()
    }
    assert got == want


def test_pq_lossy_recall(spark, emb):
    """Production-shaped PQ (small codebooks, lossy ADC) must still
    find most of the true top-k after the exact rerank."""
    from neuscraper_spark.operators.similarity import ann_pq_topk

    q = S.queries_from_ids(emb, range(3))
    truth = {}
    for r in S.brute_force_topk(emb, q, k=10).collect():
        truth.setdefault(r["qid"], set()).add(r["nid"])
    got = {}
    for r in ann_pq_topk(emb, q, k=10, m=8, k_pq=16, rerank=4).collect():
        got.setdefault(r["qid"], set()).add(r["nid"])
    recalls = [
        len(truth[qid] & got.get(qid, set())) / len(truth[qid]) for qid in truth
    ]
    assert sum(recalls) / len(recalls) >= 0.6, recalls


def test_ivfpq_exact_setting_equals_brute_force(spark, emb):
    """IVF-PQ with all cells probed and exact codebooks must equal the
    exact top-k — the driver-oracle setting of the 'ivfpq' variant."""
    from neuscraper_spark.operators.similarity import ann_ivfpq_topk

    q = S.queries_from_ids(emb, range(3))
    want = {
        (r["qid"], r["rank"]): (r["nid"], r["cosine"])
        for r in S.brute_force_topk(emb, q, k=10).collect()
    }
    got = {
        (r["qid"], r["rank"]): (r["nid"], r["cosine"])
        for r in ann_ivfpq_topk(
            emb, q, k=10, n_centroids=16, nprobe=16, m=8, k_pq=512, sample=1 << 20
        ).collect()
    }
    assert got == want


def test_ivfpq_lossy_recall(spark, emb):
    """Production-shaped IVF-PQ (nprobe < n_centroids, lossy
    codebooks) keeps most of the true top-k after the exact rerank —
    the two approximations compose without collapsing recall."""
    from neuscraper_spark.operators.similarity import ann_ivfpq_topk

    q = S.queries_from_ids(emb, range(5))
    truth = {}
    for r in S.brute_force_topk(emb, q, k=10).collect():
        truth.setdefault(r["qid"], set()).add(r["nid"])
    got = {}
    for r in ann_ivfpq_topk(
        emb, q, k=10, n_centroids=16, nprobe=4, m=8, k_pq=16, rerank=4
    ).collect():
        got.setdefault(r["qid"], set()).add(r["nid"])
    recalls = [
        len(truth[qid] & got.get(qid, set())) / len(truth[qid]) for qid in truth
    ]
    assert sum(recalls) / len(recalls) >= 0.4, recalls


def test_ivfpq_encode_is_compact_and_consistent(spark, emb):
    """The fused encode emits one row per vector with a valid cell and
    m codes; cells agree with ivf_assign's nearest-cell assignment."""
    from neuscraper_spark.operators.similarity import (
        ivfpq_encode,
        train_ivf_centroids,
        train_pq_codebooks,
    )

    cents = train_ivf_centroids(emb, n_centroids=8)
    books = train_pq_codebooks(emb, m=8, k=16)
    enc = ivfpq_encode(emb, cents, books).toPandas().set_index("nid")
    assert len(enc) == emb.count()
    assert enc["cell"].between(0, 7).all()
    via_assign = S.ivf_assign(emb, cents, nprobe=1).toPandas().set_index("id")
    assert (enc["cell"].sort_index() == via_assign["cell"].sort_index()).all()


def test_pq_codes_are_compact(spark, emb):
    """The encoded table is the scale representation: m int codes + one
    norm per vector, no float vectors."""
    from neuscraper_spark.operators.similarity import pq_encode, train_pq_codebooks

    books = train_pq_codebooks(emb, m=8, k=16)
    codes = pq_encode(emb, books)
    assert codes.columns == ["nid", "codes", "nn"]
    row = codes.orderBy("nid").first()
    assert len(row["codes"]) == 8
    assert all(0 <= c < 16 for c in row["codes"])
