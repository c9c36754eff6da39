"""The correctness gate: Spark pipeline vs single-process oracle.

BASELINE.json targets: byte-identical extracted text per url; keep/drop
F1 >= 0.99 vs reference labels (the oracle path, BASELINE.md).
"""

import pandas as pd
import pytest

from neuscraper_spark import oracle
from neuscraper_spark.corpus import gen_pages, web_pages_df
from neuscraper_spark.operators.extract import (
    chunk_nodes,
    extract_fused,
    extract_pipeline,
    kept_nodes,
    parse_nodes,
    score_nodes,
    text_nodes,
)
from neuscraper_spark.operators.quality import quality_chain


N_PAGES = 40
SEED = 42


@pytest.fixture(scope="module")
def web_pages(spark):
    return web_pages_df(spark, seed=SEED, n_pages=N_PAGES, partitions=4).cache()


@pytest.fixture(scope="module")
def oracle_extracted(pages):
    return oracle.extract_pages(pages).sort_values("url").reset_index(drop=True)


def _sorted(df) -> pd.DataFrame:
    return df.toPandas().sort_values("url").reset_index(drop=True)


def test_staged_byte_identical(spark, web_pages, oracle_extracted):
    got = _sorted(extract_pipeline(spark, web_pages))
    pd.testing.assert_frame_equal(got, oracle_extracted)


def test_fused_byte_identical(spark, web_pages, oracle_extracted):
    got = _sorted(extract_fused(spark, web_pages))
    pd.testing.assert_frame_equal(got, oracle_extracted)


def test_narrow_chunking_identical(spark, web_pages):
    """parse_chunks (narrow, r5 single-shuffle staged plan) must emit
    exactly what parse_nodes -> chunk_nodes (the general grouped route)
    aggregates — same chunks, same node structs, same order inside."""
    from neuscraper_spark.operators.extract import parse_chunks

    def normalize(df):
        pdf = df.toPandas()
        pdf["nodes"] = pdf["nodes"].map(
            lambda ns: [tuple(n) for n in ns]
        )
        return pdf.sort_values(["url", "chunk_id"]).reset_index(drop=True)

    narrow = normalize(parse_chunks(web_pages))
    grouped = normalize(chunk_nodes(parse_nodes(web_pages)))
    pd.testing.assert_frame_equal(narrow, grouped)


def test_partitioning_invariance(spark, oracle_extracted):
    """Same corpus at a different partition count -> same bytes (the
    local[8]-vs-local[32] scaling claim depends on this)."""
    wp1 = web_pages_df(spark, seed=SEED, n_pages=N_PAGES, partitions=1)
    got = _sorted(extract_pipeline(spark, wp1))
    pd.testing.assert_frame_equal(got, oracle_extracted)


def test_text_nodes_match_oracle(spark, web_pages, pages):
    got = text_nodes(parse_nodes(web_pages)).toPandas()
    got = got.sort_values(["url", "text_node_id"]).reset_index(drop=True)
    rows = []
    for p in pages:
        _, _, tn = oracle.extract_page(p["url"], p["html"])
        rows.extend({"url": p["url"], "text_node_id": nid, "text": t} for nid, t in tn)
    want = (
        pd.DataFrame(rows)
        .astype({"text_node_id": "int32"})
        .sort_values(["url", "text_node_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_kept_node_ids_match_oracle(spark, web_pages, pages):
    scored = score_nodes(spark, chunk_nodes(parse_nodes(web_pages)))
    got = kept_nodes(scored).select("url", "node_id").toPandas()
    got_sets = got.groupby("url")["node_id"].agg(set).to_dict()
    for p in pages:
        _, kept, _ = oracle.extract_page(p["url"], p["html"])
        assert got_sets.get(p["url"], set()) == kept, p["url"]


def test_keep_drop_f1_vs_oracle_labels(spark, web_pages, pages):
    """The headline BASELINE metric, computed the reference's way
    (evaluator.py:27-33). Byte-identity makes it exactly 1.0 — assert the
    target threshold anyway."""
    curated = quality_chain(spark, extract_pipeline(spark, web_pages)).toPandas()
    want = oracle.curate_pages(pages)
    merged = curated.merge(want, on="url", suffixes=("_got", "_want"))
    assert len(merged) == len(want)
    f1 = oracle.f1_keep_drop(merged["keep_want"], merged["keep_got"])
    assert f1 >= 0.99
    # and the full label row agrees
    for col in ("lang_pred", "quality_pass", "toxicity_pass", "keep"):
        assert (merged[f"{col}_got"] == merged[f"{col}_want"]).all(), col
    assert (merged["scrubbed_text_got"] == merged["scrubbed_text_want"]).all()


def test_threshold_sweep_counts(spark, web_pages):
    """M2: one forward pass, all (task, θ) predictions; monotone in θ and
    consistent with kept_nodes at θ=0.9."""
    from neuscraper_spark.operators.extract import threshold_sweep

    scored = score_nodes(spark, chunk_nodes(parse_nodes(web_pages))).cache()
    sweep = threshold_sweep(scored).toPandas()
    prim = sweep[sweep.task == "Primary"]
    by_thr = prim.groupby("threshold")["node_id"].count()
    assert by_thr.is_monotonic_decreasing
    kept = kept_nodes(scored).count()
    # sweep at 0.9 counts nodes regardless of text!='' fusion
    assert by_thr.loc[0.9] >= kept
    scored.unpersist()


def test_threshold_monotonicity(spark, web_pages):
    """Lower θ keeps a superset of nodes (M2 sweep semantics)."""
    scored = score_nodes(spark, chunk_nodes(parse_nodes(web_pages))).cache()
    hi = kept_nodes(scored, threshold=0.9).count()
    lo = kept_nodes(scored, threshold=0.5).count()
    assert lo >= hi > 0
    scored.unpersist()
