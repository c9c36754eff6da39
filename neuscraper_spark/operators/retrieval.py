"""Lexical retrieval over the document corpus: inverted term
statistics + Okapi BM25 ranking.

A curation pipeline uses this for query-based corpus selection
("find the documents most relevant to these seed queries/domains and
up-sample them") — the lexical complement of the embedding ANN family
in ``operators/similarity.py``. Public design: Robertson & Zaragoza
2009 (BM25); the always-positive idf variant ``ln(1 + (N-df+.5)/(df+.5))``
is the one Lucene ships.

Scale shape (100 TB corpus, broadcast-sized query set):
- postings = explode + groupBy(doc_id, term): ONE shuffle with map-side
  combine; doc lengths derive from postings by a doc_id re-agg.
- df is a term-keyed agg of postings and the postings->df join is
  co-keyed on term, so AQE plans it without an extra exchange of the
  big side; the query-term join broadcasts (queries are small by
  contract).
- nothing collects; corpus stats (N, total tokens) reduce to one row
  and ride a broadcast join.

Cross-engine determinism: per-(qid, doc, term) BM25 contributions are
computed in float64 but QUANTIZED to integers (x 1e9, BIGINT) before
the per-doc sum — integer addition is exactly associative, so the
score is independent of partitioning/aggregation order and hash-equal
across Spark and the DuckDB oracle (float sums are not: their order
differs between engines). The driver row keeps the quantized score.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

BM25_K1 = 1.2
BM25_B = 0.75
SCORE_SCALE = 1_000_000_000  # contribution quantum: 1e-9
# Salt fan-out for the two-phase top-k: bounds any single ranking task
# at ~|scored rows for the hottest qid| / BM25_SALTS. Output is
# provably salt-count-independent (see bm25_topk), so production can
# raise it to ~the executor count; 32 matches the local bench width.
BM25_SALTS = 32


def _terms(df: DataFrame, text_col: str, out: str = "term") -> DataFrame:
    """Whitespace tokenization shared by corpus and query sides (the
    corpus is pre-cleaned lowercase text; empty tokens from repeated
    separators are dropped on both engines)."""
    return df.withColumn(out, F.explode(F.split(F.col(text_col), " "))).filter(
        F.col(out) != ""
    )


def term_postings(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, term, tf): the inverted index payload. One shuffle,
    map-side combined."""
    return (
        _terms(docs.select(id_col, text_col), text_col)
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k documents per query by BM25.

    ``queries``: (qid, qtext) — broadcast-sized by contract. Query
    terms are DISTINCT per qid (set semantics; repeated query words do
    not double-count — documented divergence from tf-weighted query
    variants).

    Returns (qid, doc_id, score_q, rank) where ``score_q`` is the
    BM25 score quantized at 1e-9 (BIGINT) — see module docstring for
    why the quantized integer, not the float, is the contract.
    """
    post = term_postings(docs, text_col, id_col)
    dl = post.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    dft = post.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        (F.sum("dl") / F.count(F.lit(1))).cast("double").alias("avgdl"),
    )
    qterms = _terms(queries.select("qid", "qtext"), "qtext").select("qid", "term").distinct()

    idf = F.log(
        (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    tf_part = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf")
        + F.lit(k1)
        * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
    )
    contrib_q = F.round(idf * tf_part * F.lit(SCORE_SCALE)).cast("long")

    scored = (
        post.join(F.broadcast(qterms), "term")
        .join(dft, "term")
        .join(dl, id_col)
        .join(F.broadcast(stats))
        .withColumn("contrib_q", contrib_q)
        .groupBy("qid", id_col)
        .agg(F.sum("contrib_q").alias("score_q"))
    )
    # Two-phase salted top-k (r5 VERDICT #2): a single
    # Window.partitionBy(qid) funnels EVERY scored (qid, doc) row for a
    # query into one task — a query containing one common term scores a
    # large fraction of the corpus, so that partition becomes the job.
    # Phase 1 ranks within (qid, salt) — salt derived deterministically
    # from the doc id (guide §2.5: never rand()) — and keeps k rows per
    # bucket; phase 2 ranks the <= BM25_SALTS*k survivors per qid.
    # Equivalence: the order (score desc, doc_id asc) is a strict total
    # order per qid, and every global top-k row is necessarily within
    # its own salt bucket's top-k, so phase 2 sees every global winner
    # and emits exactly the rows the single window did.
    salt = F.pmod(F.xxhash64(F.col(id_col)), F.lit(BM25_SALTS))
    w_local = Window.partitionBy("qid", "_salt").orderBy(
        F.desc("score_q"), F.asc(id_col)
    )
    survivors = (
        scored.withColumn("_salt", salt)
        .withColumn("_lr", F.row_number().over(w_local))
        .filter(F.col("_lr") <= k)
        .drop("_salt", "_lr")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score_q"), F.asc(id_col))
    return (
        survivors.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", id_col, "score_q", "rank")
    )


def queries_from_docs(
    docs: DataFrame,
    ids,
    n_terms: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic query set: the first ``n_terms`` words of the
    selected documents (qid = doc_id). Mirrors similarity's
    queries_from_ids so tests and the driver need no external data."""
    return docs.filter(F.col(id_col).isin(list(ids))).select(
        F.col(id_col).alias("qid"),
        F.array_join(
            F.slice(F.split(F.col(text_col), " "), 1, n_terms), " "
        ).alias("qtext"),
    )
