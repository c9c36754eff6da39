"""S8 — single-page serving parity (the reference's POST /predict).

The reference's serving app fetches a page, runs build -> inference ->
Primary@0.9 -> join + sort desc + groupby-concat and returns
``{"Text": ...}`` (app/app.py:31-46). Our oracle path IS that chain;
this module exposes it in the serving shape, plus a Spark single-row
variant for parity testing the distributed plan against the server
response (SURVEY.md §2.1 S8).
"""

from __future__ import annotations

from .. import config as C
from ..oracle import extract_page


def predict_page(url: str, html: bytes, threshold: float = C.PRIMARY_THRESHOLD) -> dict:
    """The serving response: extracted primary text for one page."""
    text, kept, _ = extract_page(url, html, threshold)
    return {"Url": url, "Text": text or "", "KeptNodeIds": sorted(kept)}


def predict_page_spark(spark, url: str, html: bytes,
                       threshold: float = C.PRIMARY_THRESHOLD) -> dict:
    """Same request through the distributed plan (single-row DataFrame) —
    must equal predict_page byte-for-byte (tests/test_serve.py)."""
    from .extract import extract_pipeline

    df = spark.createDataFrame([(url, html)], "url string, html binary")
    rows = extract_pipeline(spark, df, threshold=threshold).collect()
    text = rows[0]["text"] if rows else ""
    return {"Url": url, "Text": text}
