"""Unicode normalization + control scrub (functions/normalize.py)."""

from __future__ import annotations

import unicodedata

from pyspark.sql import functions as F

SAMPLES = [
    "plain ascii",
    "already composed: éÅñ",
    "decomposed: é Å ñ",
    "compat: ﬃ ① ½",  # ffi-ligature, circled one, vulgar half
    "controls: a\x07b\x1fc\x7fd keep\tthis\nand\rthis",
    "hangul: 각",  # jamo -> composes to 각 under NFC
    "",
]


def test_python_twins_match_unicodedata():
    from neuscraper_spark.functions.normalize import (
        nfc_py,
        nfkc_py,
        strip_controls_py,
    )

    for s in SAMPLES:
        assert nfc_py(s) == unicodedata.normalize("NFC", s)
        assert nfkc_py(s) == unicodedata.normalize("NFKC", s)
        # twin strips exactly C0-minus-{tab,nl,cr} plus DEL
        kept = strip_controls_py(s)
        assert "\x07" not in kept and "\x1f" not in kept and "\x7f" not in kept
        for keep in ("\t", "\n", "\r"):
            assert (keep in kept) == (keep in s)


def test_spark_matches_python_twins(spark):
    from neuscraper_spark.functions.normalize import (
        nfc_py,
        nfkc_py,
        normalize_text,
        strip_controls_py,
    )

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(SAMPLES)], "id long, text string"
    )
    out = (
        normalize_text(df, form="NFC", controls=False, out_col="nfc")
        .transform(lambda d: normalize_text(d, form="NFKC", controls=False, out_col="nfkc"))
        .transform(lambda d: normalize_text(d, form=None, controls=True, out_col="ctrl"))
        .orderBy("id")
        .collect()
    )
    for row in out:
        s = row["text"]
        assert row["nfc"] == nfc_py(s)
        assert row["nfkc"] == nfkc_py(s)
        assert row["ctrl"] == strip_controls_py(s)


def test_nfc_idempotent(spark):
    from neuscraper_spark.functions.normalize import normalize_text

    df = spark.createDataFrame([(s,) for s in SAMPLES], "text string")
    once = normalize_text(df, form="NFC", controls=True, out_col="n1")
    twice = normalize_text(once, text_col="n1", form="NFC", controls=True, out_col="n2")
    assert all(r["n1"] == r["n2"] for r in twice.collect())


def test_control_strip_stays_native(spark):
    """form=None + controls=True must compile to a pure-Catalyst plan —
    no Python evaluation node (the control strip is the hot-path tier)."""
    from neuscraper_spark.functions.normalize import normalize_text

    df = spark.createDataFrame([("a\x07b",)], "text string")
    plan = (
        normalize_text(df, form=None, controls=True)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_nulls_pass_through(spark):
    from neuscraper_spark.functions.normalize import normalize_text

    df = spark.createDataFrame([(1, None), (2, "x\x07")], "id long, text string")
    rows = {
        r["id"]: r["text"]
        for r in normalize_text(df, form="NFC", controls=True).collect()
    }
    assert rows[1] is None and rows[2] == "x"
