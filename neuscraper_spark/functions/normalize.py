"""Unicode normalization + control-character scrubbing (curation tier).

Web text arrives in mixed Unicode normal forms (decomposed combining
marks from mac-filesystem paths and old CMS exports) and carries stray
C0 control bytes from broken encoders. A curation pipeline normalizes
to NFC and strips controls BEFORE dedup/fingerprinting, otherwise
byte-level hashes (d1 exact dedup, x3 fingerprints) disagree on text
that renders identically. The reference curates ASCII-safe eval CSVs
(src/eval/evaluator.py escape tokens) and never faces this; the
north-rule corpus (Common-Crawl-scale web pages) does.

Two tiers, matching the engine's perf laws:

- ``strip_controls``: pure Catalyst ``regexp_replace`` — stays inside
  whole-stage codegen, no Python. The class keeps ``\\t \\n \\r``
  (legitimate layout) and removes the rest of C0 plus DEL.
- ``nfc`` / ``nfkc``: need the Unicode character database, which no
  Catalyst expression carries, so they run as Arrow-batched pandas UDFs
  over ``unicodedata`` (C-backed table lookups; one UDF call per Arrow
  batch, no per-row Python round trips — the sanctioned slow-path shape).

Oracle: DuckDB's ``nfc_normalize()`` is an independent implementation
of UAX #15 (utf8proc lineage vs CPython's unicodedata), so a value-hash
match on the q_normalize row is a genuine cross-implementation check of
the normalization itself, not a shared-constant tautology.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

# C0 minus {\t \n \r}, plus DEL. Range-based class (3 ranges + 3 points):
# safe under the r2 Java-regex law (the pathology is wide *enumerated*
# classes, which javac lowers to per-char union lambdas).
CTRL_CLASS = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"


def strip_controls(col: Column) -> Column:
    """Remove C0 control characters (except tab/newline/CR) and DEL."""
    return F.regexp_replace(col, CTRL_CLASS, "")


def strip_controls_py(s: str) -> str:
    import re

    return re.sub(CTRL_CLASS, "", s)


def _norm_udf(form: str):
    @F.pandas_udf(StringType())
    def _norm(s: pd.Series) -> pd.Series:
        return s.map(
            lambda t: unicodedata.normalize(form, t) if t is not None else None
        )

    return _norm


# Built once at import: pandas_udf objects are reusable Column factories.
nfc = _norm_udf("NFC")
nfkc = _norm_udf("NFKC")


def nfc_py(s: str) -> str:
    return unicodedata.normalize("NFC", s)


def nfkc_py(s: str) -> str:
    return unicodedata.normalize("NFKC", s)


def normalize_text(
    df,
    text_col: str = "text",
    out_col: str | None = None,
    form: str = "NFC",
    controls: bool = True,
):
    """Normalize ``text_col`` to the given Unicode form and optionally
    scrub control characters. Narrow (per-row, zero shuffle); the only
    Python stage is the Arrow-batched normalization UDF, and the control
    strip stays in codegen. ``form=None`` skips normalization (pure
    native plan)."""
    out_col = out_col or text_col
    col: Column = F.col(text_col)
    if form == "NFC":
        col = nfc(col)
    elif form == "NFKC":
        col = nfkc(col)
    elif form is not None:
        raise ValueError(f"form must be NFC|NFKC|None, got {form!r}")
    if controls:
        col = strip_controls(col)
    return df.withColumn(out_col, col)
