"""Scalar text helpers shared by the Spark plan and the pandas oracle.

Each helper has a Catalyst-native Column form (used in DataFrame plans —
stays inside whole-stage codegen, no Python) and a pure-Python twin with
identical semantics (used by the single-process oracle and inside Arrow
UDF bodies). Property tests assert the twins agree.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..config import STRIP_CHARS

# C1 — canonical strip: text.strip('\r\n\t\xa0 ')
# (reference: src/warc/build.py:85,92,158,163). The exact charset defines
# byte-identity of the extracted text; do not "simplify" to trim().
_STRIP_CLASS = "[\\r\\n\\t\\u00a0 ]"
_STRIP_RE = f"^{_STRIP_CLASS}+|{_STRIP_CLASS}+$"


def strip_ws(col: Column) -> Column:
    return F.regexp_replace(col, _STRIP_RE, "")


def strip_ws_py(s: str) -> str:
    return s.strip(STRIP_CHARS)


# C2 — gold-text escape tokens (reference: src/eval/evaluator.py:75,86)
def unescape_gold(col: Column) -> Column:
    out = F.replace(col, F.lit("#N#"), F.lit("\n"))
    out = F.replace(out, F.lit("#TAB#"), F.lit("\t"))
    out = F.replace(out, F.lit("#R#"), F.lit("\r"))
    return out


def unescape_gold_py(s: str) -> str:
    return s.replace("#N#", "\n").replace("#TAB#", "\t").replace("#R#", "\r")


def escape_gold(col: Column) -> Column:
    """Inverse of unescape_gold — writers of gold/text-node CSV files
    must escape embedded control characters the way the reference's
    eval files carry them, or a text node containing a newline becomes
    a multiline-quoted CSV field that single-line readers misparse."""
    out = F.replace(col, F.lit("\n"), F.lit("#N#"))
    out = F.replace(out, F.lit("\t"), F.lit("#TAB#"))
    out = F.replace(out, F.lit("\r"), F.lit("#R#"))
    return out
