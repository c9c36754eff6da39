"""Data-quality expectations: declarative rules audited in ONE
aggregation pass.

A curation pipeline that writes a bad batch poisons every downstream
training run, so production tables gate commits on expectations
(the write-audit-publish pattern: data lands invisible, an audit pass
reads the written bytes, and only a clean audit publishes them —
``TableWriter.write(expectations=...)`` wires this into the manifest
commit).

Every rule compiles to a conditional count inside a single ``agg`` —
one scan, map-side combined, no matter how many rules — except
``unique``, which needs a distinct count (exact; still the same agg
row). The report maps rule name -> violation count, so zero means the
expectation holds.

Rules (each a tuple, keyed by column):
    ("not_null",)             value must not be NULL
    ("unique",)               no duplicate values (NULLs not counted)
    ("between", lo, hi)       lo <= value <= hi (NULL violates)
    ("in_set", values)        value in the set (NULL violates)
    ("matches", regex)        value rlike regex (NULL violates)
    ("non_empty",)            trim(value) != '' and not NULL
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ExpectationError(Exception):
    """Raised when enforce-mode finds violations; carries the report."""

    def __init__(self, report: dict):
        self.report = report
        failed = {k: v for k, v in report["violations"].items() if v}
        super().__init__(f"expectations failed: {failed}")


def _violation_expr(col: str, rule: tuple):
    c = F.col(col)
    kind = rule[0]
    if kind == "not_null":
        return c.isNull()
    if kind == "between":
        _, lo, hi = rule
        return ~c.between(F.lit(lo), F.lit(hi)) | c.isNull()
    if kind == "in_set":
        return ~c.isin(list(rule[1])) | c.isNull()
    if kind == "matches":
        return ~c.rlike(rule[1]) | c.isNull()
    if kind == "non_empty":
        return c.isNull() | (F.trim(c) == "")
    raise ValueError(f"unknown expectation {kind!r} for column {col!r}")


def _rule_name(col: str, rule: tuple) -> str:
    return f"{col}:{rule[0]}" + (
        f"({', '.join(map(str, rule[1:]))})" if len(rule) > 1 else ""
    )


def audit(df: DataFrame, rules: dict[str, list[tuple]]) -> dict:
    """One-pass audit. Returns {"n_rows": n, "violations":
    {rule_name: count}} — all zeros means the batch is publishable."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    uniques = []
    for col, col_rules in sorted(rules.items()):
        for rule in col_rules:
            name = _rule_name(col, rule)
            if rule[0] == "unique":
                # dupes = non-null rows minus distinct values
                aggs.append(
                    (
                        F.count(F.col(col)) - F.count_distinct(F.col(col))
                    ).alias(name)
                )
                uniques.append(name)
            else:
                aggs.append(
                    F.sum(_violation_expr(col, rule).cast("long")).alias(name)
                )
    row = df.agg(*aggs).collect()[0].asDict()
    n = row.pop("__n")
    return {
        "n_rows": n,
        "violations": {k: int(v or 0) for k, v in row.items()},
    }


def enforce(df: DataFrame, rules: dict[str, list[tuple]]) -> dict:
    """Audit and raise ExpectationError if any rule is violated."""
    report = audit(df, rules)
    if any(report["violations"].values()):
        raise ExpectationError(report)
    return report


# expectations a curated web-corpus table should always satisfy — the
# default audit run_pipeline applies with --expect
CURATED_RULES: dict[str, list[tuple]] = {
    "url": [("not_null",), ("unique",), ("non_empty",)],
    "text": [("not_null",)],
    "lang_pred": [("in_set", ("en", "de", "es", "fr"))],
    "ppl": [("between", 0.0, 1e6)],
    "n_words": [("between", 0, 10_000_000)],
    "pii_count": [("between", 0, 10_000_000)],
}
