"""Z-order data layout for multi-column file skipping.

Min/max file skipping (TableWriter.prune_files) only helps when files
are CLUSTERED on the pruned column. A linear sort clusters one column
perfectly and leaves every other column's per-file range full-width; a
Z-order (Morton) curve interleaves the bits of several columns' ranks
so each file covers a small hyper-rectangle — point/range predicates on
ANY of the curve's columns skip most files (Delta OPTIMIZE ZORDER,
Iceberg sort-order rewrite — both public designs).

Shape at scale:
1. one stats pass per column (min/max agg — metadata-cheap, or sampled
   quantile ranks where skew matters; linear scaling is used here and
   documented as the skew caveat),
2. a pure-Catalyst z-value expression (shift/AND/OR bit interleave —
   codegen, no Python, no extra pass),
3. ``repartitionByRange`` on the z-value: the ONE shuffle any
   clustering rewrite needs (a sort would shuffle the same bytes), then
   ``sortWithinPartitions`` so parquet row-groups inherit the locality.

The z column is dropped before the write; the layout survives as file
boundaries + footer stats, which is where prune_files reads it back.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(col: str, lo: float, hi: float, bits: int) -> Column:
    """Linear [lo, hi] -> integer rank in [0, 2^bits). NULLs map to
    bucket 0 (they sort together, and cannot-prune stats keep them
    visible to every query)."""
    n = 1 << bits
    if lo is None or hi is None:  # all-NULL column: no information
        return F.lit(0).cast("long")
    span = hi - lo
    if span <= 0:  # constant column: every row in bucket 0
        return F.lit(0).cast("long")
    scaled = (F.col(col).cast("double") - F.lit(float(lo))) / F.lit(span) * n
    b = F.least(F.greatest(F.floor(scaled), F.lit(0)), F.lit(n - 1))
    return F.coalesce(b.cast("long"), F.lit(0))


def zvalue(stats: dict[str, tuple[float, float]], bits: int = 8) -> Column:
    """Morton interleave of the columns' bucket ranks — pure Catalyst
    (shiftleft/shiftright/AND folded with OR), stays in codegen."""
    cols = sorted(stats)  # deterministic lane assignment
    ncols = len(cols)
    lanes = []
    for ci, c in enumerate(cols):
        b = _bucket(c, *stats[c], bits=bits)
        for i in range(bits):
            bit = F.shiftright(b, i).bitwiseAND(F.lit(1))
            lanes.append(F.shiftleft(bit, i * ncols + ci))
    return reduce(lambda a, x: a.bitwiseOR(x), lanes)


def column_ranges(df: DataFrame, cols: list[str]) -> dict[str, tuple[float, float]]:
    """One agg pass: {col: (min, max)} as floats."""
    row = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"lo_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"hi_{c}") for c in cols],
    ).collect()[0]
    return {c: (row[f"lo_{c}"], row[f"hi_{c}"]) for c in cols}


def zorder(
    df: DataFrame,
    cols: list[str],
    n_files: int,
    bits: int = 8,
    stats: dict[str, tuple[float, float]] | None = None,
) -> DataFrame:
    """Cluster ``df`` into ``n_files`` range-slices of the Z-curve over
    ``cols``. Write the result (e.g. via TableWriter) and
    ``prune_files`` becomes effective on every listed column at once.
    ``stats`` overrides the min/max pass (e.g. from manifest metrics —
    skips the extra scan)."""
    if len(cols) < 2:
        raise ValueError("zorder needs >= 2 columns; use a plain sort for 1")
    if stats is None:
        stats = column_ranges(df, cols)
    missing = [c for c in cols if c not in stats]
    if missing:
        raise ValueError(f"stats missing for {missing}")
    z = zvalue({c: stats[c] for c in cols}, bits=bits)
    return (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )
