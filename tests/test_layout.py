"""Z-order layout (sources/layout.py): pruning effectiveness on both
curve columns, plan purity, edge cases."""

import pytest
from pyspark.sql import functions as F

from neuscraper_spark.sources.layout import column_ranges, zorder, zvalue
from neuscraper_spark.sources.writer import TableWriter


@pytest.fixture(scope="module")
def grid(spark):
    # 64x64 grid: two independent uniform columns — the worst case for
    # single-column sorting, the showcase for Z-order
    return (
        spark.range(0, 4096)
        .select(
            (F.col("id") % 64).alias("x"),
            (F.col("id") / 64).cast("long").alias("y"),
            F.col("id").alias("payload"),
        )
        .withColumn("part", F.lit("p0"))
    )


def _write(spark, tmp_path, df, name):
    w = TableWriter(str(tmp_path / name), partition_col="part")
    w.write(df, mode="resume")
    return w


def test_zorder_prunes_on_both_columns(spark, grid, tmp_path):
    N_FILES = 16
    wz = _write(spark, tmp_path, zorder(grid, ["x", "y"], N_FILES), "z")
    # linear sort on x: perfect for x, useless for y
    wl = _write(
        spark, tmp_path,
        grid.repartitionByRange(N_FILES, "x").sortWithinPartitions("x"),
        "lin",
    )
    for w in (wz, wl):
        assert w.prune_files("x", None, None)["files_total"] == N_FILES

    # narrow x slice: both layouts prune
    zx = wz.prune_files("x", 0, 7)["files_kept"]
    lx = wl.prune_files("x", 0, 7)["files_kept"]
    assert zx <= N_FILES // 2 and lx <= N_FILES // 2
    # narrow y slice: only the z-ordered layout prunes
    zy = wz.prune_files("y", 0, 7)["files_kept"]
    ly = wl.prune_files("y", 0, 7)["files_kept"]
    assert ly == N_FILES  # linear layout: every file spans all of y
    assert zy <= N_FILES // 2
    # point-ish box on both dims: intersection skips even more
    assert wz.prune_files("x", 0, 7)["files_kept"] < N_FILES


def test_zorder_preserves_rows(spark, grid, tmp_path):
    w = _write(spark, tmp_path, zorder(grid, ["x", "y"], 8), "rows")
    got = w.read(spark)
    assert got.count() == 4096
    assert got.agg(F.sum("payload")).collect()[0][0] == 4096 * 4095 // 2


def test_zvalue_is_pure_catalyst(spark, grid):
    df = grid.withColumn("_z", zvalue({"x": (0, 63), "y": (0, 63)}, bits=6))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_zvalue_interleaves_bits():
    # hand-check on a tiny frame: (x=1, y=0) -> z=1; (0,1) -> 2; (1,1) -> 3;
    # (2,3) -> x bits 10, y bits 11 -> interleave y1 x1 y0 x0 = 1 1 1 0 = 14
    import pandas as pd

    from neuscraper_spark.session import get_spark

    spark = get_spark("tests")
    df = spark.createDataFrame(
        pd.DataFrame({"x": [1, 0, 1, 2], "y": [0, 1, 1, 3]})
    ).withColumn("_z", zvalue({"x": (0, 3), "y": (0, 3)}, bits=2))
    got = [r["_z"] for r in df.collect()]
    assert got == [1, 2, 3, 14]


def test_nulls_and_constant_columns(spark):
    df = spark.createDataFrame(
        [(None, 5, "p"), (1, 5, "p"), (2, 5, "p")],
        "x int, y int, part string",
    )
    out = zorder(df, ["x", "y"], 2)
    assert out.count() == 3  # null x lands in bucket 0, nothing dropped


def test_compact_with_zorder_layout(spark, grid, tmp_path):
    """OPTIMIZE ZORDER as table maintenance: an unclustered table gets
    rewritten into Z-curve slices by compact(layout_cols=...), and file
    skipping starts working on both columns."""
    from neuscraper_spark.sources.writer import _ranges_from_stats

    w = _write(spark, tmp_path, grid.repartition(4), "cz")  # unordered
    before = w.prune_files("y", 0, 7)["files_kept"]
    assert before == w.prune_files("y", 0, 7)["files_total"]  # no skipping
    snap = w.compact(spark, layout_cols=["x", "y"], target_files=16,
                     min_files=1)
    assert snap["layout_cols"] == ["x", "y"]
    assert w.read(spark).count() == 4096
    total = w.prune_files("x", None, None)["files_total"]
    assert total > 4
    assert w.prune_files("x", 0, 7)["files_kept"] <= total // 2
    assert w.prune_files("y", 0, 7)["files_kept"] <= total // 2
    # the curve's min/max came from manifest stats — no extra scan needed
    assert _ranges_from_stats(w.partition_metrics()["p0"], ["x", "y"]) == {
        "x": (0, 63), "y": (0, 63)
    }


def test_ranges_from_stats_falls_back_on_non_numeric():
    from neuscraper_spark.sources.writer import _ranges_from_stats

    manifest = {"lineage": {"files": [
        {"stats": {"x": {"min": 0, "max": 9}, "s": {"min": "a", "max": "z"}}},
    ]}}
    assert _ranges_from_stats(manifest, ["x"]) == {"x": (0, 9)}
    assert _ranges_from_stats(manifest, ["x", "s"]) is None
    assert _ranges_from_stats(manifest, ["x", "missing"]) is None
    assert _ranges_from_stats({"lineage": {"files": []}}, ["x"]) is None


def test_stats_override_skips_scan(spark, grid):
    stats = column_ranges(grid, ["x", "y"])
    assert stats["x"] == (0.0, 63.0) and stats["y"] == (0.0, 63.0)
    out = zorder(grid, ["x", "y"], 4, stats=stats)
    assert out.count() == 4096
    with pytest.raises(ValueError, match="missing"):
        zorder(grid, ["x", "y"], 4, stats={"x": (0, 1)})
    with pytest.raises(ValueError, match=">= 2"):
        zorder(grid, ["x"], 4)
