"""Z-order layout (operators/layout.py): bit-exactness vs a python
reference, and the actual data-skipping claim — a z-ordered layout's
per-file min/max boxes must prune BOTH indexed columns, where a
single-column sort prunes only its own."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from doc_parser_spark.operators.layout import zorder_layout, zorder_value


def _grid(spark, n=32):
    # full n×n grid: uniform 2-D mass, the textbook z-order case
    rows = [(y * n + x, x, y) for x in range(n) for y in range(n)]
    return spark.createDataFrame(rows, ["id", "x", "y"])


class TestZValue:
    def test_bit_exact_vs_reference(self, spark):
        df = spark.createDataFrame(
            [(i, (i * 37) % 100, (i * 11) % 50) for i in range(200)],
            ["id", "x", "y"],
        )
        got = {
            r["id"]: r["zvalue"]
            for r in zorder_value(df, ["x", "y"], bits=8).collect()
        }
        xs = [(i * 37) % 100 for i in range(200)]
        ys = [(i * 11) % 50 for i in range(200)]

        def scale(v, lo, hi):
            return (v - lo) * 255 // (hi - lo)

        for i in range(200):
            sx = scale(xs[i], min(xs), max(xs))
            sy = scale(ys[i], min(ys), max(ys))
            want = sum(
                (((sx >> b) & 1) << (2 * b)) + (((sy >> b) & 1) << (2 * b + 1))
                for b in range(8)
            )
            assert got[i] == want

    def test_constant_column_contributes_zero(self, spark):
        df = spark.createDataFrame(
            [(i, i, 7) for i in range(16)], ["id", "x", "y"]
        )
        out = zorder_value(df, ["x", "y"], bits=4).collect()
        # y is constant → scaled 0 → z is x's bits spread to even positions
        for r in out:
            sx = r["x"] * 15 // 15
            want = sum(((sx >> b) & 1) << (2 * b) for b in range(4))
            assert r["zvalue"] == want

    def test_overflow_guard(self, spark):
        df = spark.createDataFrame([(1, 2, 3, 4)], ["a", "b", "c", "d"])
        with pytest.raises(ValueError):
            zorder_value(df, ["a", "b", "c", "d"], bits=16)


class TestSkipping:
    def _file_boxes(self, laid_out):
        return (
            laid_out.withColumn("pid", F.spark_partition_id())
            .groupBy("pid")
            .agg(
                F.min("x").alias("x0"), F.max("x").alias("x1"),
                F.min("y").alias("y0"), F.max("y").alias("y1"),
            )
            .collect()
        )

    def test_zorder_prunes_both_axes(self, spark):
        df = _grid(spark, 32)
        n_files = 16
        z_boxes = self._file_boxes(zorder_layout(df, ["x", "y"], n_files))
        x_boxes = self._file_boxes(
            df.repartitionByRange(n_files, "x").sortWithinPartitions("x")
        )

        def touched(boxes, col, v):
            lo, hi = (1, 2) if col == "x" else (3, 4)
            return sum(1 for b in boxes if b[lo] <= v <= b[hi])

        # predicate x = 5: both layouts prune well on x
        assert touched(z_boxes, "x", 5) <= n_files // 2
        assert touched(x_boxes, "x", 5) <= 2
        # predicate y = 5: the x-sorted layout reads EVERY file; z-order
        # must skip at least half
        assert touched(x_boxes, "y", 5) == len(x_boxes)
        assert touched(z_boxes, "y", 5) <= n_files // 2

        # per-axis extent (area is a wash on a uniform grid — equal row
        # counts give equal areas; the SHAPE is what prunes): z-order's
        # square tiles bound y tightly, the x-sort's stripes span all of y
        def avg_y_extent(boxes):
            return sum(b[4] - b[3] + 1 for b in boxes) / len(boxes)

        assert avg_y_extent(z_boxes) < avg_y_extent(x_boxes) / 2
