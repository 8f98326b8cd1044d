"""Span operators — O3 interval merge on real extracted spans.

Port of merge_overlapping_bboxes (genos_utils.py:114-160): the reference does
a fixpoint union of overlapping same-page boxes; the relational analog is the
gaps-and-islands pattern over (conv_id, turn_idx, page)-partitioned char
intervals, which merges transitively in ONE pass (a sorted running-max is
the fixpoint).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merged_spans(extracted: DataFrame, pad: int = 0) -> DataFrame:
    """Explode spans → merge overlapping/adjacent (within ``pad`` chars)
    intervals per (conv_id, turn_idx, page) → one row per merged island.

    Output: conv_id, turn_idx, page, span_start, span_end, n_spans, labels.
    """
    ex = extracted.select(
        "conv_id", "turn_idx", F.explode("spans").alias("s")
    ).select(
        "conv_id",
        "turn_idx",
        F.col("s.page").alias("page"),
        F.col("s.start").alias("start"),
        F.col("s.end").alias("end"),
        F.col("s.label").alias("label"),
    )
    w = (
        Window.partitionBy("conv_id", "turn_idx", "page")
        .orderBy("start", "end")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = ex.withColumn(
        "new_island",
        F.when(
            F.col("start")
            > F.coalesce(F.max("end").over(w), F.lit(-(2**31))) + pad,
            1,
        ).otherwise(0),
    )
    w2 = (
        Window.partitionBy("conv_id", "turn_idx", "page")
        .orderBy("start", "end")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    islands = flagged.withColumn("island", F.sum("new_island").over(w2))
    return (
        islands.groupBy("conv_id", "turn_idx", "page", "island")
        .agg(
            F.min("start").alias("span_start"),
            F.max("end").alias("span_end"),
            F.count("*").alias("n_spans"),
            F.sort_array(F.collect_set("label")).alias("labels"),
        )
        .drop("island")
    )


def merge_bboxes_2d(
    df: DataFrame,
    group_cols: list[str],
    x_tolerance: float = 1.0,
    y_tolerance: float = 1.0,
) -> DataFrame:
    """True 2-D fixpoint bbox merge (merge_overlapping_bboxes,
    genos_utils.py:114-160) — the general case the 1-D ``merged_spans``
    cannot express, because merged boxes grow and can bridge boxes that
    never overlapped directly.

    df columns: group_cols + (page int, btype string, l, t, r, b double).
    Runs the exact python kernel per group via applyInPandas: a group is one
    document/page neighborhood (bounded box count — layout items per page),
    groups are many, so the stage shuffles once on the group key and is
    embarrassingly parallel; no driver-side collection.
    """
    import pandas as pd
    from pyspark.sql import types as T

    from doc_parser_spark.functions.bbox import merge_overlapping_bboxes

    out_schema = T.StructType(
        [df.schema[c] for c in group_cols]
        + [
            T.StructField("page", T.IntegerType()),
            T.StructField("btype", T.StringType()),
            T.StructField("l", T.DoubleType()),
            T.StructField("t", T.DoubleType()),
            T.StructField("r", T.DoubleType()),
            T.StructField("b", T.DoubleType()),
        ]
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        keys = {c: pdf[c].iloc[0] for c in group_cols}
        boxes = [
            {
                "page": int(row.page),
                "type": row.btype,
                "bbox": {"l": row.l, "t": row.t, "r": row.r, "b": row.b},
            }
            for row in pdf.itertuples()
        ]
        merged = merge_overlapping_bboxes(boxes, x_tolerance, y_tolerance)
        rows = [
            {
                **keys,
                "page": m["page"],
                "btype": m["type"],
                "l": m["bbox"]["l"],
                "t": m["bbox"]["t"],
                "r": m["bbox"]["r"],
                "b": m["bbox"]["b"],
            }
            for m in merged
        ]
        return pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return df.groupBy(*group_cols).applyInPandas(fn, out_schema)


def span_coverage(extracted: DataFrame) -> DataFrame:
    """Per-turn span stats: how much of extracted_text the spans cover —
    row-local (no shuffle): spans are disjoint by construction."""
    return extracted.select(
        "conv_id",
        "turn_idx",
        F.size("spans").alias("n_spans"),
        F.expr(
            "aggregate(spans, 0, (acc, s) -> acc + s.end - s.start)"
        ).alias("covered_chars"),
        F.length("extracted_text").alias("total_chars"),
    )
