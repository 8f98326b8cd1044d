"""Per-conversation stateful operators (grouped-map applyInPandas) and
skew-safe aggregation.

- ``with_conversation_context``: the cross-turn analog of the
  HierarchicalChunker heading stack (C1): each turn inherits the active
  title/section heading from earlier turns of the same conversation. The
  level-aware stack semantics need sequential state per conversation →
  ``applyInPandas`` partitioned by conv_id (never crossing conv boundaries,
  SURVEY.md §7 "what's hard" #2).
- ``salted_agg``: two-phase aggregation for skewed keys. A groupBy(conv_id)
  over a corpus with 10^6-turn whale conversations pins one reducer; salting
  splits each key into ``n_salts`` partial groups (map-side spread), then
  re-aggregates the partials — the classic explicit-salt pattern the north
  rule requires (AQE skew handling only covers joins, not aggregations).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from doc_parser_spark.datamodel import LABEL_SECTION_HEADER, LABEL_TITLE

CONTEXT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("active_title", T.StringType(), True),
        T.StructField("active_section", T.StringType(), True),
    ]
)


def with_conversation_context(extracted: DataFrame) -> DataFrame:
    """For each turn: the active heading stack carried from prior turns.

    A title span resets the stack; a section_header replaces the section
    level. Output one row per input turn (conv_id, turn_idx, active_title,
    active_section).
    """

    def per_conv(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("turn_idx")
        title = None
        section = None
        out_title, out_section = [], []
        for text, spans in zip(pdf["extracted_text"], pdf["spans"]):
            if spans is not None and text is not None:
                for s in spans:
                    if s["label"] == LABEL_TITLE:
                        title = text[s["start"] : s["end"]]
                        section = None
                    elif s["label"] == LABEL_SECTION_HEADER:
                        section = text[s["start"] : s["end"]]
            out_title.append(title)
            out_section.append(section)
        return pd.DataFrame(
            {
                "conv_id": pdf["conv_id"],
                "turn_idx": pdf["turn_idx"].astype("int32"),
                "active_title": out_title,
                "active_section": out_section,
            }
        )

    return extracted.groupBy("conv_id").applyInPandas(
        per_conv, schema=CONTEXT_SCHEMA
    )


def salted_agg(
    df: DataFrame,
    key: str,
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    aggs: {out_name: (fn, col)} with fn in {"count", "sum", "min", "max"}.
    Phase 1 groups by (key, salt) — the whale key's rows spread over
    ``n_salts`` reducers; phase 2 re-aggregates partials by key. Both phases
    get map-side combine from Spark's partial aggregation.
    """
    phase1 = []
    phase2 = []
    for name, (fn, col) in aggs.items():
        if fn == "count":
            phase1.append(F.count("*").alias(f"_p_{name}"))
            phase2.append(F.sum(f"_p_{name}").alias(name))
        elif fn == "sum":
            phase1.append(F.sum(col).alias(f"_p_{name}"))
            phase2.append(F.sum(f"_p_{name}").alias(name))
        elif fn == "min":
            phase1.append(F.min(col).alias(f"_p_{name}"))
            phase2.append(F.min(f"_p_{name}").alias(name))
        elif fn == "max":
            phase1.append(F.max(col).alias(f"_p_{name}"))
            phase2.append(F.max(f"_p_{name}").alias(name))
        else:
            raise ValueError(f"unsupported agg fn {fn}")
    return (
        df.withColumn(
            "_salt",
            F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts)),
        )
        .groupBy(key, "_salt")
        .agg(*phase1)
        .groupBy(key)
        .agg(*phase2)
    )
