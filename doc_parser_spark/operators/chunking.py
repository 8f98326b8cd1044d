"""Chunk-level Spark operators: extracted turns → token-budget chunks →
GenOSVectorMeta-shaped vector rows.

The chunking itself is row-local (a turn's item list lives in its ``spans``
column), so it runs inside mapInPandas with zero shuffle. The vector-meta
indices (i_chunk_on_doc / n_chunk_of_doc / ...) are window functions over
(conv_id, turn_idx) — the one place a shuffle is inherent, and it reuses the
extraction output's bucketing when written bucketed.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

CHUNK_ROWS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("chunk_idx", T.IntegerType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("headings", T.ArrayType(T.StringType()), True),
        T.StructField("n_tokens", T.IntegerType(), False),
        T.StructField("i_page", T.IntegerType(), True),
        T.StructField("e_page", T.IntegerType(), True),
    ]
)


def chunk_turns(extracted: DataFrame, max_tokens: int = 2000) -> DataFrame:
    """extracted rows (with spans) → one row per chunk.

    Items come from the spans column: (label, extracted_text[start:end]).
    """
    from doc_parser_spark.functions.chunking import chunk_items

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for conv_id, turn_idx, text, spans in zip(
                pdf["conv_id"], pdf["turn_idx"], pdf["extracted_text"], pdf["spans"]
            ):
                if text is None or spans is None or len(spans) == 0:
                    continue
                items = [
                    (s["label"], text[s["start"] : s["end"]]) for s in spans
                ]
                pages = [int(s["page"]) for s in spans]
                for ci, chunk in enumerate(chunk_items(items, max_tokens)):
                    # per-chunk page bounds from the chunk's OWN items
                    # (preprocessor.py:294-331), not the whole turn
                    own = [pages[j] for j in chunk.item_indices] or pages
                    rows.append(
                        (
                            conv_id,
                            int(turn_idx),
                            ci,
                            chunk.text,
                            chunk.headings,
                            chunk.n_tokens,
                            min(own),
                            max(own),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "conv_id", "turn_idx", "chunk_idx", "text", "headings",
                    "n_tokens", "i_page", "e_page",
                ],
            ).astype(
                {
                    "turn_idx": "int32", "chunk_idx": "int32",
                    "n_tokens": "int32", "i_page": "int32", "e_page": "int32",
                }
            )

    return extracted.mapInPandas(gen, schema=CHUNK_ROWS_SCHEMA)


def compose_vectors(chunks: DataFrame) -> DataFrame:
    """GenOSVectorMeta projection (src/preprocessor.py:266-338 semantics):
    n_char/n_word/n_line per chunk; i_chunk_on_page resets per turn ("page");
    i_chunk_on_doc runs over the conversation; n_* counts via windows."""
    w_doc = Window.partitionBy("conv_id").orderBy("turn_idx", "chunk_idx")
    w_doc_all = Window.partitionBy("conv_id")
    w_page = Window.partitionBy("conv_id", "turn_idx").orderBy("chunk_idx")
    w_page_all = Window.partitionBy("conv_id", "turn_idx")
    return chunks.select(
        "conv_id",
        "turn_idx",
        "text",
        "headings",
        F.length("text").cast("int").alias("n_char"),
        F.size(F.split(F.col("text"), " ")).cast("int").alias("n_word"),
        F.size(F.split(F.col("text"), "\n")).cast("int").alias("n_line"),
        F.col("i_page"),
        F.col("e_page"),
        (F.row_number().over(w_page) - 1).cast("int").alias("i_chunk_on_page"),
        F.count("*").over(w_page_all).cast("int").alias("n_chunk_of_page"),
        (F.row_number().over(w_doc) - 1).cast("int").alias("i_chunk_on_doc"),
        F.count("*").over(w_doc_all).cast("int").alias("n_chunk_of_doc"),
        F.max("turn_idx").over(w_doc_all).cast("int").alias("n_page"),
        # title = first heading seen in the conversation (the portable part
        # of E4 metadata enrichment: facade/intelligent_processor.py:1253-1257)
        F.first(
            F.when(F.size("headings") > 0, F.element_at("headings", 1)),
            ignorenulls=True,
        ).over(
            Window.partitionBy("conv_id")
            .orderBy("turn_idx", "chunk_idx")
            .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("title"),
    )
