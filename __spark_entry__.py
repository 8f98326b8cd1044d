"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship extraction pipeline; ``queries``/``oracle_sql``
expose one entry per implemented operator from SURVEY.md §2, verified
against DuckDB at sf=0.01 by the driver.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SF_DEFAULT = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full transcript extraction over a mixed-payload corpus
    derived deterministically from the sf0.001 documents table.

    documents → transcripts(conv_id, turn_idx, text) with HTML / PDF-ish /
    plain / empty payload classes → sniff → content-type routing →
    Arrow-batched main-content extraction with spans, status, quality.
    """
    from doc_parser_spark.operators.extract import extract_turns
    from doc_parser_spark.plans.driver_queries import PAYLOAD_SNIFF

    docs = spark.read.parquet(f"{SF_DEFAULT}/documents.parquet")
    transcripts = docs.select(
        F.concat(F.lit("conv-"), (F.col("doc_id") % 50).cast("string")).alias(
            "conv_id"
        ),
        (F.col("doc_id") / 50).cast("int").alias("turn_idx"),
        F.expr(PAYLOAD_SNIFF).alias("text"),
    )
    return extract_turns(transcripts, route_partitions=8)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from doc_parser_spark.plans.driver_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from doc_parser_spark.plans.driver_queries import ORACLES

    return dict(ORACLES)
