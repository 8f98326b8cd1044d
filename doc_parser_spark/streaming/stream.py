"""Structured Streaming variants of the extraction pipeline.

The batch operators compose unchanged onto streaming DataFrames: the sniff
pandas UDF and the mapInPandas extraction are stateless per-row transforms,
so ``readStream → extract → writeStream`` is the whole job. Checkpointing is
Spark-native here (offsets + sink commit log) — the batch pipeline's manifest
(plans/pipeline.py) covers the batch path.

For event-time aggregation, ``turn_rate_stream`` shows the watermark +
tumbling-window pattern (late turns beyond the watermark are dropped).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from doc_parser_spark.datamodel import TRANSCRIPT_SCHEMA
from doc_parser_spark.operators.extract import extract_turns


def read_transcript_stream(spark: SparkSession, input_path: str) -> DataFrame:
    return (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_path)
    )


def extract_stream(
    transcripts: DataFrame, boilerplate_mode: str = "reference"
) -> DataFrame:
    """Streaming extraction: same operator as batch (no repartition — the
    micro-batch is already split by source files; a streaming shuffle would
    only add latency)."""
    return extract_turns(
        transcripts, boilerplate_mode=boilerplate_mode, route_partitions=0
    )


def run_stream_to_parquet(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    available_now: bool = True,
):
    """readStream → extract → parquet sink; availableNow drains the backlog
    and stops (the batch-parity mode used in tests and backfills)."""
    out = extract_stream(read_transcript_stream(spark, input_path))
    writer = (
        out.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def turn_rate_stream(
    transcripts: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Windowed event-time aggregation with late-data handling: turns per
    (window, role). Append-mode-compatible (watermarked)."""
    # group on window(...) itself — projecting .start inside the groupBy
    # severs the event-time/watermark link and append mode rejects the plan
    return (
        transcripts.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "role")
        .agg(F.count("*").alias("n_turns"))
        .select(
            F.col("window.start").alias("window_start"), "role", "n_turns"
        )
    )


def dedup_stream(
    extracted: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming exact dedup: drop turns whose extracted text hash was
    already seen within the watermark window. State stays bounded — a
    duplicate arriving later than the watermark is NOT caught (the batch
    exact_dedup pass is the complete backstop; this is the low-latency
    filter in front of it)."""
    hashed = extracted.withColumn(
        "doc_hash", F.md5(F.coalesce(F.col("extracted_text"), F.lit("")))
    )
    return hashed.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["doc_hash"]
    )
