"""End-to-end extraction job: read → sniff → route → extract → write,
with per-bucket metrics, a commit manifest, and idempotent resume.

North-rule requirements covered here:
- explicit partitioning on ``hash(conv_id)`` buckets (Iceberg bucket analog;
  ``bucket_id = pmod(xxhash64(conv_id), n_buckets)``);
- checkpointing: every completed bucket gets a manifest row with lineage
  (job_run_id) and metrics (docs parsed, bytes, parse failures, wall);
- idempotent resume: a rerun anti-joins the manifest and only processes
  buckets without a committed manifest row;
- stable (conv_id, turn_idx) ordering within each written bucket.

At cluster scale the parquet writes become Iceberg table appends; the
manifest becomes an Iceberg snapshot/summary — the control flow is identical.
"""

from __future__ import annotations

import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from doc_parser_spark.operators.extract import bucket_id, extract_turns

DEFAULT_BUCKETS = 64


def _manifest_path(output_path: str) -> str:
    return os.path.join(output_path, "_manifest")


def _metrics_path(output_path: str) -> str:
    return os.path.join(output_path, "_metrics")


def completed_buckets(spark: SparkSession, output_path: str) -> DataFrame | None:
    """Read the commit manifest if it exists → DataFrame[bucket_id]."""
    path = _manifest_path(output_path)
    try:
        return spark.read.parquet(path).select("partition_id").distinct()
    except Exception:
        return None


def run_extraction_job(
    spark: SparkSession,
    transcripts: DataFrame,
    output_path: str,
    n_buckets: int = DEFAULT_BUCKETS,
    boilerplate_mode: str = "reference",
    job_run_id: str | None = None,
    resume: bool = True,
    route_partitions: int | None = None,
) -> dict:
    """Run the full pipeline; returns a summary dict (rows, buckets, wall_s)."""
    job_run_id = job_run_id or uuid.uuid4().hex[:12]
    t0 = time.perf_counter()

    work = transcripts.withColumn("bucket_id", bucket_id("conv_id", n_buckets))

    if resume:
        done = completed_buckets(spark, output_path)
        if done is not None:
            # manifest is tiny (≤ n_buckets rows) → broadcast anti-join,
            # no shuffle of the big side
            work = work.join(
                F.broadcast(done.withColumnRenamed("partition_id", "bucket_id")),
                on="bucket_id",
                how="left_anti",
            )

    extracted = extract_turns(
        work,
        boilerplate_mode=boilerplate_mode,
        route_partitions=route_partitions,
        keep_metrics_cols=True,
    ).withColumn("bucket_id", bucket_id("conv_id", n_buckets))

    # one shuffle: cluster rows by storage bucket, stable order within files
    final = (
        extracted.repartition(F.col("bucket_id"))
        .sortWithinPartitions("conv_id", "turn_idx")
        .cache()
    )

    out_rows = final.count()
    if out_rows > 0:
        (
            final.drop("_n_bytes", "_proc_us")
            .write.mode("append")
            .partitionBy("bucket_id")
            .parquet(os.path.join(output_path, "extracted"))
        )

        metrics = (
            final.groupBy("bucket_id")
            .agg(
                F.count("*").alias("docs_parsed"),
                F.sum("_n_bytes").alias("bytes_processed"),
                F.sum(
                    F.when(F.col("parse_status") == "failure", 1).otherwise(0)
                ).alias("parse_failures"),
                (F.sum("_proc_us") / 1000).cast("long").alias("wall_ms"),
            )
            .withColumn("job_run_id", F.lit(job_run_id))
            .withColumnRenamed("bucket_id", "partition_id")
        )
        metrics.write.mode("append").parquet(_metrics_path(output_path))
        # the manifest commit is the LAST step: a bucket is resumable-skipped
        # only after its data + metrics are durably written
        metrics.select("partition_id", "job_run_id").write.mode("append").parquet(
            _manifest_path(output_path)
        )

    final.unpersist()
    wall_s = time.perf_counter() - t0
    return {
        "job_run_id": job_run_id,
        "rows": out_rows,
        "wall_s": wall_s,
        "turns_per_sec": out_rows / wall_s if wall_s > 0 else 0.0,
    }


def read_extracted(spark: SparkSession, output_path: str) -> DataFrame:
    return spark.read.parquet(os.path.join(output_path, "extracted"))


def read_metrics(spark: SparkSession, output_path: str) -> DataFrame:
    return spark.read.parquet(_metrics_path(output_path))
