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

Scale shape: ONE pass over the input — extraction rows stream from the
routing shuffle through one bucket-clustering shuffle straight into the
parquet writer (no cache of the corpus; caching the output was the first
design and dies at 100 TB). Every row carries ``job_run_id`` / ``n_bytes_in``
/ ``proc_us`` lineage columns, so per-bucket metrics aggregate from the
(column-pruned) written files afterwards. At cluster scale the writes become
Iceberg appends and the manifest an Iceberg snapshot summary.
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


def _extracted_path(output_path: str) -> str:
    return os.path.join(output_path, "extracted")


def _read_manifest_meta(spark: SparkSession, output_path: str) -> int | None:
    """n_buckets recorded by prior runs (None if no manifest yet)."""
    try:
        row = spark.read.parquet(_manifest_path(output_path)).select(
            "n_buckets"
        ).first()
        return int(row[0]) if row else None
    except Exception:
        return None


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
    routing: str = "shuffle",
) -> dict:
    """Run the full pipeline; returns a summary dict (rows, wall_s, tps)."""
    job_run_id = job_run_id or uuid.uuid4().hex[:12]
    t0 = time.perf_counter()

    work = transcripts.withColumn("bucket_id", bucket_id("conv_id", n_buckets))

    if resume:
        # resume across runs is only sound with a stable bucket function
        prior = _read_manifest_meta(spark, output_path)
        if prior is not None and prior != n_buckets:
            raise ValueError(
                f"output at {output_path} was written with n_buckets={prior}; "
                f"resume with the same value (got {n_buckets})"
            )
        done = completed_buckets(spark, output_path)
        if done is not None:
            # manifest is tiny (≤ n_buckets rows) → broadcast anti-join,
            # no shuffle of the big side
            work = work.join(
                F.broadcast(done.withColumnRenamed("partition_id", "bucket_id")),
                on="bucket_id",
                how="left_anti",
            )

    # routing="shuffle": one exchange on (content_type, conv_id, turn_idx)
    #   before the parse — content-homogeneous batches + whale salting.
    # routing="none": extract directly on scan partitions — the bucket
    #   write below is then the job's ONLY full exchange. Right when the
    #   source already yields well-sized splits (Iceberg) and payload mix
    #   within a split is acceptable; wrong when input files are few/skewed.
    extracted = (
        extract_turns(
            work,
            boilerplate_mode=boilerplate_mode,
            route_partitions=0 if routing == "none" else route_partitions,
            keep_metrics_cols=True,
        )
        .withColumnRenamed("_n_bytes", "n_bytes_in")
        .withColumnRenamed("_proc_us", "proc_us")
        .withColumn("bucket_id", bucket_id("conv_id", n_buckets))
        .withColumn("job_run_id", F.lit(job_run_id))
    )

    # single pass: cluster by storage bucket, stable order, write.
    # the sort MUST lead with bucket_id: the dynamic-partition writer
    # requires ordering by the partition columns and would otherwise insert
    # its own (non-stable) sort, destroying (conv_id, turn_idx) order
    (
        extracted.repartition(F.col("bucket_id"))
        .sortWithinPartitions("bucket_id", "conv_id", "turn_idx")
        .write.mode("append")
        .partitionBy("bucket_id")
        .parquet(_extracted_path(output_path))
    )

    # metrics from the written files, THIS run only (column-pruned scan of
    # the lineage columns; job_run_id rows are the run's lineage)
    written = spark.read.parquet(_extracted_path(output_path)).where(
        F.col("job_run_id") == job_run_id
    )
    metrics = (
        written.groupBy("bucket_id")
        .agg(
            F.count("*").alias("docs_parsed"),
            F.sum("n_bytes_in").alias("bytes_processed"),
            F.sum(
                F.when(F.col("parse_status") == "failure", 1).otherwise(0)
            ).alias("parse_failures"),
            (F.sum("proc_us") / 1000).cast("long").alias("wall_ms"),
        )
        .withColumn("job_run_id", F.lit(job_run_id))
        .withColumnRenamed("bucket_id", "partition_id")
    ).cache()
    out_rows = int(
        metrics.agg(F.coalesce(F.sum("docs_parsed"), F.lit(0))).first()[0]
    )
    if out_rows > 0:
        metrics.write.mode("append").parquet(_metrics_path(output_path))
        # the manifest commit is the LAST step: a bucket is resumable-skipped
        # only after its data + metrics are durably written
        metrics.select("partition_id", "job_run_id").withColumn(
            "n_buckets", F.lit(n_buckets)
        ).write.mode("append").parquet(_manifest_path(output_path))
    metrics.unpersist()

    wall_s = time.perf_counter() - t0
    return {
        "job_run_id": job_run_id,
        "rows": out_rows,
        "wall_s": wall_s,
        "turns_per_sec": out_rows / wall_s if wall_s > 0 else 0.0,
    }


def read_extracted(spark: SparkSession, output_path: str) -> DataFrame:
    """Committed rows only. Data lands in extracted/ BEFORE the manifest
    commit, so a crash between the two leaves orphan rows that the resumed
    run re-emits under a new job_run_id — reading raw files would double
    those buckets. The manifest's (partition_id, job_run_id) pairs are the
    commit log; a broadcast semi-join filters to them (manifest ≤ a few rows
    per bucket — no shuffle of the big side)."""
    df = spark.read.parquet(_extracted_path(output_path))
    try:
        committed = (
            spark.read.parquet(_manifest_path(output_path))
            .select(F.col("partition_id").alias("bucket_id"), "job_run_id")
            .distinct()
        )
    except Exception:
        # no manifest → nothing was ever committed
        return df.where(F.lit(False))
    return df.join(
        F.broadcast(committed), ["bucket_id", "job_run_id"], "left_semi"
    )


def read_metrics(spark: SparkSession, output_path: str) -> DataFrame:
    return spark.read.parquet(_metrics_path(output_path))


def main(argv: list[str] | None = None) -> None:
    """spark-submit entry point:

        spark-submit --py-files pipeline.zip -m doc_parser_spark.plans.pipeline \\
            --input /path/or/table --output /out [--buckets 256] \\
            [--boilerplate reference|density] [--routing shuffle|none]
    """
    import argparse

    from doc_parser_spark.session import get_spark
    from doc_parser_spark.sources.iceberg import read_transcripts

    ap = argparse.ArgumentParser(description="transcript extraction job")
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--buckets", type=int, default=DEFAULT_BUCKETS)
    ap.add_argument("--boilerplate", default="reference",
                    choices=["reference", "density"])
    ap.add_argument("--routing", default="shuffle", choices=["shuffle", "none"])
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--job-run-id", default=None)
    args = ap.parse_args(argv)

    spark = get_spark(app_name="doc_parser_spark.extract")
    transcripts = read_transcripts(spark, args.input)
    summary = run_extraction_job(
        spark,
        transcripts,
        args.output,
        n_buckets=args.buckets,
        boilerplate_mode=args.boilerplate,
        job_run_id=args.job_run_id,
        resume=not args.no_resume,
        routing=args.routing,
    )
    print(summary)
    spark.stop()


if __name__ == "__main__":
    main()


def write_bucketed_table(
    df, table: str, key: str, n_buckets: int, sort: bool = True
) -> None:
    """Catalog-backed bucketed write (the real form of this pipeline's
    ``bucket_id`` partition-column analog): ``bucketBy(key)`` +
    ``sortBy(key)`` + ``saveAsTable``. Two tables written this way with
    the SAME key and bucket count join with ZERO exchanges AND zero
    sorts — the co-located SortMergeJoin reads pre-bucketed, pre-sorted
    files on both sides (verified: tests/test_bucketed_join.py). At
    100 TB this converts every recurring join/agg on the bucket key
    (conversation reassembly, per-conv dedup, turn lookups) from a full
    shuffle into a metadata decision — the biggest single lever a
    storage layout owns. The parquet-path pipeline keeps the
    ``bucket_id`` column analog because plain-path reads can't consume
    bucket metadata; on a catalog deployment (Iceberg/Hive), this is
    the write to use."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)
