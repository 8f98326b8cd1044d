"""Training-data curation pipeline: the composition story.

extract → quality gate → exact dedup → near-dup (MinHash-LSH) removal →
token-budget chunking → vector metadata. Every stage is one of the repo's
operators; this plan wires them the way a 100 TB pretraining-data job would:

- the quality gate runs BEFORE any dedup join (cheap filter first — shrinks
  both join sides);
- exact dedup is a hash aggregate on md5(extracted_text) — map-side combine,
  one narrow shuffle;
- near-dup removal joins constant-size LSH bucket keys, never payload text;
  survivors = the smallest turn uid of each near-dup cluster (greedy by id,
  deterministic);
- chunking is row-local; the only remaining shuffles are the GenOSVectorMeta
  index windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from doc_parser_spark.datamodel import STATUS_PARTIAL, STATUS_SUCCESS
from doc_parser_spark.operators.chunking import chunk_turns, compose_vectors
from doc_parser_spark.operators.dedup import exact_dedup, lsh_candidate_pairs
from doc_parser_spark.operators.extract import extract_turns


def run_curation(
    spark: SparkSession,
    transcripts: DataFrame,
    min_quality: float = 0.5,
    near_dup_jaccard: float = 0.7,
    max_tokens: int = 2000,
    boilerplate_mode: str = "reference",
) -> tuple[DataFrame, dict]:
    """Returns (vectors DataFrame, per-stage row counts)."""
    stats: dict[str, int] = {}

    extracted = extract_turns(transcripts, boilerplate_mode=boilerplate_mode)
    extracted = extracted.withColumn(
        "uid", F.concat_ws("#", "conv_id", F.col("turn_idx").cast("string"))
    ).cache()
    stats["extracted"] = extracted.count()

    # 1. quality gate: parse succeeded, non-empty, not glyph garbage
    kept = extracted.where(
        F.col("parse_status").isin(STATUS_SUCCESS, STATUS_PARTIAL)
        & (F.col("n_char") > 0)
        & (F.coalesce(F.col("parse_score"), F.lit(0.0)) >= min_quality)
    )
    stats["quality_kept"] = kept.count()

    # 2. exact dedup on the extracted main text
    deduped = exact_dedup(kept, "uid", "extracted_text").where("keep").drop(
        "keep", "doc_hash"
    )
    stats["exact_unique"] = deduped.count()

    # 3. near-dup removal: LSH candidates → verified pairs → drop the larger
    # uid of every pair (greedy, deterministic)
    # 8 bands × 1 row: candidate probability 1-(1-j)^8 ≈ 1.0 for j ≥ 0.5 —
    # high recall for a dedup pass (false candidates are killed by the exact
    # Jaccard verification inside lsh_candidate_pairs)
    pairs = lsh_candidate_pairs(
        deduped, "uid", "extracted_text", threshold=near_dup_jaccard,
        k=8, bands=8,
    )
    # no broadcast hint: the loser set can be corpus-sized on dup-heavy
    # data — AQE picks broadcast when it actually fits
    losers = pairs.select(F.col("b_id").alias("uid")).distinct()
    survivors = deduped.join(losers, "uid", "left_anti")
    stats["near_dup_unique"] = survivors.count()

    # 4. chunk + vector metadata
    chunks = chunk_turns(survivors, max_tokens=max_tokens)
    vectors = compose_vectors(chunks)
    stats["vectors"] = vectors.count()

    extracted.unpersist()
    return vectors, stats
