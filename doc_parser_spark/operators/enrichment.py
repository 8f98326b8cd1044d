"""Document-enrichment operators: TOC match-back (the portable half of E4).

The reference reconstructs a table of contents with an LLM and then fuzzily
matches the entries back onto document text items
(docling/utils/document_enrichment.py:685-760 — sequential greedy
assignment in TOC order: each entry takes the highest-similarity unmatched
candidate above threshold 0.5, where similarity is the max of
full-line and title-only ratios). ``functions/toc.py`` is the exact
difflib port used on real documents; THIS module is the distributed form:
the same sequential allocation as a bounded number of DataFrame rounds
(one per TOC rank), with levenshtein-ratio similarity — a built-in on both
Spark and DuckDB, making the whole operator exactly oracle-checkable.

Scale shape: every round is a hash join + max_by aggregate on doc_id with
constant-width rows (TOC entries per doc and candidates per doc are small
by construction); the number of shuffle rounds is the max TOC rank, fixed
at plan time, independent of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Lineage-truncation cadence for the sequential allocation loop: small
# contract TOCs (max_rank ≤ 8) never checkpoint, so oracle-checked plans
# are untouched; a large real TOC truncates before plan depth compounds.
_CHECKPOINT_EVERY = 8


def toc_match_back(
    toc: DataFrame,
    candidates: DataFrame,
    max_rank: int,
) -> DataFrame:
    """Sequential greedy TOC→candidate assignment, reference semantics
    (document_enrichment.py:724-757) with levenshtein-ratio similarity.

    ``toc``: (doc_id, toc_i, toc_title, toc_full) with toc_i in
    1..max_rank; ``candidates``: (doc_id, cand_j, cand_text). Entries
    allocate in toc_i order; each takes the unmatched candidate with the
    highest max(sim(full), sim(title)), ties to the smallest cand_j. The
    0.5 threshold is evaluated in INTEGER arithmetic
    (2·lev ≤ max(len, len)) so both engines agree bit-for-bit.

    Returns (doc_id, toc_i, cand_j, lev_full, lev_title, cand_text).
    """

    def ratio(lev, la, lb):
        return F.lit(1.0) - lev / F.greatest(la, lb, F.lit(1)).cast("double")

    out: DataFrame | None = None
    remaining = candidates
    for rank in range(1, max_rank + 1):
        t = toc.where(F.col("toc_i") == rank)
        scored = (
            remaining.join(t, "doc_id")
            .withColumn("lev_full", F.levenshtein("toc_full", "cand_text"))
            .withColumn("lev_title", F.levenshtein("toc_title", "cand_text"))
            .withColumn("len_c", F.length("cand_text"))
            .withColumn(
                "sim",
                F.greatest(
                    ratio(F.col("lev_full"), F.length("toc_full"),
                          F.col("len_c")),
                    ratio(F.col("lev_title"), F.length("toc_title"),
                          F.col("len_c")),
                ),
            )
            .where(
                (2 * F.col("lev_full")
                 <= F.greatest(F.length("toc_full"), F.col("len_c")))
                | (2 * F.col("lev_title")
                   <= F.greatest(F.length("toc_title"), F.col("len_c")))
            )
        )
        pick = scored.groupBy("doc_id").agg(
            F.max_by(
                F.struct("toc_i", "cand_j", "lev_full", "lev_title",
                         "cand_text"),
                # highest similarity first, then smallest candidate index
                F.struct(F.col("sim"), (-F.col("cand_j")).alias("nj")),
            ).alias("m")
        ).select("doc_id", "m.*")
        out = pick if out is None else out.unionByName(pick)
        remaining = remaining.join(
            pick.select("doc_id", "cand_j"), ["doc_id", "cand_j"],
            "left_anti",
        )
        # round i's `remaining` nests all i-1 prior join+agg plans, so
        # unchecked lineage grows O(max_rank²); truncate it periodically
        # (same shape as connected_components' per-round localCheckpoint).
        if rank % _CHECKPOINT_EVERY == 0 and rank < max_rank:
            remaining = remaining.localCheckpoint(eager=True)
    assert out is not None
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("toc_i").cast("int").alias("toc_i"),
        F.col("cand_j").cast("int").alias("cand_j"),
        F.col("lev_full").cast("int").alias("lev_full"),
        F.col("lev_title").cast("int").alias("lev_title"),
        "cand_text",
    )
