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
  index windows;
- per-stage row counts ride the SINGLE terminal action as CollectMetrics
  (``df.observe``) nodes — no eager ``.count()`` jobs re-traversing the
  lineage (at 100 TB each such job re-runs memory-pressured stages).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from doc_parser_spark.datamodel import STATUS_PARTIAL, STATUS_SUCCESS
from doc_parser_spark.operators.chunking import chunk_turns, compose_vectors
from doc_parser_spark.operators.dedup import exact_dedup, lsh_candidate_pairs
from doc_parser_spark.operators.extract import extract_turns

_STAGES = ("extracted", "quality_kept", "exact_unique", "near_dup_unique",
           "vectors")


class CurationStats(dict):
    """Per-stage row counts, collected from the plan's CollectMetrics nodes
    by whatever action the CALLER runs on the returned vectors DataFrame
    (normally the one real write). If the stats are read before any action
    has run, ONE fallback count() fires and fills every stage at once —
    the worst case is one extra job, never five.

    ``unpersist()`` releases every plan-level cached intermediate — the
    dedup-survivor fork points AND lsh_candidate_pairs' internal bucket
    cache (exposed via the pair frame's ``_lsh_bucket_cache`` handle) — so
    a long-lived ingest driver looping batches never depends on
    GC/ContextCleaner timing to reclaim cached blocks."""

    def __init__(self, vectors: DataFrame, observations: dict[str, Observation],
                 cached):
        super().__init__()
        self._vectors = vectors
        self._observations = observations
        self._cached = tuple(
            df
            for df in (
                (cached,) if isinstance(cached, DataFrame) else tuple(cached)
            )
            if df is not None
        )
        self._filled = False

    def _fill(self) -> None:
        if self._filled:
            return
        # probe the "vectors" observation BY NAME (it belongs to the frame
        # ``self._vectors`` the fallback count runs on): in curate_ingest an
        # action on the novel_index BRANCH fires the upstream observations
        # but never the vectors one — probing the first would then block
        # forever on obs.get below, and probing "whatever was inserted
        # last" would silently break if a later stage were ever observed
        # after vectors (round-7 ADVICE).
        last = self._observations.get(
            "vectors", list(self._observations.values())[-1]
        )
        try:
            action_ran = not last._jo.getOrEmpty().isEmpty()
        except Exception:  # private-API drift → safe fallback
            action_ran = False
        if not action_ran:
            self._vectors.count()
        for name, obs in self._observations.items():
            super().__setitem__(name, int(obs.get["count"]))
        self._filled = True

    def unpersist(self) -> None:
        for df in self._cached:
            df.unpersist()

    def __getitem__(self, key):
        self._fill()
        return super().__getitem__(key)

    def __contains__(self, key):
        self._fill()
        return super().__contains__(key)

    def __iter__(self):
        self._fill()
        return super().__iter__()

    def __len__(self):
        self._fill()
        return super().__len__()

    def keys(self):
        self._fill()
        return super().keys()

    def items(self):
        self._fill()
        return super().items()

    def values(self):
        self._fill()
        return super().values()

    # dict's C-level read paths bypass __getitem__ — each must fill first,
    # or e.g. stats.get("extracted") before the first action silently
    # returns None instead of the count.
    def get(self, key, default=None):
        self._fill()
        return super().get(key, default)

    def __eq__(self, other):
        self._fill()
        return dict.__eq__(dict(self.items()), other)

    def __ne__(self, other):
        # dict.__eq__ returns NotImplemented for non-dict others; `not
        # NotImplemented` is a TypeError on Python 3.12+ — propagate it
        # so the interpreter falls back to identity comparison.
        r = self.__eq__(other)
        return r if r is NotImplemented else not r

    __hash__ = None  # mutable mapping, same as dict

    def copy(self):
        self._fill()
        return dict(super().items())

    def pop(self, key, *default):
        self._fill()
        return super().pop(key, *default)

    def popitem(self):
        self._fill()
        return super().popitem()

    def setdefault(self, key, default=None):
        self._fill()
        return super().setdefault(key, default)

    def __repr__(self):
        self._fill()
        return dict.__repr__(self)


def _observe(df: DataFrame, obs_map: dict[str, Observation],
             name: str) -> DataFrame:
    obs = Observation(f"curation_{name}")
    obs_map[name] = obs
    return df.observe(obs, F.count(F.lit(1)).alias("count"))


def run_curation(
    spark: SparkSession,
    transcripts: DataFrame,
    min_quality: float = 0.5,
    near_dup_jaccard: float = 0.7,
    max_tokens: int = 2000,
    boilerplate_mode: str = "reference",
    lsh_max_bucket: int | None = 1000,
) -> tuple[DataFrame, CurationStats]:
    """Returns (vectors DataFrame, per-stage row counts).

    The stats dict is lazy: counts materialize from observe() metrics when
    the caller's first action on ``vectors`` runs (or on first stats access,
    via one fallback count). Call ``stats.unpersist()`` after the terminal
    write to release the cached dedup intermediate."""
    observations: dict[str, Observation] = {}

    # 1. extract + quality gate (parse succeeded, non-empty, not glyph
    # garbage) — shared with the indexed ingest path below
    kept = _extract_gate(
        transcripts, observations, min_quality, boilerplate_mode
    )

    # 2. exact dedup on the extracted main text
    deduped = exact_dedup(kept, "uid", "extracted_text").where("keep").drop(
        "keep", "doc_hash"
    )
    deduped = _observe(deduped, observations, "exact_unique")
    # the LSH-pair branch and the survivor anti-join below BOTH consume
    # deduped inside the one terminal action — cache the fork point so
    # extraction + dedup don't run twice (caller releases via
    # stats.unpersist(); without an explicit release it ages out of the
    # executor block store under normal LRU)
    deduped = deduped.cache()

    # 3. near-dup removal: LSH candidates → verified pairs → drop the larger
    # uid of every pair (greedy, deterministic)
    # 8 bands × 1 row: candidate probability 1-(1-j)^8 ≈ 1.0 for j ≥ 0.5 —
    # high recall for a dedup pass (false candidates are killed by the exact
    # Jaccard verification inside lsh_candidate_pairs)
    # lsh_max_bucket: production guard against near-identical template
    # families (survive exact dedup, land m docs in one bucket per band →
    # m²/2 pairs); oversized buckets emit a Jaccard-verified star instead,
    # which keeps the loser set (everything but the min uid) identical for
    # a true family. No bucket in the contract corpora comes near the cap,
    # so oracle parity is unaffected.
    pairs = lsh_candidate_pairs(
        deduped, "uid", "extracted_text", threshold=near_dup_jaccard,
        k=8, bands=8, max_bucket=lsh_max_bucket,
    )
    # no broadcast hint: the loser set can be corpus-sized on dup-heavy
    # data — AQE picks broadcast when it actually fits
    losers = pairs.select(F.col("b_id").alias("uid")).distinct()
    survivors = deduped.join(losers, "uid", "left_anti")
    survivors = _observe(survivors, observations, "near_dup_unique")

    # 4. chunk + vector metadata
    chunks = chunk_turns(survivors, max_tokens=max_tokens)
    vectors = compose_vectors(chunks)
    vectors = _observe(vectors, observations, "vectors")

    return vectors, CurationStats(
        vectors,
        observations,
        (deduped, getattr(pairs, "_lsh_bucket_cache", None)),
    )


# ---------------------------------------------------------------------------
# Incremental (indexed) ingest — the production path for a STANDING corpus.
# run_curation re-clusters the whole input per run (right for a one-shot
# corpus build); at 100 TB the steady state is a standing corpus + arriving
# batches, where per-batch cost must be O(batch), never O(corpus). These two
# entry points wire operators/dedup.py's materialized-index form
# (dedup_index / dedup_incremental_indexed, round 6: 158 s -> 4.5 s per 5k
# batch vs a 1M corpus) into the curation plan.
# ---------------------------------------------------------------------------
def _extract_gate(
    transcripts: DataFrame,
    observations: dict[str, Observation],
    min_quality: float,
    boilerplate_mode: str,
) -> DataFrame:
    """Shared head of run_curation / build_curation_index / curate_ingest:
    extract -> uid -> quality gate (cheap filter first)."""
    extracted = extract_turns(transcripts, boilerplate_mode=boilerplate_mode)
    extracted = extracted.withColumn(
        "uid", F.concat_ws("#", "conv_id", F.col("turn_idx").cast("string"))
    )
    extracted = _observe(extracted, observations, "extracted")
    kept = extracted.where(
        F.col("parse_status").isin(STATUS_SUCCESS, STATUS_PARTIAL)
        & (F.col("n_char") > 0)
        & (F.coalesce(F.col("parse_score"), F.lit(0.0)) >= min_quality)
    )
    return _observe(kept, observations, "quality_kept")


def build_curation_index(
    spark: SparkSession,
    transcripts: DataFrame,
    min_quality: float = 0.5,
    boilerplate_mode: str = "reference",
    hashed: bool = True,
    k: int = 8,
    bands: int = 8,
    n: int = 3,
) -> DataFrame:
    """One-pass materialized dedup index over a corpus of transcripts:
    extract + quality gate, then ``dedup_index`` rows
    (uid, h, buckets, shingles) keyed by the turn uid. Write this ONCE per
    corpus; after that, ``curate_ingest`` batches never re-read corpus
    text. ``hashed=True`` (default — the at-scale setting) stores xxhash64
    shingle arrays: 8 bytes/shingle instead of the raw trigram strings.
    The (k, bands, n, hashed) parameters are part of the index's identity:
    pass the SAME values to every ``curate_ingest`` against it.

    ``bands=8`` (1 minhash row per band) matches run_curation's in-batch
    near-dup policy: candidate recall 1-(1-j)^8 ≈ 1.0 for j ≥ 0.7. The
    operator default (bands=2, rows=4) would silently cap vs-corpus
    candidate recall at ~42% for j = 0.7 — a near-dup admitted as novel
    is permanent, so the index pays 8 bucket rows/doc for parity with
    the one-shot path (bucket rows are constant-width; the shingle
    array, the index's real bulk, is unaffected)."""
    from doc_parser_spark.operators.dedup import dedup_index

    observations: dict[str, Observation] = {}
    kept = _extract_gate(
        transcripts, observations, min_quality, boilerplate_mode
    )
    return dedup_index(
        kept, "uid", "extracted_text", k=k, bands=bands, n=n, hashed=hashed
    )


def curate_ingest(
    spark: SparkSession,
    transcripts: DataFrame,
    corpus_index: DataFrame,
    min_quality: float = 0.5,
    near_dup_jaccard: float = 0.7,
    max_tokens: int = 2000,
    boilerplate_mode: str = "reference",
    lsh_max_bucket: int | None = 1000,
    hashed: bool = True,
    k: int = 8,
    bands: int = 8,
    n: int = 3,
    in_batch_bands: int = 8,
) -> tuple[DataFrame, DataFrame, CurationStats]:
    """Incremental curation ingest of ONE batch against a standing corpus
    index (``build_curation_index`` output, normally read back from
    parquet). Returns ``(vectors, novel_index_rows, stats)``:

    - ``vectors``: chunk + GenOSVectorMeta rows for the batch's NOVEL
      turns only (unique within the batch AND not exact/near dups of the
      indexed corpus);
    - ``novel_index_rows``: ``dedup_index`` rows for those turns — append
      them to the standing index after the batch's terminal write commits
      (append-only maintenance; exactly what
      streaming/stream.py::indexed_dedup_processor does per micro-batch,
      with batch_id bookkeeping for replay);
    - ``stats``: per-stage lazy counts (see run_curation).

    Cost shape: corpus text is NEVER read (only the index columns the
    plan touches); every join is batch-sized against index-shaped
    constant-width rows. Within-batch dedup runs first (batch-local,
    same policy as run_curation: exact, then 8-band LSH with the
    hot-bucket star cap), then one ``dedup_incremental_indexed``
    classification pass against the index.
    """
    from doc_parser_spark.operators.dedup import (
        dedup_incremental_indexed,
        dedup_index,
    )

    observations: dict[str, Observation] = {}
    kept = _extract_gate(
        transcripts, observations, min_quality, boilerplate_mode
    )

    # within-batch exact + near dedup (identical policy to run_curation)
    deduped = exact_dedup(kept, "uid", "extracted_text").where("keep").drop(
        "keep", "doc_hash"
    )
    deduped = _observe(deduped, observations, "exact_unique")
    deduped = deduped.cache()  # LSH-pair branch + anti-join fork point
    # n=n: the shingle size is part of the index identity — the in-batch
    # pass must shingle the same way as the vs-corpus classification
    # below (k stays pinned to run_curation's in-batch policy; see
    # build_curation_index's recall note). Round-7 ADVICE.
    # in_batch_bands (round-8 verdict #1): bands < k gives multi-row
    # banding (rows per band = k // bands) — e.g. bands=4 → r=2, which
    # cuts the r=1 candidate volume on vocabulary-sharing turns at
    # 1-(1-j^2)^4 recall (~0.93 at j=0.7, ~1.0 for template families —
    # measured in docs/SCALE.md round 8). Default 8 = the r=1 policy the
    # standing oracles pin.
    pairs = lsh_candidate_pairs(
        deduped, "uid", "extracted_text", threshold=near_dup_jaccard,
        k=8, bands=in_batch_bands, n=n, max_bucket=lsh_max_bucket,
    )
    losers = pairs.select(F.col("b_id").alias("uid")).distinct()
    survivors = deduped.join(losers, "uid", "left_anti")
    survivors = _observe(survivors, observations, "near_dup_unique")
    # fork point: consumed by the classification lineage AND the novels
    # semi-join — without the cache the in-batch LSH pipeline re-evaluates
    # per branch (the differing projections defeat ReuseExchange)
    survivors = survivors.cache()

    # vs-corpus classification: batch-sized joins against the index only.
    # cast_matched=None — uids are strings; ANSI mode would throw on the
    # default long cast (matched_old_id keeps the uid type).
    cls = dedup_incremental_indexed(
        survivors.select("uid", "extracted_text"), corpus_index,
        "uid", "extracted_text", threshold=near_dup_jaccard,
        k=k, bands=bands, n=n, hashed=hashed, cast_matched=None,
    )
    novels = survivors.join(
        cls.where("status = 'novel'").select("uid"), "uid", "semi"
    )
    novels = _observe(novels, observations, "novel")
    # consumed by BOTH chunk->vectors and the novel index rows
    novels = novels.cache()

    novel_index = dedup_index(
        novels, "uid", "extracted_text", k=k, bands=bands, n=n, hashed=hashed
    )

    chunks = chunk_turns(novels, max_tokens=max_tokens)
    vectors = compose_vectors(chunks)
    vectors = _observe(vectors, observations, "vectors")

    return vectors, novel_index, CurationStats(
        vectors,
        observations,
        (
            deduped,
            survivors,
            novels,
            getattr(pairs, "_lsh_bucket_cache", None),
        ),
    )
