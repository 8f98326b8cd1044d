"""Corpus-curation operators (operators/curation.py): benchmark
decontamination, deterministic stratified sampling, sequence packing.

Semantic properties beyond the DuckDB oracle gate (curate_* queries):
determinism across re-runs, the rate-1.0 threshold sentinel, packing
invariants (offset bounds, straddle flags, per-shard contiguity), and the
scale shape (broadcast on the benchmark side, no corpus-text shuffle).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from doc_parser_spark.operators.curation import (
    decontaminate_ngrams,
    pack_sequences,
    sample_threshold_hex,
    stratified_sample,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (1, "one two three four five six seven eight nine ten eleven"),
        (2, "totally unrelated words nothing shared with anything else here"),
        (3, "prefix words then alpha beta gamma delta epsilon zeta tail"),
        (4, "short text"),  # < n words: no 5-grams
        (5, "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestDecontaminate:
    def test_flags_overlap_and_spares_rest(self, spark, corpus):
        bench = corpus.where("doc_id = 0")
        out = {
            r["doc_id"]: (r["n_hits"], r["contaminated"])
            for r in decontaminate_ngrams(
                corpus, bench, "doc_id", "text", n=5
            ).collect()
        }
        assert len(out) == 6  # every corpus doc present, incl. the short one
        assert out[0][1] is True  # bench doc itself
        assert out[3][1] is True  # shares 'alpha beta gamma delta epsilon'+
        assert out[3][0] >= 2  # two shared 5-grams (sliding window)
        assert out[1] == (0, False)
        assert out[2] == (0, False)
        assert out[4] == (0, False)  # too short for any 5-gram

    def test_benchmark_side_is_broadcast(self, spark, corpus):
        plan = decontaminate_ngrams(
            corpus, corpus.limit(1), "doc_id", "text", n=5
        )._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan


class TestStratifiedSample:
    RATES = {"a": 0.5, "b": 1.0, "c": 0.0}

    @pytest.fixture(scope="class")
    def strata(self, spark):
        rows = [(i, "abc"[i % 3]) for i in range(300)]
        return spark.createDataFrame(rows, "doc_id long, stratum string")

    def test_rate_one_keeps_all_rate_zero_drops_all(self, spark, strata):
        out = stratified_sample(
            strata, "doc_id", "stratum", self.RATES
        ).toPandas()
        b = out[out.stratum == "b"]
        c = out[out.stratum == "c"]
        assert b.sampled.all() and (b.weight == 1.0).all()
        assert (~c.sampled).all() and (c.weight == 0.0).all()
        a = out[out.stratum == "a"]
        assert 0.3 < a.sampled.mean() < 0.7  # ~0.5 on 100 draws
        assert (a[a.sampled].weight == 2.0).all()

    def test_deterministic_across_runs(self, spark, strata):
        kept1 = set(
            r["doc_id"]
            for r in stratified_sample(strata, "doc_id", "stratum", self.RATES)
            .where("sampled")
            .collect()
        )
        kept2 = set(
            r["doc_id"]
            for r in stratified_sample(
                strata.repartition(7), "doc_id", "stratum", self.RATES
            )
            .where("sampled")
            .collect()
        )
        assert kept1 == kept2  # partitioning-independent, no RNG state

    def test_threshold_hex_edges(self):
        assert sample_threshold_hex(1.0) == "zzzz"
        assert sample_threshold_hex(0.0) == "0000"
        assert sample_threshold_hex(0.25) == "4000"

    def test_row_local_no_exchange(self, spark, strata):
        plan = stratified_sample(
            strata, "doc_id", "stratum", self.RATES
        )._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestPackSequences:
    @pytest.fixture(scope="class")
    def packed(self, spark):
        rows = [(i, " ".join(["w"] * (10 + i % 37))) for i in range(200)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        return pack_sequences(
            df, "doc_id", "text", budget=64, n_shards=4
        ).toPandas()

    def test_offsets_within_budget(self, packed):
        assert (packed.offset_in_seq >= 0).all()
        assert (packed.offset_in_seq < 64).all()

    def test_straddle_flag_matches_arithmetic(self, packed):
        ends = packed.offset_in_seq + packed.tokens
        assert (packed.straddles == (ends > 64)).all()

    def test_shards_pack_contiguously(self, packed):
        for shard, grp in packed.groupby("shard"):
            grp = grp.sort_values("doc_id")
            # consecutive docs in a shard either continue the running token
            # stream or the stream crossed a budget cut — never a gap
            cum = grp.tokens.cumsum().shift(fill_value=0)
            assert (
                grp.seq_id == shard * 2**32 + cum // 64
            ).all()
            # local seq ids are dense from 0
            local = sorted((grp.seq_id - shard * 2**32).unique())
            assert local[0] == 0
            assert local == list(range(len(local)))

    def test_seq_ids_globally_unique_across_shards(self, packed):
        by_seq = packed.groupby("seq_id").shard.nunique()
        assert (by_seq == 1).all()
