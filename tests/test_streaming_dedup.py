"""Streaming incremental dedup: continuous ingestion gets exact/near/novel
tagging with BIT-PARITY to the batch operator across micro-batch
boundaries, and novel docs from earlier batches are visible as corpus to
later batches (the cross-batch property foreachBatch exists for)."""

from __future__ import annotations

import pandas as pd
import pytest


CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog again and again"),
    (2, "completely different reference text about spark streaming joins"),
]

BATCH_1 = [
    (100, "the quick brown fox jumps over the lazy dog again and again"),
    (101, "a genuinely new document that matches nothing in the corpus"),
]

BATCH_2 = [
    # exact dup of batch 1's NOVEL doc — only visible cross-batch
    (200, "a genuinely new document that matches nothing in the corpus"),
    # near dup of corpus doc 1 (one word changed)
    (201, "the quick brown fox jumps over the lazy cat again and again"),
    (202, "yet another novel text with entirely fresh vocabulary inside"),
]


def _write(df_rows, path):
    pd.DataFrame(df_rows, columns=["doc_id", "text"]).astype(
        {"doc_id": "int64"}
    ).to_parquet(path, index=False)


@pytest.fixture(scope="module")
def dirs(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("sdedup")
    corpus = root / "corpus"
    incoming = root / "incoming"
    corpus.mkdir()
    incoming.mkdir()
    _write(CORPUS, corpus / "corpus.parquet")
    _write(BATCH_1, incoming / "b1.parquet")
    _write(BATCH_2, incoming / "b2.parquet")
    return root


def _run_stream(spark, root):
    from doc_parser_spark.streaming.stream import dedup_incremental_stream

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)  # one arrival file per micro-batch
        .parquet(str(root / "incoming"))
    )
    q = dedup_incremental_stream(
        stream,
        corpus_path=str(root / "corpus"),
        accepted_path=str(root / "accepted"),
        output_path=str(root / "out"),
        checkpoint_path=str(root / "ckpt"),
    )
    q.awaitTermination(180)
    return spark.read.parquet(str(root / "out"))


def test_streaming_matches_sequential_batch_exactly(spark, dirs):
    """Drain the two arrival files as two micro-batches, then replay the
    same sequence with the BATCH operator (batch 2's corpus = corpus +
    batch 1 novels) — statuses and matched ids must be identical."""
    from doc_parser_spark.operators.dedup import dedup_incremental

    out = _run_stream(spark, dirs).toPandas()
    assert len(out) == 5
    # micro-batch boundaries respected: one file per batch
    assert sorted(out["batch_id"].unique().tolist()) == [0, 1]

    corpus = spark.createDataFrame(CORPUS, "doc_id long, text string")
    b1 = spark.createDataFrame(BATCH_1, "doc_id long, text string")
    b2 = spark.createDataFrame(BATCH_2, "doc_id long, text string")
    r1 = dedup_incremental(b1, corpus, "doc_id", "text").toPandas()
    novel1 = b1.join(
        spark.createDataFrame(
            r1[r1.status == "novel"][["doc_id"]]
        ),
        "doc_id",
    )
    r2 = dedup_incremental(
        b2, corpus.unionByName(novel1), "doc_id", "text"
    ).toPandas()
    batch_ref = (
        pd.concat([r1, r2])
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    stream_got = (
        out.drop(columns=["batch_id"]).sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        stream_got.astype(str), batch_ref.astype(str)
    )


def test_cross_batch_statuses(spark, dirs):
    out = (
        spark.read.parquet(str(dirs / "out"))
        .toPandas()
        .set_index("doc_id")
    )
    assert out.loc[100, "status"] == "exact_dup"
    assert out.loc[100, "matched_old_id"] == 1
    assert out.loc[101, "status"] == "novel"
    # the decisive cross-batch case: 200 duplicates batch 1's novel 101
    assert out.loc[200, "status"] == "exact_dup"
    assert out.loc[200, "matched_old_id"] == 101
    assert out.loc[201, "status"] == "near_dup"
    assert out.loc[201, "matched_old_id"] == 1
    assert out.loc[202, "status"] == "novel"


def test_accepted_corpus_contains_exactly_the_novels(spark, dirs):
    acc = spark.read.parquet(str(dirs / "accepted")).toPandas()
    assert sorted(acc["doc_id"].tolist()) == [101, 202]


# ---------------------------------------------------------------------------
# exactly-once under foreachBatch replay (the kill/restart shape)
# ---------------------------------------------------------------------------

def _processor(root):
    from doc_parser_spark.streaming.stream import incremental_dedup_processor

    return incremental_dedup_processor(
        corpus_path=str(root / "corpus"),
        accepted_path=str(root / "accepted"),
        output_path=str(root / "out"),
    )


def _fresh_root(spark, tmp_path):
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    _write(CORPUS, corpus / "corpus.parquet")
    return tmp_path


def _state(spark, root):
    """(output rows, accepted doc_ids) — the full externally-visible state."""
    out = (
        spark.read.parquet(str(root / "out"))
        .toPandas()
        .astype(str)
        .sort_values(["batch_id", "doc_id"])
        .reset_index(drop=True)
    )
    acc = sorted(
        spark.read.parquet(str(root / "accepted")).toPandas()["doc_id"]
    )
    return out, acc


def test_replay_of_a_committed_batch_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: after a kill between the sink commits
    and the checkpoint commit, the SAME batch_id replays with both sinks
    already written.  The replay must (a) not duplicate rows (partition
    overwrite, not append) and (b) not reclassify the batch's own novels
    as exact_dup of themselves via the accepted rows the first attempt
    wrote (the batch_id < current replay guard)."""
    root = _fresh_root(spark, tmp_path)
    process = _processor(root)
    b1 = spark.createDataFrame(BATCH_1, "doc_id long, text string")
    b2 = spark.createDataFrame(BATCH_2, "doc_id long, text string")

    process(b1, 0)
    process(b2, 1)
    clean_out, clean_acc = _state(spark, root)

    # replay both batches (kill-after-commit shape), oldest first
    process(b1, 0)
    process(b2, 1)
    replay_out, replay_acc = _state(spark, root)

    pd.testing.assert_frame_equal(replay_out, clean_out)
    assert replay_acc == clean_acc == [101, 202]
    # the decisive assertion: batch 0's novel stayed novel on replay
    assert (
        replay_out.set_index("doc_id").loc["101", "status"] == "novel"
    )


def test_replay_heals_partial_commit(spark, tmp_path):
    """Kill between the two sink writes: output partition committed,
    accepted partition missing.  The replay must recompute the identical
    result and leave the same final state as a clean run."""
    import shutil

    root = _fresh_root(spark, tmp_path)
    process = _processor(root)
    b1 = spark.createDataFrame(BATCH_1, "doc_id long, text string")
    b2 = spark.createDataFrame(BATCH_2, "doc_id long, text string")

    process(b1, 0)
    # simulate the crash window: accepted side of batch 0 never committed
    shutil.rmtree(root / "accepted" / "batch_id=0")
    process(b1, 0)  # checkpoint retries the batch
    process(b2, 1)

    out, acc = _state(spark, root)
    assert acc == [101, 202]
    statuses = out.set_index("doc_id")["status"]
    assert statuses.loc["101"] == "novel"
    assert statuses.loc["200"] == "exact_dup"  # cross-batch dup still caught
    assert len(out) == 5  # no duplicated rows from the two attempts


# ---------------------------------------------------------------------------
# materialized-index variant (round 6): old text is never re-hashed
# ---------------------------------------------------------------------------

class TestIndexedIncremental:
    def test_bit_parity_with_text_based(self, spark):
        """dedup_incremental_indexed(new, dedup_index(old)) must classify
        identically to dedup_incremental(new, old) — including a
        shingle-less short doc on each side (null buckets path)."""
        from doc_parser_spark.operators.dedup import (
            dedup_incremental,
            dedup_incremental_indexed,
            dedup_index,
        )

        old_rows = CORPUS + [(3, "too short")]          # shingle-less old
        new_rows = BATCH_1 + BATCH_2 + [
            (300, "too short"),                          # exact dup of 3
            (301, "also tiny"),                          # shingle-less novel
        ]
        old = spark.createDataFrame(old_rows, "doc_id long, text string")
        new = spark.createDataFrame(new_rows, "doc_id long, text string")

        ref = dedup_incremental(new, old, "doc_id", "text").toPandas()
        idx = dedup_index(old, "doc_id", "text")
        got = dedup_incremental_indexed(new, idx, "doc_id", "text").toPandas()
        ref = ref.sort_values("doc_id").reset_index(drop=True).astype(str)
        got = got.sort_values("doc_id").reset_index(drop=True).astype(str)
        pd.testing.assert_frame_equal(got, ref)
        # sanity on the interesting rows
        byid = got.set_index("doc_id")["status"]
        assert byid.loc["300"] == "exact_dup"
        assert byid.loc["301"] == "novel"

    def test_index_shape(self, spark):
        from doc_parser_spark.operators.dedup import dedup_index

        old = spark.createDataFrame(
            CORPUS + [(3, "too short")], "doc_id long, text string"
        )
        idx = {r["id"]: r for r in dedup_index(old, "doc_id", "text").collect()}
        assert len(idx[1]["buckets"]) > 0          # banded
        assert idx[3]["buckets"] is None           # shingle-less: excluded
        assert idx[3]["shingles"] == []

    def test_streaming_indexed_matches_text_based(self, spark, dirs,
                                                  tmp_path):
        """Drain the same 2-file arrival sequence through the indexed
        stream; output rows must equal the text-based stream's
        (dirs/out, already drained by the module fixture)."""
        from doc_parser_spark.operators.dedup import dedup_index
        from doc_parser_spark.streaming.stream import (
            dedup_incremental_stream_indexed,
        )

        corpus = spark.read.parquet(str(dirs / "corpus"))
        dedup_index(corpus, "doc_id", "text").write.parquet(
            str(tmp_path / "corpus_index")
        )
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(dirs / "incoming"))
        )
        q = dedup_incremental_stream_indexed(
            stream,
            corpus_index_path=str(tmp_path / "corpus_index"),
            accepted_index_path=str(tmp_path / "accepted_index"),
            output_path=str(tmp_path / "out"),
            checkpoint_path=str(tmp_path / "ckpt"),
        )
        q.awaitTermination(180)
        got = (
            spark.read.parquet(str(tmp_path / "out"))
            .toPandas().astype(str)
            .sort_values("doc_id").reset_index(drop=True)
        )
        ref = (
            spark.read.parquet(str(dirs / "out"))
            .toPandas().astype(str)
            .sort_values("doc_id").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got[sorted(got.columns)], ref[sorted(ref.columns)]
        )
        # accepted INDEX rows exist for exactly the novels
        acc = spark.read.parquet(str(tmp_path / "accepted_index")).toPandas()
        assert sorted(acc["id"].tolist()) == [101, 202]
        assert set(acc.columns) >= {"id", "h", "buckets", "shingles"}

    def test_indexed_replay_is_idempotent(self, spark, tmp_path):
        from doc_parser_spark.operators.dedup import dedup_index
        from doc_parser_spark.streaming.stream import indexed_dedup_processor

        root = _fresh_root(spark, tmp_path)
        corpus = spark.read.parquet(str(root / "corpus"))
        dedup_index(corpus, "doc_id", "text").write.parquet(
            str(root / "corpus_index")
        )
        process = indexed_dedup_processor(
            corpus_index_path=str(root / "corpus_index"),
            accepted_index_path=str(root / "accepted_index"),
            output_path=str(root / "out"),
        )
        b1 = spark.createDataFrame(BATCH_1, "doc_id long, text string")
        b2 = spark.createDataFrame(BATCH_2, "doc_id long, text string")
        process(b1, 0)
        process(b2, 1)
        clean = (
            spark.read.parquet(str(root / "out"))
            .toPandas().astype(str)
            .sort_values(["batch_id", "doc_id"]).reset_index(drop=True)
        )
        process(b1, 0)  # kill-after-commit replay
        process(b2, 1)
        replay = (
            spark.read.parquet(str(root / "out"))
            .toPandas().astype(str)
            .sort_values(["batch_id", "doc_id"]).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(replay, clean)
        assert replay.set_index("doc_id").loc["101", "status"] == "novel"

    def test_hashed_streaming_cross_batch(self, spark, tmp_path):
        """hashed=True through the STREAMING processor: the novel-index
        rows the loop appends must use the same hashed schema as the
        corpus index, or batch 2's unionByName fails and prior novels
        silently vanish from the old side (the cross-batch leak)."""
        from doc_parser_spark.operators.dedup import dedup_index
        from doc_parser_spark.streaming.stream import indexed_dedup_processor

        root = _fresh_root(spark, tmp_path)
        corpus = spark.read.parquet(str(root / "corpus"))
        dedup_index(corpus, "doc_id", "text", hashed=True).write.parquet(
            str(root / "corpus_index")
        )
        process = indexed_dedup_processor(
            corpus_index_path=str(root / "corpus_index"),
            accepted_index_path=str(root / "accepted_index"),
            output_path=str(root / "out"),
            hashed=True,
        )
        b1 = spark.createDataFrame(BATCH_1, "doc_id long, text string")
        b2 = spark.createDataFrame(BATCH_2, "doc_id long, text string")
        process(b1, 0)
        process(b2, 1)
        out = (
            spark.read.parquet(str(root / "out"))
            .toPandas().set_index("doc_id")
        )
        # the decisive cross-batch row: 200 duplicates batch 0's novel 101
        assert out.loc[200, "status"] == "exact_dup"
        assert out.loc[200, "matched_old_id"] == 101
        assert out.loc[201, "status"] == "near_dup"
        # novel index rows carry the HASHED schema
        acc = spark.read.parquet(str(root / "accepted_index"))
        assert dict(acc.dtypes)["shingles"] == "array<bigint>"
        assert sorted(r["id"] for r in acc.collect()) == [101, 202]

    def test_legacy_accepted_state_fails_loudly(self, spark, tmp_path):
        """Accepted state that exists but can't serve the replay guard
        (no batch_id column) must FAIL the batch, not be misread as
        'first batch' — silently dropping the old side is the dedup-leak
        failure mode the try-scope exists to prevent."""
        from pyspark.errors import AnalysisException
        from doc_parser_spark.operators.dedup import dedup_index
        from doc_parser_spark.streaming.stream import indexed_dedup_processor

        root = _fresh_root(spark, tmp_path)
        corpus = spark.read.parquet(str(root / "corpus"))
        dedup_index(corpus, "doc_id", "text").write.parquet(
            str(root / "corpus_index")
        )
        # legacy/corrupt accepted index: rows but NO batch_id column
        dedup_index(
            spark.createDataFrame(
                [(101, BATCH_1[1][1])], "doc_id long, text string"
            ),
            "doc_id", "text",
        ).write.parquet(str(root / "accepted_index"))
        process = indexed_dedup_processor(
            corpus_index_path=str(root / "corpus_index"),
            accepted_index_path=str(root / "accepted_index"),
            output_path=str(root / "out"),
        )
        b2 = spark.createDataFrame(BATCH_2, "doc_id long, text string")
        with pytest.raises(AnalysisException):
            process(b2, 1)

    def test_hashed_index_classifies_identically(self, spark):
        """hashed=True stores xxhash64(shingle) arrays (8 bytes/shingle —
        the 100-TB storage lever); classification must equal both the
        raw-shingle index and the text-based operator."""
        from doc_parser_spark.operators.dedup import (
            dedup_incremental,
            dedup_incremental_indexed,
            dedup_index,
        )

        old_rows = CORPUS + [(3, "too short")]
        new_rows = BATCH_1 + BATCH_2 + [(300, "too short"), (301, "tiny")]
        old = spark.createDataFrame(old_rows, "doc_id long, text string")
        new = spark.createDataFrame(new_rows, "doc_id long, text string")

        ref = dedup_incremental(new, old, "doc_id", "text").toPandas()
        hidx = dedup_index(old, "doc_id", "text", hashed=True)
        assert dict(hidx.dtypes)["shingles"] == "array<bigint>"
        got = dedup_incremental_indexed(
            new, hidx, "doc_id", "text", hashed=True
        ).toPandas()
        pd.testing.assert_frame_equal(
            got.sort_values("doc_id").reset_index(drop=True).astype(str),
            ref.sort_values("doc_id").reset_index(drop=True).astype(str),
        )
