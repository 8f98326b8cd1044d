"""Per-conversation stateful context + salted aggregation tests."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F


class TestConversationContext:
    def test_heading_carries_across_turns(self, spark):
        from doc_parser_spark.operators.conversation import (
            with_conversation_context,
        )
        from doc_parser_spark.operators.extract import extract_turns

        rows = pd.DataFrame(
            {
                "conv_id": ["c1"] * 4 + ["c2"] * 2,
                "turn_idx": [0, 1, 2, 3, 0, 1],
                "role": "user",
                "text": [
                    "<h1>Setup Guide</h1><p>intro</p>",
                    "plain reply with no headings",
                    "<h2>Install</h2><p>steps</p>",
                    "another plain turn",
                    "no heading conv",
                    "<h1>Other Doc</h1>",
                ],
                "tool": None,
                "ts": pd.Timestamp("2026-01-01"),
            }
        )
        ctx = (
            with_conversation_context(
                extract_turns(spark.createDataFrame(rows))
            )
            .orderBy("conv_id", "turn_idx")
            .toPandas()
        )
        c1 = ctx[ctx["conv_id"] == "c1"]
        assert c1["active_title"].tolist() == ["Setup Guide"] * 4
        assert c1["active_section"].tolist() == [None, None, "Install", "Install"]
        c2 = ctx[ctx["conv_id"] == "c2"]
        assert c2["active_title"].tolist() == [None, "Other Doc"]

    def test_one_row_per_turn(self, spark, transcripts_pdf):
        from doc_parser_spark.operators.conversation import (
            with_conversation_context,
        )
        from doc_parser_spark.operators.extract import extract_turns

        sub = transcripts_pdf.head(150)
        ctx = with_conversation_context(
            extract_turns(spark.createDataFrame(sub))
        )
        assert ctx.count() == len(sub)


class TestSaltedAgg:
    def test_matches_plain_groupby(self, spark, transcripts_pdf):
        from doc_parser_spark.operators.conversation import salted_agg

        df = spark.createDataFrame(transcripts_pdf)
        got = (
            salted_agg(
                df.withColumn("text_len", F.length("text")),
                "conv_id",
                {
                    "n_turns": ("count", "*"),
                    "max_turn": ("max", "turn_idx"),
                    "total_chars": ("sum", "text_len"),
                },
                n_salts=8,
            )
            .orderBy("conv_id")
            .toPandas()
        )
        exp = (
            df.withColumn("text_len", F.length("text"))
            .groupBy("conv_id")
            .agg(
                F.count("*").alias("n_turns"),
                F.max("turn_idx").alias("max_turn"),
                F.sum("text_len").alias("total_chars"),
            )
            .orderBy("conv_id")
            .toPandas()
        )
        pd.testing.assert_frame_equal(
            got[["conv_id", "n_turns", "max_turn", "total_chars"]],
            exp[["conv_id", "n_turns", "max_turn", "total_chars"]],
        )


class TestStatefulStreaming:
    def test_state_persists_across_batches(self, spark, tmp_path):
        import pandas as pd
        from doc_parser_spark.streaming.stream import read_transcript_stream
        from doc_parser_spark.streaming.stream import extract_stream
        from doc_parser_spark.streaming.stateful import (
            conversation_context_stream,
        )

        inp = tmp_path / "in"
        inp.mkdir()

        def write(name, rows):
            pdf = pd.DataFrame(rows)
            pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
            pdf["tool"] = pdf["tool"].astype("string")
            pdf.to_parquet(
                str(inp / name), index=False,
                coerce_timestamps="us", allow_truncated_timestamps=True,
            )

        base = {"role": "user", "tool": None, "ts": pd.Timestamp("2026-01-01")}
        write(
            "b1.parquet",
            [
                {"conv_id": "c1", "turn_idx": 0,
                 "text": "<h1>Guide</h1><p>intro</p>", **base},
                {"conv_id": "c1", "turn_idx": 1, "text": "plain turn", **base},
            ],
        )

        stream = conversation_context_stream(
            extract_stream(read_transcript_stream(spark, str(inp)))
        )
        out = str(tmp_path / "out")

        def drain():
            q = (
                stream.writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", str(tmp_path / "ckpt"))
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            return spark.read.parquet(out).toPandas()

        first = drain()
        assert first.sort_values("turn_idx")["active_title"].tolist() == [
            "Guide", "Guide",
        ]

        # second batch later: state (title + counter) must carry over
        write(
            "b2.parquet",
            [{"conv_id": "c1", "turn_idx": 2,
              "text": "<h2>Install</h2><p>steps</p>", **base}],
        )
        both = drain()
        second = both[both["turn_idx"] == 2]
        assert len(both) == 3 and len(second) == 1
        row = second.iloc[0]
        assert row["active_title"] == "Guide"
        assert row["active_section"] == "Install"
        assert row["n_turns_seen"] == 3
