"""Spark integration tests: the extraction operator and the end-to-end job.

The correctness contract (north rule): per-turn text equality under stable
(conv_id, turn_idx) ordering — asserted here by comparing the distributed
result against the pure-python kernels applied row-by-row.
"""

from __future__ import annotations

import pandas as pd
import pytest

from doc_parser_spark.datamodel import CT_EMPTY, STATUS_SKIPPED, STATUS_SUCCESS
from doc_parser_spark.functions.html_extract import extract_html
from doc_parser_spark.functions.pdfish_extract import extract_pdfish
from doc_parser_spark.functions.plain_extract import extract_plain
from doc_parser_spark.operators.extract import extract_turns, with_content_type
from doc_parser_spark.sources.sniff import sniff_text


def _expected_text(text: str) -> str | None:
    from doc_parser_spark.functions.csv_extract import extract_csv
    from doc_parser_spark.functions.md_extract import extract_md

    ct = sniff_text(text)
    if ct == CT_EMPTY:
        return ""
    if ct == "html":
        return extract_html(text)[0]
    if ct == "pdf":
        return extract_pdfish(text)[0]
    if ct == "markdown":
        return extract_md(text)[0]
    if ct == "csv":
        return extract_csv(text)[0]
    if ct == "asciidoc":
        from doc_parser_spark.functions.asciidoc_extract import extract_asciidoc

        return extract_asciidoc(text)[0]
    return extract_plain(text)[0]


@pytest.fixture(scope="module")
def extracted(spark, transcripts_pdf):
    df = spark.createDataFrame(transcripts_pdf)
    return (
        extract_turns(df, route_partitions=8)
        .orderBy("conv_id", "turn_idx")
        .toPandas()
    )


class TestExtractOperator:
    def test_row_count_preserved(self, extracted, transcripts_pdf):
        assert len(extracted) == len(transcripts_pdf)

    def test_per_turn_text_equality(self, extracted, transcripts_pdf):
        """Distributed result == pure-kernel result, per turn, stable order."""
        inp = transcripts_pdf.sort_values(["conv_id", "turn_idx"]).reset_index(
            drop=True
        )
        got = extracted.reset_index(drop=True)
        assert (got["conv_id"] == inp["conv_id"]).all()
        assert (got["turn_idx"] == inp["turn_idx"]).all()
        expected = inp["text"].map(_expected_text)
        mismatches = got["extracted_text"].fillna("") != expected.fillna("")
        assert not mismatches.any(), (
            f"{mismatches.sum()} per-turn text mismatches; first: "
            f"{got[mismatches].head(2).to_dict()}"
        )

    def test_spans_match_text_slices(self, extracted):
        for _, row in extracted.iterrows():
            if row["spans"] is None:
                continue
            for span in row["spans"]:
                seg = row["extracted_text"][span["start"] : span["end"]]
                assert len(seg) == span["end"] - span["start"]
                assert "\n\n" not in seg or span["label"] == "table"

    def test_status_vocabulary(self, extracted):
        assert set(extracted["parse_status"]) <= {
            "success",
            "partial_success",
            "failure",
            "skipped",
        }

    def test_empty_is_skipped(self, extracted, transcripts_pdf):
        inp = transcripts_pdf.sort_values(["conv_id", "turn_idx"]).reset_index(
            drop=True
        )
        got = extracted.reset_index(drop=True)
        empties = inp["text"].fillna("").str.strip() == ""
        assert (got.loc[empties, "parse_status"] == STATUS_SKIPPED).all()
        assert (got.loc[~empties, "parse_status"] == STATUS_SUCCESS).all()

    def test_content_types_routed(self, extracted):
        assert {"html", "plain", "pdf"} <= set(extracted["content_type"])

    def test_garbage_scores_zero(self, extracted):
        glyph = extracted["extracted_text"].fillna("").str.contains("GLYPH<")
        assert (extracted.loc[glyph, "parse_score"] == 0.0).all()

    def test_counts(self, extracted):
        nonnull = extracted[extracted["extracted_text"].notna()]
        assert (nonnull["n_char"] == nonnull["extracted_text"].str.len()).all()


class TestSniffColumn:
    def test_matches_scalar(self, spark, transcripts_pdf):
        df = spark.createDataFrame(transcripts_pdf.head(50))
        got = (
            with_content_type(df)
            .select("conv_id", "turn_idx", "content_type")
            .orderBy("conv_id", "turn_idx")
            .toPandas()
        )
        inp = (
            transcripts_pdf.head(50)
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )
        assert got["content_type"].tolist() == [
            sniff_text(t) for t in inp["text"]
        ]


class TestPipelineJob:
    def test_job_runs_and_resumes(self, spark, transcripts_pdf, tmp_path):
        from doc_parser_spark.plans.pipeline import (
            read_extracted,
            read_metrics,
            run_extraction_job,
        )

        df = spark.createDataFrame(transcripts_pdf)
        out = str(tmp_path / "out")
        summary = run_extraction_job(
            spark, df, out, n_buckets=8, job_run_id="run1"
        )
        assert summary["rows"] == len(transcripts_pdf)

        result = read_extracted(spark, out)
        assert result.count() == len(transcripts_pdf)
        assert "bucket_id" in result.columns

        metrics = read_metrics(spark, out).toPandas()
        assert metrics["docs_parsed"].sum() == len(transcripts_pdf)
        assert (metrics["job_run_id"] == "run1").all()
        assert metrics["bytes_processed"].sum() > 0

        # resume: everything committed → second run is a no-op
        summary2 = run_extraction_job(
            spark, df, out, n_buckets=8, job_run_id="run2"
        )
        assert summary2["rows"] == 0
        assert read_extracted(spark, out).count() == len(transcripts_pdf)

    def test_partial_resume(self, spark, transcripts_pdf, tmp_path):
        from doc_parser_spark.operators.extract import bucket_id
        from doc_parser_spark.plans.pipeline import (
            read_extracted,
            run_extraction_job,
        )
        from pyspark.sql import functions as F

        df = spark.createDataFrame(transcripts_pdf)
        out = str(tmp_path / "out2")
        # first run sees only buckets 0-3 (simulated interrupted job)
        partial = df.where(bucket_id("conv_id", 8) < 4)
        run_extraction_job(spark, partial, out, n_buckets=8, job_run_id="p1")
        n_partial = read_extracted(spark, out).count()
        assert 0 < n_partial < len(transcripts_pdf)

        # rerun over the full input completes only the missing buckets
        run_extraction_job(spark, df, out, n_buckets=8, job_run_id="p2")
        final = read_extracted(spark, out)
        assert final.count() == len(transcripts_pdf)
        # no duplicates
        assert (
            final.select("conv_id", "turn_idx").distinct().count()
            == len(transcripts_pdf)
        )

    def test_crash_between_data_and_manifest_leaves_no_duplicates(
        self, spark, transcripts_pdf, tmp_path
    ):
        """Mid-write crash sim: data written to extracted/ but the manifest
        commit never happened. The rerun reprocesses those buckets (orphan
        rows get a second copy under a new job_run_id); read_extracted must
        return only manifest-committed rows — exactly one copy."""
        import shutil

        from doc_parser_spark.plans.pipeline import (
            read_extracted,
            run_extraction_job,
        )

        df = spark.createDataFrame(transcripts_pdf)
        out = str(tmp_path / "out_crash")
        run_extraction_job(spark, df, out, n_buckets=8, job_run_id="c1")
        # simulate the crash: the parquet data survived, the manifest didn't
        shutil.rmtree(str(tmp_path / "out_crash" / "_manifest"))
        assert read_extracted(spark, out).count() == 0  # nothing committed

        run_extraction_job(spark, df, out, n_buckets=8, job_run_id="c2")
        final = read_extracted(spark, out)
        assert final.count() == len(transcripts_pdf)
        assert (
            final.select("conv_id", "turn_idx").distinct().count()
            == len(transcripts_pdf)
        )
        # the orphan copy is still on disk but filtered by the commit log
        raw = spark.read.parquet(str(tmp_path / "out_crash" / "extracted"))
        assert raw.count() == 2 * len(transcripts_pdf)

    def test_stable_ordering_within_bucket_files(self, spark, transcripts_pdf, tmp_path):
        from doc_parser_spark.plans.pipeline import run_extraction_job, read_extracted

        df = spark.createDataFrame(transcripts_pdf)
        out = str(tmp_path / "out3")
        run_extraction_job(spark, df, out, n_buckets=4, job_run_id="o1")
        pdf = read_extracted(spark, out).toPandas()
        # within each parquet bucket, rows must be (conv_id, turn_idx)-sorted
        for _, grp in pdf.groupby("bucket_id"):
            keys = list(zip(grp["conv_id"], grp["turn_idx"]))
            assert keys == sorted(keys)


class TestRoutingModes:
    def test_single_shuffle_mode_same_results(self, spark, transcripts_pdf, tmp_path):
        from doc_parser_spark.plans.pipeline import read_extracted, run_extraction_job

        df = spark.createDataFrame(transcripts_pdf)
        a, b = str(tmp_path / "a"), str(tmp_path / "b")
        run_extraction_job(spark, df, a, n_buckets=4, job_run_id="r1")
        run_extraction_job(spark, df, b, n_buckets=4, job_run_id="r2", routing="none")
        pa = (
            read_extracted(spark, a)
            .select("conv_id", "turn_idx", "extracted_text", "parse_status")
            .orderBy("conv_id", "turn_idx")
            .toPandas()
        )
        pb = (
            read_extracted(spark, b)
            .select("conv_id", "turn_idx", "extracted_text", "parse_status")
            .orderBy("conv_id", "turn_idx")
            .toPandas()
        )
        assert pa.equals(pb)


class TestSizeGuard:
    def test_oversize_turn_takes_cheap_path(self, spark):
        from doc_parser_spark.operators.extract import MAX_PARSE_BYTES

        huge_html = "<html><body><h1>T</h1><p>" + ("word " * (MAX_PARSE_BYTES // 4)) + "</p></body></html>"
        small_html = "<html><body><h1>T</h1><p>small</p></body></html>"
        rows = pd.DataFrame(
            {
                "conv_id": ["big", "small"],
                "turn_idx": [0, 0],
                "role": "user",
                "text": [huge_html, small_html],
                "tool": None,
                "ts": pd.Timestamp("2026-01-01"),
            }
        )
        out = (
            extract_turns(spark.createDataFrame(rows))
            .orderBy("conv_id")
            .toPandas()
        )
        big, small = out.iloc[0], out.iloc[1]
        assert big["parse_status"] == "partial_success"
        assert big["extracted_text"].startswith("<html>")  # plain path
        assert small["parse_status"] == "success"
        assert small["extracted_text"] == "T\n\nsmall"


class TestManifestGuard:
    def test_bucket_count_mismatch_rejected(self, spark, transcripts_pdf, tmp_path):
        from doc_parser_spark.plans.pipeline import run_extraction_job

        df = spark.createDataFrame(transcripts_pdf.head(40))
        out = str(tmp_path / "g")
        run_extraction_job(spark, df, out, n_buckets=8, job_run_id="g1")
        with pytest.raises(ValueError, match="n_buckets=8"):
            run_extraction_job(spark, df, out, n_buckets=16, job_run_id="g2")
