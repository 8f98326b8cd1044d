"""operators/office.py through Spark: sniff-by-zip-member dispatch, per-row
fallback (poison zips become failure rows, never task errors), and span
integrity — plus the synth builders used by the driver oracles."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from doc_parser_spark.sources.synth_office import (
    build_docx,
    build_pptx,
    build_xlsx,
)


@pytest.fixture()
def media_df(spark):
    rows = []
    for i in range(30):
        kind = i % 4
        if kind == 0:
            payload = build_docx(f"Doc {i}", [f"body {i}"], ["a", "b"])
        elif kind == 1:
            payload = build_xlsx("S", [["h1", "h2"], [str(i), "x"]])
        elif kind == 2:
            payload = build_pptx(f"Deck {i}", ["p1", "p2"])
        else:
            payload = b"PK\x03\x04 not a real zip"  # poison
        rows.append((i, payload))
    pdf = pd.DataFrame(rows, columns=["doc_id", "payload"])
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    return spark.createDataFrame(pdf, schema=schema)


def test_office_operator_dispatch_and_fallback(spark, media_df):
    from doc_parser_spark.operators.office import extract_office_docs

    out = extract_office_docs(media_df).toPandas().set_index("doc_id")
    assert len(out) == 30
    for i in range(30):
        row = out.loc[i]
        kind = i % 4
        if kind == 0:
            assert row["doc_kind"] == "docx"
            assert row["parse_status"] == "success"
            assert f"Doc {i}" in row["extracted_text"]
        elif kind == 1:
            assert row["doc_kind"] == "xlsx"
            assert "| h1 | h2 |" in row["extracted_text"]
        elif kind == 2:
            assert row["doc_kind"] == "pptx"
            assert f"Deck {i}" in row["extracted_text"]
        else:
            # poison zip: skipped/failure row, no task error
            assert row["doc_kind"] == "unknown"
            assert row["parse_status"] == "skipped"
    # span integrity for successful rows
    ok = out[out["parse_status"] == "success"]
    for _, row in ok.iterrows():
        text = row["extracted_text"]
        for s in row["spans"]:
            assert 0 <= s["start"] < s["end"] <= len(text)


def test_office_sniff_kinds():
    from doc_parser_spark.operators.office import sniff_office

    assert sniff_office(build_docx("t", [], [])) == "docx"
    assert sniff_office(build_xlsx("s", [["a"]])) == "xlsx"
    assert sniff_office(build_pptx("t", [])) == "pptx"
    assert sniff_office(b"") == "unknown"
    assert sniff_office(b"plain bytes") == "unknown"
    assert sniff_office(b"PK\x03\x04corrupt") == "unknown"
