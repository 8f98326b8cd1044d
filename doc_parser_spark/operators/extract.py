"""The extraction operator — Arrow-batched mapInPandas over transcript turns.

Spark-first design notes (SURVEY.md §3.4):

- routing: rows repartition on (conv_id, turn_idx) before the heavy parse —
  turn-level salting, so a single whale conversation (10^6 turns) spreads
  across the cluster instead of pinning one task (north-rule skew
  requirement). The content-type sniff runs INSIDE the extraction batch
  (one Python boundary crossing, not two — round 8). Extraction is
  per-turn, so no cross-row state is needed and the stage is
  embarrassingly parallel.
- per-row reliability: the reference's dual-converter fallback
  (/root/reference/genon/preprocessor/facade/intelligent_processor.py:1055-1069)
  becomes a per-row try/except chain inside the batch: primary extractor →
  plain-text fallback (partial_success) → failure row. A poison document
  never kills the task.
- metrics: each output row carries ``_proc_us`` (its share of the batch's
  wall time) and ``_n_bytes`` so per-partition metrics (docs, bytes,
  failures, wall) are a pure relational aggregate afterwards — Spark
  accumulators are lossy under task retries (SURVEY.md §1.4).
"""

from __future__ import annotations

import time
from typing import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from doc_parser_spark.datamodel import (
    CT_ASCIIDOC,
    CT_CSV,
    CT_EMPTY,
    CT_HTML,
    CT_JATS,
    CT_MARKDOWN,
    CT_PDF,
    CT_PLAIN,
    CT_USPTO,
    EXTRACTED_SCHEMA,
    STATUS_FAILURE,
    STATUS_PARTIAL,
    STATUS_SKIPPED,
    STATUS_SUCCESS,
)
from doc_parser_spark.functions.asciidoc_extract import extract_asciidoc
from doc_parser_spark.functions.csv_extract import extract_csv
from doc_parser_spark.functions.html_extract import extract_html
from doc_parser_spark.functions.jats_extract import extract_jats
from doc_parser_spark.functions.uspto_extract import extract_uspto
from doc_parser_spark.functions.md_extract import extract_md
from doc_parser_spark.functions.pdfish_extract import extract_pdfish
from doc_parser_spark.functions.plain_extract import extract_plain
from doc_parser_spark.functions.quality import rate_text_quality
from doc_parser_spark.sources.sniff import sniff_series

# internal metric columns appended to EXTRACTED_SCHEMA by the UDF
EXTRACT_OUTPUT_SCHEMA = T.StructType(
    EXTRACTED_SCHEMA.fields
    + [
        T.StructField("_n_bytes", T.LongType(), False),
        T.StructField("_proc_us", T.LongType(), False),
    ]
)

_EXTRACTORS = {
    CT_ASCIIDOC: extract_asciidoc,
    CT_HTML: extract_html,
    CT_JATS: extract_jats,
    CT_USPTO: extract_uspto,
    CT_PDF: extract_pdfish,
    CT_PLAIN: extract_plain,
    CT_MARKDOWN: extract_md,
    CT_CSV: extract_csv,
}


def with_content_type(df: DataFrame) -> DataFrame:
    """Add the sniffer column (S1). Vectorized pandas UDF over the text head."""

    @F.pandas_udf(T.StringType())
    def _sniff(texts: pd.Series) -> pd.Series:
        return sniff_series(texts)

    return df.withColumn("content_type", _sniff(F.col("text")))


# size limit (S2 analog, document.py:116-206 limits + R5 time budget): a
# pathological multi-MB turn skips the structural parse (quadratic-ish DOM
# costs) and takes the cheap paragraph path with partial status
MAX_PARSE_BYTES = 4 * 1024 * 1024


import re as _re

# full-document markers (the reference's own HTML probe shape,
# document.py:440-477); an HTML payload WITHOUT one is a routed fragment.
# Tag names are anchored (``[\s>]``) so a fragment starting with <header>
# (a routed block tag) is NOT mistaken for a full document.
_FULLDOC_RE = _re.compile(r"<!doctype\s+html|<html[\s>]|<head[\s>]|<body[\s>]")

# binary-payload probe: C0 control bytes (minus \t\n\r) in the head mean the
# payload is not text — a plain-text fallback on compressed/binary bytes is
# worse than reporting the failure
_BINARY_RE = _re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f]")


def _extract_one(content_type: str, text: str, boilerplate_mode: str):
    """Per-document extraction with the R4-style fallback chain.

    Returns (extracted_text, spans, status).
    """
    if content_type == CT_EMPTY:
        return "", [], STATUS_SKIPPED
    if (
        len(text) > MAX_PARSE_BYTES
        and content_type != CT_PLAIN
        and content_type != CT_PDF
    ):
        # CT_PDF is exempt: a plain-text "fallback" over binary PDF bytes is
        # garbage, and the real decoder is lazy (xref-driven) with its own
        # glyph/page caps — oversized PDFs parse or fail, never fall back
        extracted, spans = extract_plain(text)
        return extracted, spans, STATUS_PARTIAL
    extractor = _EXTRACTORS.get(content_type, extract_plain)
    try:
        if extractor is extract_html:
            extracted, spans = extract_html(text, boilerplate_mode)
        else:
            extracted, spans = extractor(text)
        if not extracted and text.strip() and extractor is not extract_plain:
            # Non-whitespace input that extracted to nothing is never a
            # plain `success` (round-2 verdict: the HTML-fragment demotion
            # generalized to every backend). Two legitimate empty-success
            # carve-outs remain: a FULL html document whose body is
            # genuinely empty/boilerplate-stripped, and a well-formed
            # %PDF-SIM cell dump whose rows are all page furniture.
            if extractor is extract_html and _FULLDOC_RE.search(
                text[:1024].lower()
            ):
                return extracted, spans, STATUS_SUCCESS
            if content_type == CT_PDF and text.startswith("%PDF-SIM"):
                return extracted, spans, STATUS_SUCCESS
            if _BINARY_RE.search(text[:4096]):
                # binary payload (e.g. real %PDF bytes the decoder could
                # not read): plain fallback would emit compressed garbage
                return None, None, STATUS_FAILURE
            extracted, spans = extract_plain(text)
            return extracted, spans, STATUS_PARTIAL
        return extracted, spans, STATUS_SUCCESS
    except Exception:
        if _BINARY_RE.search(text[:4096]):
            return None, None, STATUS_FAILURE
        try:
            extracted, spans = extract_plain(text)
            return extracted, spans, STATUS_PARTIAL
        except Exception:
            return None, None, STATUS_FAILURE


def _q10(scores: list) -> float:
    """np.quantile(scores, 0.10) with method='linear', bit-exact (numpy's
    _lerp switches formula at t >= 0.5), without the per-row numpy-call
    overhead — _score runs once per document row."""
    s = sorted(scores)
    n = len(s)
    if n == 1:
        return float(s[0])
    vi = 0.10 * (n - 1)
    lo = int(vi)
    t = vi - lo
    if t == 0.0:
        return float(s[lo])
    a, b = s[lo], s[lo + 1]
    d = b - a
    return float(b - d * (1.0 - t)) if t >= 0.5 else float(a + d * t)


def _score(extracted: str | None, spans) -> float | None:
    """Doc parse score = 10th percentile of per-span quality scores
    (page_preprocessing_model.py:78-85 aggregation).

    Fast path: every quality trigger requires '/', '�' or 'GLYPH<' — if the
    WHOLE text has none, every span scores 1.0 and so does the quantile.
    Profiling showed scoring at 44% of per-row extraction cost before this.
    """
    if not extracted or not spans:
        return None
    if (
        "/" not in extracted
        and "�" not in extracted
        and "GLYPH<" not in extracted
    ):
        return 1.0
    scores = [rate_text_quality(extracted[s[0] : s[1]]) for s in spans]
    return _q10(scores)


def make_extract_udf(boilerplate_mode: str = "reference"):
    """Build the mapInPandas function (iterator form → init-once per task)."""

    def extract_batches(
        batches: Iterable[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            t0 = time.perf_counter()
            n = len(pdf)
            if n == 0:
                continue
            texts = pdf["text"]
            if "content_type" in pdf.columns:
                ctypes = pdf["content_type"]
            else:
                ctypes = sniff_series(texts)

            extracted_l: list = []
            spans_l: list = []
            status_l: list = []
            score_l: list = []
            # stat columns computed inline while the per-row loop already
            # holds each string (saves three object-dtype .str passes;
            # ~2% wall — cProfile shows 12% but taxes the .str call fan-out)
            n_char_l: list = []
            n_word_l: list = []
            n_line_l: list = []
            for ct, text in zip(ctypes.tolist(), texts.tolist()):
                extracted, spans, status = _extract_one(
                    ct, text or "", boilerplate_mode
                )
                extracted_l.append(extracted)
                spans_l.append(
                    [
                        {"start": s[0], "end": s[1], "label": s[2], "page": s[3]}
                        for s in spans
                    ]
                    if spans is not None
                    else None
                )
                status_l.append(status)
                score_l.append(_score(extracted, spans))
                if extracted is None:
                    n_char_l.append(0)
                    n_word_l.append(0)
                    n_line_l.append(0)
                else:
                    n_char_l.append(len(extracted))
                    n_word_l.append(len(extracted.split()))
                    n_line_l.append(extracted.count("\n") + 1)

            ext = pd.Series(extracted_l, index=pdf.index, dtype="object")
            elapsed_us = int((time.perf_counter() - t0) * 1e6)

            out = pd.DataFrame(
                {
                    "conv_id": pdf["conv_id"],
                    "turn_idx": pdf["turn_idx"].astype("int32"),
                    "content_type": ctypes,
                    "extracted_text": ext,
                    "spans": spans_l,
                    "parse_status": status_l,
                    "parse_score": pd.Series(
                        score_l, index=pdf.index, dtype="float32"
                    ),
                    "n_char": pd.Series(
                        n_char_l, index=pdf.index, dtype="int32"
                    ),
                    "n_word": pd.Series(
                        n_word_l, index=pdf.index, dtype="int32"
                    ),
                    "n_line": pd.Series(
                        n_line_l, index=pdf.index, dtype="int32"
                    ),
                    "_n_bytes": texts.fillna("").str.len().astype("int64"),
                    "_proc_us": np.int64(elapsed_us // n),
                }
            )
            yield out

    return extract_batches


def extract_turns(
    df: DataFrame,
    boilerplate_mode: str = "reference",
    route_partitions: int | None = None,
    keep_metrics_cols: bool = False,
) -> DataFrame:
    """transcripts → extracted rows (EXTRACTED_SCHEMA).

    Repartitions by (conv_id, turn_idx) — turn-level salting against whale
    conversations — then runs the Arrow-batched extraction, which sniffs
    content type in-batch.

    Round-8 note: the sniff used to run as a SEPARATE pandas UDF before the
    routing shuffle so the repartition key could include content_type. But
    (conv_id, turn_idx) is already unique per row, so hashing the extra
    column changes nothing about the distribution (partitions were never
    content-homogeneous), while the pre-shuffle ArrowEvalPython node cost a
    second full JVM→Python→JVM round trip for every row (guide §4.1) and
    shuffled one extra string column. The extraction UDF has always sniffed
    in-batch when content_type is absent; routing now relies on that.
    """
    # explicit projection: Catalyst cannot prune through mapInPandas (the
    # UDF is a black box receiving every child column), so unused transcript
    # columns (role/tool/ts) would otherwise be scanned AND shuffled
    typed = df.select("conv_id", "turn_idx", "text")
    if route_partitions == 0:
        pass  # no routing shuffle (streaming micro-batches are pre-split)
    elif route_partitions:
        typed = typed.repartition(
            route_partitions, F.col("conv_id"), F.col("turn_idx")
        )
    else:
        typed = typed.repartition(F.col("conv_id"), F.col("turn_idx"))
    out = typed.mapInPandas(
        make_extract_udf(boilerplate_mode), schema=EXTRACT_OUTPUT_SCHEMA
    )
    if not keep_metrics_cols:
        out = out.drop("_n_bytes", "_proc_us")
    return out


def bucket_id(col: str | Column = "conv_id", n_buckets: int = 64) -> Column:
    """Stable storage-partition id (Iceberg ``bucket(conv_id)`` analog)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.pmod(F.xxhash64(c), F.lit(n_buckets)).cast("int")
