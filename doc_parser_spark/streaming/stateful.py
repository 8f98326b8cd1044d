"""Custom stateful streaming operator — applyInPandasWithState.

Streaming analog of operators/conversation.with_conversation_context: as
transcript turns stream in, each conversation carries (active_title,
active_section, n_turns_seen) state across micro-batches. This is the
"custom stateful operator" pattern (SURVEY.md §1.4: Structured Streaming +
applyInPandasWithState) the reference's request/response service never
needed — a stream of turns does.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from doc_parser_spark.datamodel import LABEL_SECTION_HEADER, LABEL_TITLE

STATEFUL_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("active_title", T.StringType(), True),
        T.StructField("active_section", T.StringType(), True),
        T.StructField("n_turns_seen", T.LongType(), False),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("title", T.StringType(), True),
        T.StructField("section", T.StringType(), True),
        T.StructField("n_seen", T.LongType(), True),
    ]
)


def _context_fn(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        title, section, n_seen = state.get
    else:
        title, section, n_seen = None, None, 0
    conv_id = key[0]
    for pdf in pdfs:
        pdf = pdf.sort_values("turn_idx")
        out_title, out_section, out_seen = [], [], []
        for text, spans in zip(pdf["extracted_text"], pdf["spans"]):
            if spans is not None and text is not None:
                for s in spans:
                    if s["label"] == LABEL_TITLE:
                        title, section = text[s["start"] : s["end"]], None
                    elif s["label"] == LABEL_SECTION_HEADER:
                        section = text[s["start"] : s["end"]]
            n_seen += 1
            out_title.append(title)
            out_section.append(section)
            out_seen.append(n_seen)
        yield pd.DataFrame(
            {
                "conv_id": conv_id,
                "turn_idx": pdf["turn_idx"].astype("int32"),
                "active_title": out_title,
                "active_section": out_section,
                "n_turns_seen": out_seen,
            }
        )
    state.update((title, section, n_seen))


def conversation_context_stream(extracted_stream: DataFrame) -> DataFrame:
    """Streaming extracted rows → per-turn active heading context with
    conversation state persisted across micro-batches."""
    return extracted_stream.groupBy("conv_id").applyInPandasWithState(
        _context_fn,
        outputStructType=STATEFUL_OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
