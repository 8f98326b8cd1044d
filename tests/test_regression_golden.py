"""Golden-baseline regression (reference test strategy, SURVEY.md §5).

Mirrors genon/preprocessor/tests/regression/*: a checked-in JSON baseline of
the seeded corpus's extraction — exact row count, exact label distribution,
exact total characters, and a per-turn sha256 of (conv_id, turn_idx,
extracted_text) — but with EXACT equality (we own both sides; the
reference's 0.85-similarity slack exists for model drift we don't have).

Regenerate after an intentional semantic change:
    GEN_TEST_DATA=1 python -m pytest tests/test_regression_golden.py
(the reference's update-baseline flag, tests/test_data_gen_flag.py analog).
"""

from __future__ import annotations

import hashlib
import json
import os
from pathlib import Path

import pytest

GOLDEN = Path(__file__).parent / "goldens" / "extraction_baseline.json"
GEN = os.environ.get("GEN_TEST_DATA") == "1"


def _current(spark, transcripts_pdf) -> dict:
    from doc_parser_spark.operators.extract import extract_turns

    out = (
        extract_turns(spark.createDataFrame(transcripts_pdf))
        .orderBy("conv_id", "turn_idx")
        .toPandas()
    )
    label_dist: dict[str, int] = {}
    for spans in out["spans"]:
        if spans is None:
            continue
        for s in spans:
            label_dist[s["label"]] = label_dist.get(s["label"], 0) + 1
    turn_hashes = [
        hashlib.sha256(
            f"{c}|{t}|{x if x is not None else '<null>'}".encode()
        ).hexdigest()[:16]
        for c, t, x in zip(out["conv_id"], out["turn_idx"], out["extracted_text"])
    ]
    return {
        "num_rows": int(len(out)),
        "status_distribution": {
            k: int(v) for k, v in out["parse_status"].value_counts().items()
        },
        "content_type_distribution": {
            k: int(v) for k, v in out["content_type"].value_counts().items()
        },
        "label_distribution": dict(sorted(label_dist.items())),
        "total_characters": int(out["n_char"].sum()),
        "corpus_digest": hashlib.sha256(
            "".join(turn_hashes).encode()
        ).hexdigest(),
    }


def test_extraction_matches_golden(spark, transcripts_pdf):
    current = _current(spark, transcripts_pdf)
    if GEN or not GOLDEN.exists():
        GOLDEN.parent.mkdir(exist_ok=True)
        GOLDEN.write_text(json.dumps(current, indent=2) + "\n")
        if GEN:
            pytest.skip("baseline regenerated")
    golden = json.loads(GOLDEN.read_text())
    assert current["num_rows"] == golden["num_rows"]
    assert current["status_distribution"] == golden["status_distribution"]
    assert (
        current["content_type_distribution"]
        == golden["content_type_distribution"]
    )
    assert current["label_distribution"] == golden["label_distribution"]
    assert current["total_characters"] == golden["total_characters"]
    assert current["corpus_digest"] == golden["corpus_digest"], (
        "per-turn extraction drift: some turn's extracted_text changed"
    )
