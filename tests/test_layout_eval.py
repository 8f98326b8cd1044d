"""Layout-accuracy evaluation: the ported IoU/F1 harness scored on the
reference's OWN annotated evaluation asset (the only reference test asset
the repo had never exercised), plus hand-computed harness unit tests.

The reference ships a COCO-annotated Korean BOK report PDF
(facade/evaluation/test_files/) together with its NN pipeline's predictions
(result/recent_result.json). We score BOTH prediction sets with the same
ported harness (functions/layout_eval.py = evaluation.py:11-140 core):

    pipeline                      F1      class_acc  recall  precision
    reference NN (their result)   0.637   0.862      0.866   0.504
    ours (functions/layout_model) 0.829   0.899      0.888   0.778

i.e. the heuristic P3 replacement beats the reference's own RT-DETR-based
layout output on its own annotated asset on every global metric (their
boxes are tighter where matched: avg IoU 0.72 vs our 0.62). Numbers are
pinned with a small buffer so incidental decoder changes don't flap the
test, and the relative claim (ours >= theirs) is asserted directly.
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from doc_parser_spark.functions.layout_eval import (
    coco_to_groundtruth,
    evaluate_layout,
    f1_metrics,
    iou,
    match_bboxes,
)

EVAL = Path("/root/reference/genon/preprocessor/facade/evaluation/test_files")
GT_JSON = EVAL / "annotated/labeled_recent.json"
REF_RESULT = EVAL / "result/recent_result.json"
PDF = EVAL / "pdf/최근의 미국경제 상황과 평가(2024.8월).pdf"


class TestHarnessArithmetic:
    """Hand-computed values, independent of any engine (the float-checklist
    rule: unit-test VALUES from independent arithmetic)."""

    def test_iou_hand_computed(self):
        # boxes [0,1]x[0,1] and [0.5,1.5]x[0.5,1.5] → inter 0.25, union 1.75
        a = {"l": 0.0, "t": 1.0, "r": 1.0, "b": 0.0}
        b = {"l": 0.5, "t": 1.5, "r": 1.5, "b": 0.5}
        assert abs(iou(a, b) - 0.25 / 1.75) < 1e-5

    def test_iou_disjoint_and_identical(self):
        a = {"l": 0.0, "t": 0.5, "r": 0.5, "b": 0.0}
        b = {"l": 0.6, "t": 0.5, "r": 1.0, "b": 0.0}
        assert iou(a, b) == 0.0
        assert abs(iou(a, a) - 1.0) < 1e-5  # eps makes it 1/(1+eps)

    def test_greedy_matching_is_one_to_one_highest_iou_first(self):
        gt = [
            {"id": 1, "bbox": {"l": 0, "t": 1, "r": 1, "b": 0}, "page": 1,
             "category_name": "text"},
            {"id": 2, "bbox": {"l": 0, "t": 1, "r": 0.9, "b": 0}, "page": 1,
             "category_name": "table"},
        ]
        preds = [{"chunk_bboxes": [
            {"page": 1, "bbox": {"l": 0, "t": 1, "r": 1, "b": 0},
             "type": "text"},
        ]}]
        matches, acc = match_bboxes(gt, preds)
        # the single prediction can match only ONE gt — the higher-IoU one
        assert len(matches) == 1
        assert matches[0]["gt_id"] == 1
        assert acc == 1.0
        m = f1_metrics(matches, gt, preds)
        # TP=1 FP=0 FN=1 → precision 1, recall 0.5, F1 2/3
        assert m["TP"] == 1 and m["FP"] == 0 and m["FN"] == 1
        assert abs(m["f1_score"] - 2 / 3) < 1e-9

    def test_page_mismatch_never_matches(self):
        gt = [{"id": 1, "bbox": {"l": 0, "t": 1, "r": 1, "b": 0}, "page": 2,
               "category_name": "text"}]
        preds = [{"chunk_bboxes": [
            {"page": 1, "bbox": {"l": 0, "t": 1, "r": 1, "b": 0},
             "type": "text"}]}]
        matches, _ = match_bboxes(gt, preds)
        assert matches == []

    def test_coco_conversion_hand_computed(self):
        coco = {
            "images": [{"id": 3, "width": 200, "height": 100}],
            "categories": [{"id": 7, "name": "table"}],
            "annotations": [
                {"id": 9, "image_id": 3, "category_id": 7,
                 "bbox": [20, 10, 60, 30]}
            ],
        }
        (g,) = coco_to_groundtruth(coco)
        # x=20/200=0.1, r=80/200=0.4, t=(100-10)/100=0.9, b=(100-40)/100=0.6
        assert g["bbox"]["l"] == 0.1 and g["bbox"]["r"] == 0.4
        assert g["bbox"]["t"] == 0.9 and g["bbox"]["b"] == 0.6
        assert g["page"] == 3 and g["category_name"] == "table"


@pytest.mark.skipif(not GT_JSON.exists(), reason="reference asset missing")
class TestReferencePredictionsScore:
    """Harness validation: scoring the reference's OWN predictions must
    reproduce the figures recorded in docs/PARITY.md."""

    def test_reference_nn_score(self):
        r = evaluate_layout(str(GT_JSON), str(REF_RESULT))
        assert r["TP"] == 116 and r["FP"] == 114 and r["FN"] == 18
        assert abs(r["f1_score"] - 0.6374) < 5e-4
        assert abs(r["class_accuracy"] - 0.8621) < 5e-4
        assert abs(r["iou_stats"]["avg_iou"] - 0.7248) < 5e-4


@pytest.mark.skipif(not PDF.exists(), reason="reference asset missing")
class TestOurLayoutScore:
    @pytest.fixture(scope="class")
    def score(self):
        from doc_parser_spark.functions.layout_model import layout_result_rows

        rows = layout_result_rows(PDF.read_bytes())
        return evaluate_layout(str(GT_JSON), rows)

    def test_f1_floor(self, score):
        # measured 0.8293 (round 5), 0.8403 with the round-6 unruled-table
        # detector; floor leaves headroom for decoder-side drift
        assert score["f1_score"] >= 0.80

    def test_recall_and_precision_floors(self, score):
        assert score["recall"] >= 0.84
        assert score["precision"] >= 0.72

    def test_class_accuracy_floor(self, score):
        assert score["class_accuracy"] >= 0.85

    def test_beats_reference_nn_output(self, score):
        ref = evaluate_layout(str(GT_JSON), str(REF_RESULT))
        assert score["f1_score"] > ref["f1_score"]
        assert score["class_accuracy"] > ref["class_accuracy"]
        assert score["recall"] > ref["recall"]

    def test_per_label_floors(self, score):
        per = score["per_label"]
        # the classes that carry the document (59/10/9/10 TP measured)
        assert per["list_item"]["f1"] >= 0.70
        assert per["section_header"]["f1"] >= 0.75
        # 0.870 with the round-6 unruled-table detector (was 0.818)
        assert per["table"]["f1"] >= 0.78
        assert per["picture"]["recall"] >= 0.9


class TestLayoutModelOnSynthPdfs:
    """The layout model must run on every synthetic PDF the corpus
    generates (robustness: it shares the decoder with the extraction
    path)."""

    def test_synth_pdfs_produce_text_regions(self):
        from doc_parser_spark.functions.layout_model import layout_regions
        from doc_parser_spark.sources import synth_pdf

        for doc_id in range(6):
            data = synth_pdf.build_report_pdf(doc_id)
            regs = layout_regions(data)
            assert regs, f"no regions for synth pdf {doc_id}"
            assert all(
                0.0 <= r["bbox"]["l"] <= r["bbox"]["r"] <= 1.001
                and 0.0 <= r["bbox"]["b"] <= r["bbox"]["t"] <= 1.001
                for r in regs
            )
            assert any(r["type"] in ("text", "list_item") for r in regs)
