"""Adversarial synthetic annotated pages for the heuristic layout model
(round-5 verdict #5: the F1 0.829 figure rested on ONE annotated asset).

sources/synth_layout.py constructs pages attacking known blind spots —
an UNRULED table (spreadsheet export: no grid for the ruling-cluster
detector), multi-column text with a figure, a ruled-table control — with
COCO groundtruth known by construction. Criterion from the verdict: no
label below 0.7; measured 1.0 on every label (docs/PARITY.md)."""

from __future__ import annotations

import pytest

from doc_parser_spark.functions.layout_eval import evaluate_layout
from doc_parser_spark.functions.layout_model import (
    _unruled_tables,
    layout_result_rows,
)
from doc_parser_spark.functions.pdfish_extract import Cell


@pytest.fixture(scope="module")
def score():
    from doc_parser_spark.sources.synth_layout import build_adversarial_pages

    pdf, coco = build_adversarial_pages()
    return evaluate_layout(coco, layout_result_rows(pdf))


LABELS = ["title", "section_header", "text", "list_item", "table",
          "picture", "caption"]


class TestAdversarialSuite:
    def test_every_label_at_least_0_7(self, score):
        for lab in LABELS:
            assert score["per_label"][lab]["f1"] >= 0.7, (
                lab, score["per_label"][lab]
            )

    def test_global_floor(self, score):
        assert score["f1_score"] >= 0.9
        assert score["class_accuracy"] >= 0.9

    def test_unruled_table_is_found_as_table(self, score):
        # page 1's table has zero rulings: only the alignment detector
        # can produce this TP
        d = score["per_label"]["table"]
        assert d["n_gt"] == 2 and d["TP"] == 2

    def test_multi_column_stays_split(self, score):
        # page 2: the two prose columns must match the two text GT boxes
        # (a cross-gutter merge would produce one wide block, IoU < 0.2
        # against both column GTs)
        page2_text_matches = [
            m for m in score["matches"]
            if m["gt_class"] == "text" == m["result_class"]
        ]
        assert len(page2_text_matches) >= 4  # 2 col blocks + 2 page-1 paras


class TestUnruledDetector:
    def _cells(self, rows, cols, y0=700, step=20, w=40, h=10):
        out = []
        for r in range(rows):
            for x in cols:
                top = y0 + r * step
                out.append(Cell(1, x, top, x + w, top + h, "v"))
        return sorted(out, key=lambda c: (c.y0, c.x0))

    def test_grid_detected(self):
        boxes = _unruled_tables(self._cells(4, [90, 220, 350]))
        assert len(boxes) == 1
        x0, y0, x1, y1 = boxes[0]
        assert (x0, y0) == (90, 700) and x1 == 390 and y1 == 770

    def test_two_rows_not_enough(self):
        assert _unruled_tables(self._cells(2, [90, 220, 350])) == []

    def test_two_columns_not_enough(self):
        # two-column prose layouts must NEVER read as tables
        assert _unruled_tables(self._cells(6, [90, 350])) == []

    def test_misaligned_rows_break_the_run(self):
        a = self._cells(2, [90, 220, 350], y0=700)
        b = self._cells(2, [110, 260, 420], y0=740)
        assert _unruled_tables(sorted(a + b, key=lambda c: (c.y0, c.x0))) == []

    def test_wide_vertical_gap_breaks_the_run(self):
        a = self._cells(2, [90, 220, 350], y0=700, step=20)
        b = self._cells(2, [90, 220, 350], y0=800, step=20)  # 50pt gap
        assert _unruled_tables(sorted(a + b, key=lambda c: (c.y0, c.x0))) == []


class TestFurnitureTocSuite:
    """Second adversarial set: furniture suppression (no GT for
    header/footer/page-number → any prediction is an FP, so precision
    pins it), dotted-leader TOC merge from a SINGLE chained block
    (the block-count trigger never fired — round-6 model fix switched
    to a dotted-row count), an unruled table with a missing cell, and
    hanging-indent list items whose lone '-' markers sit 38 pt left of
    their text (the same-baseline marker-continuation rule)."""

    @pytest.fixture(scope="class")
    def score2(self):
        from doc_parser_spark.sources.synth_layout import (
            build_furniture_toc_pages,
        )

        pdf, coco = build_furniture_toc_pages()
        return evaluate_layout(coco, layout_result_rows(pdf))

    def test_every_label_perfect(self, score2):
        for lab, d in score2["per_label"].items():
            assert d["f1"] >= 0.99, (lab, d)

    def test_furniture_suppressed(self, score2):
        # precision 1.0 == zero predictions for the unannotated
        # header/footer/page-number lines
        assert score2["precision"] >= 0.99

    def test_toc_merges_to_one_region(self, score2):
        d = score2["per_label"]["section_header"]
        assert d["n_gt"] == d["n_pred"] == d["TP"] == 1

    def test_hanging_indent_items_are_separate(self, score2):
        d = score2["per_label"]["list_item"]
        assert d["n_gt"] == d["n_pred"] == d["TP"] == 2
