"""Adversarial annotated layout pages (round-6: VERDICT r5 #5).

The heuristic layout model's F1 0.829 rested on ONE annotated asset (the
reference's BOK PDF). This module constructs pages that attack its known
blind spots — a table WITHOUT rulings, multi-column text with figures, and
a ruled-table control — with COCO groundtruth known BY CONSTRUCTION, so
per-label F1 can be published on more than one page set
(tests/test_layout_adversarial.py, docs/PARITY.md).

Coordinates are PDF bottom-up points; the COCO groundtruth is converted to
top-left pixel boxes the way functions/layout_eval.py expects (bbox
[x, y_top, w, h] against image width/height = page points).
"""

from __future__ import annotations

from doc_parser_spark.sources.synth_pdf import PAGE_H, PAGE_W, build_layout_pdf

# Helvetica average glyph advance ≈ 0.5 em for mixed text — groundtruth
# boxes only need IoU ≥ 0.2 against the decoder's metric-exact cells
_EM = 0.5


def _w(size: float, text: str) -> float:
    return _EM * size * len(text)


def _gt(page: int, label: str, x0: float, y_top_pdf: float,
        x1: float, y_bot_pdf: float) -> dict:
    """GT region from bottom-up pdf Y extents → COCO top-left bbox."""
    return {
        "page": page,
        "label": label,
        "bbox": [x0, PAGE_H - y_top_pdf, x1 - x0, y_top_pdf - y_bot_pdf],
    }


def _para(texts, gts, page, x, y0, size, lines, label="text", step=None):
    step = step or round(size * 1.3)
    for i, line in enumerate(lines):
        texts.append((x, y0 - i * step, size, line))
    x1 = x + max(_w(size, ln) for ln in lines)
    gts.append(_gt(page, label, x, y0 + size,
                   x1, y0 - (len(lines) - 1) * step - 0.25 * size))


def build_adversarial_pages() -> tuple[bytes, dict]:
    """Returns (pdf_bytes, coco_groundtruth) for the 3-page suite."""
    gts: list[dict] = []

    # ---- page 1: UNRULED table --------------------------------------
    t1: list[tuple] = []
    t1.append((72, 740, 16, "II. Quarterly Results"))
    gts.append(_gt(1, "title", 72, 756, 72 + _w(16, "II. Quarterly Results"),
                   736))
    _para(t1, gts, 1, 72, 688, 11, [
        "The quarterly figures below are reported without any grid",
        "rulings, exactly as the spreadsheet export renders them in",
        "this filing; the table must still be recognized as a table.",
    ])
    cols = (90, 220, 350, 480)
    rows_y = (600, 580, 560, 540, 520)
    cells = [
        ("Region", "Revenue", "Cost", "Margin"),
        ("North", "120.50", "80.20", "0.33"),
        ("South", "98.40", "61.75", "0.37"),
        ("East", "143.90", "99.10", "0.31"),
        ("West", "88.25", "54.60", "0.38"),
    ]
    for y, row in zip(rows_y, cells):
        for x, cell in zip(cols, row):
            t1.append((x, y, 10, cell))
    gts.append(_gt(1, "table", 90, 612, 480 + _w(10, "Margin"), 516))
    cap1 = "Table 1. Revenue by region"
    t1.append((90, 498, 9, cap1))
    gts.append(_gt(1, "caption", 90, 508, 90 + _w(9, cap1), 495))
    _para(t1, gts, 1, 72, 440, 11, [
        "Margins recovered across all regions during the period as",
        "logistics costs normalized after the first-quarter spike.",
    ])
    page1 = {"texts": t1}

    # ---- page 2: multi-column + figure ------------------------------
    t2: list[tuple] = []
    i2: list[tuple] = []
    t2.append((72, 740, 15, "IV. Market Overview"))
    gts.append(_gt(2, "title", 72, 755, 72 + _w(15, "IV. Market Overview"),
                   736))
    _para(t2, gts, 2, 72, 700, 10, [
        "Left column prose line one for the",
        "two column layout where each side",
        "must remain its own region and not",
        "bridge across the center gutter to",
        "the neighboring column even though",
        "the baselines align exactly row by",
        "row across the full page width as",
        "newspaper style layouts always do.",
    ])
    _para(t2, gts, 2, 320, 700, 10, [
        "Right column prose line one here,",
        "shorter than the left column, but",
        "still a contiguous block that ends",
        "above the figure placed below it.",
        "A final right column line closes.",
    ])
    i2.append((320, 440, 200, 130))
    gts.append(_gt(2, "picture", 320, 570, 520, 440))
    cap2 = "Fig 1. Adoption trend"
    t2.append((340, 425, 9, cap2))
    gts.append(_gt(2, "caption", 340, 435, 340 + _w(9, cap2), 422))
    # one GT box per marker line: each list marker opens its own block
    # (the BOK groundtruth annotates list items per item, not per group)
    for i, item in enumerate([
        "- first finding listed with a dash marker",
        "- second finding continues the list block",
    ]):
        y = 470 - i * 14
        t2.append((72, y, 10, item))
        gts.append(_gt(2, "list_item", 72, y + 10, 72 + _w(10, item),
                       y - 2.5))
    page2 = {"texts": t2, "images": i2}

    # ---- page 3: ruled-table control + header bar + figure ----------
    t3: list[tuple] = []
    r3: list[tuple] = []
    i3: list[tuple] = []
    t3.append((72, 740, 12, "<Overview>"))
    gts.append(_gt(3, "section_header", 72, 753, 72 + _w(12, "<Overview>"),
                   737))
    # ruled 4x3 grid: outer rect + 3 inner full-width h-rules
    r3.append((90, 560, 420, 120))
    for y in (590, 620, 650):
        r3.append((90, y, 420, 0.5))
    grid = [
        ("Metric", "2023", "2024"),
        ("Users", "1.2M", "1.9M"),
        ("Sessions", "8.4M", "11.2M"),
        ("Retention", "0.41", "0.47"),
    ]
    for y, row in zip((662, 632, 602, 572), grid):
        for x, cell in zip((100, 240, 380), row):
            t3.append((x, y, 10, cell))
    gts.append(_gt(3, "table", 90, 680, 510, 560))
    # thin decoration bar + numbered header text inside it
    r3.append((72, 500, 468, 16))
    t3.append((80, 504, 12, "2 Key Findings"))
    gts.append(_gt(3, "section_header", 72, 516, 540, 500))
    _para(t3, gts, 3, 72, 470, 11, [
        "Ruled tables with drawn grids remain the control case and",
        "must keep working while the unruled detector is added.",
    ])
    i3.append((350, 330, 160, 100))
    gts.append(_gt(3, "picture", 350, 430, 510, 330))
    cap3 = "Chart 2. Rates"
    t3.append((360, 315, 9, cap3))
    gts.append(_gt(3, "caption", 360, 325, 360 + _w(9, cap3), 312))
    page3 = {"texts": t3, "rects": r3, "images": i3}

    pdf = build_layout_pdf([page1, page2, page3])
    return pdf, _coco(gts, 3)


def _coco(gts: list[dict], n_pages: int) -> dict:
    return {
        "images": [
            {"id": p, "width": PAGE_W, "height": PAGE_H}
            for p in range(1, n_pages + 1)
        ],
        "categories": [
            {"id": i, "name": n}
            for i, n in enumerate(
                ["title", "section_header", "text", "list_item",
                 "table", "picture", "caption"], start=1
            )
        ],
        "annotations": [
            {
                "id": i,
                "image_id": g["page"],
                "category_id": {
                    "title": 1, "section_header": 2, "text": 3,
                    "list_item": 4, "table": 5, "picture": 6, "caption": 7,
                }[g["label"]],
                "bbox": g["bbox"],
            }
            for i, g in enumerate(gts, start=1)
        ],
    }


def build_furniture_toc_pages() -> tuple[bytes, dict]:
    """Second adversarial set (round 6): furniture suppression, dotted-
    leader TOC merging, an unruled table with a MISSING cell, and a
    hanging-indent list sliver. Header/footer/page-number lines get NO
    groundtruth — any prediction for them is a false positive, so the
    global precision pins the suppression behavior."""
    gts: list[dict] = []

    # ---- page 1: furniture + dotted-leader TOC ----------------------
    t1: list[tuple] = []
    t1.append((72, 770, 9, "INTERNAL REPORT 2024"))     # header band: no GT
    t1.append((300, 14, 9, "- 3 -"))                     # page number: no GT
    t1.append((72, 720, 15, "III. Contents"))
    gts.append(_gt(1, "title", 72, 735, 72 + _w(15, "III. Contents"), 716))
    toc_rows = [
        "1. Introduction " + "\xb7" * 30 + " 4",
        "2. Methodology " + "\xb7" * 31 + " 9",
        "3. Results " + "\xb7" * 35 + " 17",
        "4. Discussion " + "\xb7" * 32 + " 28",
    ]
    for i, row in enumerate(toc_rows):
        t1.append((90, 670 - i * 18, 11, row))
    # the whole dotted index merges into ONE section_header region
    gts.append(_gt(1, "section_header", 90, 681,
                   90 + max(_w(11, r) for r in toc_rows), 612))
    _para(t1, gts, 1, 72, 560, 11, [
        "Body text well below the index block stays its own region",
        "and must not be absorbed into the table of contents merge.",
    ])
    page1 = {"texts": t1}

    # ---- page 2: unruled table with a hole + hanging-indent list ----
    t2: list[tuple] = []
    t2.append((72, 770, 9, "INTERNAL REPORT 2024"))     # header: no GT
    t2.append((300, 14, 9, "- 4 -"))                     # footer: no GT
    cols = (90, 210, 330, 450)
    rows_y = (700, 682, 664, 646)
    grid = [
        ("Quarter", "Units", "Price", "Total"),
        ("Q1", "1200", "3.50", "4200.00"),
        ("Q2", "980", None, "3479.00"),                 # missing cell
        ("Q3", "1410", "3.55", "5005.50"),
    ]
    for y, row in zip(rows_y, grid):
        for x, cell in zip(cols, row):
            if cell is not None:
                t2.append((x, y, 10, cell))
    gts.append(_gt(2, "table", 90, 712, 450 + _w(10, "4200.00"), 642))
    # hanging-indent list: bare "-" marker far left, text deep-indented
    for i, item in enumerate([
        "first listed finding with its text deeply indented",
        "second listed finding continuing the same pattern",
    ]):
        y = 580 - i * 16
        t2.append((72, y, 10, "-"))
        t2.append((110, y, 10, item))
        gts.append(_gt(2, "list_item", 72, y + 10, 110 + _w(10, item),
                       y - 2.5))
    _para(t2, gts, 2, 72, 520, 11, [
        "Closing paragraph after the list, a separate text region.",
    ])
    page2 = {"texts": t2}

    pdf = build_layout_pdf([page1, page2])
    return pdf, _coco(gts, 2)
