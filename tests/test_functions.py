"""Unit tests for the pure extraction kernels (no Spark).

Fixture expectations follow the reference rules documented in SURVEY.md §2
(file:line citations in each module).
"""

from __future__ import annotations

import pandas as pd
import pytest

from doc_parser_spark.datamodel import (
    CT_EMPTY,
    CT_HTML,
    CT_PDF,
    CT_PLAIN,
    LABEL_CODE,
    LABEL_LIST_ITEM,
    LABEL_PARAGRAPH,
    LABEL_SECTION_HEADER,
    LABEL_TABLE,
    LABEL_TEXT,
    LABEL_TITLE,
)
from doc_parser_spark.functions.html_extract import (
    extract_html,
    extract_html_items,
    parse_table_grid,
)
from doc_parser_spark.functions.htmldom import parse_html
from doc_parser_spark.functions.pdfish_extract import extract_pdfish
from doc_parser_spark.functions.plain_extract import extract_plain, split_paragraphs
from doc_parser_spark.functions.quality import rate_text_quality
from doc_parser_spark.functions.sanitize import sanitize_text
from doc_parser_spark.sources.sniff import sniff_series, sniff_text


# ---------------------------------------------------------------------------
# plain text (pymupdf_backend.py:88-121 semantics)
# ---------------------------------------------------------------------------
class TestPlain:
    def test_blank_line_flush(self):
        text = "line one\nline two\n\nline three"
        assert split_paragraphs(text) == ["line one line two", "line three"]

    def test_whitespace_only_line_flushes(self):
        assert split_paragraphs("a\n   \nb") == ["a", "b"]

    def test_strip_each_line(self):
        assert split_paragraphs("  a  \n  b  ") == ["a b"]

    def test_internal_spaces_preserved(self):
        assert split_paragraphs("a  b\nc") == ["a  b c"]

    def test_empty(self):
        assert split_paragraphs("") == []
        assert split_paragraphs("\n\n\n") == []

    def test_spans(self):
        text, spans = extract_plain("p one\n\np two")
        assert text == "p one\n\np two"
        assert spans == [(0, 5, LABEL_PARAGRAPH, 1), (7, 12, LABEL_PARAGRAPH, 1)]
        for s, e, _, _ in spans:
            assert "\n" not in text[s:e]


# ---------------------------------------------------------------------------
# sanitize (page_assemble_model.py:34-65 semantics)
# ---------------------------------------------------------------------------
class TestSanitize:
    def test_hyphen_dewrap(self):
        assert sanitize_text(["exam-", "ple text"]) == "example text"

    def test_hyphen_dewrap_strips_trailing_hyphen_only(self):
        # prev line's hyphen is removed; the next line joins with no space
        assert sanitize_text(["exam-", "- dash"]) == "exam- dash"
        assert sanitize_text(["exam -", "ple"]) == "exam ple"

    def test_plain_join(self):
        assert sanitize_text(["one", "two"]) == "one two"

    def test_unicode_map(self):
        # normalization only runs on the multi-line path
        assert sanitize_text(["it’s “x”", "• y ⁄ z"]) == "it's \"x\" · y / z"

    def test_single_line_early_return_is_raw(self):
        # exact reference behavior (page_assemble_model.py:35-37): single-line
        # input returns early — NO normalization, NO strip
        assert sanitize_text(["it’s “x” • y ⁄ z"]) == "it’s “x” • y ⁄ z"
        assert sanitize_text([" padded "]) == " padded "

    def test_single_line(self):
        assert sanitize_text(["only"]) == "only"


# ---------------------------------------------------------------------------
# quality (page_preprocessing_model.py:116-141 semantics)
# ---------------------------------------------------------------------------
class TestQuality:
    def test_garbage_zero(self):
        assert rate_text_quality("text with � char") == 0.0
        assert rate_text_quality("GLYPH<1a> rest") == 0.0
        assert rate_text_quality("/G12/G34 rest") == 0.0
        assert rate_text_quality("/word /token more") == 0.0

    def test_clean_one(self):
        assert rate_text_quality("a perfectly normal sentence") == 1.0

    def test_fragmented_penalty(self):
        frag = "A/bc.de/fg.hi"
        text = " ".join([frag] * 3)
        assert rate_text_quality(text) == pytest.approx(0.7)
        # below threshold: no penalty
        assert rate_text_quality(" ".join([frag] * 2)) == 1.0


# ---------------------------------------------------------------------------
# sniff (document.py:440-506 semantics)
# ---------------------------------------------------------------------------
class TestSniff:
    def test_basic(self):
        assert sniff_text("<html><body><p>x</p></body></html>") == CT_HTML
        assert sniff_text("<!DOCTYPE html><p>x</p>") == CT_HTML
        assert sniff_text("<p>fragment</p>") == CT_HTML
        assert sniff_text("%PDF-SIM\n#page 1 612 792") == CT_PDF
        assert sniff_text("just words") == CT_PLAIN
        assert sniff_text("") == CT_EMPTY
        assert sniff_text("   \n ") == CT_EMPTY
        assert sniff_text(None) == CT_EMPTY

    def test_comment_stripped_probe(self):
        assert sniff_text("<!-- c --><html><p>x</p></html>") == CT_HTML

    def test_series_matches_scalar(self):
        texts = [
            "<html><p>a</p></html>",
            "plain stuff",
            "%PDF-SIM",
            "",
            None,
            "<div>block</div>",
            "a < b and c > d",
        ]
        s = pd.Series(texts)
        vec = sniff_series(s).tolist()
        scalar = [sniff_text(t) for t in texts]
        assert vec == scalar


# ---------------------------------------------------------------------------
# HTML extraction (html_backend.py semantics)
# ---------------------------------------------------------------------------
class TestHtml:
    def test_furniture_before_first_heading(self):
        html = (
            "<html><body><p>junk nav</p><h1>Title</h1><p>body text</p>"
            "</body></html>"
        )
        items = extract_html_items(html)
        layers = [(i.label, i.layer, i.text) for i in items]
        assert layers == [
            (LABEL_TEXT, "furniture", "junk nav"),
            (LABEL_TITLE, "body", "Title"),
            (LABEL_TEXT, "body", "body text"),
        ]
        text, spans = extract_html(html)
        assert text == "Title\n\nbody text"
        assert spans == [(0, 5, LABEL_TITLE, 1), (7, 16, LABEL_TEXT, 1)]

    def test_no_heading_all_body(self):
        html = "<html><body><p>alpha</p><p>beta</p></body></html>"
        text, _ = extract_html(html)
        assert text == "alpha\n\nbeta"

    def test_br_newline(self):
        html = "<body><h1>T</h1><p>one<br>two</p></body>"
        text, _ = extract_html(html)
        assert text == "T\n\none\ntwo"

    def test_heading_hierarchy_labels(self):
        html = "<body><h1>A</h1><h3>B</h3><h2>C</h2><p>x</p></body>"
        items = [i for i in extract_html_items(html)]
        assert [i.label for i in items] == [
            LABEL_TITLE,
            LABEL_SECTION_HEADER,
            LABEL_SECTION_HEADER,
            LABEL_TEXT,
        ]
        assert items[1].level == 2  # h3 → level 2 (hlevel-1)
        assert items[2].level == 1

    def test_ordered_list_start_markers(self):
        html = (
            '<body><h1>T</h1><ol start="3"><li>aa</li><li>bb</li></ol></body>'
        )
        text, _ = extract_html(html)
        assert text == "T\n\n3. aa\n\n4. bb"

    def test_ordered_list_no_start_positional(self):
        html = "<body><h1>T</h1><ol><li>aa</li><li>bb</li></ol></body>"
        text, _ = extract_html(html)
        # no start attr → reference marker is "", we render positional N.
        assert text == "T\n\n1. aa\n\n2. bb"

    def test_unordered_list(self):
        html = "<body><h1>T</h1><ul><li>aa</li><li>bb</li></ul></body>"
        text, _ = extract_html(html)
        assert text == "T\n\n- aa\n\n- bb"

    def test_nested_list_item_text_excludes_sublist(self):
        html = (
            "<body><h1>T</h1><ul><li>outer text<ul><li>inner</li></ul></li>"
            "</ul></body>"
        )
        items = extract_html_items(html)
        li = [i for i in items if i.label == LABEL_LIST_ITEM]
        assert [i.text for i in li] == ["outer text", "inner"]

    def test_table_grid(self):
        html = (
            "<table><tr><th>h1</th><th>h2</th></tr>"
            "<tr><td>a</td><td>b</td></tr></table>"
        )
        grid = parse_table_grid(parse_html(html).find("table"))
        assert grid == [["h1", "h2"], ["a", "b"]]

    def test_table_colspan(self):
        html = (
            '<table><tr><td colspan="2">w</td></tr>'
            "<tr><td>a</td><td>b</td></tr></table>"
        )
        grid = parse_table_grid(parse_html(html).find("table"))
        assert grid == [["w", "w"], ["a", "b"]]

    def test_table_rowspan(self):
        html = (
            '<table><tr><td rowspan="2">r</td><td>b</td></tr>'
            "<tr><td>c</td></tr></table>"
        )
        grid = parse_table_grid(parse_html(html).find("table"))
        assert grid == [["r", "b"], ["r", "c"]]

    def test_nested_table_skipped(self):
        html = "<table><tr><td><table><tr><td>x</td></tr></table></td></tr></table>"
        assert parse_table_grid(parse_html(html).find("table")) is None

    def test_floating_div_text(self):
        html = "<body><div>floating words<p>para</p></div></body>"
        items = extract_html_items(html)
        assert [(i.label, i.text) for i in items] == [
            (LABEL_TEXT, "floating words"),
            (LABEL_TEXT, "para"),
        ]

    def test_pre_code(self):
        html = "<body><h1>T</h1><pre>x = 1</pre></body>"
        items = extract_html_items(html)
        assert items[1].label == LABEL_CODE
        assert items[1].text == "x = 1"

    def test_header_flips_layer_back_to_body(self):
        html = "<body><p>furn</p><h2>S</h2><p>body</p></body>"
        items = extract_html_items(html)
        assert [i.layer for i in items] == ["furniture", "body", "body"]

    def test_entities_decoded(self):
        html = "<body><p>a &amp; b &lt;c&gt;</p></body>"
        text, _ = extract_html(html)
        assert text == "a & b <c>"

    def test_malformed_tolerated(self):
        html = "<body><h1>T</h1><p>unclosed <b>bold"
        text, _ = extract_html(html)
        assert "unclosed bold" in text

    def test_density_mode_strips_nav(self):
        html = (
            "<body><h1>T</h1>"
            '<nav><ul><li><a href="#">nav one</a></li></ul></nav>'
            '<p><a href="#">all link text here</a></p>'
            "<p>real article content with plenty of words</p></body>"
        )
        ref_text, _ = extract_html(html, boilerplate_mode="reference")
        den_text, _ = extract_html(html, boilerplate_mode="density")
        assert "nav one" in ref_text
        assert "nav one" not in den_text
        assert "all link text here" not in den_text
        assert "real article content" in den_text

    def test_table_in_body_rendered(self):
        html = (
            "<body><h1>T</h1><table><tr><th>a</th></tr><tr><td>b</td></tr>"
            "</table></body>"
        )
        text, spans = extract_html(html)
        assert "| a |" in text and "| b |" in text
        assert spans[1][2] == LABEL_TABLE


# ---------------------------------------------------------------------------
# PDF-ish extraction
# ---------------------------------------------------------------------------
class TestPdfish:
    PAYLOAD = "\n".join(
        [
            "%PDF-SIM",
            "#page 1 612.0 792.0",
            "72.0 20.0 300.0 32.0 Confidential header",
            "72.0 100.0 250.0 112.0 first half",
            "255.0 100.0 480.0 112.0 second half",
            "72.0 114.0 480.0 126.0 continuation line",
            "72.0 180.0 480.0 192.0 new paragraph here",
            "72.0 770.0 300.0 782.0 Page 1 of 1",
        ]
    )

    def test_header_footer_stripped(self):
        text, _ = extract_pdfish(self.PAYLOAD)
        assert "Confidential" not in text
        assert "Page 1 of 1" not in text

    def test_cell_merge_and_paragraphs(self):
        text, spans = extract_pdfish(self.PAYLOAD)
        paras = text.split("\n\n")
        assert paras == [
            "first half second half continuation line",
            "new paragraph here",
        ]
        assert len(spans) == 2
        assert all(s[2] == LABEL_PARAGRAPH for s in spans)

    def test_hyphen_dewrap_across_lines(self):
        payload = "\n".join(
            [
                "%PDF-SIM",
                "#page 1 612.0 792.0",
                "72.0 100.0 480.0 112.0 hyphen exam-",
                "72.0 114.0 480.0 126.0 ple continues",
            ]
        )
        text, _ = extract_pdfish(payload)
        assert text == "hyphen example continues"

    def test_empty(self):
        assert extract_pdfish("%PDF-SIM\n") == ("", [])

    def test_multi_page_order(self):
        payload = "\n".join(
            [
                "%PDF-SIM",
                "#page 1 612.0 792.0",
                "72.0 100.0 480.0 112.0 page one text",
                "#page 2 612.0 792.0",
                "72.0 100.0 480.0 112.0 page two text",
            ]
        )
        text, spans = extract_pdfish(payload)
        assert text == "page one text\n\npage two text"
        assert [s[3] for s in spans] == [1, 2]


class TestDensityScoring:
    def test_short_linky_block_dropped(self):
        html = (
            "<body><h1>T</h1>"
            '<p>see <a href="#">here</a> and <a href="#">there</a> now</p>'
            "<p>a genuinely long article paragraph with many words that "
            'mentions <a href="#">one link</a> but is mostly real prose '
            "content going on and on about the subject at hand in detail"
            "</p></body>"
        )
        den, _ = extract_html(html, boilerplate_mode="density")
        assert "see" not in den  # short + link-heavy → furniture
        assert "genuinely long article" in den  # long, low density → kept

    def test_long_low_density_kept_even_with_links(self):
        words = " ".join(["word"] * 40)
        html = f'<body><h1>T</h1><p>{words} <a href="#">x</a></p></body>'
        den, _ = extract_html(html, boilerplate_mode="density")
        assert "word word" in den


class TestPdfishColumns:
    TWO_COL = "\n".join(
        [
            "%PDF-SIM",
            "#page 1 612.0 792.0",
            # left column (x 50-280), right column (x 320-560): same y rows
            "50.0 100.0 280.0 112.0 left column first line",
            "320.0 100.0 560.0 112.0 right column first line",
            "50.0 114.0 280.0 126.0 left column second line",
            "320.0 114.0 560.0 126.0 right column second line",
        ]
    )

    def test_two_column_reading_order(self):
        text, spans = extract_pdfish(self.TWO_COL)
        assert text == (
            "left column first line left column second line"
            "\n\n"
            "right column first line right column second line"
        )

    def test_single_column_row_join_unchanged(self):
        # two far-apart cells but only ONE per band → not multi-column;
        # the visual row joins left-to-right (previous behavior)
        payload = "\n".join(
            [
                "%PDF-SIM",
                "#page 1 612.0 792.0",
                "50.0 100.0 200.0 112.0 alpha",
                "400.0 100.0 560.0 112.0 beta",
            ]
        )
        text, _ = extract_pdfish(payload)
        assert text == "alpha beta"


class TestSnifferCorpusParity:
    def test_vectorized_equals_scalar_on_corpus(self):
        import random

        from doc_parser_spark.sources.transcripts import payload_for

        rng = random.Random(99)
        texts = [payload_for(rng) for _ in range(400)]
        s = pd.Series(texts)
        assert sniff_series(s).tolist() == [sniff_text(t) for t in texts]
