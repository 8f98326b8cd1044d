"""Fragment-routing semantics: prose with inline tags must NOT route to the
HTML walker, routed fragments must keep their floating text, and a fragment
whose walk yields nothing must demote to partial with a plain-text fallback.

These cases are the content-loss scenarios from the round-1 advisory: payloads
like 'use <b>bold</b> text sparingly' previously extracted to '' with
parse_status='success'.
"""

from __future__ import annotations

import pandas as pd

from doc_parser_spark.datamodel import (
    CT_HTML,
    CT_PLAIN,
    STATUS_PARTIAL,
    STATUS_SUCCESS,
)
from doc_parser_spark.functions.html_extract import extract_html
from doc_parser_spark.operators.extract import _extract_one
from doc_parser_spark.sources.sniff import sniff_series, sniff_text


PROSE_INLINE = "use <b>bold</b> text sparingly in prose"
PROSE_ANGLES = "compare a<b and c>d thresholds"
FRAG_TRAILING = "<p>x</p> trailing text"
FRAG_BLOCKS = "<div>a</div><p>b</p><ul><li>c</li></ul>"
FULL_DOC = "<html><body><p>hello</p></body></html>"
FRAG_IMG_ONLY = '<img src="x.png">'
PROSE_ONE_BLOCK_MID = "Some long prose first, then <p>one block</p> later"


class TestSniffFragmentProbe:
    def test_inline_tags_stay_plain(self):
        assert sniff_text(PROSE_INLINE) == CT_PLAIN

    def test_angle_prose_stays_plain(self):
        assert sniff_text(PROSE_ANGLES) == CT_PLAIN

    def test_block_start_routes_html(self):
        assert sniff_text(FRAG_TRAILING) == CT_HTML
        assert sniff_text(FRAG_BLOCKS) == CT_HTML

    def test_full_doc_routes_html(self):
        assert sniff_text(FULL_DOC) == CT_HTML

    def test_single_mid_block_stays_plain(self):
        # one block tag buried in prose does not dominate the head
        assert sniff_text(PROSE_ONE_BLOCK_MID) == CT_PLAIN

    def test_many_mid_blocks_route_html(self):
        payload = "intro " + "<p>a</p><p>b</p><p>c</p>"
        assert sniff_text(payload) == CT_HTML

    def test_vectorized_matches_scalar(self):
        payloads = [
            PROSE_INLINE, PROSE_ANGLES, FRAG_TRAILING, FRAG_BLOCKS,
            FULL_DOC, FRAG_IMG_ONLY, PROSE_ONE_BLOCK_MID, None, "   ",
            "# md heading\nbody", "plain words only",
        ]
        vec = sniff_series(pd.Series(payloads)).tolist()
        scalar = [sniff_text(p) for p in payloads]
        assert vec == scalar


class TestFragmentWalk:
    def test_trailing_text_kept(self):
        text, spans = extract_html(FRAG_TRAILING)
        assert "x" in text and "trailing text" in text

    def test_floating_text_around_inline_tags(self):
        text, _ = extract_html("<h1>T</h1>mid <b>bold</b> tail")
        assert "mid bold tail" in text

    def test_floating_before_block(self):
        text, _ = extract_html("lead text<p>para</p>")
        assert "lead text" in text and "para" in text

    def test_full_doc_body_floating_unchanged(self):
        # reference parity: floating text directly under <body> stays dropped
        text, _ = extract_html("<html><body>floating<p>para</p></body></html>")
        assert text == "para"


class TestStatusFallback:
    def test_inline_prose_roundtrips_via_plain(self):
        extracted, _, status = _extract_one(
            sniff_text(PROSE_INLINE), PROSE_INLINE, "reference"
        )
        assert status == STATUS_SUCCESS
        assert "bold" in extracted and "sparingly" in extracted

    def test_fragment_with_content_success(self):
        extracted, _, status = _extract_one(CT_HTML, FRAG_TRAILING, "reference")
        assert status == STATUS_SUCCESS
        assert "trailing text" in extracted

    def test_empty_walk_fragment_demotes_to_partial(self):
        extracted, _, status = _extract_one(CT_HTML, FRAG_IMG_ONLY, "reference")
        assert status == STATUS_PARTIAL
        assert extracted  # plain fallback keeps the payload

    def test_empty_full_doc_stays_success(self):
        # a genuinely empty full document is an empty success, not partial
        extracted, _, status = _extract_one(
            CT_HTML, "<html><body><div></div></body></html>", "reference"
        )
        assert status == STATUS_SUCCESS
        assert extracted == ""


class TestFragmentNoLossFuzz:
    def test_fragment_words_survive(self):
        """Property: for a routed HEADER-FREE block fragment made of prose
        runs, inline tags, and <p>/<ul> blocks, every prose word appears in
        the extracted text — the advisory's silent content loss cannot
        recur. (Headers invoke the reference furniture rule, which
        legitimately drops pre-heading content — covered separately.)"""
        import random

        rng = random.Random(11)
        for trial in range(300):
            words = [f"w{trial}x{i}" for i in range(rng.randint(1, 12))]
            pieces = [f"<p>{words[0]}</p>"]  # ensure block-led fragment
            for w in words[1:]:
                kind = rng.randint(0, 5)
                if kind == 0:
                    pieces.append(f" {w} ")
                elif kind == 1:
                    tag = rng.choice(["b", "em", "span", "a"])
                    pieces.append(f"<{tag}>{w}</{tag}>")
                elif kind == 2:
                    pieces.append(f"<p>{w}</p>")
                elif kind == 3:
                    pieces.append(f"<ul><li>{w}</li></ul>")
                elif kind == 4:
                    pieces.append(f"<div>{w} <b>{w}b</b></div>")
                else:
                    pieces.append(f"<div>{w}")  # unclosed div swallows rest
            payload = "".join(pieces)
            ct = sniff_text(payload)
            assert ct in (CT_HTML, CT_PLAIN)
            extracted, _, status = _extract_one(ct, payload, "reference")
            assert status == STATUS_SUCCESS
            for w in words:
                assert w in extracted, (trial, w, payload, extracted)

    def test_fragment_div_keeps_buffered_text(self):
        """In fragment mode, text buffered inside a <div> whose last child
        is an element is kept (lossless mode); in a full document the same
        div drops it — the reference's own sibling-scan behavior."""
        frag = "<p>a</p><div>hello <b>world</b></div>"
        text, _ = extract_html(frag)
        assert "hello world" in text
        full = f"<html><body>{frag}</body></html>"
        text_full, _ = extract_html(full)
        assert "hello" not in text_full  # reference-exact for full docs

    def test_fragment_furniture_rule_still_applies(self):
        # reference rule: a fragment WITH a header keeps the layer semantics —
        # content before the first heading is furniture
        text, _ = extract_html("<p>lead</p><h2>Head</h2><p>body</p>")
        assert "lead" not in text
        assert "Head" in text and "body" in text
