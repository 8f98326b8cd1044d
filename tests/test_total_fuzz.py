"""Total-robustness fuzz of the full sniff → extract router: ARBITRARY
unicode text (including binary-ish garbage via surrogateescape-free
codepoints, markup shards, control characters, deep nesting, format
magics spliced mid-string) must NEVER raise, always land in a valid
(status, content_type), keep spans well-formed inside the extracted
text, and be deterministic. The per-format property fuzzes cover
structured inputs; this covers the hostile remainder — a transcript
corpus at 100 TB contains everything."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from doc_parser_spark.datamodel import (
    STATUS_FAILURE,
    STATUS_PARTIAL,
    STATUS_SKIPPED,
    STATUS_SUCCESS,
)
from doc_parser_spark.operators.extract import _extract_one
from doc_parser_spark.sources.sniff import sniff_text

_STATUSES = {STATUS_SUCCESS, STATUS_PARTIAL, STATUS_FAILURE, STATUS_SKIPPED}

# adversarial ingredients: format magics, broken markup, control chars,
# combining marks, RTL, raw unicode soup
_SHARDS = st.sampled_from([
    "%PDF-1.7\n", "%PDF-SIM\n#page 1\n", "<html>", "</div>", "<table><tr>",
    "| a | b |\n|---|\n", "# head\n", "* item\n", "a,b,c\n1,2\n",
    "= Title\n", "<?xml version='1.0'?><article>", "<!DOCTYPE html>",
    "\x00\x01\x02", "‮‭", "é̊", "�﻿",
    "<li>", "```\n", "-----", "&amp;&bogus;", "<td colspan='x'>",
    "PK\x03\x04", "GIF89a", "\xff\xd8\xff",
])
_PAYLOAD = st.lists(
    st.one_of(_SHARDS, st.text(max_size=24)), min_size=0, max_size=12
).map("".join)


@settings(max_examples=300, deadline=None)
@given(_PAYLOAD)
def test_router_never_throws_and_output_is_well_formed(payload):
    ct = sniff_text(payload)
    for mode in ("reference", "density"):
        text, spans, status = _extract_one(ct, payload, mode)
        assert status in _STATUSES
        if status == STATUS_FAILURE:
            # the documented failure contract: no text, no spans
            assert text is None and spans is None
        else:
            assert isinstance(text, str)
            # spans (start, end, label, page): monotone, in-bounds, labeled
            prev_end = 0
            for sp in spans:
                start, end, label = sp[0], sp[1], sp[2]
                assert isinstance(label, str) and label
                assert 0 <= start <= end <= len(text)
                assert start >= prev_end
                prev_end = end
        if status == STATUS_SKIPPED:
            assert text == ""
        # deterministic
        text2, spans2, status2 = _extract_one(ct, payload, mode)
        assert (text2, status2) == (text, status)
        assert spans2 == spans


@settings(max_examples=120, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=0, max_codepoint=0x2FFF),
               max_size=200))
def test_router_survives_raw_unicode_soup(soup):
    ct = sniff_text(soup)
    text, spans, status = _extract_one(ct, soup, "reference")
    assert status in _STATUSES
    if status != STATUS_FAILURE:
        assert all(0 <= sp[0] <= sp[1] <= len(text) for sp in spans)
