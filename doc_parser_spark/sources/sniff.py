"""Content-type sniffing (S1) — vectorized port of the reference's probes.

The reference sniffs format from content (/root/reference/docling/datamodel/
document.py:306-506): HTML via a regex probe on the (comment-stripped,
lowercased) head (_detect_html_xhtml, document.py:440-477). We add the
``%PDF`` magic (mime-by-magic analog) and our %PDF-SIM cell-dump marker, and
classify whitespace-only payloads as ``empty``.

``sniff_series`` is the vectorized form used inside Arrow batches; it scans
only the head of each payload so cost is O(rows), not O(bytes).
"""

from __future__ import annotations

import re

import pandas as pd

from doc_parser_spark.datamodel import (
    CT_ASCIIDOC,
    CT_CSV,
    CT_EMPTY,
    CT_HTML,
    CT_JATS,
    CT_MARKDOWN,
    CT_USPTO,
    CT_PDF,
    CT_PLAIN,
)
from doc_parser_spark.functions.csv_extract import sniff_csv

HEAD_BYTES = 1024

_COMMENT_RE = re.compile(r"<!--(.*?)-->", re.DOTALL)
_XML_DECL_RE = re.compile(r"<\?xml")
_HTML_RE = re.compile(
    r"(<script.*?>.*?</script>\s*)?(<!doctype\s+html|<html|<head|<body)", re.DOTALL
)
# Fragment routing (transcript turns often carry fragments without
# <html>/<body>). Only BLOCK-level markup routes to the HTML walker, and only
# when markup dominates the head: the payload starts with a block tag, or the
# head carries several of them. Inline tags (<b>, <a>, <span>, ...) never
# route — prose like "use <b>bold</b> text sparingly" or "a<b and c>d" must
# stay plain, because the HTML walk keeps only block-item text and would
# silently drop such content (parse_status would still read success).
_BLOCK_TAGS = (
    r"(?:h[1-6]|p|div|ul|ol|li|table|pre|blockquote|nav|header|"
    r"footer|article|section|figure|img|br|hr)"
)
_HTML_FRAGMENT_TAG_RE = re.compile(rf"<{_BLOCK_TAGS}\b[^>]*>")
_FRAGMENT_MIN_TAGS = 3


def _is_html_fragment(content: str) -> bool:
    """content = comment-stripped, lowercased, lstripped head."""
    if _HTML_FRAGMENT_TAG_RE.match(content):
        return True
    return len(_HTML_FRAGMENT_TAG_RE.findall(content)) >= _FRAGMENT_MIN_TAGS
# JATS article probe: an xml-declared or root-level <article> with JATS
# structure markers in the head (B12; distinct from html5's <article> tag,
# which only appears after a doctype/html/body probe hit)
_JATS_RE = re.compile(r"^(?:<\?xml[^>]*>\s*)?(?:<!doctype\s+article[^>]*>\s*)?<article[\s>]")
_JATS_MARKER_RE = re.compile(r"<(?:front|article-meta|journal-meta)[\s>]")

# USPTO patent probe (B13): the four supported grammars' root elements
_USPTO_RE = re.compile(
    r"^(?:<\?xml[^>]*>\s*)?(?:<!doctype\s+[^>]*>\s*)?"
    r"<(?:us-patent-application|us-patent-grant|patent-application-publication"
    r"|patdoc)[\s>]"
)

# markdown probe: an ATX heading or fence at a line start in the head
_MD_RE = re.compile(r"(?m)^(?:#{1,6} |```)")
# asciidoc probe: the first non-blank line is a '=' title/section
_ADOC_RE = re.compile(r"^=+ \S")
# cheap vectorized CSV prefilter; confirmed by csv.Sniffer per candidate
_CSV_PREFILTER_RE = re.compile(r"^[^\n<]*[,;\t|][^\n]*\n", )


def sniff_text(text: str | None) -> str:
    """Classify one payload. Mirrors _detect_html_xhtml + magic bytes."""
    if text is None or not text.strip():
        return CT_EMPTY
    head = text[:HEAD_BYTES]
    if head.startswith("%PDF"):
        return CT_PDF
    content = _COMMENT_RE.sub("", head.lower()).lstrip()
    if _XML_DECL_RE.match(content) and "xhtml" in content[:1000]:
        return CT_HTML
    if _HTML_RE.match(content):
        return CT_HTML
    if _JATS_RE.match(content) and _JATS_MARKER_RE.search(content):
        return CT_JATS
    if head.startswith("PATN\n") or _USPTO_RE.match(content):
        return CT_USPTO
    if _ADOC_RE.match(head.lstrip()):
        return CT_ASCIIDOC
    if _MD_RE.search(head):
        return CT_MARKDOWN
    if _is_html_fragment(content):
        return CT_HTML
    if _CSV_PREFILTER_RE.match(head) and sniff_csv(text):
        return CT_CSV
    return CT_PLAIN


def sniff_series(texts: pd.Series) -> pd.Series:
    """Vectorized sniff over a pandas Series of payloads."""
    head = texts.fillna("").str.slice(0, HEAD_BYTES)
    stripped = head.str.strip()
    lowered = head.str.lower().str.replace(_COMMENT_RE, "", regex=True).str.lstrip()

    is_empty = stripped.eq("") | texts.isna()
    is_pdf = head.str.startswith("%PDF")
    is_xhtml = lowered.str.match(_XML_DECL_RE) & lowered.str.slice(0, 1000).str.contains(
        "xhtml", regex=False
    )
    is_html_full = lowered.str.match(_HTML_RE) | is_xhtml
    is_jats = lowered.str.match(_JATS_RE) & lowered.str.contains(
        _JATS_MARKER_RE, regex=True
    )
    is_uspto = head.str.startswith("PATN\n") | lowered.str.match(_USPTO_RE)
    is_adoc = head.str.lstrip().str.match(_ADOC_RE)
    is_md = head.str.contains(_MD_RE, regex=True) & ~is_adoc
    is_html_frag = lowered.str.match(_HTML_FRAGMENT_TAG_RE) | (
        lowered.str.count(_HTML_FRAGMENT_TAG_RE) >= _FRAGMENT_MIN_TAGS
    )

    out = pd.Series(CT_PLAIN, index=texts.index, dtype="object")
    # csv confirmation runs scalar csv.Sniffer only on prefiltered candidates
    csv_cand = (
        ~is_empty & ~is_pdf & ~is_html_full & ~is_md & ~is_html_frag
        & ~is_adoc & head.str.match(_CSV_PREFILTER_RE)
    )
    if csv_cand.any():
        confirmed = texts[csv_cand].map(lambda t: sniff_csv(t or ""))
        out[confirmed[confirmed].index] = CT_CSV
    out[is_html_frag] = CT_HTML
    out[is_md] = CT_MARKDOWN
    out[is_adoc] = CT_ASCIIDOC
    out[is_uspto] = CT_USPTO
    out[is_jats] = CT_JATS
    out[is_html_full] = CT_HTML
    out[is_pdf] = CT_PDF
    out[is_empty] = CT_EMPTY
    return out
