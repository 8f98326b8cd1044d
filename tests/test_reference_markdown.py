"""Byte-exact markdown-export parity with the reference's own groundtruth.

extract_html_markdown must reproduce every
/root/reference/tests/data/groundtruth/docling_v2/*.html.md byte for byte
(modulo trailing newline) from the corresponding HTML fixture — the same
files the reference's e2e tests assert against. This covers heading markers,
nested-list indentation, ordered-list start markers, tabulate-style table
layout (numeric right-alignment, header min-padding), picture/caption
ordering, and the serializer's &/_ escaping.
"""

from __future__ import annotations

from pathlib import Path

import pytest

from doc_parser_spark.functions.export_md import extract_html_markdown

HTML_DIR = Path("/root/reference/tests/data/html")
GT_DIR = Path("/root/reference/tests/data/groundtruth/docling_v2")

FIXTURES = sorted(
    p.stem for p in HTML_DIR.glob("*.html")
    if (GT_DIR / f"{p.name}.md").exists()
)


@pytest.mark.parametrize("name", FIXTURES)
def test_markdown_export_byte_exact(name):
    ours = extract_html_markdown(
        (HTML_DIR / f"{name}.html").read_text()
    ).rstrip("\n")
    expected = (GT_DIR / f"{name}.html.md").read_text().rstrip("\n")
    if ours != expected:
        ol, el = ours.split("\n"), expected.split("\n")
        k = next(
            (i for i in range(min(len(ol), len(el))) if ol[i] != el[i]),
            min(len(ol), len(el)),
        )
        pytest.fail(
            f"{name}: first divergence at line {k}:\n"
            f"  ours: {ol[k] if k < len(ol) else '<missing>'!r}\n"
            f"  gt:   {el[k] if k < len(el) else '<missing>'!r}"
        )
