"""DOCX backend (B9) parity with the reference's OWN groundtruth.

Runs our stdlib docx extractor on /root/reference/tests/data/docx/*.docx and
compares the flat item stream (label + text, table dims) against the
reference's indented-text exports.

ALL 12 fixtures are item-exact and markdown byte-exact, including
``equations.docx`` via the from-scratch OMML→LaTeX converter
(functions/omath.py) replacing the external dwml dependency.
"""

from __future__ import annotations

from pathlib import Path

import pytest

from doc_parser_spark.functions.docx_extract import flat_items, parse_docx
from tests.test_reference_fixtures import _parse_itxt

DOCX_DIR = Path("/root/reference/tests/data/docx")
GT_DIR = Path("/root/reference/tests/data/groundtruth/docling_v2")

EXCLUDED: set[str] = set()

FIXTURES = sorted(
    p.stem
    for p in DOCX_DIR.glob("*.docx")
    if (GT_DIR / f"{p.name}.itxt").exists() and p.stem not in EXCLUDED
)


def _our_items(payload: bytes):
    out = []
    for n in flat_items(parse_docx(payload)):
        if n.label == "table":
            g = n.grid or []
            out.append(("table", len(g), len(g[0]) if g else 0))
        elif n.label == "picture":
            out.append(("picture", ""))
        else:
            out.append((n.label, n.text))
    return out


@pytest.mark.parametrize("name", FIXTURES)
def test_docx_reference_parity(name):
    got = _our_items((DOCX_DIR / f"{name}.docx").read_bytes())
    expected = _parse_itxt(GT_DIR / f"{name}.docx.itxt")

    def matches(g, e) -> bool:
        if g == e:
            return True
        if len(g) == 2 and len(e) == 2 and g[0] == e[0] and " ... " in e[1]:
            head, _, tail = e[1].partition(" ... ")
            return g[1].startswith(head) and g[1].endswith(tail)
        return False

    assert len(got) == len(expected), (
        f"{name}: {len(got)} items vs groundtruth {len(expected)}"
    )
    for i, (g, e) in enumerate(zip(got, expected)):
        assert matches(g, e), f"{name} item {i}: ours {g!r} != groundtruth {e!r}"


def test_extract_docx_surface():
    """extract_docx end-to-end on a fixture: non-empty text, valid spans."""
    from doc_parser_spark.functions.docx_extract import extract_docx

    text, spans = extract_docx((DOCX_DIR / "word_sample.docx").read_bytes())
    assert "Swimming in the lake" in text
    assert "You can relax and look around" in text
    for s, e, label, page in spans:
        assert 0 <= s < e <= len(text)
        assert page == 1


@pytest.mark.parametrize("name", FIXTURES)
def test_docx_markdown_parity(name):
    """Byte-exact markdown export vs the reference's own .docx.md goldens
    (formatting markers, inline-group joins, list nesting, tables)."""
    from doc_parser_spark.functions.export_tree_md import export_tree_markdown

    ours = export_tree_markdown(
        parse_docx((DOCX_DIR / f"{name}.docx").read_bytes())
    ).rstrip("\n")
    expected = (GT_DIR / f"{name}.docx.md").read_text().rstrip("\n")
    assert ours == expected
