"""PPTX backend (B10) parity with the reference's OWN groundtruth:
item-stream and byte-exact markdown on all three fixtures."""

from __future__ import annotations

from pathlib import Path

import pytest

from doc_parser_spark.functions.docx_extract import flat_items
from doc_parser_spark.functions.export_tree_md import export_tree_markdown
from doc_parser_spark.functions.pptx_extract import extract_pptx, parse_pptx
from tests.test_reference_fixtures import _parse_itxt

PPTX_DIR = Path("/root/reference/tests/data/pptx")
GT_DIR = Path("/root/reference/tests/data/groundtruth/docling_v2")

FIXTURES = sorted(
    p.name for p in PPTX_DIR.glob("*.pptx")
    if (GT_DIR / f"{p.name}.itxt").exists()
)


def _our_items(payload: bytes):
    out = []
    for n in flat_items(parse_pptx(payload)):
        if n.label == "table":
            g = n.grid or []
            out.append(("table", len(g), len(g[0]) if g else 0))
        elif n.label == "picture":
            out.append(("picture", ""))
        else:
            out.append((n.label, n.text))
    return out


def _matches(g, e) -> bool:
    if g == e:
        return True
    if len(g) == 2 and len(e) == 2 and g[0] == e[0] and " ... " in e[1]:
        head, _, tail = e[1].partition(" ... ")
        return g[1].startswith(head) and g[1].endswith(tail)
    return False


@pytest.mark.parametrize("name", FIXTURES)
def test_pptx_itxt_parity(name):
    got = _our_items((PPTX_DIR / name).read_bytes())
    expected = _parse_itxt(GT_DIR / f"{name}.itxt")
    assert len(got) == len(expected), (len(got), len(expected))
    for i, (g, e) in enumerate(zip(got, expected)):
        assert _matches(g, e), f"{name} item {i}: {g!r} != {e!r}"


@pytest.mark.parametrize("name", FIXTURES)
def test_pptx_markdown_parity(name):
    ours = export_tree_markdown(
        parse_pptx((PPTX_DIR / name).read_bytes())
    ).rstrip("\n")
    expected = (GT_DIR / f"{name}.md").read_text().rstrip("\n")
    assert ours == expected


def test_extract_pptx_surface():
    text, spans = extract_pptx(
        (PPTX_DIR / "powerpoint_sample.pptx").read_bytes()
    )
    assert "Test Table Slide" in text and "List item4" in text
    assert {s[3] for s in spans} == {1, 2, 3}  # one page per slide
    for s, e, _, _ in spans:
        assert 0 <= s < e <= len(text)
