"""JATS backend (B12) parity with the reference's OWN groundtruth: flat
item streams (label + text + table dims) against all five article fixtures.

docling-core's indented-text export prints picture/table captions twice —
under their item AND again as trailing body items (same quirk the HTML
parity test tolerates); the tail must consist solely of already-seen
captions.
"""

from __future__ import annotations

from pathlib import Path

import pytest

from doc_parser_spark.functions.docx_extract import flat_items
from doc_parser_spark.functions.jats_extract import extract_jats, parse_jats
from tests.test_reference_fixtures import _parse_itxt

JATS_DIR = Path("/root/reference/tests/data/jats")
GT_DIR = Path("/root/reference/tests/data/groundtruth/docling_v2")

FIXTURES = sorted(
    p.name for p in JATS_DIR.glob("*.xml")
    if (GT_DIR / f"{p.name}.itxt").exists()
)


def _matches(g, e) -> bool:
    if g == e:
        return True
    if len(g) == 2 and len(e) == 2 and g[0] == e[0] and " ... " in e[1]:
        head, _, tail = e[1].partition(" ... ")
        return g[1].startswith(head) and g[1].endswith(tail)
    return False


@pytest.mark.parametrize("name", FIXTURES)
def test_jats_reference_parity(name):
    got = []
    for n in flat_items(parse_jats((JATS_DIR / name).read_bytes())):
        if n.label == "table":
            g = n.grid or []
            got.append(("table", len(g), len(g[0]) if g else 0))
        elif n.label == "picture":
            got.append(("picture", ""))
        else:
            got.append((n.label, n.text))
    expected = _parse_itxt(GT_DIR / f"{name}.itxt")

    for i, (g, e) in enumerate(zip(got, expected)):
        assert _matches(g, e), f"{name} item {i}: {g!r} != {e!r}"
    assert len(got) <= len(expected)
    # trailing caption duplicates only
    seen_captions = [it for it in got if len(it) == 2 and it[0] == "caption"]
    for e in expected[len(got):]:
        assert len(e) == 2 and e[0] == "caption", f"{name}: tail {e!r}"
        assert any(_matches(g, e) for g in seen_captions), f"{name}: {e!r}"


def test_extract_jats_surface():
    text, spans = extract_jats(
        (JATS_DIR / "elife-56337.xml").read_text()
    )
    assert "KRAB-zinc finger protein" in text
    assert "Abstract" in text
    assert "References" in text
    for s, e, _, _ in spans:
        assert 0 <= s < e <= len(text)


@pytest.mark.parametrize("name", FIXTURES)
def test_jats_markdown_parity(name):
    """Byte-exact markdown vs the reference's own .xml.md goldens — ALL
    FIVE fixtures (section depth ladder, $$ formulas, inline-formula
    replacement inside table cells, caption-before-item, post-render
    escaping with pre-escape table widths, and the cell edge-whitespace
    rules: leading drops, trailing newlines drop, trailing literal spaces
    pad the column)."""
    from doc_parser_spark.functions.export_tree_md import export_tree_markdown

    ours = export_tree_markdown(
        parse_jats((JATS_DIR / name).read_bytes())
    ).rstrip("\n")
    expected = (GT_DIR / f"{name}.md").read_text().rstrip("\n")
    assert ours == expected
