"""USPTO backend (B13) parity with the reference's OWN
groundtruth: item streams and byte-exact markdown on both ICE fixtures.
All five reference fixtures are supported and byte-exact: ICE v4
application/grant, application v1.x, grant v2.5, and the pre-2001 APS text
format."""

from __future__ import annotations

from pathlib import Path

import pytest

from doc_parser_spark.functions.docx_extract import flat_items
from doc_parser_spark.functions.export_tree_md import export_tree_markdown
from doc_parser_spark.functions.uspto_extract import extract_uspto, parse_uspto
from tests.test_reference_fixtures import _parse_itxt

USPTO_DIR = Path("/root/reference/tests/data/uspto")
GT_DIR = Path("/root/reference/tests/data/groundtruth/docling_v2")

ICE_FIXTURES = ["ipa20180000016", "ipa20200022300", "pa20010031492", "pg06442728"]
APS_FIXTURE = "pftaps057006474"


@pytest.mark.parametrize("name", ICE_FIXTURES)
def test_uspto_ice_itxt_parity(name):
    got = []
    for n in flat_items(parse_uspto((USPTO_DIR / f"{name}.xml").read_text())):
        if n.label == "table":
            g = n.grid or []
            got.append(("table", len(g), len(g[0]) if g else 0))
        else:
            got.append((n.label, n.text))
    expected = _parse_itxt(GT_DIR / f"{name}.itxt")
    assert len(got) == len(expected)
    for i, (g, e) in enumerate(zip(got, expected)):
        if g == e:
            continue
        assert (
            len(g) == 2 and len(e) == 2 and g[0] == e[0] and " ... " in e[1]
            and g[1].startswith(e[1].partition(" ... ")[0])
            and g[1].endswith(e[1].partition(" ... ")[2])
        ), f"{name} item {i}: {g!r} != {e!r}"


@pytest.mark.parametrize("name", ICE_FIXTURES)
def test_uspto_ice_markdown_parity(name):
    ours = export_tree_markdown(
        parse_uspto((USPTO_DIR / f"{name}.xml").read_text())
    ).rstrip("\n")
    expected = (GT_DIR / f"{name}.md").read_text().rstrip("\n")
    assert ours == expected


def test_uspto_aps_parity():
    root = parse_uspto((USPTO_DIR / f"{APS_FIXTURE}.txt").read_text())
    got = [(n.label, n.text) for n in flat_items(root)]
    expected = _parse_itxt(GT_DIR / f"{APS_FIXTURE}.itxt")
    assert len(got) == len(expected)
    for g, e in zip(got, expected):
        if g == e:
            continue
        head, _, tail = e[1].partition(" ... ")
        assert g[0] == e[0] and g[1].startswith(head) and g[1].endswith(tail)
    md = export_tree_markdown(root).rstrip("\n")
    assert md == (GT_DIR / f"{APS_FIXTURE}.md").read_text().rstrip("\n")


def test_uspto_unknown_rejected():
    with pytest.raises(ValueError):
        parse_uspto("<unknown-root/>")


def test_extract_uspto_surface():
    text, spans = extract_uspto(
        (USPTO_DIR / "ipa20180000016.xml").read_text()
    )
    assert "LIGHT EMITTING DEVICE" in text
    assert "ABSTRACT" in text and "CLAIMS" in text
    for s, e, _, _ in spans:
        assert 0 <= s < e <= len(text)
