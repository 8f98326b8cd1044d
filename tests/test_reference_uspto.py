"""USPTO backend (B13, ICE v4 subset) parity with the reference's OWN
groundtruth: item streams and byte-exact markdown on both ICE fixtures.
Legacy DTD families (grant v2.5, application v1, APS text) are a documented
unsupported subset and raise ValueError."""

from __future__ import annotations

from pathlib import Path

import pytest

from doc_parser_spark.functions.docx_extract import flat_items
from doc_parser_spark.functions.export_tree_md import export_tree_markdown
from doc_parser_spark.functions.uspto_extract import extract_uspto, parse_uspto
from tests.test_reference_fixtures import _parse_itxt

USPTO_DIR = Path("/root/reference/tests/data/uspto")
GT_DIR = Path("/root/reference/tests/data/groundtruth/docling_v2")

ICE_FIXTURES = ["ipa20180000016", "ipa20200022300"]


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


def test_uspto_legacy_formats_rejected():
    for name in ["pa20010031492.xml", "pg06442728.xml"]:
        with pytest.raises(ValueError):
            parse_uspto((USPTO_DIR / name).read_text())


def test_extract_uspto_surface():
    text, spans = extract_uspto(
        (USPTO_DIR / "ipa20180000016.xml").read_text()
    )
    assert "LIGHT EMITTING DEVICE" in text
    assert "ABSTRACT" in text and "CLAIMS" in text
    for s, e, _, _ in spans:
        assert 0 <= s < e <= len(text)
