"""Parity with the reference repo's OWN extraction fixtures.

Runs our HTML extractor on /root/reference/tests/data/html/*.html and
compares the item stream (label + text per item, table dims) against the
reference's checked-in groundtruth indented-text exports
(tests/data/groundtruth/docling_v2/*.html.itxt) — the same goldens the
reference's own e2e tests assert against (tests/test_backend_html.py).

The groundtruth files are read-only inputs; nothing is copied.
"""

from __future__ import annotations

import re
from pathlib import Path

import pytest

from doc_parser_spark.functions.html_extract import extract_html_items

HTML_DIR = Path("/root/reference/tests/data/html")
GT_DIR = Path("/root/reference/tests/data/groundtruth/docling_v2")

_ITEM_RE = re.compile(
    r"^\s*item-\d+ at level \d+: ([a-z_]+): (.*)$"
)
_GROUP_RE = re.compile(r"^\s*item-\d+ at level \d+: [a-z_]+: group ")
_BARE_ITEM_RE = re.compile(r"^\s*item-\d+ at level \d+: ([a-z_]+)\s*$")
_TABLE_RE = re.compile(
    r"^\s*item-\d+ at level \d+: table with \[(\d+)x(\d+)\]"
)

COMPARABLE_LABELS = {
    "title", "section_header", "text", "list_item", "code", "picture",
    "caption", "paragraph", "formula",
}


def _parse_itxt(path: Path):
    """→ list of ('table', rows, cols) | (label, text); multi-line item text
    continues on lines that match no item pattern."""
    items = []
    for line in path.read_text().split("\n"):
        if not line.strip():
            continue
        m = _TABLE_RE.match(line)
        if m:
            items.append(("table", int(m.group(1)), int(m.group(2))))
            continue
        if _GROUP_RE.match(line):
            continue
        m = _BARE_ITEM_RE.match(line)
        if m and m.group(1) in COMPARABLE_LABELS:
            items.append((m.group(1), ""))
            continue
        m = _ITEM_RE.match(line)
        if m and m.group(1) in COMPARABLE_LABELS | {"unspecified"}:
            if m.group(1) == "unspecified":
                continue
            items.append((m.group(1), m.group(2)))
        elif items and isinstance(items[-1], tuple) and len(items[-1]) == 2:
            # continuation of the previous item's text
            items[-1] = (items[-1][0], items[-1][1] + "\n" + line)
    return items


def _our_items(markup: str):
    """BODY-layer items only: the reference's exports exclude FURNITURE —
    on wiki_duck that is exactly the pre-first-heading site chrome."""
    items = []
    for it in extract_html_items(markup):
        if it.layer != "body":
            continue
        if it.label == "table":
            grid = it.table_grid or []
            items.append(("table", len(grid), len(grid[0]) if grid else 0))
        elif it.label == "picture":
            items.append(("picture", ""))
        elif it.label in COMPARABLE_LABELS:
            items.append((it.label, it.text))
    return items


FIXTURES = sorted(
    p.stem for p in HTML_DIR.glob("*.html")
    if (GT_DIR / f"{p.name}.itxt").exists()
)


@pytest.mark.parametrize("name", FIXTURES)
def test_reference_fixture_parity(name):
    markup = (HTML_DIR / f"{name}.html").read_text()
    expected = _parse_itxt(GT_DIR / f"{name}.html.itxt")
    got = _our_items(markup)
    def matches(g, e) -> bool:
        if g == e:
            return True
        # the itxt export truncates long text to "head ... tail"
        if (
            len(g) == 2
            and len(e) == 2
            and g[0] == e[0]
            and " ... " in e[1]
        ):
            head, _, tail = e[1].partition(" ... ")
            return g[1].startswith(head) and g[1].endswith(tail)
        return False

    first_div = next(
        (
            (i, g, e)
            for i, (g, e) in enumerate(zip(got, expected))
            if not matches(g, e)
        ),
        None,
    )
    assert first_div is None, (
        f"{name} item {first_div[0]}: ours {first_div[1]!r} != "
        f"groundtruth {first_div[2]!r}"
    )
    # docling-core's indented-text export prints picture captions twice:
    # under their picture AND again as trailing body items. Accept a
    # groundtruth tail made solely of already-seen captions.
    tail = expected[len(got):]
    seen_captions = {
        it[1] for it in got if len(it) == 2 and it[0] == "caption"
    }
    assert len(got) <= len(expected), (
        f"{name}: we produced {len(got) - len(expected)} extra items: "
        f"{got[len(expected):][:3]}"
    )
    for it in tail:
        assert (
            len(it) == 2 and it[0] == "caption" and it[1] in seen_captions
        ), f"{name}: unexplained groundtruth tail item {it!r}"


def test_density_mode_on_real_wikipedia():
    """Arc90 link-density mode on wiki_duck: site chrome and link-farm
    blocks (TOC entries, tool links) drop; article prose survives intact."""
    from doc_parser_spark.functions.html_extract import extract_html

    markup = (HTML_DIR / "wiki_duck.html").read_text()
    ref, _ = extract_html(markup, "reference")
    den, _ = extract_html(markup, "density")

    # meaningful reduction, not evisceration
    assert 0.5 < len(den) / len(ref) < 0.9

    # link-farm content dropped
    for chrome in ["1 Etymology", "What links here"]:
        assert chrome in ref and chrome not in den
    # every long article paragraph survives
    for prose in [
        "Duck is the common name",
        "The word duck comes from",
        "Ducks eat food sources such as grasses",
    ]:
        assert prose in ref and prose in den
