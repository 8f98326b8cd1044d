"""Markdown main-content extraction (B6 analog).

The reference markdown backend walks a marko AST and re-routes embedded HTML
blocks through the HTML backend (md_backend.py:548-615). This port is a
line-based parser covering the same item classes:

- ATX headings ``#..######`` → title (h1) / section_header
- fenced code blocks ``` ``` → code items
- unordered (-, *, +) and ordered (N.) list items
- pipe tables (header + |---| separator) → table grid
- blank-line-separated paragraphs
- HTML blocks (a line starting with '<') re-routed through extract_html_items
  with the same reference boilerplate rule — matching the B6→B1 dispatch.

The boilerplate layer rule matches B1: if the payload has any heading,
content before the first heading is FURNITURE.
"""

from __future__ import annotations

import re

from doc_parser_spark.datamodel import (
    LABEL_CODE,
    LABEL_LIST_ITEM,
    LABEL_SECTION_HEADER,
    LABEL_TABLE,
    LABEL_TEXT,
    LABEL_TITLE,
)
from doc_parser_spark.functions.html_extract import (
    BODY,
    FURNITURE,
    Item,
    extract_html_items,
    render_table,
    serialize_items,
)

_HEADING_RE = re.compile(r"^(#{1,6})\s+(.*)$")
_ULIST_RE = re.compile(r"^\s*[-*+]\s+(.*)$")
_OLIST_RE = re.compile(r"^\s*(\d+)\.\s+(.*)$")
_FENCE_RE = re.compile(r"^```")
_TABLE_SEP_RE = re.compile(r"^\s*\|?[\s:|-]+\|[\s:|-]*$")
_HTML_BLOCK_RE = re.compile(r"^\s*<")


def _table_row(line: str) -> list[str]:
    cells = line.strip().strip("|").split("|")
    return [c.strip() for c in cells]


def extract_md_items(text: str) -> list[Item]:
    lines = text.split("\n")
    has_heading = any(_HEADING_RE.match(ln) for ln in lines)
    layer = FURNITURE if has_heading else BODY

    items: list[Item] = []
    para: list[str] = []
    i = 0
    n = len(lines)

    def flush_para():
        nonlocal para
        if para:
            items.append(Item(LABEL_TEXT, " ".join(para).strip(), layer))
            para = []

    while i < n:
        line = lines[i]
        stripped = line.strip()

        if not stripped:
            flush_para()
            i += 1
            continue

        m = _HEADING_RE.match(line)
        if m:
            flush_para()
            layer = BODY  # first heading flips to BODY (B1 rule)
            level = len(m.group(1))
            label = LABEL_TITLE if level == 1 else LABEL_SECTION_HEADER
            items.append(Item(label, m.group(2).strip(), layer, level=level - 1))
            i += 1
            continue

        if _FENCE_RE.match(stripped):
            flush_para()
            code_lines = []
            i += 1
            while i < n and not _FENCE_RE.match(lines[i].strip()):
                code_lines.append(lines[i])
                i += 1
            i += 1  # closing fence
            code = "\n".join(code_lines).strip()
            if code:
                items.append(Item(LABEL_CODE, code, layer))
            continue

        if _HTML_BLOCK_RE.match(line):
            # HTML block → re-route through the HTML walk (md_backend.py:548+)
            flush_para()
            block = [line]
            i += 1
            while i < n and lines[i].strip():
                block.append(lines[i])
                i += 1
            for item in extract_html_items("\n".join(block)):
                item.layer = layer
                items.append(item)
            continue

        # pipe table: current line has |, next line is a separator row
        if "|" in stripped and i + 1 < n and _TABLE_SEP_RE.match(lines[i + 1]):
            flush_para()
            grid = [_table_row(stripped)]
            i += 2
            while i < n and "|" in lines[i] and lines[i].strip():
                grid.append(_table_row(lines[i]))
                i += 1
            items.append(
                Item(LABEL_TABLE, render_table(grid), layer, table_grid=grid)
            )
            continue

        m = _ULIST_RE.match(line)
        if m:
            flush_para()
            items.append(
                Item(LABEL_LIST_ITEM, m.group(1).strip(), layer, enumerated=False)
            )
            i += 1
            continue

        m = _OLIST_RE.match(line)
        if m:
            flush_para()
            items.append(
                Item(
                    LABEL_LIST_ITEM,
                    m.group(2).strip(),
                    layer,
                    enumerated=True,
                    marker=f"{m.group(1)}.",
                )
            )
            i += 1
            continue

        para.append(stripped)
        i += 1

    flush_para()
    return items


def extract_md(text: str) -> tuple[str, list[tuple[int, int, str, int]]]:
    return serialize_items(extract_md_items(text))
