"""Lenient HTML DOM built on stdlib ``html.parser``.

A minimal replacement for the BeautifulSoup(html.parser) tree the reference
uses (/root/reference/docling/backend/html_backend.py:78). Matches the
behaviors the extraction walk depends on:

- text nodes (including inter-tag whitespace) are preserved in document order;
- character references are decoded (``convert_charrefs=True``);
- no implied end tags (``html.parser`` nests ``<p>a<p>b``) — mirrors bs4's
  html.parser tree builder;
- void elements never take children;
- stray end tags are ignored; unclosed tags are closed at EOF;
- comments and script/style contents are tracked as *preformatted* strings so
  the walk can skip them (bs4 ``PreformattedString`` analog).

Pure python, no dependencies — safe to ship inside Arrow UDF batches.
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Iterator, Optional, Union

VOID_ELEMENTS = frozenset(
    {
        "area", "base", "br", "col", "embed", "hr", "img", "input",
        "link", "meta", "param", "source", "track", "wbr",
    }
)

_PREFORMATTED_PARENTS = frozenset({"script", "style"})


class TextNode(str):
    """A navigable string. ``preformatted`` marks script/style/comment text."""

    __slots__ = ("preformatted",)
    preformatted: bool

    def __new__(cls, value: str, preformatted: bool = False) -> "TextNode":
        obj = super().__new__(cls, value)
        obj.preformatted = preformatted
        return obj


class Element:
    __slots__ = ("name", "attrs", "children", "parent")

    def __init__(self, name: str, attrs: Optional[dict] = None) -> None:
        self.name = name
        self.attrs = attrs or {}
        self.children: list[Union["Element", TextNode]] = []
        self.parent: Optional["Element"] = None

    # -- tree ops ----------------------------------------------------------
    def append(self, node: Union["Element", TextNode]) -> None:
        if isinstance(node, Element):
            node.parent = self
        self.children.append(node)

    def get(self, key: str, default=None):
        return self.attrs.get(key, default)

    # -- queries (bs4-ish) ---------------------------------------------------
    def iter_elements(self) -> Iterator["Element"]:
        """All descendant elements, document order (self excluded)."""
        for child in self.children:
            if isinstance(child, Element):
                yield child
                yield from child.iter_elements()

    def find(self, names) -> Optional["Element"]:
        if isinstance(names, str):
            names = (names,)
        names = frozenset(names)
        for el in self.iter_elements():
            if el.name in names:
                return el
        return None

    def find_all(self, names) -> list["Element"]:
        if isinstance(names, str):
            names = (names,)
        names = frozenset(names)
        return [el for el in self.iter_elements() if el.name in names]

    @property
    def text(self) -> str:
        """Concatenation of all descendant text (bs4 ``.text`` analog).

        Comment text is excluded; script/style text is included (matching
        bs4 ``get_text()`` which joins all strings).
        """
        parts: list[str] = []
        self._collect_text(parts)
        return "".join(parts)

    def _collect_text(self, parts: list[str]) -> None:
        for child in self.children:
            if isinstance(child, Element):
                child._collect_text(parts)
            elif not getattr(child, "is_comment", False):
                parts.append(str(child))

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"<Element {self.name} children={len(self.children)}>"


class CommentNode(TextNode):
    __slots__ = ()
    is_comment = True

    def __new__(cls, value: str) -> "CommentNode":
        return super().__new__(cls, value, preformatted=True)


class _DomBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Element("[document]")
        self.stack: list[Element] = [self.root]

    # HTMLParser hooks -------------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        el = Element(tag, {k: v for k, v in attrs})
        self.stack[-1].append(el)
        if tag not in VOID_ELEMENTS:
            self.stack.append(el)

    def handle_startendtag(self, tag: str, attrs) -> None:
        el = Element(tag, {k: v for k, v in attrs})
        self.stack[-1].append(el)

    def handle_endtag(self, tag: str) -> None:
        # pop to the nearest matching open tag; ignore stray end tags
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].name == tag:
                del self.stack[i:]
                return

    def handle_data(self, data: str) -> None:
        if not data:
            return
        pre = self.stack[-1].name in _PREFORMATTED_PARENTS
        self.stack[-1].append(TextNode(data, preformatted=pre))

    def handle_comment(self, data: str) -> None:
        self.stack[-1].append(CommentNode(data))


def parse_html(markup: str) -> Element:
    """Parse HTML text into a lenient DOM. Never raises on malformed input
    the way ``html.parser`` tolerates it; raises only on catastrophic input.
    """
    builder = _DomBuilder()
    builder.feed(markup)
    builder.close()
    return builder.root


def find_body(root: Element) -> Element:
    """Return <body> if present else the document root (html_backend.py:125)."""
    body = root.find("body")
    return body if body is not None else root


def replace_br_with_newlines(root: Element) -> None:
    """In-place: replace every <br> element with a "\\n" text node
    (html_backend.py:128-129)."""
    stack = [root]
    while stack:
        el = stack.pop()
        for i, child in enumerate(el.children):
            if isinstance(child, Element):
                if child.name == "br":
                    el.children[i] = TextNode("\n")
                else:
                    stack.append(child)
