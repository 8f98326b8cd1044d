"""Property-based extraction invariants over generated structured HTML.

Complements the DOM-equivalence fuzz: these run the FULL extractor and
assert semantic invariants that must hold for any input:

1. never raises; output is (str, list of (start < end, label, page));
2. spans tile the text: consecutive spans are separated by exactly "\\n\\n"
   and cover the whole extracted_text;
3. furniture rule: when the document has a heading, no body text that
   appears only before the first heading leaks into the output;
4. every extracted body fragment originates from the input markup
   (no invented text beyond list markers / table pipes).
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from doc_parser_spark.functions.html_extract import extract_html

_WORDS = st.lists(
    st.sampled_from("alpha beta gamma delta epsilon zeta omega".split()),
    min_size=1,
    max_size=6,
).map(" ".join)


@st.composite
def _element(draw, depth=0):
    kind = draw(
        st.sampled_from(
            ["p", "h1", "h2", "pre", "ul", "ol", "table", "div", "nav", "text"]
        )
    )
    words = draw(_WORDS)
    if kind == "text":
        return words
    if kind in ("p", "h1", "h2", "pre"):
        return f"<{kind}>{words}</{kind}>"
    if kind in ("ul", "ol"):
        items = draw(st.lists(_WORDS, min_size=1, max_size=3))
        start = ' start="3"' if kind == "ol" and draw(st.booleans()) else ""
        return (
            f"<{kind}{start}>"
            + "".join(f"<li>{i}</li>" for i in items)
            + f"</{kind}>"
        )
    if kind == "table":
        cells = draw(st.lists(_WORDS, min_size=1, max_size=4))
        return (
            "<table><tr>"
            + "".join(f"<td>{c}</td>" for c in cells)
            + "</tr></table>"
        )
    if depth >= 2:
        return f"<{kind}>{words}</{kind}>"
    children = draw(
        st.lists(_element(depth=depth + 1), min_size=0, max_size=3)
    )
    return f"<{kind}>{words}{''.join(children)}</{kind}>"


@st.composite
def _document(draw):
    blocks = draw(st.lists(_element(), min_size=0, max_size=8))
    return "<html><body>" + "".join(blocks) + "</body></html>"


@settings(max_examples=150, deadline=None)
@given(_document())
def test_extraction_invariants(markup):
    text, spans = extract_html(markup)

    # 1. types and monotone spans
    assert isinstance(text, str)
    prev_end = None
    for start, end, label, page in spans:
        assert 0 <= start < end <= len(text)
        assert isinstance(label, str) and page == 1
        if prev_end is not None:
            assert start == prev_end + 2
            assert text[prev_end:start] == "\n\n"
        prev_end = end

    # 2. spans tile the text exactly
    if spans:
        assert spans[0][0] == 0
        assert spans[-1][1] == len(text)
    else:
        assert text == ""

    # 3. character conservation: the walk may concatenate text fragments
    # (reference buffer semantics) but never invents or duplicates content —
    # each letter of the output is covered by the tag-stripped input
    import re as _re
    from collections import Counter

    stripped = _re.sub(r"<[^>]*>", "", markup)
    out_letters = Counter(c for c in text if c.isalpha())
    in_letters = Counter(c for c in stripped if c.isalpha())
    for ch, cnt in out_letters.items():
        assert cnt <= in_letters[ch], f"invented/duplicated char {ch!r}"


@settings(max_examples=150, deadline=None)
@given(st.lists(_WORDS, min_size=1, max_size=3), _WORDS, _WORDS)
def test_furniture_rule_property(pre_heading_paras, title, body):
    """Text strictly before the first heading never reaches the output."""
    # make pre-heading text distinguishable
    pre = "".join(f"<p>furn{q} {p}</p>" for q, p in enumerate(pre_heading_paras))
    markup = f"<body>{pre}<h1>{title}</h1><p>{body}</p></body>"
    text, _ = extract_html(markup)
    assert "furn0" not in text
    assert text.startswith(title.strip())
    assert body.strip() in text
