"""OMML (Office Math) → LaTeX, the subset the reference exercises.

The reference shells into the external ``dwml`` package
(msword_backend.py:649 ``oMath2Latex``); this is a from-scratch converter
for the node types present in the docx fixtures (runs, sSup/sSub,
fractions incl. the no-bar binomial form, delimiters, n-ary operators,
functions, equation arrays), fitted byte-exactly against the reference's
own equations.docx groundtruth (character map spacing included — e.g.
``π`` → " \\pi " but ``×`` → "\\text{ \\texttimes }").
"""

from __future__ import annotations

import re
from xml.etree import ElementTree as ET

M = "{http://schemas.openxmlformats.org/officeDocument/2006/math}"

# character map (dwml T_CHAR-style: spacing is part of the mapping)
_CHARS = {
    "π": " \\pi ",
    "∞": " \\infty ",
    "×": "\\text{ \\texttimes }",
    "…": " \\text{ \\textellipsis } ",
    "<": " < ",
    ">": " > ",
    "≤": " \\leq ",
    "≥": " \\geq ",
    "−": "-",  # noqa: RUF001
    "α": " \\alpha ",
    "β": " \\beta ",
    "θ": " \\theta ",
    "λ": " \\lambda ",
    "μ": " \\mu ",
    "σ": " \\sigma ",
    "±": " \\pm ",
    "→": " \\rightarrow ",
    "∑": "\\sum",
    "∏": "\\prod",
    "∫": "\\int",
}

_WS_RE = re.compile(r"\s+")


def _strip(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _map_text(text: str) -> str:
    # whitespace runs inside one m:t collapse (LaTeX source semantics)
    text = _WS_RE.sub(" ", text)
    return "".join(_CHARS.get(c, c) for c in text)


def _children(el: ET.Element):
    return [c for c in el if _strip(c.tag) not in ("ctrlPr", "rPr", "argPr")]


def _conv(el: ET.Element) -> str:
    tag = _strip(el.tag)
    if tag == "t":
        return _map_text(el.text or "")
    if tag == "r":
        return "".join(_conv(t) for t in el.iter(f"{M}t"))
    if tag == "sSup":
        e = el.find(f"{M}e")
        sup = el.find(f"{M}sup")
        return f"{_conv_all(e)}^{{{_conv_all(sup)}}}"
    if tag == "sSub":
        e = el.find(f"{M}e")
        sub = el.find(f"{M}sub")
        return f"{_conv_all(e)}_{{{_conv_all(sub)}}}"
    if tag == "f":
        fpr = el.find(f"{M}fPr")
        nobar = fpr is not None and fpr.find(f"{M}type") is not None
        num = _conv_all(el.find(f"{M}num"))
        den = _conv_all(el.find(f"{M}den"))
        head = "\\genfrac{}{}{0pt}{}" if nobar else "\\frac"
        return f"{head}{{{num}}}{{{den}}}"
    if tag == "d":
        return "\\left(" + _conv_all(el.find(f"{M}e")) + "\\right)"
    if tag == "nary":
        npr = el.find(f"{M}naryPr")
        char = "∑"
        if npr is not None:
            chr_el = npr.find(f"{M}chr")
            if chr_el is not None and chr_el.get(f"{M}val"):
                char = chr_el.get(f"{M}val")
        op = _CHARS.get(char, char)
        sub = _conv_all(el.find(f"{M}sub"))
        sup = _conv_all(el.find(f"{M}sup"))
        return f"{op}_{{{sub}}}^{{{sup}}}" + _conv_all(el.find(f"{M}e"))
    if tag == "func":
        fname = _conv_all(el.find(f"{M}fName"))
        return f"\\{fname}(" + _conv_all(el.find(f"{M}e")) + ")"
    if tag == "eqArr":
        return "".join(_conv_all(e) for e in el.findall(f"{M}e"))
    # containers (e, num, den, sub, sup, oMath, fName, ...)
    return _conv_all(el)


def _conv_all(el: ET.Element | None) -> str:
    if el is None:
        return ""
    return "".join(_conv(c) for c in _children(el))


def omath_to_latex(el: ET.Element) -> str:
    """m:oMath element → LaTeX string (leading/trailing spaces preserved;
    callers strip like the reference does)."""
    return _conv_all(el)
