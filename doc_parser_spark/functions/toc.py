"""TOC reconstruction — the PORTABLE half of the reference's E4 enrichment.

The reference's TOC flow (docling/utils/document_enrichment.py) is: an LLM
generates a table-of-contents text from the document
(`call_ai_model(category="toc_extraction", ...)` :180-188, external
service, out of scope), then pure-python machinery applies it back:

- ``parse_toc_content``   — :634-672: ``TITLE:`` line → document title;
  numbered lines matched 4-level-first (``1.1.1.1.`` → ``1.``), level =
  dot count + 1; anything else is a level-1 entry;
- ``dedupe_items``        — :207-230: adjacent entries with level distance
  ≤ 1 and SequenceMatcher ratio ≥ 0.92 keep the first;
- ``apply_toc``           — :685-760: title via difflib.get_close_matches
  (n=3, cutoff=0.3) then ratio ≥ 0.5; each TOC entry scores candidates in
  REVERSED document order with max(sim(full), sim(title)) ≥ 0.5, takes the
  top-scoring candidate not yet converted, sequentially in TOC order.

Instead of the LLM, ``toc_from_index_page`` sources the TOC text from the
document's OWN index page — the dotted-leader block our layout model
already isolates (the BOK evaluation PDF's 차례 page is the fixture).
"""

from __future__ import annotations

import difflib
import re
from difflib import SequenceMatcher

_RE_TOC_LEVELS = [
    re.compile(r"^(\d+\.\d+\.\d+\.\d+)\.\s*(.+)$"),
    re.compile(r"^(\d+\.\d+\.\d+)\.\s*(.+)$"),
    re.compile(r"^(\d+\.\d+)\.\s*(.+)$"),
    re.compile(r"^(\d+)\.\s*(.+)$"),
]

_RE_DOTTED = re.compile(r"[·.]{4,}")
_RE_TRAIL_PAGENO = re.compile(r"[\s·.]*\d*\s*$")


def parse_toc_content(toc_content: str) -> dict:
    """document_enrichment.py:634-672, exact semantics."""
    toc_items: list[dict] = []
    document_title = None
    for line in toc_content.split("\n"):
        cleaned = line.strip()
        if not cleaned:
            continue
        if cleaned.startswith("TITLE:"):
            document_title = cleaned[6:].strip()
            continue
        matched = False
        for pattern in _RE_TOC_LEVELS:
            m = pattern.match(cleaned)
            if m:
                number = m.group(1)
                toc_items.append(
                    {
                        "number": number,
                        "title": m.group(2).strip(),
                        "level": number.count(".") + 1,
                        "full_text": cleaned,
                    }
                )
                matched = True
                break
        if not matched and cleaned:
            toc_items.append(
                {"number": "", "title": cleaned, "level": 1,
                 "full_text": cleaned}
            )
    return {"title": document_title, "toc_items": toc_items}


def _similar(a: str, b: str, thr: float = 0.92) -> bool:
    """document_enrichment.py:207-208."""
    return SequenceMatcher(a=a.lower(), b=b.lower()).ratio() >= thr


def dedupe_items(items: list[dict]) -> list[dict]:
    """document_enrichment.py:210-230: adjacent near-identical entries
    (level distance ≤ 1, similarity ≥ 0.92) keep the FIRST."""
    deduped: list[dict] = []
    for item in items:
        if deduped:
            prev = deduped[-1]
            if abs(prev["level"] - item["level"]) <= 1 and _similar(
                prev["title"], item["title"]
            ):
                continue
        deduped.append(item)
    return deduped


def apply_toc(
    items: list[tuple[int, str]],
    toc_content: str,
    threshold: float = 0.5,
) -> dict:
    """document_enrichment.py:685-760: match TOC entries back onto document
    text items. ``items`` = [(index, text)] of TEXT-labeled items in
    document order. Returns {"title_idx": int|None,
    "sections": [(item_idx, toc_item_dict)], "matched_count": int}.
    """
    parsed = parse_toc_content(toc_content)
    document_title = parsed["title"]
    toc_items = dedupe_items(parsed["toc_items"])

    text_items = [(i, t.strip()) for i, t in items if len(t.strip()) >= 2]
    text_items_reversed = text_items[::-1]
    converted: set[int] = set()
    matched_count = 0
    title_idx = None
    sections: list[tuple[int, dict]] = []

    if document_title and text_items:
        title_clean = document_title.strip()
        text_only = [t for _, t in text_items]
        close = difflib.get_close_matches(title_clean, text_only, n=3,
                                          cutoff=0.3)
        if close:
            best_text = close[0]
            best_idx = next(
                (i for i, t in text_items if t == best_text), None
            )
            if best_idx is not None and best_idx not in converted:
                sim = SequenceMatcher(
                    None, title_clean.lower(), best_text.lower()
                ).ratio()
                if sim >= 0.5:
                    title_idx = best_idx
                    converted.add(best_idx)
                    matched_count += 1

    for toc_item in toc_items:
        toc_full = toc_item["full_text"]
        toc_title = toc_item["title"]
        if len(toc_full) < 2:
            continue
        scored = []
        for idx, text in text_items_reversed:
            if idx in converted:
                continue
            sim_full = SequenceMatcher(
                None, toc_full.lower(), text.lower()
            ).ratio()
            sim_title = SequenceMatcher(
                None, toc_title.lower(), text.lower()
            ).ratio()
            similarity = max(sim_full, sim_title)
            if similarity >= threshold:
                scored.append((idx, similarity, text))
        scored.sort(key=lambda x: x[1], reverse=True)
        if scored:
            best_idx, _, _ = scored[0]
            sections.append((best_idx, toc_item))
            converted.add(best_idx)
            matched_count += 1

    return {
        "title_idx": title_idx,
        "sections": sections,
        "matched_count": matched_count,
    }


def toc_from_index_page(lines: list[str]) -> str | None:
    """LLM-free TOC source: the document's own index page. Lines carrying
    dotted leaders (``Ⅰ. chapter ········ 3``) are TOC entries — leaders
    and trailing page numbers strip off; a run of ≥3 such lines qualifies
    as an index. Returns reference-shaped toc_content text, or None."""
    entries: list[str] = []
    for line in lines:
        if _RE_DOTTED.search(line):
            head = _RE_DOTTED.split(line)[0]
            head = _RE_TRAIL_PAGENO.sub("", head).strip()
            if len(head) >= 2:
                entries.append(head)
    if len(entries) < 3:
        return None
    return "\n".join(entries)
