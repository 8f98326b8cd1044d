"""2-D bounding-box fixpoint merge — port of merge_overlapping_bboxes
(/root/reference/genon/preprocessor/src/genos_utils.py:114-160).

The reference repeatedly folds each 'text' box into the first already-merged
box it overlaps (within per-axis tolerances) and reruns the pass until
nothing changes. Because merged boxes GROW, the fixpoint can join boxes that
never overlapped directly — a plain transitive closure over the original
overlap graph is NOT equivalent, so the port keeps the iterate-until-stable
shape. Non-'text' boxes pass through untouched, same as the reference.

Box format: {"page": int, "type": str, "bbox": {"l","t","r","b"}} — kept
identical to the reference so the semantics are auditable line by line.
"""

from __future__ import annotations


def _overlaps(b1: dict, b2: dict, x_tol: float, y_tol: float) -> bool:
    """genos_utils.py:115-127 — same page, separated on neither axis by more
    than the tolerance."""
    if b1["page"] != b2["page"]:
        return False
    a, b = b1["bbox"], b2["bbox"]
    if (
        a["r"] < b["l"] - x_tol
        or a["l"] > b["r"] + x_tol
        or a["b"] < b["t"] - y_tol
        or a["t"] > b["b"] + y_tol
    ):
        return False
    return True


def _union(b1: dict, b2: dict) -> dict:
    """genos_utils.py:129-139 — coordinate-wise hull; page/type from b1."""
    a, b = b1["bbox"], b2["bbox"]
    return {
        "page": b1["page"],
        "type": "text",
        "bbox": {
            "l": min(a["l"], b["l"]),
            "t": min(a["t"], b["t"]),
            "r": max(a["r"], b["r"]),
            "b": max(a["b"], b["b"]),
        },
    }


def merge_overlapping_bboxes(
    bboxes: list[dict], x_tolerance: float = 1, y_tolerance: float = 1
) -> list[dict]:
    """Fixpoint greedy merge (genos_utils.py:141-160)."""
    changed = True
    while changed:
        changed = False
        merged: list[dict] = []
        for current in bboxes:
            if current["type"] != "text":
                merged.append(current)
                continue
            folded = False
            for i, existing in enumerate(merged):
                if _overlaps(existing, current, x_tolerance, y_tolerance):
                    merged[i] = _union(existing, current)
                    changed = True
                    folded = True
                    break
            if not folded:
                merged.append(current)
        bboxes = merged
    return bboxes
