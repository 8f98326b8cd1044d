"""Layout-accuracy evaluation: IoU matching + F1 against COCO annotations.

Port of the reference's evaluation harness core
(/root/reference/genon/preprocessor/facade/evaluation/evaluation.py):

- ``iou``                      — evaluation.py:11-38 (normalized BOTTOMLEFT
  boxes: ``t`` > ``b``; epsilon-stabilized union);
- ``coco_to_groundtruth``      — evaluation.py:349-396 (COCO ``[x,y,w,h]``
  top-left pixel boxes → normalized BOTTOMLEFT dicts, page = image_id);
- ``match_bboxes``             — evaluation.py:41-110 (same-page candidate
  pairs at IoU ≥ threshold, greedily resolved highest-IoU-first into a
  one-to-one matching; class accuracy over the matched pairs);
- ``f1_metrics``               — evaluation.py:113-137 (TP = matches, FP =
  remaining predictions, FN = remaining ground truth);
- ``iou_stats``                — evaluation.py:423-443;
- ``evaluate_layout``          — evaluation.py:331-475 minus the PyMuPDF
  box-drawing and tensorflow-ranking imports, which are visualization /
  ranking-metric extras the score itself never uses.

Prediction format = the reference's result JSON: a list of chunk rows, each
with ``chunk_bboxes``: ``[{"page": int, "bbox": {l,t,r,b}, "type": str}]``
(normalized BOTTOMLEFT, page 1-based).
"""

from __future__ import annotations

import json
from statistics import mean, median
from typing import Any


def iou(bbox1: dict, bbox2: dict, eps: float = 1e-6) -> float:
    """IoU of two normalized BOTTOMLEFT boxes (evaluation.py:11-38)."""
    l1, t1, r1, b1 = bbox1["l"], bbox1["t"], bbox1["r"], bbox1["b"]
    l2, t2, r2, b2 = bbox2["l"], bbox2["t"], bbox2["r"], bbox2["b"]
    left = max(l1, l2)
    right = min(r1, r2)
    bottom = max(b1, b2)
    top = min(t1, t2)
    if right <= left or top <= bottom:
        return 0.0
    intersection = (right - left) * (top - bottom)
    area1 = (r1 - l1) * (t1 - b1)
    area2 = (r2 - l2) * (t2 - b2)
    return intersection / (area1 + area2 - intersection + eps)


def coco_to_groundtruth(coco: dict) -> list[dict]:
    """COCO dict → normalized GT items (evaluation.py:349-396): bbox
    [x, y, w, h] in pixels, top-left origin → {l,t,r,b} in page fractions,
    BOTTOMLEFT origin; ``page`` = image_id."""
    image_info = {img["id"]: (img["width"], img["height"])
                  for img in coco.get("images", [])}
    category = {c["id"]: c["name"] for c in coco.get("categories", [])}
    out = []
    for ann in coco.get("annotations", []):
        iw, ih = image_info.get(ann["image_id"], (None, None))
        if iw is None or ih is None:
            continue
        x, y, w, h = ann["bbox"]
        out.append(
            {
                "id": ann["id"],
                "bbox": {
                    "l": x / iw,
                    "t": (ih - y) / ih,
                    "r": (x + w) / iw,
                    "b": (ih - (y + h)) / ih,
                    "coord_origin": "BOTTOMLEFT",
                },
                "page": ann["image_id"],
                "category_id": ann["category_id"],
                "category_name": category.get(ann["category_id"], "Unknown"),
            }
        )
    return out


def match_bboxes(
    groundtruth: list[dict],
    result_data: list[dict],
    iou_threshold: float = 0.2,
) -> tuple[list[dict], float]:
    """Greedy highest-IoU-first one-to-one matching of same-page GT and
    predicted boxes (evaluation.py:41-110). Returns (matches,
    class_accuracy-over-matches)."""
    all_matches = []
    for gt_idx, gt_item in enumerate(groundtruth):
        gt_bbox = gt_item["bbox"]
        gt_page = gt_item["page"]
        for result_idx, result in enumerate(result_data):
            for bbox_idx, item in enumerate(result.get("chunk_bboxes", [])):
                if item.get("bbox") is None or item.get("page") != gt_page:
                    continue
                val = iou(gt_bbox, item["bbox"])
                if val >= iou_threshold:
                    all_matches.append(
                        {
                            "gt_idx": gt_idx,
                            "result_idx": result_idx,
                            "bbox_idx": bbox_idx,
                            "gt_id": gt_item["id"],
                            "gt_class": gt_item.get("category_name"),
                            "result_class": item.get("type"),
                            "iou": val,
                        }
                    )
    all_matches.sort(key=lambda m: m["iou"], reverse=True)
    matched_gt: set[int] = set()
    matched_pred: set[tuple[int, int]] = set()
    final = []
    for m in all_matches:
        pred_key = (m["result_idx"], m["bbox_idx"])
        if m["gt_idx"] not in matched_gt and pred_key not in matched_pred:
            matched_gt.add(m["gt_idx"])
            matched_pred.add(pred_key)
            final.append(m)
    correct = sum(1 for m in final if m["gt_class"] == m["result_class"])
    accuracy = correct / len(final) if final else 0
    return final, accuracy


def f1_metrics(matches: list[dict], groundtruth: list[dict],
               result_data: list[dict]) -> dict:
    """TP/FP/FN → precision/recall/F1 (evaluation.py:113-137)."""
    tp = len(matches)
    total_pred = sum(
        1
        for result in result_data
        for item in result.get("chunk_bboxes", [])
        if "bbox" in item
    )
    fp = total_pred - tp
    fn = len(groundtruth) - tp
    precision = tp / (tp + fp) if tp + fp else 0
    recall = tp / (tp + fn) if tp + fn else 0
    f1 = (
        2 * precision * recall / (precision + recall)
        if precision + recall
        else 0
    )
    return {"precision": precision, "recall": recall, "f1_score": f1,
            "TP": tp, "FP": fp, "FN": fn}


def iou_stats(matches: list[dict]) -> dict:
    """IoU distribution over the final matches (evaluation.py:423-443)."""
    vals = [m["iou"] for m in matches]
    if not vals:
        return {k: 0 for k in ("avg_iou", "median_iou", "min_iou", "max_iou",
                               "iou_50_ratio", "iou_75_ratio")}
    return {
        "avg_iou": mean(vals),
        "median_iou": median(vals),
        "min_iou": min(vals),
        "max_iou": max(vals),
        "iou_50_ratio": sum(v >= 0.5 for v in vals) / len(vals),
        "iou_75_ratio": sum(v >= 0.75 for v in vals) / len(vals),
    }


def per_label_f1(matches: list[dict], groundtruth: list[dict],
                 result_data: list[dict]) -> dict[str, dict]:
    """Per-category breakdown (ours — the reference prints only the global
    figure, but per-label is what localizes the heuristic-vs-NN gap): for
    each GT category, recall over that category's GT boxes, precision over
    predictions CARRYING that label, and class-aware F1 where a match only
    counts when the label agrees."""
    labels = sorted(
        {g["category_name"] for g in groundtruth}
        | {
            item.get("type")
            for result in result_data
            for item in result.get("chunk_bboxes", [])
            if item.get("type")
        }
    )
    by_label: dict[str, dict] = {}
    for lab in labels:
        n_gt = sum(1 for g in groundtruth if g["category_name"] == lab)
        n_pred = sum(
            1
            for result in result_data
            for item in result.get("chunk_bboxes", [])
            if item.get("type") == lab
        )
        tp = sum(
            1
            for m in matches
            if m["gt_class"] == lab and m["result_class"] == lab
        )
        matched_any = sum(1 for m in matches if m["gt_class"] == lab)
        precision = tp / n_pred if n_pred else 0
        recall = tp / n_gt if n_gt else 0
        f1 = (
            2 * precision * recall / (precision + recall)
            if precision + recall
            else 0
        )
        by_label[lab] = {
            "n_gt": n_gt, "n_pred": n_pred, "TP": tp,
            "matched_any_class": matched_any,
            "precision": precision, "recall": recall, "f1": f1,
        }
    return by_label


def evaluate_layout(
    coco: dict | str,
    result_data: list[dict] | str,
    iou_threshold: float = 0.2,
) -> dict[str, Any]:
    """Full evaluation (evaluation.py:331-475, minus drawing): COCO GT +
    result JSON → class accuracy, precision/recall/F1, IoU stats, per-label
    breakdown. ``coco`` / ``result_data`` may be paths or loaded objects."""
    if isinstance(coco, str):
        with open(coco, encoding="utf-8") as f:
            coco = json.load(f)
    if isinstance(result_data, str):
        with open(result_data, encoding="utf-8") as f:
            result_data = json.load(f)
    groundtruth = coco_to_groundtruth(coco)
    matches, class_accuracy = match_bboxes(
        groundtruth, result_data, iou_threshold=iou_threshold
    )
    metrics = f1_metrics(matches, groundtruth, result_data)
    return {
        "class_accuracy": class_accuracy,
        **metrics,
        "iou_stats": iou_stats(matches),
        "per_label": per_label_f1(matches, groundtruth, result_data),
        "n_groundtruth": len(groundtruth),
        "n_predictions": metrics["TP"] + metrics["FP"],
        "matches": matches,
    }
