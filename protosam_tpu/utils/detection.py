"""Detection metrics: bbox-of-mask F1 over IoU 0.50:0.95
(reference validation_protosam.py:40-122)."""

from __future__ import annotations

import cv2
import numpy as np
import pandas as pd


def get_bounding_box(segmentation_map: np.ndarray) -> tuple:
    """One XYWH box covering the mask's extreme points
    (reference :50-62, cv2.boundingRect)."""
    return cv2.boundingRect(np.asarray(segmentation_map).astype(np.uint8))


def calc_iou(box_a, box_b) -> float:
    """XYWH box IoU (reference :64-78)."""
    xa = max(box_a[0], box_b[0])
    ya = max(box_a[1], box_b[1])
    xb = min(box_a[0] + box_a[2], box_b[0] + box_b[2])
    yb = min(box_a[1] + box_a[3], box_b[1] + box_b[3])
    inter = max(0, xb - xa) * max(0, yb - ya)
    union = box_a[2] * box_a[3] + box_b[2] * box_b[3] - inter
    return inter / float(union) if union else 0.0


def eval_detection(pred_list: list[dict]) -> pd.DataFrame:
    """Per-threshold TP/FP/precision/recall/F1 table (reference :81-122).

    pred_list entries: {'pred_bbox': XYWH, 'gt_bbox': XYWH, 'score': float}.
    """
    thresholds = np.round(np.arange(0.5, 1.0, 0.05), 2)
    rows = []
    for t in thresholds:
        tp = sum(calc_iou(p["pred_bbox"], p["gt_bbox"]) >= t
                 for p in pred_list)
        fp = len(pred_list) - tp
        precision = tp / (tp + fp) if pred_list else 0.0
        recall = tp / len(pred_list) if pred_list else 0.0
        f1 = (2 * precision * recall / (precision + recall)
              if precision + recall else 0.0)
        rows.append({"iou_threshold": t, "tp": tp, "fp": fp,
                     "n_gt": len(pred_list), "f1": f1,
                     "precision": precision, "recall": recall})
    return pd.DataFrame(rows)
