"""Semantic segmentation metrics (confusion-matrix mIoU), reference
minkowski/lib/test.py fast_hist/per_class_iu and kpconv utils/metrics.py
IoU_from_confusions."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def confusion_matrix(pred: jax.Array, label: jax.Array, num_classes: int,
                     ignore: int = 255) -> jax.Array:
    """(C, C) counts; rows = GT, cols = pred. Device-friendly one-hot sum."""
    ok = (label != ignore) & (label >= 0) & (label < num_classes)
    idx = jnp.where(ok, label * num_classes + jnp.clip(pred, 0, num_classes - 1), -1)
    flat = jax.ops.segment_sum(
        jnp.where(idx >= 0, 1, 0), jnp.maximum(idx, 0),
        num_segments=num_classes * num_classes,
    )
    return flat.reshape(num_classes, num_classes)


def miou_from_confusion(hist: np.ndarray) -> tuple[float, np.ndarray]:
    hist = np.asarray(hist, np.float64)
    inter = np.diag(hist)
    union = hist.sum(0) + hist.sum(1) - inter
    with np.errstate(invalid="ignore", divide="ignore"):
        iou = np.where(union > 0, inter / union, np.nan)
    return float(np.nanmean(iou)), iou


def average_precision(probs: np.ndarray, labels: np.ndarray,
                      num_classes: int, ignore: int = 255) -> np.ndarray:
    """Per-class average precision from softmax probs (reference
    minkowski/lib/utils.py average_precision via sklearn, used at
    lib/test.py:139-143). Classes absent from `labels` yield NaN so callers
    can nanmean across scenes like the reference's `np.nanmean(aps, 0)`."""
    from sklearn.metrics import average_precision_score

    ok = (labels != ignore) & (labels >= 0) & (labels < num_classes)
    probs, labels = probs[ok], labels[ok]
    out = np.full(num_classes, np.nan)
    for c in range(num_classes):
        pos = labels == c
        if pos.any():
            out[c] = average_precision_score(pos, probs[:, c])
    return out
