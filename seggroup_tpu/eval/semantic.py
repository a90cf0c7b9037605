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
