"""Host-side point-cloud augmentations for stage-2 training.

Numpy ports of the reference's augmentation zoo semantics (reference
minkowski/lib/transforms.py:20-235, lib/voxelizer.py:44-131, and pointgroup
data/scannetv2_inst.py:81-139): rotation/scale/flip, elastic distortion,
chromatic autocontrast/translation/jitter. All operate on (N, 3) coords /
(N, 3) colors in [0, 255] float.
"""

from __future__ import annotations

import numpy as np
import scipy.ndimage
import scipy.interpolate


def random_rotation_z(coords: np.ndarray, rng: np.random.Generator,
                      max_angle: float = 2 * np.pi) -> np.ndarray:
    """Upright rotation (reference voxelizer ROTATION_AUGMENTATION_BOUND z-axis)."""
    t = rng.uniform(-max_angle / 2, max_angle / 2)
    c, s = np.cos(t), np.sin(t)
    rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    return coords @ rot.T


def random_scale(coords: np.ndarray, rng: np.random.Generator,
                 lo: float = 0.9, hi: float = 1.1) -> np.ndarray:
    return coords * rng.uniform(lo, hi)


def random_flip(coords: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    out = coords.copy()
    for axis in (0, 1):
        if rng.random() < 0.5:
            out[:, axis] = -out[:, axis]
    return out


def elastic_distortion(coords: np.ndarray, rng: np.random.Generator,
                       granularity: float, magnitude: float) -> np.ndarray:
    """Blurred-noise displacement field (reference transforms.py:203-235 /
    pointgroup scannetv2_inst.py:81-98).

    The box blurs run as separable float32 correlations (same kernel as the
    reference's ones(3)/3 convolve passes; a symmetric kernel makes convolve
    == correlate) — scipy.ndimage.convolve with float64 weights upcasts the
    whole field and was ~20x slower on 150k-point scenes."""
    from seggroup_tpu import native

    mins = coords.min(0)
    dims = ((coords - mins).max(0) // granularity).astype(int) + 3
    noise = rng.standard_normal(size=(*dims, 3), dtype=np.float32)
    k = np.array([1 / 3, 1 / 3, 1 / 3], np.float32)
    for _ in range(2):
        for axis in range(3):
            noise = scipy.ndimage.correlate1d(noise, k, axis=axis,
                                              mode="constant")
    # trilinear sampling runs in C++ when available (~20x over the generic
    # RegularGridInterpolator on 150k-point scenes; same math — the grid is
    # regular with spacing `granularity` starting at -granularity)
    out = native.elastic_interp(coords, mins, granularity, magnitude, noise)
    if out is not None:
        return out
    ax = [np.linspace(-granularity, granularity * (d - 2), d) for d in dims]
    interp = scipy.interpolate.RegularGridInterpolator(
        ax, noise, bounds_error=False, fill_value=0
    )
    return (coords + interp(coords - mins) * magnitude).astype(np.float32)


def chromatic_auto_contrast(colors: np.ndarray, rng: np.random.Generator,
                            blend_factor: float | None = None) -> np.ndarray:
    """(reference transforms.py:38-53)"""
    if rng.random() >= 0.2:
        return colors
    lo = colors.min(0, keepdims=True)
    hi = colors.max(0, keepdims=True)
    scale = 255 / np.maximum(hi - lo, 1e-6)
    stretched = (colors - lo) * scale
    bf = rng.random() if blend_factor is None else blend_factor
    return (1 - bf) * colors + bf * stretched


def chromatic_translation(colors: np.ndarray, rng: np.random.Generator,
                          ratio: float = 0.1) -> np.ndarray:
    """(reference transforms.py:56-66)"""
    if rng.random() >= 0.95:
        return colors
    tr = (rng.random((1, 3)) - 0.5) * 255 * 2 * ratio
    return np.clip(colors + tr, 0, 255)


def chromatic_jitter(colors: np.ndarray, rng: np.random.Generator,
                     std: float = 0.05) -> np.ndarray:
    """(reference transforms.py:69-78)"""
    if rng.random() >= 0.95:
        return colors
    noise = rng.standard_normal(colors.shape) * 255 * std
    return np.clip(colors + noise, 0, 255)


def default_train_transform(coords, colors, rng,
                            elastic=((0.2, 0.4), (0.8, 1.6))):
    """The reference ScanNet training recipe (minkowski scannet.py
    ELASTIC_DISTORT_PARAMS + voxelizer augs)."""
    coords = random_rotation_z(coords, rng)
    coords = random_scale(coords, rng)
    coords = random_flip(coords, rng)
    for gran, mag in elastic:
        if rng.random() < 0.95:
            coords = elastic_distortion(coords, rng, gran, mag)
    colors = chromatic_auto_contrast(colors, rng)
    colors = chromatic_translation(colors, rng)
    colors = chromatic_jitter(colors, rng)
    return coords.astype(np.float32), colors.astype(np.float32)
