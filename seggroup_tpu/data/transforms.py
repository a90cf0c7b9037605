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


def random_dropout(coords: np.ndarray, feats: np.ndarray,
                   labels: np.ndarray, rng: np.random.Generator,
                   dropout_ratio: float = 0.2):
    """Random point dropout (reference minkowski/lib/transforms.py:141-156,
    wired into training at lib/dataset.py:451).

    Faithful to the reference's behaviour, including its quirk: the
    *application* probability is `dropout_ratio` itself (the constructor's
    dropout_application_ratio is never read), and when applied it keeps a
    uniform sample of N*(1-dropout_ratio) points."""
    if rng.random() < dropout_ratio:
        n = len(coords)
        inds = rng.choice(n, int(n * (1 - dropout_ratio)), replace=False)
        return coords[inds], feats[inds], labels[inds]
    return coords, feats, labels


def spatial_crop(xyz: np.ndarray, max_npoint: int, rng: np.random.Generator,
                 full_scale: int = 512, shrink: int = 32):
    """Reference PointGroup spatial crop (pointgroup data/scannetv2_inst.py:
    142-158): shift the (voxel-scaled, >= 0) cloud by a random offset inside
    a [0, full_scale)^3 window and shrink the window's xy extent by `shrink`
    until <= max_npoint points survive. Returns (xyz_offset, valid_mask) —
    a spatially coherent crop, unlike first-N truncation.

    Guaranteed to terminate: once full_scale[:2] <= 0 no point is valid."""
    xyz_offset = xyz.copy()
    valid = np.ones(len(xyz), bool)
    fs = np.array([full_scale] * 3, np.float64)
    room_range = xyz.max(0) - xyz.min(0)
    while valid.sum() > max_npoint:
        offset = np.clip(fs - room_range + 0.001, None, 0) * rng.random(3)
        xyz_offset = xyz + offset
        valid = (xyz_offset.min(1) >= 0) & ((xyz_offset < fs).sum(1) == 3)
        fs[:2] -= shrink
    return xyz_offset, valid


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
