"""ctypes bindings to the native host library (csrc/), with numpy fallbacks.

Build with `make -C seggroup_tpu/csrc` (done automatically on first import if
a compiler is available). Every entry point has a pure-numpy fallback so the
framework works without the native lib — the native path just makes the data
pipeline faster, mirroring where the reference used C++ (SURVEY.md §2.6).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.join(os.path.dirname(__file__), "csrc")
_LIB_PATH = os.path.join(_DIR, "libseggroup_native.so")
_lib = None


def _try_build() -> None:
    try:
        subprocess.run(["make", "-C", _DIR], check=True, capture_output=True,
                       timeout=120)
    except Exception:
        pass


def get_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        _try_build()
    if os.path.exists(_LIB_PATH):
        lib = ctypes.CDLL(_LIB_PATH)
        c_f32 = ctypes.POINTER(ctypes.c_float)
        c_i32 = ctypes.POINTER(ctypes.c_int32)
        lib.grid_subsample.restype = ctypes.c_int64
        lib.grid_subsample.argtypes = [c_f32, ctypes.c_int64, ctypes.c_float,
                                       c_f32, c_i32]
        lib.radius_neighbors.restype = None
        lib.radius_neighbors.argtypes = [c_f32, ctypes.c_int64, c_f32,
                                         ctypes.c_int64, ctypes.c_float,
                                         ctypes.c_int32, c_i32, c_i32]
        lib.voxelize_rulebook.restype = ctypes.c_int64
        lib.voxelize_rulebook.argtypes = [c_i32, c_i32, ctypes.c_int64,
                                          c_i32, c_i32]
        lib.nearest_neighbor_map.restype = None
        lib.nearest_neighbor_map.argtypes = [c_f32, ctypes.c_int64, c_f32,
                                             ctypes.c_int64, ctypes.c_float,
                                             c_i32]
        lib.connected_components_uf.restype = None
        lib.connected_components_uf.argtypes = [c_i32, ctypes.c_int64,
                                                ctypes.c_int64, c_i32]
        lib.subm_rulebook3.restype = None
        lib.subm_rulebook3.argtypes = [c_i32, ctypes.c_int64, ctypes.c_int64,
                                       c_i32]
        lib.downsample_plan.restype = ctypes.c_int64
        lib.downsample_plan.argtypes = [c_i32, ctypes.c_int64, ctypes.c_int64,
                                        c_i32, c_i32, c_i32]
        lib.subm_windows.restype = ctypes.c_int64
        lib.subm_windows.argtypes = [c_i32, ctypes.c_int64, ctypes.c_int64,
                                     ctypes.c_int64, c_i32, c_i32]
        lib.elastic_interp.restype = None
        lib.elastic_interp.argtypes = [c_f32, ctypes.c_int64, c_f32,
                                       ctypes.c_float, ctypes.c_float,
                                       c_f32, c_i32]
        lib.voxelize_sorted.restype = ctypes.c_int64
        lib.voxelize_sorted.argtypes = [c_f32, ctypes.c_int64,
                                        ctypes.c_float, c_i32, c_i32, c_i32]
        _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def _ptr(a, t):
    return a.ctypes.data_as(ctypes.POINTER(t))


def grid_subsample(points: np.ndarray, cell_size: float):
    """(n,3) float32 -> (barycenters (m,3), inverse (n,))."""
    points = np.ascontiguousarray(points, np.float32)
    n = len(points)
    lib = get_lib()
    if lib is not None:
        out_p = np.empty((n, 3), np.float32)
        inv = np.empty(n, np.int32)
        m = lib.grid_subsample(_ptr(points, ctypes.c_float), n,
                               ctypes.c_float(cell_size),
                               _ptr(out_p, ctypes.c_float),
                               _ptr(inv, ctypes.c_int32))
        return out_p[:m].copy(), inv
    # fallback
    ic = np.floor(points / cell_size).astype(np.int64)
    key = (ic[:, 0] * 2**42) + (ic[:, 1] * 2**21) + ic[:, 2]
    uniq, first_idx, inv = np.unique(key, return_index=True, return_inverse=True)
    order = np.argsort(first_idx)  # first-appearance order like the native
    rank = np.empty_like(order)
    rank[order] = np.arange(len(order))
    inv = rank[inv]
    sums = np.zeros((len(uniq), 3))
    np.add.at(sums, inv, points)
    cnt = np.bincount(inv, minlength=len(uniq))[:, None]
    return (sums / cnt).astype(np.float32), inv.astype(np.int32)


def radius_neighbors(support: np.ndarray, queries: np.ndarray, radius: float,
                     max_k: int):
    """Returns (idx (nq, max_k) int32 with ns for empty, counts (nq,))."""
    support = np.ascontiguousarray(support, np.float32)
    queries = np.ascontiguousarray(queries, np.float32)
    ns, nq = len(support), len(queries)
    lib = get_lib()
    if lib is not None:
        idx = np.empty((nq, max_k), np.int32)
        cnt = np.empty(nq, np.int32)
        lib.radius_neighbors(_ptr(support, ctypes.c_float), ns,
                             _ptr(queries, ctypes.c_float), nq,
                             ctypes.c_float(radius), max_k,
                             _ptr(idx, ctypes.c_int32),
                             _ptr(cnt, ctypes.c_int32))
        return idx, cnt
    idx = np.full((nq, max_k), ns, np.int32)
    cnt = np.zeros(nq, np.int32)
    r2 = radius * radius
    for q in range(nq):
        d = ((support - queries[q]) ** 2).sum(1)
        hits = np.where(d <= r2)[0][:max_k]
        idx[q, : len(hits)] = hits
        cnt[q] = len(hits)
    return idx, cnt


def voxelize_rulebook(coords: np.ndarray, batch: np.ndarray):
    """(n,3) int32 + (n,) int32 -> (point2voxel (n,), voxel_coords (m,4))."""
    coords = np.ascontiguousarray(coords, np.int32)
    batch = np.ascontiguousarray(batch, np.int32)
    n = len(coords)
    lib = get_lib()
    if lib is not None:
        p2v = np.empty(n, np.int32)
        vc = np.empty((n, 4), np.int32)
        m = lib.voxelize_rulebook(_ptr(coords, ctypes.c_int32),
                                  _ptr(batch, ctypes.c_int32), n,
                                  _ptr(p2v, ctypes.c_int32),
                                  _ptr(vc, ctypes.c_int32))
        return p2v, vc[:m].copy()
    key = (batch.astype(np.int64) * 2**63 // 2**63)  # placeholder
    key = (batch.astype(np.int64) << 48) ^ (
        coords[:, 0].astype(np.int64) * 2**32
        + coords[:, 1].astype(np.int64) * 2**16 + coords[:, 2])
    uniq, first_idx, inv = np.unique(key, return_index=True, return_inverse=True)
    order = np.argsort(first_idx)
    rank = np.empty_like(order)
    rank[order] = np.arange(len(order))
    p2v = rank[inv].astype(np.int32)
    vc = np.concatenate([batch[first_idx[order]][:, None],
                         coords[first_idx[order]]], 1).astype(np.int32)
    return p2v, vc


def nearest_neighbor_map(verts: np.ndarray, resampled: np.ndarray,
                         cell: float = 0.1):
    verts = np.ascontiguousarray(verts, np.float32)
    resampled = np.ascontiguousarray(resampled, np.float32)
    lib = get_lib()
    if lib is not None:
        out = np.empty(len(verts), np.int32)
        lib.nearest_neighbor_map(_ptr(verts, ctypes.c_float), len(verts),
                                 _ptr(resampled, ctypes.c_float),
                                 len(resampled), ctypes.c_float(cell),
                                 _ptr(out, ctypes.c_int32))
        return out
    out = np.empty(len(verts), np.int32)
    chunk = 4096
    for i in range(0, len(verts), chunk):
        d = ((verts[i:i + chunk, None] - resampled[None]) ** 2).sum(-1)
        out[i:i + chunk] = d.argmin(1)
    return out


def subm_rulebook3(coords: np.ndarray, n: int, capacity: int) -> np.ndarray:
    """Kernel-3 submanifold rulebook over (capacity, 4) int32 coords with the
    first `n` rows valid. Returns (capacity, 27) int32 neighbor rows, absent
    = capacity. Host analog of sparse/conv.build_subm_rulebook (the offset
    ordering matches kernel_offsets(3)). Numpy fallback: dict lookups."""
    coords = np.ascontiguousarray(coords, np.int32)
    capacity = int(capacity)
    lib = get_lib()
    if lib is not None:
        out = np.empty((capacity, 27), np.int32)
        lib.subm_rulebook3(_ptr(coords, ctypes.c_int32), int(n), capacity,
                           _ptr(out, ctypes.c_int32))
        return out
    table = {tuple(c): i for i, c in enumerate(coords[:n])}
    out = np.full((capacity, 27), capacity, np.int32)
    k = 0
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                for i in range(n):
                    b, x, y, z = coords[i]
                    q = (b, x + dx, y + dy, z + dz)
                    if q[1] >= 0 and q[2] >= 0 and q[3] >= 0:
                        out[i, k] = table.get(q, capacity)
                k += 1
    return out


def subm_windows(rulebook: np.ndarray, tile: int, window: int):
    """Windowed-gather plan over a (capacity, 27) rulebook whose rows are in
    lexicographic coordinate order. Returns (win_base (capacity//tile, 9),
    rb_win (3*capacity, 9), overflow_count).

    rb_win is the dz-BLOCK-INTERLEAVED layout the Pallas kernel consumes:
    rb_win[(t*3 + dz)*tile + i, g] = window-local index of query row
    t*tile + i for kernel offset k = g*3 + dz; == window marks absent.
    overflow_count > 0 means a REAL neighbor did not fit its window —
    callers must then use the global-gather path (never silently drop)."""
    rulebook = np.ascontiguousarray(rulebook, np.int32)
    capacity = len(rulebook)
    n_tiles = capacity // tile
    lib = get_lib()
    if lib is not None:
        base = np.empty((n_tiles, 9), np.int32)
        rb_win = np.empty((3 * capacity, 9), np.int32)
        ovf = lib.subm_windows(_ptr(rulebook, ctypes.c_int32), capacity, tile,
                               window, _ptr(base, ctypes.c_int32),
                               _ptr(rb_win, ctypes.c_int32))
        return base, rb_win, int(ovf)
    m = capacity
    rb3 = rulebook.reshape(n_tiles, tile, 9, 3)
    present = rb3 < m
    lo = np.where(present, rb3, m).min(axis=(1, 3))  # (n_tiles, 9)
    base = np.where(lo == m, 0, lo & ~15).astype(np.int32)
    d = rb3 - base[:, None, :, None]
    fits = present & (d >= 0) & (d < window)
    local = np.where(fits, d, window).astype(np.int32)  # (nt, tile, 9, 3)
    ovf = int((present & ~fits).sum())
    rb_win = np.ascontiguousarray(
        local.transpose(0, 3, 1, 2).reshape(3 * capacity, 9))
    return base, rb_win, int(ovf)


def downsample_plan(coords: np.ndarray, n: int, cap_out: int):
    """Stride-2 downsample plan: unique halved coords in lexicographic order
    (matching the device downsample_coords). Returns (out_coords (cap_out,4),
    num_out, out_row (n_in,), delta (n_in,)); n_in = len(coords)."""
    coords = np.ascontiguousarray(coords, np.int32)
    n_in = len(coords)
    lib = get_lib()
    if lib is not None:
        out_c = np.zeros((cap_out, 4), np.int32)
        out_row = np.full(n_in, cap_out, np.int32)
        delta = np.zeros(n_in, np.int32)
        m = lib.downsample_plan(_ptr(coords, ctypes.c_int32), int(n),
                                int(cap_out), _ptr(out_c, ctypes.c_int32),
                                _ptr(out_row, ctypes.c_int32),
                                _ptr(delta, ctypes.c_int32))
        return out_c, int(m), out_row, delta
    half = coords.copy()
    half[:, 1:] >>= 1
    delta = ((coords[:, 1] & 1) * 4 + (coords[:, 2] & 1) * 2
             + (coords[:, 3] & 1)).astype(np.int32)
    uniq, inv = np.unique(half[:n], axis=0, return_inverse=True)
    m = min(len(uniq), cap_out)
    out_c = np.zeros((cap_out, 4), np.int32)
    out_c[:m] = uniq[:m]
    out_row = np.full(n_in, cap_out, np.int32)
    out_row[:n] = np.where(inv < cap_out, inv, cap_out)
    return out_c, m, out_row, delta


def elastic_interp(coords: np.ndarray, mins: np.ndarray, granularity: float,
                   magnitude: float, noise: np.ndarray) -> np.ndarray | None:
    """Trilinear displacement of `coords` by a blurred noise grid (the
    interpolation half of elastic distortion; the grid axis convention
    matches transforms.elastic_distortion's RegularGridInterpolator setup).
    Returns the displaced coords, or None when the native lib is absent
    (callers then use the scipy path)."""
    lib = get_lib()
    if lib is None:
        return None
    out = np.ascontiguousarray(coords, np.float32).copy()
    mins = np.ascontiguousarray(mins, np.float32)
    noise = np.ascontiguousarray(noise, np.float32)
    dims = np.asarray(noise.shape[:3], np.int32)
    lib.elastic_interp(_ptr(out, ctypes.c_float), len(out),
                       _ptr(mins, ctypes.c_float),
                       ctypes.c_float(granularity), ctypes.c_float(magnitude),
                       _ptr(noise, ctypes.c_float),
                       _ptr(dims, ctypes.c_int32))
    return out


def voxelize_sorted(points: np.ndarray, voxel_size: float):
    """Fused scene voxelization: (n,3) float -> (int_coords (m,3) lex-sorted,
    first (m,) original index of each voxel's first point, p2v (n,)).
    None when the native lib is absent."""
    lib = get_lib()
    if lib is None:
        return None
    points = np.ascontiguousarray(points, np.float32)
    n = len(points)
    ic = np.empty((n, 3), np.int32)
    first = np.empty(n, np.int32)
    p2v = np.empty(n, np.int32)
    m = lib.voxelize_sorted(_ptr(points, ctypes.c_float), n,
                            ctypes.c_float(voxel_size),
                            _ptr(ic, ctypes.c_int32),
                            _ptr(first, ctypes.c_int32),
                            _ptr(p2v, ctypes.c_int32))
    return ic[:m].copy(), first[:m].copy(), p2v


def connected_components(edges: np.ndarray, n: int):
    edges = np.ascontiguousarray(edges, np.int32)
    lib = get_lib()
    if lib is not None:
        labels = np.empty(n, np.int32)
        lib.connected_components_uf(_ptr(edges, ctypes.c_int32), len(edges),
                                    n, _ptr(labels, ctypes.c_int32))
        return labels
    parent = np.arange(n)

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return np.array([find(i) for i in range(n)], np.int32)
