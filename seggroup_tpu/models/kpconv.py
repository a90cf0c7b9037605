"""KPConv (kernel point convolution) FCNN, TPU-native.

Reimplements the reference KPConv stack (reference kpconv/kernels/
convolution_ops.py:161-626, models/network_blocks.py, models/KPFCNN_model.py)
with the whole multiscale pyramid built ON DEVICE:

  * the reference builds per-batch radius neighborhoods and grid subsampling
    pyramids with CPU TF ops over nanoflann KD-trees
    (tf_custom_ops/tf_batch_neighbors.cpp, tf_batch_subsampling.cpp) — the
    classic KPConv input bottleneck. Here both are grid-hash ball queries and
    voxel barycenter pooling (ops.knn.ball_query_pair + ops.voxelize), fully
    jitted, with shadow-row padding exactly like the reference's shadow
    points (convolution_ops.py:190-194);
  * the conv itself is two einsums: influence-weighted neighbor aggregation
    per kernel point, then the (P, Cin, Cout) weight contraction — both MXU
    matmuls (convolution_ops.py:227-247 is the same algebra);
  * rigid and deformable variants; deformable offsets come from a rigid
    KPConv head, and the fitting/repulsive regularizers
    (KPFCNN_model.py:217-296) are returned explicitly instead of fished out
    of the TF graph by name;
  * kernel point dispositions via the reference's repulsive-potential
    optimization (kernels/kernel_points.py:41-180), run once and cached.

ScanNet configuration (training_Scannet.py:78-126): 15 kernel points,
dl0=4 cm, architecture simple/resnetb encoder with strided + deformable
stages and nearest-upsample/unary decoder, in_features_dim=4 (constant 1 +
rgb), first_features_dim=64, BN momentum .98 (TF decay convention), linear
influence, sum aggregation.
"""

from __future__ import annotations

from functools import lru_cache
from typing import NamedTuple, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from seggroup_tpu.ops.knn import ball_query_pair, ball_query_pair_fast
from seggroup_tpu.ops.segment_ops import segment_mean

# ---------------------------------------------------------------------------
# kernel point dispositions
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def kernel_point_positions(num_points: int = 15, dim: int = 3,
                           num_iters: int = 10000, seed: int = 42,
                           fixed: str = "center",
                           n_restarts: int = 8) -> np.ndarray:
    """Repulsive-potential optimization of kernel point placement (the
    reference's kernel_point_optimization_debug scheme,
    kernels/kernel_points.py:41-180): init uniform in the r^2 < 0.5 ball;
    each step the potential gradient is inter-point repulsion
    sum_j (x_i - x_j)/|x_i - x_j|^3 plus a radial attraction 10*x_i; points
    move a CLIPPED distance min(lr * |g|, 0.05) along -g/|g| with lr decaying
    by 0.9995 per step; stops when the per-point gradient norms settle
    (max change < 1e-5); finally rescaled so the mean radius of the moving
    points is 1. `fixed`: 'center' pins point 0 at the origin (the reference
    ScanNet config); 'verticals' additionally pins points 1-2 on the +-2/3 z
    axis (their z is held, xy gradients zeroed); 'none' moves everything.

    Like the reference's load_kernels (which optimizes num_kernels=100 and
    keeps the best, kernel_points.py:234-244), the optimization restarts
    `n_restarts` times and returns the lowest-potential disposition. The
    result is deterministic per (num_points, seed) but differs from the
    reference's shipped .ply cache (different RNG draws — same potential,
    same statistics; docs/ARCHITECTURE.md deviations list)."""
    best, best_pot = None, np.inf
    for restart in range(n_restarts):
        pts = _optimize_kernel_points(num_points, dim, num_iters,
                                      seed + restart, fixed)
        d = np.linalg.norm(pts[:, None] - pts[None], axis=-1)
        np.fill_diagonal(d, np.inf)
        pot = float((1.0 / d[np.isfinite(d)]).sum() / 2
                    + 5.0 * (np.linalg.norm(pts, axis=1) ** 2).sum())
        if fixed == "verticals" and pts[1, -1] * pts[2, -1] >= 0:
            # the z-constrained points drifted to the same side — penalize so
            # a restart with the intended +-z structure wins when one exists
            pot += 1e6
        if pot < best_pot:
            best, best_pot = pts, pot
    return best


def _optimize_kernel_points(num_points: int, dim: int, num_iters: int,
                            seed: int, fixed: str) -> np.ndarray:
    rng = np.random.default_rng(seed)
    pts = np.empty((0, dim))
    while len(pts) < num_points:
        cand = rng.uniform(-1, 1, size=(4 * num_points, dim))
        cand = cand[np.sum(cand ** 2, axis=1) < 0.5]
        pts = np.concatenate([pts, cand])
    pts = pts[:num_points].copy()
    if fixed == "center":
        pts[0] = 0.0
    elif fixed == "verticals":
        pts[:3] = 0.0
        pts[1, -1] = 2.0 / 3.0
        pts[2, -1] = -2.0 / 3.0

    lr, decay, clip, thresh = 1e-2, 0.9995, 0.05, 1e-5
    old_norms = np.zeros(num_points)
    for _ in range(num_iters):
        diff = pts[:, None, :] - pts[None, :, :]
        d2 = np.sum(diff ** 2, axis=-1)
        grad = (diff / (d2[..., None] ** 1.5 + 1e-6)).sum(axis=1)
        grad += 10.0 * pts
        if fixed == "verticals":
            grad[1:3, :-1] = 0.0
        norms = np.linalg.norm(grad, axis=-1)
        moving = np.arange(num_points) >= {"center": 1, "verticals": 3}.get(
            fixed, 0)
        if np.max(np.abs(old_norms[moving] - norms[moving])) < thresh:
            break
        old_norms = norms
        step = np.minimum(lr * norms, clip)
        if fixed in ("center", "verticals"):
            step[0] = 0.0
        pts -= (step[:, None] * grad) / (norms[:, None] + 1e-6)
        lr *= decay
    r = np.linalg.norm(pts, axis=-1)
    pts = pts / np.mean(r[1:])
    return pts.astype(np.float32)


# ---------------------------------------------------------------------------
# the conv op
# ---------------------------------------------------------------------------


def kpconv_op(
    queries: jax.Array,        # (Nq, 3)
    supports: jax.Array,       # (Ns, 3)
    neighbors: jax.Array,      # (Nq, K) into supports, == Ns for shadow
    feats: jax.Array,          # (Ns, Cin)
    kernel_pts: jax.Array,     # (P, 3) absolute offsets (already scaled)
    weights: jax.Array,        # (P, Cin, Cout)
    extent: float,
    influence: str = "linear",
    aggregation: str = "sum",
) -> jax.Array:
    """Reference KPConv (convolution_ops.py:161-249). Shadow neighbors are
    sent far away so their influence is zero."""
    ns = supports.shape[0]
    sup_pad = jnp.concatenate(
        [supports, jnp.full((1, 3), 1e6, supports.dtype)], axis=0
    )
    feat_pad = jnp.concatenate([feats, jnp.zeros((1, feats.shape[1]))], axis=0)
    nbr = jnp.minimum(neighbors, ns)
    rel = sup_pad[nbr] - queries[:, None, :]            # (Nq, K, 3)
    d2 = jnp.sum(
        (rel[:, :, None, :] - kernel_pts[None, None]) ** 2, axis=-1
    )  # (Nq, K, P)
    if influence == "linear":
        infl = jnp.maximum(0.0, 1.0 - jnp.sqrt(d2 + 1e-12) / extent)
    elif influence == "constant":
        infl = jnp.ones_like(d2)
    elif influence == "gaussian":
        sigma = extent * 0.3
        infl = jnp.exp(-d2 / (2 * sigma ** 2))
    else:
        raise ValueError(influence)
    if aggregation == "closest":
        closest = jnp.argmin(d2, axis=-1)
        infl = infl * jax.nn.one_hot(closest, kernel_pts.shape[0])
    g = feat_pad[nbr]  # (Nq, K, Cin)
    weighted = jnp.einsum("nkp,nkc->npc", infl, g,
                          preferred_element_type=jnp.float32)
    return jnp.einsum("npc,pco->no", weighted, weights,
                      preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# device-side multiscale pyramid
# ---------------------------------------------------------------------------


class PyramidLevel(NamedTuple):
    points: jax.Array     # (N_l, 3)
    batch: jax.Array      # (N_l,)
    valid: jax.Array      # (N_l,)
    neighbors: jax.Array  # (N_l, K) within-level
    pools: jax.Array      # (N_{l+1}, K) coarse query -> fine support (last level: empty)
    upsamples: jax.Array  # (N_l,) fine -> its coarse cell row (for decoder)


def build_pyramid(
    points: jax.Array,
    batch: jax.Array,
    valid: jax.Array,
    num_layers: int,
    dl0: float,
    conv_radius: float = 2.5,
    neighbor_cap: int | Sequence[int] = 32,
    level_caps: Sequence[int] | None = None,
    bucket_cap: int = 16,
    return_overflow: bool = False,
):
    """The analog of tf_segmentation_inputs (reference common.py:1021-1158):
    per layer, within-level radius neighborhoods, 2x grid pooling (barycenter
    of each voxel cell, reference grid_subsampling.cpp:4-106), pooling
    neighborhoods, and upsample assignment (= the fine point's voxel cell).

    `neighbor_cap` may be a single int or one cap per layer — use
    `calibrate_neighbor_caps` to set them from data histograms instead of
    constants (the reference's calibrate_neighbors, common.py:551-656).

    With `return_overflow`, returns (levels, overflow_rates): per level the
    fraction of valid query points whose true neighborhood exceeded the cap
    (flags computed by ball_query_pair) — log these during validation so
    silent truncation is visible."""
    from seggroup_tpu.ops.voxelize import voxelize

    if isinstance(neighbor_cap, int):
        nbr_caps = [neighbor_cap] * num_layers
    else:
        nbr_caps = list(neighbor_cap)
        assert len(nbr_caps) == num_layers
    levels = []
    over_rates = []
    cur_p, cur_b, cur_v = points, batch, valid
    dl = dl0
    n0 = points.shape[0]
    caps = level_caps or [max(256, n0 >> i) for i in range(1, num_layers + 1)]
    for layer in range(num_layers):
        r = dl * conv_radius
        nbrs, _, over = ball_query_pair_fast(
            cur_p, cur_b, cur_v, cur_p, cur_b, cur_v, r,
            max_neighbors=nbr_caps[layer], bucket_cap=bucket_cap,
        )
        over_rates.append(
            jnp.sum(jnp.where(cur_v, over, False))
            / jnp.maximum(jnp.sum(cur_v), 1))
        if layer + 1 < num_layers:
            cap = caps[layer]
            ic = jnp.floor(cur_p / (2 * dl)).astype(jnp.int32)
            ic = ic - jnp.min(jnp.where(cur_v[:, None], ic, 2**30), axis=0)
            vm = voxelize(ic, cur_b, cur_v, cap)
            nxt_p = segment_mean(cur_p, vm.point2voxel, cap,
                                 method="sorted")  # barycenters
            nxt_b = vm.voxel_coords[:, 0]
            nxt_v = vm.voxel_valid
            pools, _, _ = ball_query_pair_fast(
                cur_p, cur_b, cur_v, nxt_p, nxt_b, nxt_v, r,
                max_neighbors=nbr_caps[layer], bucket_cap=bucket_cap,
            )
            ups = vm.point2voxel  # fine point -> coarse row
        else:
            pools = jnp.zeros((1, nbr_caps[layer]), jnp.int32)
            ups = jnp.zeros((cur_p.shape[0],), jnp.int32)
        levels.append(PyramidLevel(cur_p, cur_b, cur_v, nbrs, pools, ups))
        if layer + 1 < num_layers:
            cur_p, cur_b, cur_v = nxt_p, nxt_b, nxt_v
            dl *= 2
    if return_overflow:
        return levels, over_rates
    return levels


def calibrate_neighbor_caps(
    sample_batches,
    num_layers: int,
    dl0: float,
    conv_radius: float = 2.5,
    keep_ratio: float = 0.8,
    probe_cap: int = 192,
    probe_bucket: int = 64,
    level_caps: Sequence[int] | None = None,
) -> tuple[list[int], list[float]]:
    """Set per-level neighbor caps from data histograms (the reference's
    calibrate_neighbors, common.py:551-656, keep_ratio 0.8): probe a few
    sample batches with generous caps, take the per-level `keep_ratio`
    quantile of true neighborhood sizes, and round up to the next multiple
    of 8 (lane-friendly). Returns (caps, overflow_rate_at_probe) — a nonzero
    probe overflow rate means even the probe caps truncated and the quantile
    is a lower bound.

    sample_batches: iterable of (points (N,3), batch_ids (N,), valid (N,))
    numpy/jax arrays, all the same N (one compile)."""
    from seggroup_tpu.ops.voxelize import voxelize

    @jax.jit
    def probe(pts, bids, valid):
        counts_l, over_l = [], []
        cur_p, cur_b, cur_v = pts, bids, valid
        dl = dl0
        n0 = pts.shape[0]
        caps = level_caps or [max(256, n0 >> i) for i in range(1, num_layers + 1)]
        for layer in range(num_layers):
            r = dl * conv_radius
            _, cnt, over = ball_query_pair(
                cur_p, cur_b, cur_v, cur_p, cur_b, cur_v, r,
                max_neighbors=probe_cap, bucket_cap=probe_bucket,
            )
            counts_l.append(jnp.where(cur_v, cnt, -1))
            over_l.append(over & cur_v)
            if layer + 1 < num_layers:
                cap = caps[layer]
                ic = jnp.floor(cur_p / (2 * dl)).astype(jnp.int32)
                ic = ic - jnp.min(jnp.where(cur_v[:, None], ic, 2**30), axis=0)
                vm = voxelize(ic, cur_b, cur_v, cap)
                cur_p = segment_mean(cur_p, vm.point2voxel, cap,
                                     method="sorted")
                cur_b = vm.voxel_coords[:, 0]
                cur_v = vm.voxel_valid
                dl *= 2
        return counts_l, over_l

    all_counts = [[] for _ in range(num_layers)]
    over_n = np.zeros(num_layers)
    over_d = np.zeros(num_layers)
    for pts, bids, valid in sample_batches:
        counts_l, over_l = probe(jnp.asarray(pts), jnp.asarray(bids),
                                 jnp.asarray(valid))
        for lv in range(num_layers):
            c = np.asarray(counts_l[lv])
            all_counts[lv].append(c[c >= 0])
            o = np.asarray(over_l[lv])
            over_n[lv] += o.sum()
            over_d[lv] += max((c >= 0).sum(), 1)
    caps_out, over_rate = [], []
    for lv in range(num_layers):
        c = np.concatenate(all_counts[lv]) if all_counts[lv] else np.array([1])
        q = int(np.quantile(c, keep_ratio)) if len(c) else 8
        caps_out.append(int(min(max(8, -(-q // 8) * 8), probe_cap)))
        over_rate.append(float(over_n[lv] / max(over_d[lv], 1)))
        if caps_out[-1] >= probe_cap:
            import warnings
            warnings.warn(
                f"calibrate_neighbor_caps: level {lv} quantile saturated at "
                f"probe_cap={probe_cap} (overflow rate "
                f"{over_rate[-1]:.3f}); the calibrated cap is a LOWER bound "
                f"— re-run with a larger probe_cap for dense scans",
                stacklevel=2)
    return caps_out, over_rate


def sample_sphere_sizes(clouds, in_radius: float, samples_per_cloud: int = 30,
                        rng=None) -> np.ndarray:
    """Sample in_radius-sphere point counts across clouds — the statistics
    the reference's batch calibration draws from (common.py:497-512: random
    centers jittered by in_radius/4, KD-tree radius count). Host-side numpy;
    chunked brute force replaces the KD-tree."""
    rng = rng or np.random.default_rng(0)
    sizes = []
    r2 = in_radius * in_radius
    for pts in clouds:
        pts = np.asarray(pts, np.float32)
        n = len(pts)
        take = min(samples_per_cloud, n)
        centers = pts[rng.choice(n, size=take, replace=False)]
        centers = centers + rng.normal(
            scale=in_radius / 4, size=centers.shape).astype(np.float32)
        for c in centers:
            cnt = 0
            for lo in range(0, n, 1 << 17):
                d2 = ((pts[lo:lo + (1 << 17)] - c) ** 2).sum(1)
                cnt += int((d2 < r2).sum())
            sizes.append(cnt)
    return np.sort(np.asarray(sizes))


def calibrate_batch_limit(sphere_sizes, batch_num: int, rng=None,
                          iters: int = 10000, gain: float = 10.0,
                          round_to: int = 1024) -> tuple[float, int]:
    """Batch-limit calibration (reference calibrate_batches,
    common.py:487-549): find the cumulative point limit at which greedily
    packing random spheres until the running sum crosses it yields ~batch_num
    spheres per batch, via the same proportional-corrector loop over sampled
    sphere sizes. Returns (batch_limit, point_cap) where point_cap is the
    limit rounded UP to `round_to` — the static padded capacity the TPU
    pipeline uses in place of the reference's dynamic tf.data batch limit.

    The stochastic loop is deterministic under `rng`."""
    sizes = np.sort(np.asarray(sphere_sizes, np.float64))
    if sizes.size == 0:
        raise ValueError("calibrate_batch_limit: no sphere sizes sampled")
    rng = rng or np.random.default_rng(0)
    lim = float(sizes[-1]) * batch_num
    # largest number of spheres that could ever fit under lim (smallest-first)
    max_b = int(np.searchsorted(np.cumsum(sizes), lim, side="right"))
    max_b = max(max_b, 1)
    estim = 0.0
    for i in range(iters):
        pick = rng.choice(sizes, size=min(max_b, sizes.size), replace=False)
        fit = int(np.sum(np.cumsum(pick) < lim))
        estim += (fit - estim) / min(i + 1, 100)
        lim += gain * (batch_num - estim)
    lim = max(lim, float(sizes[-1]))
    point_cap = int(-(-int(lim) // round_to) * round_to)
    return lim, point_cap


# ---------------------------------------------------------------------------
# blocks + KPFCNN
# ---------------------------------------------------------------------------


class TFBatchNorm(nn.Module):
    """BN with TF decay convention (running = momentum*running +
    (1-momentum)*batch; reference batch_norm_momentum=0.98)."""

    momentum: float = 0.98
    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x, valid, train: bool):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,)))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((c,)))
        if train:
            m = valid.astype(x.dtype)[:, None]
            cnt = jnp.maximum(jnp.sum(m), 1.0)
            mean = jnp.sum(x * m, 0) / cnt
            var = jnp.sum(jnp.square(x - mean) * m, 0) / cnt
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        else:
            mean, var = ra_mean.value, ra_var.value
        return (x - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias


def _leaky(x):
    return nn.leaky_relu(x, 0.1)


class KPConvLayer(nn.Module):
    """One (possibly deformable) KPConv with weights as flax params.

    deformable:    v1 — offsets from a rigid KPConv head over the
                   neighborhood (reference convolution_ops.py:252-502).
    deformable_v2: offsets from a pointwise MLP on the query features
                   instead — fewer parameters, center point fixed
                   (convolution_ops.py:503-626). For strided blocks the
                   query feature is read at the nearest support row.
    modulated:     v2 only — the MLP also emits per-kernel-point modulation
                   scalars 2*sigmoid(.), applied to the influence weights;
                   the center point's modulation is 0 like the reference
                   (convolution_ops.py:566-570)."""

    out_channels: int
    num_kernel_points: int = 15
    kp_extent: float = 1.0
    deformable: bool = False
    deformable_v2: bool = False
    modulated: bool = False

    @nn.compact
    def __call__(self, queries, supports, neighbors, feats, dl):
        p = self.num_kernel_points
        cin = feats.shape[-1]
        base = jnp.asarray(kernel_point_positions(p)) * (1.5 * self.kp_extent * dl)
        extent = self.kp_extent * dl
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
            (p, cin, self.out_channels),
        )
        reg = jnp.zeros(())
        modulations = None
        if self.deformable_v2:
            # pointwise offset MLP on query-located features (zero-init like
            # the reference's w0/b0, convolution_ops.py:548-552)
            if queries.shape[0] == supports.shape[0]:
                qfeats = feats
            else:  # strided: nearest support row carries the query feature
                ns = supports.shape[0]
                qfeats = jnp.concatenate(
                    [feats, jnp.zeros((1, cin))], 0
                )[jnp.minimum(neighbors[:, 0], ns)]
            off_dim = (3 + int(self.modulated)) * (p - 1)
            f0 = nn.Dense(off_dim, use_bias=True,
                          kernel_init=nn.initializers.zeros,
                          bias_init=nn.initializers.zeros,
                          name="offset_mlp")(qfeats)
            off = f0[:, : 3 * (p - 1)].reshape(-1, p - 1, 3)
            off = jnp.concatenate([jnp.zeros_like(off[:, :1]), off], axis=1)
            off = off * extent
            kp = base[None] + off
            if self.modulated:
                mods = 2.0 * jax.nn.sigmoid(f0[:, 3 * (p - 1):])  # (Nq, P-1)
                modulations = jnp.concatenate(
                    [jnp.zeros_like(mods[:, :1]), mods], axis=1)
        elif self.deformable:
            w_off = self.param("offset_kernel", nn.initializers.zeros,
                               (p, cin, p * 3))
            off = kpconv_op(queries, supports, neighbors, feats, base, w_off,
                            extent)
            off = off.reshape(-1, p, 3) * extent  # (Nq, P, 3)
            kp = base[None] + off
        if self.deformable or self.deformable_v2:
            # captured by cli/introspect_kpconv.py --mode deformations
            # (reference visualize_deformations.py reads deformed_KP by name)
            self.sow("intermediates", "deformed_kp", kp)
            # fitting + repulsive regularizers (KPFCNN_model.py:217-296)
            ns = supports.shape[0]
            sup_pad = jnp.concatenate([supports, jnp.full((1, 3), 1e6)], 0)
            rel = sup_pad[jnp.minimum(neighbors, ns)] - queries[:, None, :]
            d2 = jnp.sum((rel[:, :, None, :] - kp[:, None]) ** 2, -1)  # (Nq,K,P)
            fitting = jnp.mean(jnp.clip(jnp.min(d2, axis=1) / extent ** 2, 0, 1))
            kpd = jnp.sum((kp[:, :, None, :] - kp[:, None, :, :]) ** 2, -1)
            kpd = kpd + jnp.eye(p)[None] * 1e6
            repulsive = jnp.mean(
                jnp.clip(1.0 - jnp.sqrt(kpd + 1e-12) / extent, 0, None) ** 2
            )
            reg = fitting + repulsive
            out = _deformable_apply(queries, supports, neighbors, feats, kp, w,
                                    extent, modulations=modulations)
        else:
            out = kpconv_op(queries, supports, neighbors, feats, base, w, extent)
        return out, reg


def _deformable_apply(queries, supports, neighbors, feats, kp, w, extent,
                      modulations=None):
    """Same math as kpconv_op but with per-query kernel points (Nq, P, 3);
    optional per-query modulation scalars (Nq, P) multiply the influence
    weights (reference KPConv_deform_ops modulated path)."""
    ns = supports.shape[0]
    sup_pad = jnp.concatenate([supports, jnp.full((1, 3), 1e6)], 0)
    feat_pad = jnp.concatenate([feats, jnp.zeros((1, feats.shape[1]))], 0)
    nbr = jnp.minimum(neighbors, ns)
    rel = sup_pad[nbr] - queries[:, None, :]
    d2 = jnp.sum((rel[:, :, None, :] - kp[:, None]) ** 2, -1)
    infl = jnp.maximum(0.0, 1.0 - jnp.sqrt(d2 + 1e-12) / extent)
    if modulations is not None:
        infl = infl * modulations[:, None, :]
    g = feat_pad[nbr]
    weighted = jnp.einsum("nkp,nkc->npc", infl, g,
                          preferred_element_type=jnp.float32)
    return jnp.einsum("npc,pco->no", weighted, w,
                      preferred_element_type=jnp.float32)


class ResnetBottleneck(nn.Module):
    """unary(f/2) -> KPConv(f/2) -> unary(2f) + shortcut (reference
    resnetb_block, network_blocks.py:290-338). Strided variant queries the
    coarse level and max-pools the shortcut over the pool neighborhood."""

    fdim: int
    deformable: bool = False
    strided: bool = False
    deformable_v2: bool = False
    modulated: bool = False

    @nn.compact
    def __call__(self, lvl: PyramidLevel, nxt: PyramidLevel | None, feats,
                 dl, train: bool):
        f = self.fdim
        if self.strided:
            queries, q_valid = nxt.points, nxt.valid
            neighbors = lvl.pools
        else:
            queries, q_valid = lvl.points, lvl.valid
            neighbors = lvl.neighbors

        x = nn.Dense(f // 2, use_bias=False, name="conv1")(feats)
        x = _leaky(TFBatchNorm(name="bn1")(x, lvl.valid, train))
        x, reg = KPConvLayer(f // 2, deformable=self.deformable,
                             deformable_v2=self.deformable_v2,
                             modulated=self.modulated, name="kp")(
            queries, lvl.points, neighbors, x, dl
        )
        x = _leaky(TFBatchNorm(name="bn2")(x, q_valid, train))
        x = nn.Dense(2 * f, use_bias=False, name="conv3")(x)
        x = TFBatchNorm(name="bn3")(x, q_valid, train)

        sc = feats
        if self.strided:
            # max-pool shortcut over the pooling neighborhood
            ns = feats.shape[0]
            pad = jnp.concatenate([sc, jnp.full((1, sc.shape[1]), -1e30)], 0)
            pooled = jnp.max(pad[jnp.minimum(neighbors, ns)], axis=1)
            sc = jnp.where(pooled <= -1e30, 0.0, pooled)
        if sc.shape[-1] != 2 * f:
            sc = nn.Dense(2 * f, use_bias=False, name="shortcut")(sc)
            sc = TFBatchNorm(name="shortcut_bn")(sc, q_valid, train)
        out = _leaky(x + sc)
        return jnp.where(q_valid[:, None], out, 0.0), reg


SCANNET_ARCHITECTURE = (
    "simple", "resnetb", "resnetb_strided", "resnetb", "resnetb_strided",
    "resnetb_deformable", "resnetb_deformable_strided", "resnetb_deformable",
    "resnetb_deformable_strided", "resnetb_deformable",
    "nearest_upsample", "unary", "nearest_upsample", "unary",
    "nearest_upsample", "unary", "nearest_upsample", "unary",
)


class KPFCNN(nn.Module):
    """Segmentation FCNN over a precomputed pyramid (reference
    assemble_CNN/FCNN_blocks, network_blocks.py:1018-1148 + KPFCNN_model.py).
    """

    num_classes: int = 20
    architecture: Sequence[str] = SCANNET_ARCHITECTURE
    first_features_dim: int = 64
    dl0: float = 0.04
    modulated: bool = False  # modulated deformable_v2 blocks

    @nn.compact
    def __call__(self, pyramid: list[PyramidLevel], in_feats, train: bool = True):
        fdim = self.first_features_dim
        dl = self.dl0
        layer = 0
        feats = in_feats
        skips = []
        regs = jnp.zeros(())
        i = 0
        for name in self.architecture:
            lvl = pyramid[layer]
            if name == "simple":
                x, reg = KPConvLayer(fdim // 2, name=f"b{i}_kp")(
                    lvl.points, lvl.points, lvl.neighbors, feats, dl
                )
                feats = _leaky(TFBatchNorm(name=f"b{i}_bn")(x, lvl.valid, train))
                regs += reg
            elif name.startswith("resnetb"):
                v2 = "deformable_v2" in name
                deform = ("deformable" in name) and not v2
                strided = "strided" in name
                if strided:
                    skips.append(feats)
                nxt = pyramid[layer + 1] if strided else None
                feats, reg = ResnetBottleneck(
                    fdim, deform, strided, deformable_v2=v2,
                    modulated=v2 and self.modulated, name=f"b{i}")(
                    lvl, nxt, feats, dl, train)
                regs += reg
                if strided:
                    layer += 1
                    dl *= 2
                    fdim *= 2
            elif name == "nearest_upsample":
                # decoder: gather coarse features at each fine point's cell
                layer -= 1
                dl /= 2
                fdim //= 2
                fine = pyramid[layer]
                cap = feats.shape[0]
                pad = jnp.concatenate([feats, jnp.zeros((1, feats.shape[1]))], 0)
                up = pad[jnp.minimum(fine.upsamples, cap)]
                feats = jnp.concatenate([up, skips.pop()], axis=-1)
            elif name == "unary":
                lvl = pyramid[layer]
                feats = nn.Dense(fdim, use_bias=False, name=f"b{i}_unary")(feats)
                feats = _leaky(TFBatchNorm(name=f"b{i}_bn")(feats, lvl.valid, train))
            else:
                raise ValueError(name)
            i += 1

        lvl = pyramid[0]
        head = nn.Dense(self.first_features_dim, use_bias=False, name="head")(feats)
        head = _leaky(TFBatchNorm(name="head_bn")(head, lvl.valid, train))
        logits = nn.Dense(self.num_classes, name="logits")(head)
        return jnp.where(lvl.valid[:, None], logits, 0.0), regs


MODELNET_ARCHITECTURE = (
    "simple", "resnetb", "resnetb_strided", "resnetb", "resnetb_strided",
    "resnetb_deformable", "resnetb_deformable_strided", "resnetb_deformable",
    "resnetb_deformable_strided", "resnetb_deformable", "global_average",
)


class KPCNN(nn.Module):
    """Classification CNN over KPConv blocks (reference models/KPCNN_model.py
    + assemble_CNN_blocks/classification_head, network_blocks.py:1018-1084,
    1151-1174): simple/resnetb encoder with strided + deformable stages,
    masked global average over each batch element (global_average_block,
    network_blocks.py:835-860), then fc 1024 -> dropout -> num_classes.

    Named KPCNN like the reference; the sparse-voxel-engine classifier of the
    same role lives in models/resnet_sparse.py (registry key 'kpcnn')."""

    num_classes: int = 40
    architecture: Sequence[str] = MODELNET_ARCHITECTURE
    first_features_dim: int = 64
    dl0: float = 0.04
    num_batches: int = 8  # static batch-element budget for the pooled output
    modulated: bool = False

    @nn.compact
    def __call__(self, pyramid: list[PyramidLevel], in_feats,
                 train: bool = True):
        fdim = self.first_features_dim
        dl = self.dl0
        layer = 0
        feats = in_feats
        regs = jnp.zeros(())
        pooled = None
        for i, name in enumerate(self.architecture):
            lvl = pyramid[layer]
            if name == "simple":
                x, reg = KPConvLayer(fdim // 2, name=f"b{i}_kp")(
                    lvl.points, lvl.points, lvl.neighbors, feats, dl)
                feats = _leaky(TFBatchNorm(name=f"b{i}_bn")(x, lvl.valid, train))
                regs += reg
            elif name.startswith("resnetb"):
                v2 = "deformable_v2" in name
                deform = ("deformable" in name) and not v2
                strided = "strided" in name
                nxt = pyramid[layer + 1] if strided else None
                feats, reg = ResnetBottleneck(
                    fdim, deform, strided, deformable_v2=v2,
                    modulated=v2 and self.modulated, name=f"b{i}")(
                    lvl, nxt, feats, dl, train)
                regs += reg
                if strided:
                    layer += 1
                    dl *= 2
                    fdim *= 2
            elif name == "max_pool":
                # max over the pooling neighborhood (max_pool_block,
                # network_blocks.py:824-831)
                nxt = pyramid[layer + 1]
                ns = feats.shape[0]
                pad = jnp.concatenate(
                    [feats, jnp.full((1, feats.shape[1]), -1e30)], 0)
                feats = jnp.max(pad[jnp.minimum(lvl.pools, ns)], axis=1)
                feats = jnp.where(feats <= -1e30, 0.0, feats)
                layer += 1
                dl *= 2
                fdim *= 2
            elif name == "global_average":
                b_ids = jnp.where(lvl.valid, lvl.batch, self.num_batches)
                pooled = segment_mean(feats, b_ids, self.num_batches)  # (B, C)
            else:
                raise ValueError(name)

        assert pooled is not None, "architecture must end in global_average"
        batch_valid = jax.ops.segment_sum(
            pyramid[layer].valid.astype(jnp.int32),
            jnp.where(pyramid[layer].valid, pyramid[layer].batch,
                      self.num_batches),
            num_segments=self.num_batches + 1)[: self.num_batches] > 0
        h = nn.Dense(1024, use_bias=False, name="fc")(pooled)
        h = _leaky(TFBatchNorm(name="fc_bn")(h, batch_valid, train))
        h = nn.Dropout(0.5, deterministic=not train)(h)
        logits = nn.Dense(self.num_classes, name="softmax")(h)
        return jnp.where(batch_valid[:, None], logits, 0.0), regs
