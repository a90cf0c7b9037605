"""MinkowskiNet Res16UNet family on the gather-GEMM-scatter sparse engine.

Reimplements the reference's MinkowskiEngine models (reference
minkowski/models/res16unet.py:9-332 over resnet.py) TPU-first: fixed voxel
capacities per pyramid level, masked BatchNorm, and kernel-2/stride-2
down/up convs that reuse saved fine-level sites (exactly MinkowskiEngine's
coords-manager behaviour, and spconv's indice_key, by construction).

Channel plans / layer counts match the reference variants:
Res16UNet34C PLANES (32,64,128,256,256,128,96,96), LAYERS (2,3,4,6,2,2,2,2)
(res16unet.py:330-332), INIT_DIM 32, first conv kernel = conv1_kernel_size
(default 3, minkowski/config.py:35), BN momentum 0.02 (config.py:78).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from seggroup_tpu.sparse.conv import (
    build_subm_rulebook,
    inverse_conv_up,
    strided_conv_down,
    strided_conv_down_planned,
    subm_conv,
)
from seggroup_tpu.sparse.tensor import SparseTensor


class SparseBatchNorm(nn.Module):
    """BatchNorm over valid voxels (torch momentum convention: new running =
    (1 - momentum) * old + momentum * batch; reference bn_momentum=0.02)."""

    momentum: float = 0.02
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, feats: jax.Array, valid: jax.Array, train: bool) -> jax.Array:
        c = feats.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,)))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((c,)))
        if train:
            m = valid.astype(feats.dtype)[:, None]
            cnt = jnp.maximum(jnp.sum(m), 1.0)
            mean = jnp.sum(feats * m, axis=0) / cnt
            var = jnp.sum(jnp.square(feats - mean) * m, axis=0) / cnt
            if not self.is_initializing():
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * var
        else:
            mean, var = ra_mean.value, ra_var.value
        y = (feats - mean) * jax.lax.rsqrt(var + self.epsilon)
        return y * scale + bias


class SparseInstanceNorm(nn.Module):
    """Per-batch-element norm over each scene's voxels (reference
    MinkowskiInstanceNorm, minkowski/lib/layers.py:49-96 /
    models/modules/common.py:17-18): per (scene, channel) mean/var via
    segment reductions over the batch column, learned (C,) scale/bias."""

    max_batches: int = 16
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, feats: jax.Array, batch_ids: jax.Array,
                 valid: jax.Array) -> jax.Array:
        c = feats.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        nb = self.max_batches
        ids = jnp.where(valid, jnp.minimum(batch_ids, nb - 1), nb)
        ones = valid.astype(feats.dtype)
        cnt = jnp.maximum(
            jax.ops.segment_sum(ones, ids, num_segments=nb + 1), 1.0)
        mean = jax.ops.segment_sum(
            feats * ones[:, None], ids, num_segments=nb + 1) / cnt[:, None]
        d = feats - mean[jnp.minimum(ids, nb)]
        var = jax.ops.segment_sum(
            jnp.square(d) * ones[:, None], ids,
            num_segments=nb + 1) / cnt[:, None]
        y = d * jax.lax.rsqrt(var[jnp.minimum(ids, nb)] + self.epsilon)
        return y * scale + bias


# Norm-type strings mirror the reference NormType enum
# (minkowski/models/modules/common.py:9-24): 'batch' | 'instance' |
# 'instance_batch'. The helpers keep the default ('batch') parameter tree
# byte-identical to the pre-norm_type layout so existing checkpoints load.
def _apply_norm(norm_type, momentum, name, feats, st, train):
    """Must be called from inside a parent module's compact scope."""
    if norm_type in ("instance", "instance_batch"):
        feats = SparseInstanceNorm(name=f"{name}_in")(
            feats, st.coords[:, 0], st.valid)
    if norm_type in ("batch", "instance_batch"):
        feats = SparseBatchNorm(momentum, name=name)(feats, st.valid, train)
    return feats


class SubMConv(nn.Module):
    """Submanifold sparse conv (shares a precomputed rulebook; the kernel
    size K is read off the rulebook's width, so non-cube regions —
    hypercross / spatio-temporal HYBRID — need no extra plumbing)."""

    out_channels: int
    kernel_size: int = 3
    use_bias: bool = False

    @nn.compact
    def __call__(self, st: SparseTensor, rulebook: jax.Array,
                 windows: dict | None = None) -> jax.Array:
        k = rulebook.shape[1]
        cin = st.channels
        fan_in = k * cin
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
            (k, cin, self.out_channels),
        )
        out = subm_conv(st, w, rulebook, windows=windows)
        if self.use_bias:
            out = out + self.param("bias", nn.initializers.zeros,
                                   (self.out_channels,))
        return out


class BasicBlock(nn.Module):
    """conv3-bn-relu-conv3-bn + residual (reference
    minkowski/models/modules/resnet_block.py BasicBlock; norm_type
    'instance_batch' gives BasicBlockINBN, resnet_block.py:66-67)."""

    planes: int
    bn_momentum: float = 0.02
    norm_type: str = "batch"

    @nn.compact
    def __call__(self, st: SparseTensor, rulebook: jax.Array, train: bool,
                 windows: dict | None = None) -> SparseTensor:
        nt = self.norm_type
        identity = st.feats
        h = SubMConv(self.planes, name="conv1")(st, rulebook, windows)
        h = _apply_norm(nt, self.bn_momentum, "norm1", h, st, train)
        h = nn.relu(h)
        h = SubMConv(self.planes, name="conv2")(st.with_feats(h), rulebook, windows)
        h = _apply_norm(nt, self.bn_momentum, "norm2", h, st, train)
        if identity.shape[-1] != self.planes:
            identity = nn.Dense(self.planes, use_bias=False, name="downsample")(identity)
            identity = _apply_norm(nt, self.bn_momentum, "downsample_norm",
                                   identity, st, train)
        return st.with_feats(nn.relu(h + identity))


class Bottleneck(nn.Module):
    """1x1(planes) -> 3x3 subm(planes) -> 1x1(planes*4) + residual (reference
    minkowski/models/modules/resnet_block.py:70-121, expansion 4). The 1x1
    sparse convs are Dense over voxel rows (a kernel-1 submanifold conv
    touches only the center site)."""

    planes: int
    bn_momentum: float = 0.02
    expansion: int = 4
    norm_type: str = "batch"

    @nn.compact
    def __call__(self, st: SparseTensor, rulebook: jax.Array, train: bool,
                 windows: dict | None = None) -> SparseTensor:
        e = self.expansion
        nt = self.norm_type
        identity = st.feats
        h = nn.Dense(self.planes, use_bias=False, name="conv1")(st.feats)
        h = _apply_norm(nt, self.bn_momentum, "norm1", h, st, train)
        h = nn.relu(h)
        h = SubMConv(self.planes, name="conv2")(st.with_feats(h), rulebook, windows)
        h = _apply_norm(nt, self.bn_momentum, "norm2", h, st, train)
        h = nn.relu(h)
        h = nn.Dense(self.planes * e, use_bias=False, name="conv3")(h)
        h = _apply_norm(nt, self.bn_momentum, "norm3", h, st, train)
        if identity.shape[-1] != self.planes * e:
            identity = nn.Dense(self.planes * e, use_bias=False,
                                name="downsample")(identity)
            identity = _apply_norm(nt, self.bn_momentum, "downsample_norm",
                                   identity, st, train)
        return st.with_feats(nn.relu(h + identity))


class MinkUNet(nn.Module):
    """Res16UNet over SparseTensor. Variants select PLANES/LAYERS/block.

    With block='bottleneck' (Res16UNet50/101, reference res16unet.py:270-278)
    every residual group outputs planes*4 channels; the final head reads the
    true block8 width (the reference's `final` layer declares PLANES[7] inputs,
    which cannot run under MinkowskiEngine for expansion 4 — we use the
    actual width)."""

    out_channels: int = 20
    planes: Sequence[int] = (32, 64, 128, 256, 256, 128, 96, 96)  # 34C
    layers: Sequence[int] = (2, 3, 4, 6, 2, 2, 2, 2)
    init_dim: int = 32
    conv1_kernel_size: int = 3
    bn_momentum: float = 0.02
    block: str = "basic"  # 'basic' | 'bottleneck'
    norm_type: str = "batch"  # 'batch' | 'instance' | 'instance_batch'
    # Kernel region for the residual blocks (reference Res16UNetBase
    # CONV_TYPE, res16unet.py:18): the HYBRID spatial-cube x temporal-cross
    # on 5-column spatio-temporal input, a plain 27-cube on 3-D input.
    # 'hypercube' gives the STResTesseract* 81-point 4-D kernel.
    block_conv_type: str = "spatial_hypercube_temporal_hypercross"
    level_caps: Sequence[int] | None = None  # per-level capacity (len 5)

    @nn.compact
    def __call__(self, st: SparseTensor, train: bool = True,
                 plan: dict | None = None) -> jax.Array:
        """`plan` (optional): host-built pyramid plan (sparse/plan.py) with
        per-level rulebooks and down maps — skips all on-device rulebook
        construction. plan=None builds everything on device (equivalent)."""
        caps = self.level_caps or [
            st.capacity, st.capacity // 2, st.capacity // 4,
            st.capacity // 8, st.capacity // 8,
        ]
        bm = self.bn_momentum

        block_cls = {"basic": BasicBlock, "bottleneck": Bottleneck}[self.block]

        def blocks(st, n, planes, rb, name, train, lvl):
            win = None
            if plan is not None and "windows" in plan:
                win = plan["windows"][lvl]
            for i in range(n):
                st = block_cls(planes, bm, norm_type=self.norm_type,
                               name=f"{name}_{i}")(st, rb, train, win)
            return st

        def down(st, cin, name):
            w = self.param(
                f"{name}_kernel",
                nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
                (8, cin, cin),
            )
            lvl = _down_level(name)
            if plan is not None:
                return strided_conv_down_planned(st, w, plan["down"][lvl - 1])
            return strided_conv_down(st, w, caps[lvl])

        def up(st, cout, key, name):
            w = self.param(
                f"{name}_kernel",
                nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
                (8, st.channels, cout),
            )
            return inverse_conv_up(st, w, key)

        def level_rulebook(st_l, lvl):
            if plan is not None:
                return plan["rulebooks"][lvl]
            return build_subm_rulebook(st_l, 3,
                                       conv_type=self.block_conv_type)

        p = self.planes

        # stem (NON_BLOCK_CONV_TYPE = SPATIAL_HYPERCUBE, res16unet.py:17:
        # stem/down/up kernels never span time)
        if plan is not None and self.conv1_kernel_size == 3:
            rb0 = plan["rulebooks"][0]
            win0 = plan.get("windows", [None] * 5)[0]
        else:
            rb0 = build_subm_rulebook(st, self.conv1_kernel_size,
                                      conv_type="spatial_hypercube")
            win0 = None
        h = SubMConv(self.init_dim, self.conv1_kernel_size, name="conv0")(st, rb0, win0)
        h = _apply_norm(self.norm_type, bm, "bn0", h, st, train)
        out_p1 = st.with_feats(nn.relu(h))

        # encoder (rulebooks per pyramid level are saved and REUSED by the
        # decoder: the inverse conv restores exactly the encoder's sites, so
        # the decoder-level rulebook is identical — 5 builds instead of 9)
        skips = []
        keys = []
        # decoder blocks are always kernel-3; reuse rb0 only if the stem's
        # region matches the block region (true in 3-D, where spatial cube ==
        # hybrid; NOT true on 5-column temporal coords)
        stem_matches_blocks = (self.conv1_kernel_size == 3
                               and (st.coords.shape[1] == 4
                                    or self.block_conv_type
                                    == "spatial_hypercube"))
        rbs = [rb0 if stem_matches_blocks else level_rulebook(st, 0)]
        cur = out_p1
        for lvl in range(4):
            st_dn, key = down(cur, cur.channels, f"conv{lvl+1}s2")
            keys.append(key)
            h = _apply_norm(self.norm_type, bm, f"bn{lvl+1}", st_dn.feats,
                            st_dn, train)
            st_dn = st_dn.with_feats(nn.relu(h))
            rb = level_rulebook(st_dn, lvl + 1)
            rbs.append(rb)
            st_b = blocks(st_dn, self.layers[lvl], p[lvl], rb, f"block{lvl+1}",
                          train, lvl + 1)
            skips.append(st_b)
            cur = st_b

        # decoder
        for lvl in range(4):
            key = keys[3 - lvl]
            skip = skips[2 - lvl] if lvl < 3 else out_p1
            st_up = up(cur, p[4 + lvl], key, f"convtr{lvl+4}s2")
            h = _apply_norm(self.norm_type, bm, f"bntr{lvl+4}", st_up.feats,
                            st_up, train)
            st_up = st_up.with_feats(nn.relu(h))
            cat = jnp.concatenate([st_up.feats, skip.feats], axis=-1)
            st_cat = st_up.with_feats(cat)
            rb = rbs[3 - lvl]
            cur = blocks(st_cat, self.layers[4 + lvl], p[4 + lvl], rb,
                         f"block{lvl+5}", train, 3 - lvl)

        logits = nn.Dense(self.out_channels, use_bias=True, name="final")(cur.feats)
        return jnp.where(cur.valid[:, None], logits, 0.0)


def _down_level(name: str) -> int:
    # conv1s2 -> caps[1], conv2s2 -> caps[2], ...
    return int(name[4])


# --- variants (reference res16unet.py:300-332) -----------------------------

VARIANTS = {
    "Res16UNet14A": dict(layers=(1,) * 8, planes=(32, 64, 128, 256, 128, 128, 96, 96)),
    "Res16UNet14B": dict(layers=(1,) * 8, planes=(32, 64, 128, 256, 128, 128, 128, 128)),
    "Res16UNet14C": dict(layers=(1,) * 8, planes=(32, 64, 128, 256, 192, 192, 128, 128)),
    "Res16UNet14D": dict(layers=(1,) * 8, planes=(32, 64, 128, 256, 384, 384, 384, 384)),
    "Res16UNet18A": dict(layers=(2,) * 8, planes=(32, 64, 128, 256, 128, 128, 96, 96)),
    "Res16UNet18B": dict(layers=(2,) * 8, planes=(32, 64, 128, 256, 128, 128, 128, 128)),
    "Res16UNet18D": dict(layers=(2,) * 8, planes=(32, 64, 128, 256, 384, 384, 384, 384)),
    "Res16UNet34A": dict(layers=(2, 3, 4, 6, 2, 2, 2, 2), planes=(32, 64, 128, 256, 256, 128, 64, 64)),
    "Res16UNet34B": dict(layers=(2, 3, 4, 6, 2, 2, 2, 2), planes=(32, 64, 128, 256, 256, 128, 64, 32)),
    "Res16UNet34C": dict(layers=(2, 3, 4, 6, 2, 2, 2, 2), planes=(32, 64, 128, 256, 256, 128, 96, 96)),
    # Bottleneck variants (reference res16unet.py:270-278; PLANES from the
    # Res16UNetBase default, res16unet.py:11)
    "Res16UNet50": dict(layers=(2, 3, 4, 6, 2, 2, 2, 2),
                        planes=(32, 64, 128, 256, 256, 256, 256, 256),
                        block="bottleneck"),
    "Res16UNet101": dict(layers=(2, 3, 4, 23, 2, 2, 2, 2),
                         planes=(32, 64, 128, 256, 256, 256, 256, 256),
                         block="bottleneck"),
    # Base-PLANES variants (reference res16unet.py:257-278)
    "Res16UNet14": dict(layers=(1,) * 8,
                        planes=(32, 64, 128, 256, 256, 256, 256, 256)),
    "Res16UNet18": dict(layers=(2,) * 8,
                        planes=(32, 64, 128, 256, 256, 256, 256, 256)),
    "Res16UNet34": dict(layers=(2, 3, 4, 6, 2, 2, 2, 2),
                        planes=(32, 64, 128, 256, 256, 256, 256, 256)),
}

# 4-D spatio-temporal variants (reference res16unet.py:334-376): same
# configs, fed (M, 5) spatio-temporal coords. The ST* names keep the hybrid
# block region (the base default — a no-op on 3-D input); Tesseract uses the
# full 4-D hypercube (STResTesseract16UNetBase, res16unet.py:370-375).
ST_VARIANTS = {}
for _b in ("Res16UNet14", "Res16UNet14A", "Res16UNet18", "Res16UNet34",
           "Res16UNet50", "Res16UNet101"):
    ST_VARIANTS[f"ST{_b}"] = dict(VARIANTS[_b])
ST_VARIANTS["STRes16UNet18A"] = dict(
    layers=(2,) * 8, planes=(32, 64, 128, 256, 128, 128, 96, 96))
ST_VARIANTS["STResTesseract16UNet18A"] = dict(
    ST_VARIANTS["STRes16UNet18A"], block_conv_type="hypercube")


def make_minkunet(variant: str = "Res16UNet34C", out_channels: int = 20,
                  **kwargs) -> MinkUNet:
    cfg = VARIANTS.get(variant) or ST_VARIANTS[variant]
    return MinkUNet(out_channels=out_channels, planes=cfg["planes"],
                    layers=cfg["layers"], block=cfg.get("block", "basic"),
                    block_conv_type=cfg.get(
                        "block_conv_type",
                        "spatial_hypercube_temporal_hypercross"),
                    **kwargs)


class ResUNet(nn.Module):
    """Legacy ResUNet family (reference minkowski/models/resunet.py:12-260):
    3 down / 3 up levels with a residual group at FULL resolution before the
    first stride (unlike Res16UNet), and a 1x1-512 head before the classifier.
    `plan` (sparse/plan.py, built with 4 level caps) is optional like
    MinkUNet's."""

    out_channels: int = 20
    planes: Sequence[int] = (64, 128, 256, 512, 256, 128, 128)
    layers: Sequence[int] = (2, 2, 2, 2, 2, 2)
    init_dim: int = 64
    conv1_kernel_size: int = 3
    bn_momentum: float = 0.02
    block: str = "basic"
    norm_type: str = "batch"  # 'instance_batch' gives ResUNet18INBN
    block_conv_type: str = "spatial_hypercube_temporal_hypercross"
    level_caps: Sequence[int] | None = None  # len 4

    @nn.compact
    def __call__(self, st: SparseTensor, train: bool = True,
                 plan: dict | None = None) -> jax.Array:
        caps = self.level_caps or [
            st.capacity, st.capacity // 2, st.capacity // 4, st.capacity // 8,
        ]
        bm = self.bn_momentum
        block_cls = {"basic": BasicBlock, "bottleneck": Bottleneck}[self.block]
        p = self.planes

        def blocks(st_l, n, planes, rb, name, lvl):
            win = None
            if plan is not None and "windows" in plan:
                win = plan["windows"][lvl]
            for i in range(n):
                st_l = block_cls(planes, bm, norm_type=self.norm_type,
                                 name=f"{name}_{i}")(st_l, rb, train, win)
            return st_l

        def rb_of(st_l, lvl):
            if plan is not None:
                return plan["rulebooks"][lvl]
            return build_subm_rulebook(st_l, 3,
                                       conv_type=self.block_conv_type)

        def down(st_l, name, lvl):
            w = self.param(
                f"{name}_kernel",
                nn.initializers.variance_scaling(1.0, "fan_in",
                                                 "truncated_normal"),
                (8, st_l.channels, st_l.channels),
            )
            if plan is not None:
                return strided_conv_down_planned(st_l, w, plan["down"][lvl])
            return strided_conv_down(st_l, w, caps[lvl + 1])

        def up(st_l, cout, key, name):
            w = self.param(
                f"{name}_kernel",
                nn.initializers.variance_scaling(1.0, "fan_in",
                                                 "truncated_normal"),
                (8, st_l.channels, cout),
            )
            return inverse_conv_up(st_l, w, key)

        # stem + full-res residual group (resunet.py forward:169-174)
        if plan is not None and self.conv1_kernel_size == 3:
            rb0 = plan["rulebooks"][0]
        else:
            rb0 = build_subm_rulebook(st, self.conv1_kernel_size,
                                      conv_type="spatial_hypercube")
        h = SubMConv(self.init_dim, self.conv1_kernel_size, name="conv1")(st, rb0)
        h = _apply_norm(self.norm_type, bm, "bn1", h, st, train)
        cur = st.with_feats(nn.relu(h))
        stem_matches_blocks = (self.conv1_kernel_size == 3
                               and (st.coords.shape[1] == 4
                                    or self.block_conv_type
                                    == "spatial_hypercube"))
        rb_full = rb0 if stem_matches_blocks else rb_of(cur, 0)
        b1 = blocks(cur, self.layers[0], p[0], rb_full, "block1", 0)

        skips, keys, rbs = [b1], [], [rb_full]
        cur = b1
        for lvl in range(3):
            st_dn, key = down(cur, f"conv{lvl+2}s2", lvl)
            keys.append(key)
            hh = _apply_norm(self.norm_type, bm, f"bn{lvl+2}", st_dn.feats,
                             st_dn, train)
            st_dn = st_dn.with_feats(nn.relu(hh))
            rb = rb_of(st_dn, lvl + 1)
            rbs.append(rb)
            st_b = blocks(st_dn, self.layers[lvl + 1], p[lvl + 1], rb,
                          f"block{lvl+2}", lvl + 1)
            skips.append(st_b)
            cur = st_b

        for lvl in range(3):
            key = keys[2 - lvl]
            skip = skips[2 - lvl]
            st_up = up(cur, p[4 + lvl], key, f"convtr{lvl+4}s2")
            hh = _apply_norm(self.norm_type, bm, f"bntr{lvl+4}", st_up.feats,
                             st_up, train)
            st_up = st_up.with_feats(nn.relu(hh))
            cat = jnp.concatenate([st_up.feats, skip.feats], axis=-1)
            st_cat = st_up.with_feats(cat)
            if lvl < 2:  # block5/block6; the last cat feeds the head directly
                cur = blocks(st_cat, self.layers[4 + lvl], p[4 + lvl],
                             rbs[2 - lvl], f"block{lvl+5}", 2 - lvl)
            else:
                cur = st_cat

        # final head: 1x1-512 + bn + relu + 1x1 classifier (resunet.py:158-168)
        h = nn.Dense(512, use_bias=False, name="final_fc")(cur.feats)
        h = _apply_norm(self.norm_type, bm, "final_bn", h, cur, train)
        logits = nn.Dense(self.out_channels, use_bias=True,
                          name="final")(nn.relu(h))
        return jnp.where(cur.valid[:, None], logits, 0.0)


def _pool_transpose(st_coarse: SparseTensor, rows: jax.Array,
                    fine_valid: jax.Array) -> jax.Array:
    """Unpool coarse features to fine sites (ME MinkowskiPoolingTranspose,
    used by MinkUNetHyper resunet.py:389,410): each fine site reads its
    coarse ancestor's feature divided by that ancestor's child count.
    `rows` maps fine row -> coarse row (== coarse capacity where absent)."""
    capc = st_coarse.capacity
    ok = fine_valid & (rows < capc)
    ones = ok.astype(jnp.float32)
    cnt = jax.ops.segment_sum(ones, jnp.where(ok, rows, capc),
                              num_segments=capc + 1)[:capc]
    scaled = st_coarse.feats / jnp.maximum(cnt, 1.0)[:, None]
    pad = jnp.concatenate([scaled, jnp.zeros((1, scaled.shape[1]))], axis=0)
    out = pad[jnp.minimum(rows, capc)]
    return jnp.where(ok[:, None], out, 0.0)


class MinkUNetHyper(nn.Module):
    """MinkUNetHyper (reference resunet.py:270-481): the ResUNet trunk with a
    hypercolumn head — block5 (pixel 4) and block6 (pixel 2) outputs are
    ALSO unpooled straight to full resolution (MinkowskiPoolingTranspose
    kernel 4/stride 4 and kernel 2/stride 2, resunet.py:388,409) and
    concatenated with the final decoder output and block1 before the
    1x1-512 + BN + ReLU + classifier head (resunet.py:424-431).
    MinkUNetHyper14INBN = layers (1,)*6 + instance_batch norms
    (resunet.py:483-485)."""

    out_channels: int = 20
    planes: Sequence[int] = (64, 128, 256, 512, 256, 128, 128)
    layers: Sequence[int] = (2, 2, 2, 2, 2, 2)
    init_dim: int = 64
    conv1_kernel_size: int = 3
    bn_momentum: float = 0.02
    norm_type: str = "batch"
    block_conv_type: str = "spatial_hypercube_temporal_hypercross"
    level_caps: Sequence[int] | None = None  # len 4

    @nn.compact
    def __call__(self, st: SparseTensor, train: bool = True) -> jax.Array:
        caps = self.level_caps or [
            st.capacity, st.capacity // 2, st.capacity // 4, st.capacity // 8,
        ]
        bm = self.bn_momentum
        p = self.planes

        def blocks(st_l, n, planes, rb, name):
            for i in range(n):
                st_l = BasicBlock(planes, bm, norm_type=self.norm_type,
                                  name=f"{name}_{i}")(st_l, rb, train, None)
            return st_l

        def rb_of(st_l):
            return build_subm_rulebook(st_l, 3,
                                       conv_type=self.block_conv_type)

        def down(st_l, name, lvl):
            w = self.param(
                f"{name}_kernel",
                nn.initializers.variance_scaling(1.0, "fan_in",
                                                 "truncated_normal"),
                (8, st_l.channels, st_l.channels),
            )
            return strided_conv_down(st_l, w, caps[lvl + 1])

        def up(st_l, cout, key, name):
            w = self.param(
                f"{name}_kernel",
                nn.initializers.variance_scaling(1.0, "fan_in",
                                                 "truncated_normal"),
                (8, st_l.channels, cout),
            )
            return inverse_conv_up(st_l, w, key)

        rb0 = build_subm_rulebook(st, self.conv1_kernel_size,
                                  conv_type="spatial_hypercube")
        h = SubMConv(self.init_dim, self.conv1_kernel_size, name="conv1")(st, rb0)
        h = _apply_norm(self.norm_type, bm, "bn1", h, st, train)
        cur = st.with_feats(nn.relu(h))
        stem_matches_blocks = (self.conv1_kernel_size == 3
                               and (st.coords.shape[1] == 4
                                    or self.block_conv_type
                                    == "spatial_hypercube"))
        rb_full = rb0 if stem_matches_blocks else rb_of(cur)
        b1 = blocks(cur, self.layers[0], p[0], rb_full, "block1")

        skips, keys, rbs = [b1], [], [rb_full]
        cur = b1
        for lvl in range(3):
            st_dn, key = down(cur, f"conv{lvl+2}s2", lvl)
            keys.append(key)
            hh = _apply_norm(self.norm_type, bm, f"bn{lvl+2}", st_dn.feats,
                             st_dn, train)
            st_dn = st_dn.with_feats(nn.relu(hh))
            rb = rb_of(st_dn)
            rbs.append(rb)
            st_b = blocks(st_dn, self.layers[lvl + 1], p[lvl + 1], rb,
                          f"block{lvl+2}")
            skips.append(st_b)
            cur = st_b

        # fine->coarse ancestor row maps for the pooling transposes
        r01 = keys[0]["out_row"]                       # level 0 -> 1
        r12_pad = jnp.concatenate(
            [keys[1]["out_row"],
             jnp.full((1,), caps[2], jnp.int32)])      # level 1 -> 2 (padded)
        r02 = r12_pad[jnp.minimum(r01, caps[1])]       # level 0 -> 2

        # decoder with hypercolumn taps
        st_up = up(cur, p[4], keys[2], "convtr4s2")    # -> level 2
        hh = _apply_norm(self.norm_type, bm, "bntr4", st_up.feats, st_up,
                         train)
        st_up = st_up.with_feats(nn.relu(hh))
        cat = st_up.with_feats(
            jnp.concatenate([st_up.feats, skips[2].feats], axis=-1))
        b5 = blocks(cat, self.layers[4], p[4], rbs[2], "block5")
        out_5 = _pool_transpose(b5, r02, st.valid)     # (M0, p[4])

        st_up = up(b5, p[5], keys[1], "convtr5s2")     # -> level 1
        hh = _apply_norm(self.norm_type, bm, "bntr5", st_up.feats, st_up,
                         train)
        st_up = st_up.with_feats(nn.relu(hh))
        cat = st_up.with_feats(
            jnp.concatenate([st_up.feats, skips[1].feats], axis=-1))
        b6 = blocks(cat, self.layers[5], p[5], rbs[1], "block6")
        out_6 = _pool_transpose(b6, r01, st.valid)     # (M0, p[5])

        st_up = up(b6, p[6], keys[0], "convtr6s2")     # -> level 0
        hh = _apply_norm(self.norm_type, bm, "bntr6", st_up.feats, st_up,
                         train)
        st_up = st_up.with_feats(nn.relu(hh))

        hyper = jnp.concatenate(
            [st_up.feats, b1.feats, out_6, out_5], axis=-1)
        st_h = st_up.with_feats(hyper)
        h = nn.Dense(512, use_bias=False, name="final_fc")(st_h.feats)
        h = _apply_norm(self.norm_type, bm, "final_bn", h, st_h, train)
        logits = nn.Dense(self.out_channels, use_bias=True,
                          name="final")(nn.relu(h))
        return jnp.where(st_h.valid[:, None], logits, 0.0)


HYPER_VARIANTS = {
    "MinkUNetHyper": dict(layers=(2,) * 6),
    "MinkUNetHyper14INBN": dict(layers=(1,) * 6, norm_type="instance_batch"),
}


def make_hyper(variant: str = "MinkUNetHyper", out_channels: int = 20,
               **kwargs) -> MinkUNetHyper:
    cfg = HYPER_VARIANTS[variant]
    return MinkUNetHyper(out_channels=out_channels, layers=cfg["layers"],
                         norm_type=cfg.get("norm_type", "batch"), **kwargs)


# legacy variants (reference resunet.py:218-268)
RESUNET_VARIANTS = {
    "ResUNet14": dict(layers=(1,) * 6),
    "ResUNet18": dict(layers=(2,) * 6),
    "ResUNet18INBN": dict(layers=(2,) * 6, norm_type="instance_batch"),
    "ResUNet34": dict(layers=(3, 4, 6, 3, 2, 2)),
    "ResUNet50": dict(layers=(3, 4, 6, 3, 2, 2), block="bottleneck"),
    "ResUNet101": dict(layers=(3, 4, 23, 3, 2, 2), block="bottleneck"),
    "ResUNet14D": dict(layers=(1,) * 6,
                       planes=(64, 128, 256, 512, 512, 512, 512)),
    "ResUNet18D": dict(layers=(2,) * 6,
                       planes=(64, 128, 256, 512, 512, 512, 512)),
    "ResUNet34D": dict(layers=(3, 4, 6, 3, 2, 2),
                       planes=(64, 128, 256, 512, 512, 512, 512)),
    "ResUNet34E": dict(layers=(3, 4, 6, 3, 2, 2), init_dim=32,
                       planes=(32, 64, 128, 256, 128, 64, 64)),
    "ResUNet34F": dict(layers=(3, 4, 6, 3, 2, 2), init_dim=32,
                       planes=(32, 64, 128, 256, 128, 64, 32)),
}

# 4-D spatio-temporal legacy variants (reference resunet.py:488-536)
ST_RESUNET_VARIANTS = {}
for _b in ("ResUNet14", "ResUNet18", "ResUNet34", "ResUNet50", "ResUNet101"):
    ST_RESUNET_VARIANTS[f"ST{_b}"] = dict(RESUNET_VARIANTS[_b])
    ST_RESUNET_VARIANTS[f"STResTesseract{_b[3:]}"] = dict(
        RESUNET_VARIANTS[_b], block_conv_type="hypercube")


def make_resunet(variant: str = "ResUNet18", out_channels: int = 20,
                 **kwargs) -> ResUNet:
    cfg = RESUNET_VARIANTS.get(variant) or ST_RESUNET_VARIANTS[variant]
    return ResUNet(out_channels=out_channels, layers=cfg["layers"],
                   planes=cfg.get("planes",
                                  (64, 128, 256, 512, 256, 128, 128)),
                   init_dim=cfg.get("init_dim", 64),
                   norm_type=cfg.get("norm_type", "batch"),
                   block=cfg.get("block", "basic"),
                   block_conv_type=cfg.get(
                       "block_conv_type",
                       "spatial_hypercube_temporal_hypercross"),
                   **kwargs)
