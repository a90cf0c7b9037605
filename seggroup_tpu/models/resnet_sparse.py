"""Plain sparse ResNet classifiers (reference minkowski/models/resnet.py
ResNet14/18/34/50 over MinkowskiEngine) and the KPCNN classification head
(reference kpconv/models/KPCNN variant of KPFCNN_model.py) on our engines.

These complete the reference's model-zoo surface beyond the segmentation
flagships: global-pooled per-scene classification."""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from seggroup_tpu.models.minkunet import BasicBlock, SparseBatchNorm, SubMConv
from seggroup_tpu.sparse.conv import (
    build_subm_rulebook,
    global_pool,
    strided_conv_down,
)
from seggroup_tpu.sparse.tensor import SparseTensor


class SparseResNet(nn.Module):
    """conv stem + 4 strided stages of BasicBlocks + global pool + classifier
    (reference resnet.py ResNetBase: INIT_DIM 64, PLANES (64,128,256,512))."""

    out_channels: int = 20
    layers: Sequence[int] = (1, 1, 1, 1)  # ResNet14
    planes: Sequence[int] = (64, 128, 256, 512)
    init_dim: int = 64
    num_batches: int = 8
    bn_momentum: float = 0.02
    # block kernel region; the hybrid default matches the reference
    # STResNetBase (resnet.py:167-173) on 5-column spatio-temporal coords
    # and is the plain 27-cube on 3-D coords
    block_conv_type: str = "spatial_hypercube_temporal_hypercross"
    level_caps: Sequence[int] | None = None

    @nn.compact
    def __call__(self, st: SparseTensor, train: bool = True) -> jax.Array:
        caps = self.level_caps or [st.capacity >> (i + 1) for i in range(4)]
        rb = build_subm_rulebook(st, 3, conv_type="spatial_hypercube")
        h = SubMConv(self.init_dim, 3, name="conv1")(st, rb)
        h = SparseBatchNorm(self.bn_momentum, name="bn1")(h, st.valid, train)
        cur = st.with_feats(nn.relu(h))

        for stage, (n_blocks, p) in enumerate(zip(self.layers, self.planes)):
            w = self.param(
                f"down{stage}_kernel",
                nn.initializers.variance_scaling(1.0, "fan_in",
                                                 "truncated_normal"),
                (8, cur.channels, cur.channels),
            )
            cur, _ = strided_conv_down(cur, w, caps[stage])
            rb = build_subm_rulebook(cur, 3, conv_type=self.block_conv_type)
            for b in range(n_blocks):
                cur = BasicBlock(p, self.bn_momentum,
                                 name=f"stage{stage}_block{b}")(cur, rb, train)

        pooled = global_pool(cur, self.num_batches, mode="mean")
        return nn.Dense(self.out_channels, name="final")(pooled)


RESNET_VARIANTS = {
    "ResNet14": dict(layers=(1, 1, 1, 1)),
    "ResNet18": dict(layers=(2, 2, 2, 2)),
    "ResNet34": dict(layers=(3, 4, 6, 3)),
    "ResNet50": dict(layers=(3, 4, 6, 3), planes=(128, 256, 512, 1024)),
    "ResNet101": dict(layers=(3, 4, 23, 3), planes=(128, 256, 512, 1024)),
}

# 4-D spatio-temporal classifiers (reference resnet.py:167-219): same
# configs on (M, 5) coords; Tesseract = full 4-D hypercube block kernels
ST_RESNET_VARIANTS = {}
for _b in RESNET_VARIANTS:
    ST_RESNET_VARIANTS[f"ST{_b}"] = dict(RESNET_VARIANTS[_b])
    ST_RESNET_VARIANTS[f"STResTesseract{_b[3:]}"] = dict(
        RESNET_VARIANTS[_b], block_conv_type="hypercube")


def make_sparse_resnet(variant: str = "ResNet14", **kw) -> SparseResNet:
    cfg = RESNET_VARIANTS.get(variant) or ST_RESNET_VARIANTS[variant]
    return SparseResNet(**cfg, **kw)


class KPCNN(nn.Module):
    """KPConv classification network (reference KPCNN: the KPFCNN encoder
    blocks + global average + classifier head)."""

    num_classes: int = 40
    first_features_dim: int = 64
    dl0: float = 0.04
    num_batches: int = 8

    @nn.compact
    def __call__(self, pyramid, in_feats, batch_of_last_level,
                 train: bool = True):
        from seggroup_tpu.models.kpconv import (
            KPConvLayer, ResnetBottleneck, TFBatchNorm, _leaky,
        )

        fdim = self.first_features_dim
        dl = self.dl0
        feats = in_feats
        layer = 0
        regs = jnp.zeros(())
        arch = ["simple", "resnetb", "resnetb_strided", "resnetb",
                "resnetb_strided", "resnetb", "resnetb_strided", "resnetb"]
        for i, name in enumerate(arch):
            lvl = pyramid[layer]
            if name == "simple":
                x, reg = KPConvLayer(fdim // 2, name=f"b{i}_kp")(
                    lvl.points, lvl.points, lvl.neighbors, feats, dl)
                feats = _leaky(TFBatchNorm(name=f"b{i}_bn")(x, lvl.valid, train))
            else:
                strided = "strided" in name
                nxt = pyramid[layer + 1] if strided else None
                feats, reg = ResnetBottleneck(fdim, False, strided,
                                              name=f"b{i}")(lvl, nxt, feats,
                                                            dl, train)
                if strided:
                    layer += 1
                    dl *= 2
                    fdim *= 2
            regs += reg
        # global average over each scene at the coarsest level
        lvl = pyramid[layer]
        from seggroup_tpu.ops.segment_ops import segment_mean

        ids = jnp.where(lvl.valid, batch_of_last_level, self.num_batches)
        pooled = segment_mean(feats, ids, self.num_batches)
        return nn.Dense(self.num_classes, name="head")(pooled), regs
