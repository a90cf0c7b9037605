"""Farthest point sampling as a Pallas TPU kernel.

Each grid program owns one batch row (one cluster): candidate coords live in
VMEM for the whole k-step loop. Semantics are identical to
ops.fps.masked_fps (reference FPS with initial_idx=0, skip_initial=True,
seggroup/model.py:329-406): verified element-exact on real TPU.

Measured on v5e at (B=512, P=1024, k=64): 65 ms vs 30 ms for the XLA
version — XLA wins here because its per-step argmax is batched across all
B rows (full VPU lanes), while one-cluster-per-program grids serialize.
ops.fps.masked_fps therefore stays the default; this kernel is kept as the
building block for a fused variant (batched rows per program) and as the
reference Pallas pattern for VMEM-resident sequential loops.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fps_kernel(pts_ref, valid_ref, out_ref, *, k: int):
    pts = pts_ref[0]             # (P, 3) VMEM
    valid = valid_ref[0, :, 0]   # (P,) int32
    p = pts.shape[0]
    neg = jnp.float32(-1.0)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)

    def anchor_at(idx):
        # dynamic row read as a masked reduction (dynamic_slice on VMEM
        # values is not lowered by Mosaic; this is pure VPU)
        sel = (row_iota[:, 0] == idx).astype(jnp.float32)
        return jnp.sum(pts * sel[:, None], axis=0)  # (3,)

    def sqdist_to(anchor):  # anchor: (3,)
        d = pts - anchor[None, :]
        return jnp.sum(d * d, axis=-1)

    # initial_idx = 0, skip_initial = True: first kept sample is the point
    # farthest from candidate 0
    d0 = jnp.where(valid > 0, sqdist_to(pts[0]), neg)
    first = jnp.argmax(d0).astype(jnp.int32)
    min_d = jnp.where(valid > 0, sqdist_to(anchor_at(first)), neg)

    out_iota = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)[0]

    def body(i, carry):
        min_d, chosen = carry
        nxt = jnp.argmax(min_d).astype(jnp.int32)
        chosen = jnp.where(out_iota == i, nxt, chosen)
        d = jnp.where(valid > 0, sqdist_to(anchor_at(nxt)), neg)
        return jnp.minimum(min_d, d), chosen

    chosen0 = jnp.where(out_iota == 0, first, jnp.int32(0))
    _, chosen = jax.lax.fori_loop(1, k, body, (min_d, chosen0))
    out_ref[0, 0, :] = chosen


@partial(jax.jit, static_argnames=("k",))
def masked_fps_pallas(points: jax.Array, valid: jax.Array, k: int) -> jax.Array:
    """Drop-in for ops.fps.masked_fps: (B, P, D>=3) + (B, P) bool -> (B, k)
    int32. P should be a multiple of 8 (sublane) for best layout."""
    b, p, _ = points.shape
    pts3 = points[..., :3].astype(jnp.float32)
    vi = valid.astype(jnp.int32)[..., None]  # (B, P, 1): trailing dims align
    out = pl.pallas_call(
        partial(_fps_kernel, k=k),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, p, 3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, k), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1, k), jnp.int32),
    )(pts3, vi)
    return out[:, 0, :]
