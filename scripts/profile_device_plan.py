"""Piecewise timing of build_unet_plan_device on the real chip.

BENCH_r02 showed the packed train step pays ~0.66 s (2^17) / ~6 s (2^19) over
the host-plan step — all of it in the in-step device plan build. This script
times each constituent at both scales to find the hot part:

  * _build_subm_rulebook_k3 (8 vmapped binary searches + resolve) per level
  * downsample_coords (5-key lexsort + compaction) per level
  * build_windows_device per level
  * the whole build_unet_plan_device

Run: python scripts/profile_device_plan.py [--cap 19]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))



def sync(x):
    # fetch ONE scalar (device-sliced): through the axon tunnel a full-array
    # fetch would swamp the timing, and block_until_ready alone can return
    # before the remote execution finishes
    leaf = [l for l in jax.tree.leaves(x)
            if hasattr(l, "dtype") and l.dtype != jnp.bool_]
    _ = float(jnp.ravel(leaf[0])[0])


def timeit(fn, *args, iters=5):
    out = fn(*args)
    sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
        sync(out)
    return (time.time() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cap", type=int, default=19)
    args = ap.parse_args()

    from seggroup_tpu.data.synthetic import make_synthetic_scene
    from seggroup_tpu.data.voxel_dataset import make_voxel_batch
    from seggroup_tpu.sparse.conv import build_subm_rulebook, downsample_coords
    from seggroup_tpu.sparse.device_plan import (build_unet_plan_device,
                                                 build_windows_device)
    from seggroup_tpu.sparse.tensor import SparseTensor
    from seggroup_tpu.sparse import pallas_conv
    from seggroup_tpu.utils.jit_cache import enable_persistent_cache

    enable_persistent_cache()

    capacity = 2 ** args.cap
    caps = [capacity, capacity // 2, capacity // 4, capacity // 8,
            capacity // 8]
    scenes = []
    for i in range(8):
        s = make_synthetic_scene(seed=i, num_points=150528, num_slots=512,
                                 num_edges=4096, num_instances=24,
                                 segs_per_instance=12, jax_arrays=False)
        pts = np.asarray(s.points)
        scenes.append((pts[:, :3].astype(np.float32),
                       ((pts[:, 3:] + 1.0) * 127.5).astype(np.float32),
                       np.asarray(s.real_sem).astype(np.int32) % 20))
    vb = make_voxel_batch(scenes, capacity, 0.02,
                          rng=np.random.default_rng(0), augment=True)
    coords = jnp.asarray(vb.coords)
    num = jnp.asarray(vb.num)

    t_all = timeit(
        lambda c, n: build_unet_plan_device(c, n, tuple(caps)), coords, num)
    print(f"build_unet_plan_device total: {t_all*1e3:8.1f} ms")

    # per-level pieces
    st = SparseTensor(coords, jnp.zeros((capacity, 1)),
                      jnp.arange(capacity) < num, num)
    rb_fn = jax.jit(lambda s: build_subm_rulebook(s, assume_sorted=True))
    down_fn = jax.jit(lambda s, co: downsample_coords(s, co),
                      static_argnames="co")
    win_fn = jax.jit(lambda rb: build_windows_device(
        rb, pallas_conv.TILE, pallas_conv.WINDOW))

    cur = st
    for lvl, cap in enumerate(caps):
        t_rb = timeit(rb_fn, cur)
        rb = rb_fn(cur)
        t_win = (timeit(win_fn, rb)
                 if rb.shape[0] % pallas_conv.TILE == 0
                 and rb.shape[0] >= 8 * pallas_conv.TILE else 0.0)
        line = (f"level {lvl} (cap {cap:>7}): rulebook {t_rb*1e3:7.1f} ms"
                f"  windows {t_win*1e3:7.1f} ms")
        if lvl + 1 < len(caps):
            cap_out = caps[lvl + 1]
            t_dn = timeit(lambda s: downsample_coords(s, cap_out), cur)
            out_c, valid_out, m_out, _, _ = downsample_coords(cur, cap_out)
            line += f"  down {t_dn*1e3:7.1f} ms"
            cur = SparseTensor(out_c, jnp.zeros((cap_out, 1)), valid_out,
                               m_out)
        print(line)


if __name__ == "__main__":
    main()
