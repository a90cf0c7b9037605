"""Decompose the stage-1 ins_infer scene time on the real chip.

Times, at the bench scene shape (150,528 pts / 512 slots / 4,096 edges):
  * the full jitted ins_infer forward (the bench.py stage1 number);
  * cluster_knn alone at the layer-2 shape (the historical bottleneck);
  * the sequential merge scans alone (grouping ops);
  * FPS + layer-1 cluster clouds alone.

Each piece is measured as its own jitted program with a scalar-fetch sync
(axon tunnel: block_until_ready can return before remote execution ends).

Usage: python scripts/profile_stage1.py [--iters 5]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, *args, iters=5):
    import jax
    import jax.numpy as jnp
    out = fn(*args)
    jax.block_until_ready(out)
    _ = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32).ravel()[:1]))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
        _ = float(jnp.sum(jax.tree.leaves(out)[0]
                          .astype(jnp.float32).ravel()[:1]))
    return (time.time() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--knn_window", type=int, default=8192)
    ap.add_argument("--small_window", type=int, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from seggroup_tpu.data.synthetic import make_synthetic_scene
    from seggroup_tpu.models.seggroup import SegGroupGNN
    from seggroup_tpu.ops.knn import cluster_knn
    from seggroup_tpu.utils.jit_cache import enable_persistent_cache

    enable_persistent_cache()
    scene = jax.device_put(make_synthetic_scene(
        seed=0, num_points=150528, num_slots=512, num_edges=4096,
        num_instances=24, segs_per_instance=12, jax_arrays=False))
    jax.block_until_ready(scene)

    model = SegGroupGNN(cluster_cap=1024, sequential=True, fast_knn=False,
                        knn_window=args.knn_window,
                        knn_small_window=args.small_window)
    variables = jax.jit(
        lambda r1, r2, s: model.init(
            {"params": r1, "dropout": r2}, s, mode="ins_infer", train=False)
    )(jax.random.PRNGKey(0), jax.random.PRNGKey(1), scene)
    fwd = jax.jit(lambda v, s: model.apply(v, s, mode="ins_infer",
                                           train=False))
    dt = timed(lambda s: fwd(variables, s).acc, scene, iters=args.iters)
    print(f"full ins_infer:        {dt*1e3:7.1f} ms")

    # cluster_knn at the layer-2 shape: merged clusters over all points.
    # Use the instance labels as a stand-in cluster id of the same
    # cardinality the merge produces on this synthetic scene (24 instances).
    pts = scene.points[:, :3]
    n = pts.shape[0]
    pad = (-n) % 1024
    pts_p = jnp.concatenate([pts, jnp.zeros((pad, 3))], axis=0)
    cid = jnp.concatenate([
        scene.real_ins.astype(jnp.int32),
        jnp.full((pad,), 0x3FFFFFFF, jnp.int32)])
    valid = jnp.concatenate([jnp.ones((n,), bool), jnp.zeros((pad,), bool)])

    for sw in (None, 0):
        dt = timed(
            lambda p, c, v: cluster_knn(
                p, c, k=20, window=args.knn_window, valid=v,
                small_window=sw),
            pts_p, cid, valid, iters=args.iters)
        tag = "auto tier" if sw is None else "no tier  "
        print(f"cluster_knn ({tag}):  {dt*1e3:7.1f} ms   (one call; the "
              f"forward makes 2)")


if __name__ == "__main__":
    main()
