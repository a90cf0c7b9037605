"""Piecewise timing of the KPConv train step on the real chip.

BENCH r2 measured 12.28 s/iter at the reference batch budget (batch 10,
2^17 points, 5 levels). This script splits that into:

  * build_pyramid total + per-level ball_query_pair / voxelize pieces
  * KPFCNN forward (train=False apply)
  * full fwd+bwd train step with a PRECOMPUTED pyramid
  * full fwd+bwd train step with the in-step pyramid (the production path)

Run: python scripts/profile_kpconv_step.py [--cap 17]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    leaf = [l for l in jax.tree.leaves(x)
            if hasattr(l, "dtype") and l.dtype != jnp.bool_]
    _ = float(jnp.ravel(leaf[0])[0])


def timeit(fn, *args, iters=3):
    out = fn(*args)
    sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
        sync(out)
    return (time.time() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cap", type=int, default=17)
    ap.add_argument("--batch", type=int, default=10)
    args = ap.parse_args()

    import optax

    from seggroup_tpu.models.kpconv import (KPFCNN, SCANNET_ARCHITECTURE,
                                            build_pyramid)
    from seggroup_tpu.ops.knn import ball_query_pair
    from seggroup_tpu.utils.jit_cache import enable_persistent_cache

    enable_persistent_cache()

    from bench import room_sphere_points

    rng = np.random.default_rng(0)
    n = 2 ** args.cap
    batch_size = args.batch
    per = n // batch_size
    pts = np.zeros((n, 3), np.float32)
    bids = np.zeros(n, np.int32)
    for b in range(batch_size):
        center = rng.uniform(0, 8, 3).astype(np.float32)
        sl = slice(b * per, (b + 1) * per)
        pts[sl] = center + room_sphere_points(rng, per, 2.0)
        bids[sl] = b
    valid = np.ones(n, bool)
    feats = np.concatenate([np.ones((n, 1), np.float32),
                            rng.random((n, 3)).astype(np.float32)], 1)
    labels = rng.integers(0, 20, n).astype(np.int32)
    caps = [n >> i for i in range(1, 6)]
    dl0 = 0.04

    jp, jb, jv = jnp.asarray(pts), jnp.asarray(bids), jnp.asarray(valid)
    jf, jl = jnp.asarray(feats), jnp.asarray(labels)

    pyr_fn = jax.jit(lambda p, b, v: build_pyramid(
        p, b, v, num_layers=5, dl0=dl0, level_caps=caps))
    t_pyr = timeit(pyr_fn, jp, jb, jv)
    print(f"build_pyramid total: {t_pyr*1e3:8.1f} ms")
    pyr0 = pyr_fn(jp, jb, jv)

    # per-level ball_query_pair (the within-level neighborhoods)
    dl = dl0
    for lvl, level in enumerate(pyr0):
        r = dl * 2.5
        k = level.neighbors.shape[1]
        bq = jax.jit(lambda P, B, V, rr=r, kk=k: ball_query_pair(
            P, B, V, P, B, V, rr, max_neighbors=kk))
        t_bq = timeit(bq, level.points, level.batch, level.valid)
        print(f"  level {lvl} (n {level.points.shape[0]:>7}, K {k}): "
              f"ball_query {t_bq*1e3:7.1f} ms")
        dl *= 2

    model = KPFCNN(num_classes=20, architecture=SCANNET_ARCHITECTURE,
                   first_features_dim=64, dl0=dl0)
    variables = jax.jit(lambda r, pyr, f: model.init(r, pyr, f, train=True))(
        jax.random.PRNGKey(0), pyr0, jf)
    params, stats = variables["params"], variables["batch_stats"]
    opt = optax.sgd(1e-2, momentum=0.98)
    opt_state = opt.init(params)

    fwd = jax.jit(lambda p, s, pyr, f: model.apply(
        {"params": p, "batch_stats": s}, pyr, f, train=False))
    t_fwd = timeit(fwd, params, stats, pyr0, jf)
    print(f"KPFCNN forward (precomputed pyramid): {t_fwd*1e3:8.1f} ms")

    def _step(params, stats, opt_state, pyr, f, l, v):
        def loss_fn(p):
            (logits, regs), mut = model.apply(
                {"params": p, "batch_stats": stats}, pyr, f, train=True,
                mutable=["batch_stats"])
            lp = jax.nn.log_softmax(logits, -1)
            nll = -jnp.take_along_axis(lp, jnp.clip(l, 0, 19)[:, None],
                                       1)[:, 0]
            ce = jnp.sum(jnp.where(v, nll, 0.0)) / jnp.maximum(jnp.sum(v), 1)
            return ce + 1e-3 * regs, mut["batch_stats"]
        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_stats, opt_state, loss

    step_pre = jax.jit(_step)
    t_pre = timeit(step_pre, params, stats, opt_state, pyr0, jf, jl, jv)
    print(f"train step (precomputed pyramid):     {t_pre*1e3:8.1f} ms")

    @jax.jit
    def step_full(params, stats, opt_state, p, b, v, f, l):
        pyr = build_pyramid(p, b, v, num_layers=5, dl0=dl0, level_caps=caps)
        return _step(params, stats, opt_state, pyr, f, l, v)

    t_full = timeit(step_full, params, stats, opt_state, jp, jb, jv, jf, jl)
    print(f"train step (in-step pyramid):         {t_full*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
