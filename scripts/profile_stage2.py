"""Profile the MinkUNet train step at reference scale on the real TPU.

Measures, separately:
  * host batch prep (numpy voxelize of 8 scenes)
  * device train-step steady-state wall clock
  * a component breakdown: rulebook builds alone, forward alone, fwd+bwd

Usage: python scripts/profile_stage2.py [--capacity 131072] [--iters 10]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--capacity", type=int, default=2 ** 17)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--model", type=str, default="Res16UNet34C")
    p.add_argument("--skip_device_path", action="store_true",
                   help="skip the (slow) device-built-rulebook measurements")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from seggroup_tpu.data.synthetic import make_synthetic_scene
    from seggroup_tpu.data.voxel_dataset import IGNORE_LABEL, make_voxel_batch
    from seggroup_tpu.models.minkunet import make_minkunet
    from seggroup_tpu.sparse.conv import build_subm_rulebook
    from seggroup_tpu.sparse.tensor import SparseTensor

    rng = np.random.default_rng(0)
    scenes = []
    for i in range(args.batch_size):
        s = make_synthetic_scene(seed=i, num_points=150528, num_slots=512,
                                 num_edges=4096, num_instances=24,
                                 segs_per_instance=12, jax_arrays=False)
        pts = np.asarray(s.points)
        coords = pts[:, :3].astype(np.float32) * 4.0  # spread for realistic voxel occupancy
        colors = ((pts[:, 3:] + 1.0) * 127.5).astype(np.float32)
        labels = np.asarray(s.real_sem).astype(np.int32) % 20
        scenes.append((coords, colors, labels))

    # --- host prep timing
    t0 = time.time()
    for _ in range(3):
        vb = make_voxel_batch(scenes, args.capacity, 0.02, rng=rng, augment=True)
    host_prep = (time.time() - t0) / 3
    print(f"host batch prep: {host_prep*1e3:.1f} ms  (num voxels {int(vb.num)}/{args.capacity})")

    caps = [args.capacity, args.capacity // 2, args.capacity // 4,
            args.capacity // 8, args.capacity // 8]
    model = make_minkunet(args.model, out_channels=20, level_caps=caps)
    st0 = SparseTensor(jnp.asarray(vb.coords), jnp.asarray(vb.feats),
                       jnp.asarray(vb.valid), jnp.asarray(vb.num))
    labels0 = jnp.asarray(vb.labels)

    t0 = time.time()
    variables = jax.jit(lambda r, s: model.init(r, s, train=True))(
        jax.random.PRNGKey(0), st0)
    params, stats = variables["params"], variables["batch_stats"]
    jax.block_until_ready(params)
    print(f"init+compile: {time.time()-t0:.1f} s")

    def sync(x):
        return float(jnp.sum(jax.tree.leaves(x)[0][:1]))

    if not args.skip_device_path:
        # --- rulebook build alone
        rb_fn = jax.jit(lambda st: build_subm_rulebook(st, 3))
        _ = sync(rb_fn(st0))
        t0 = time.time()
        for _ in range(args.iters):
            _ = sync(rb_fn(st0))
        print(f"one full-res rulebook build: {(time.time()-t0)/args.iters*1e3:.1f} ms")

        # --- forward alone
        fwd = jax.jit(lambda p, s, st: model.apply(
            {"params": p, "batch_stats": s}, st, train=False))
        _ = sync(fwd(params, stats, st0))
        t0 = time.time()
        for _ in range(args.iters):
            _ = sync(fwd(params, stats, st0))
        fwd_t = (time.time() - t0) / args.iters
        print(f"forward (eval): {fwd_t*1e3:.1f} ms")

    # --- forward with host plan
    from seggroup_tpu.sparse.plan import build_unet_plan

    t0 = time.time()
    plan_np = build_unet_plan(vb.coords, int(vb.num), caps)
    print(f"host plan build: {(time.time()-t0)*1e3:.1f} ms")
    plan = jax.tree.map(jnp.asarray, plan_np)
    fwd_p = jax.jit(lambda p, s, st, pl: model.apply(
        {"params": p, "batch_stats": s}, st, train=False, plan=pl))
    _ = sync(fwd_p(params, stats, st0, plan))
    t0 = time.time()
    for _ in range(args.iters):
        _ = sync(fwd_p(params, stats, st0, plan))
    print(f"forward (eval, host plan): {(time.time()-t0)/args.iters*1e3:.1f} ms")

    # --- full train step
    opt = optax.sgd(1e-2, momentum=0.9)
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, stats, opt_state, st, labels, plan):
        def loss_fn(p):
            logits, mut = model.apply({"params": p, "batch_stats": stats}, st,
                                      train=True, mutable=["batch_stats"],
                                      plan=plan)
            ok = st.valid & (labels != IGNORE_LABEL)
            lp = jax.nn.log_softmax(logits, axis=-1)
            nll = -jnp.take_along_axis(lp, jnp.clip(labels, 0, 19)[:, None],
                                       axis=1)[:, 0]
            return jnp.sum(jnp.where(ok, nll, 0.0)) / jnp.maximum(jnp.sum(ok), 1), mut["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_stats, opt_state, loss

    t0 = time.time()
    params, stats, opt_state, loss = train_step(params, stats, opt_state, st0, labels0, plan)
    _ = float(loss)
    print(f"train-step compile+1st run: {time.time()-t0:.1f} s")
    t0 = time.time()
    for _ in range(args.iters):
        params, stats, opt_state, loss = train_step(params, stats, opt_state, st0, labels0, plan)
        _ = float(loss)
    step_t = (time.time() - t0) / args.iters
    print(f"train step steady state (host plan): {step_t*1e3:.1f} ms")
    print(f"TOTAL s/it if host-bound: {max(host_prep, step_t):.3f}")


if __name__ == "__main__":
    main()
