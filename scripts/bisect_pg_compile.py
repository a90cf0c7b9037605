"""Bisect WHICH part of the PointGroup split grad program (prog_b) blows the
TPU compile helper's memory cap at pts=2^19 / vox=2^18.

Variants (each tried as one compile on the real chip, survivable failures):
  A  skip_score_unet + score_stop_gradient  — backbone+heads grad only
  B  full score branch, but loss with_score=False
  C  full prog_b with Pallas windows at levels 0-2 (window_levels=3) —
     replaces the plain-gather lowering of the widest convs
  F  full prog_b (the known failure, for confirmation) — tried LAST

Usage: python scripts/bisect_pg_compile.py [--variants A,B,C,F]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="A,B,C,F")
    ap.add_argument("--point_cap", type=int, default=2 ** 19)
    ap.add_argument("--voxel_cap", type=int, default=2 ** 18)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from cli.stage2_pointgroup_common import host_voxelize_plan, make_pg_batch
    from seggroup_tpu.data.synthetic import make_synthetic_scene
    from seggroup_tpu.models.pointgroup import (PointGroup, pg_score_targets,
                                                pointgroup_loss)
    from seggroup_tpu.ops.voxelize import VoxelMap, voxel_gather_mean
    from seggroup_tpu.sparse.tensor import SparseTensor
    from seggroup_tpu.utils.jit_cache import enable_persistent_cache

    enable_persistent_cache()
    point_cap, voxel_cap = args.point_cap, args.voxel_cap
    instance_cap = 256
    level_caps = [voxel_cap >> i for i in range(7)]

    tuples = []
    for i in range(4):
        s = make_synthetic_scene(seed=i, num_points=150528, num_slots=512,
                                 num_edges=4096, num_instances=24,
                                 segs_per_instance=12, jax_arrays=False)
        pts = np.asarray(s.points)
        tuples.append((pts[:, :3].astype(np.float32),
                       ((pts[:, 3:] + 1.0) * 127.5).astype(np.float32),
                       (np.asarray(s.real_sem).astype(np.int32) % 20) + 1,
                       np.asarray(s.real_ins).astype(np.int32) + 1))

    def build_batch(window_levels):
        rng = np.random.default_rng(0)
        hb = make_pg_batch(tuples, point_cap, instance_cap, rng=rng,
                           augment=True)
        vcoords, num, p2v, plan = host_voxelize_plan(
            hb, 0.02, voxel_cap, level_caps, window_levels=window_levels)
        vm = VoxelMap(jnp.asarray(vcoords), jnp.asarray(p2v),
                      jnp.arange(voxel_cap) < jnp.int32(num), jnp.int32(num))
        feats = jnp.concatenate([jnp.asarray(hb.feats),
                                 jnp.asarray(hb.coords)], axis=1)
        st = SparseTensor(vm.voxel_coords, voxel_gather_mean(feats, vm),
                          vm.voxel_valid, vm.num_voxels)
        return (hb, st, vm.point2voxel, jax.tree.map(jnp.asarray, plan),
                jnp.asarray(hb.coords), jnp.asarray(hb.batch_ids),
                jnp.asarray(hb.valid), jnp.asarray(hb.labels),
                jnp.asarray(hb.instance_labels),
                jnp.asarray(hb.instance_centroid),
                jnp.asarray(hb.instance_pointnum))

    def make_model(**kw):
        return PointGroup(classes=20, m=16, score_cap=voxel_cap // 8,
                          level_caps=level_caps, **kw)

    def init_params(model):
        init_cap = 2048
        im = model.copy(score_cap=init_cap // 8,
                        level_caps=[init_cap >> i for i in range(7)])
        npt = 2 * init_cap
        st_s = SparseTensor(jnp.zeros((init_cap, 4), jnp.int32),
                            jnp.zeros((init_cap, 6)),
                            jnp.ones((init_cap,), bool), jnp.int32(init_cap))
        return jax.jit(lambda r: im.init(
            r, st_s, jnp.zeros((npt,), jnp.int32), jnp.zeros((npt, 3)),
            jnp.zeros((npt,), jnp.int32), jnp.ones((npt,), bool),
            do_clustering=True, train=True,
            jitter_rng=jax.random.PRNGKey(0)))(jax.random.PRNGKey(0))

    def try_variant(name, model, with_score, window_levels):
        print(f"--- variant {name} (window_levels={window_levels}, "
              f"with_score={with_score})", flush=True)
        (hb, st, p2v, plan, coords, bids, valid, labels, inst, centroid,
         pointnum) = build_batch(window_levels)
        variables = init_params(model)
        params, stats = variables["params"], variables["batch_stats"]
        opt = optax.adam(1e-3)
        opt_state = opt.init(params)
        key = jax.random.PRNGKey(1)

        prog_a = jax.jit(
            lambda params, stats, st, p2v, plan, coords, bids, valid, key:
            model.apply({"params": params, "batch_stats": stats}, st, p2v,
                        coords, bids, valid, do_clustering=True, train=True,
                        jitter_rng=key, proposals_only=True, plan=plan,
                        mutable=["batch_stats"])[0])
        t0 = time.time()
        out_a, score_ctx = prog_a(params, stats, st, p2v, plan, coords, bids,
                                  valid, key)
        gts = jax.jit(lambda pop, iv, pv, pn: pg_score_targets(
            pop, out_a.proposal_valid.shape[0], iv, pv, pn, instance_cap))(
            out_a.proposal_of_point, inst, valid, pointnum)
        jax.block_until_ready((out_a, score_ctx, gts))
        print(f"    prog_a ok in {time.time() - t0:.0f}s "
              f"(props={int(out_a.num_proposals)})", flush=True)

        def grad_body(params, stats, opt_state, pop, pvalid, nump, score_ctx,
                      gts):
            def loss_fn(p):
                out, mut = model.apply(
                    {"params": p, "batch_stats": stats}, st, p2v, coords,
                    bids, valid, do_clustering=True, train=True,
                    score_plan=(pop, pvalid, nump, score_ctx),
                    mutable=["batch_stats"], plan=plan)
                total, _ = pointgroup_loss(
                    out, labels, inst, centroid, pointnum, coords, valid,
                    num_instances_cap=instance_cap, with_score=with_score,
                    gt_scores=gts)
                return total, mut["batch_stats"]

            (loss, ns), grads = jax.value_and_grad(loss_fn,
                                                   has_aux=True)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), ns, opt_state,
                    loss)

        t0 = time.time()
        try:
            p2, s2, o2, loss = jax.jit(grad_body)(
                params, stats, opt_state, out_a.proposal_of_point,
                out_a.proposal_valid, out_a.num_proposals, score_ctx, gts)
            _ = float(loss)
        except Exception as e:  # noqa: BLE001 — record and continue bisect
            print(f"    prog_b FAILED after {time.time() - t0:.0f}s: "
                  f"{str(e)[:160]}", flush=True)
            return False
        compile_s = time.time() - t0
        t0 = time.time()
        for _ in range(3):
            p2, s2, o2, loss = jax.jit(grad_body)(
                p2, s2, o2, out_a.proposal_of_point, out_a.proposal_valid,
                out_a.num_proposals, score_ctx, gts)
        _ = float(loss)
        print(f"    prog_b ok: compile+1st {compile_s:.0f}s, "
              f"steady {(time.time() - t0) / 3:.3f} s/iter", flush=True)
        return True

    for v in args.variants.split(","):
        if v == "A":
            try_variant("A", make_model(skip_score_unet=True,
                                        score_stop_gradient=True),
                        with_score=True, window_levels=0)
        elif v == "B":
            try_variant("B", make_model(), with_score=False,
                        window_levels=0)
        elif v == "C":
            try_variant("C", make_model(), with_score=True, window_levels=3)
        elif v == "F":
            try_variant("F", make_model(), with_score=True, window_levels=0)


if __name__ == "__main__":
    main()
