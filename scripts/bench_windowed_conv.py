"""A/B the windowed subm-conv kernel knobs on the real chip.

Measures, per forward conv at M voxels / Cin=Cout=128:
  * the span distribution (per-(tile,group) hi-lo of the rulebook rows) that
    decides which static WINDOW widths are safe (use_window stays True);
  * wall time of subm_conv_windowed at WINDOW in {512, 448, 384} (and any
    width the span stats admit);
  * wall time of the chunked-one-hot variant (subm_conv_windowed_chunked)
    when present.

Timing protocol is the honest-A/B one from r3: scalar-fetch sync before
starting the clock (the axon tunnel's block_until_ready can return early),
then `iters` timed executions each synced by a scalar fetch.

Usage: python scripts/bench_windowed_conv.py [--capacity 131072] [--iters 20]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=20):
    import jax
    import jax.numpy as jnp
    out = fn(*args)
    jax.block_until_ready(out)
    _ = float(jnp.sum(out))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
        _ = float(jnp.sum(out))
    return (time.time() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--capacity", type=int, default=2 ** 17)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--cin", type=int, default=128)
    ap.add_argument("--cout", type=int, default=128)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--windows", type=str, default="512,448,384")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from seggroup_tpu.data.synthetic import make_synthetic_scene
    from seggroup_tpu.data.voxel_dataset import make_voxel_batch
    from seggroup_tpu.sparse.conv import build_subm_rulebook
    from seggroup_tpu.sparse import pallas_conv
    from seggroup_tpu.utils.jit_cache import enable_persistent_cache

    enable_persistent_cache()
    rng = np.random.default_rng(0)
    scenes = []
    for i in range(args.batch_size):
        s = make_synthetic_scene(seed=i, num_points=150528, num_slots=512,
                                 num_edges=4096, num_instances=24,
                                 segs_per_instance=12, jax_arrays=False)
        pts = np.asarray(s.points)
        coords = pts[:, :3].astype(np.float32) * 4.0
        colors = ((pts[:, 3:] + 1.0) * 127.5).astype(np.float32)
        labels = np.asarray(s.real_sem).astype(np.int32) % 20
        scenes.append((coords, colors, labels))
    vb = make_voxel_batch(scenes, args.capacity, 0.02, rng=rng, augment=True)
    print(f"voxels: {int(vb.num)}/{args.capacity}")

    from seggroup_tpu.sparse.tensor import SparseTensor
    st = SparseTensor(jnp.asarray(vb.coords), jnp.asarray(vb.feats),
                      jnp.asarray(vb.valid), jnp.asarray(vb.num))
    rulebook = jax.jit(
        lambda s: build_subm_rulebook(s, assume_sorted=True))(st)
    jax.block_until_ready(rulebook)

    m = args.capacity
    tile = pallas_conv.TILE
    n_tiles = m // tile

    # span stats per (tile, group)
    r_np = np.asarray(rulebook)
    clipped = np.minimum(r_np, m)
    lo27 = clipped.reshape(n_tiles, tile, 27).min(axis=1)
    lo = lo27.reshape(n_tiles, 9, 3).min(axis=2)
    present = (r_np < m).reshape(n_tiles, tile, 27)
    hi27 = np.where(present, r_np.reshape(n_tiles, tile, 27), -1).max(axis=1)
    hi = hi27.reshape(n_tiles, 9, 3).max(axis=2)
    span = np.where(hi >= 0, hi - (lo & ~15) + 1, 0)
    print(f"span: max={span.max()} p99.9={np.percentile(span, 99.9):.0f} "
          f"p99={np.percentile(span, 99):.0f} p50={np.percentile(span, 50):.0f}")

    feats = jnp.asarray(rng.normal(size=(m, args.cin)).astype(np.float32))
    weights = jnp.asarray(
        rng.normal(size=(27, args.cin, args.cout)).astype(np.float32) * 0.05)

    from seggroup_tpu.sparse.device_plan import build_windows_device

    for w in [int(x) for x in args.windows.split(",")]:
        win = jax.jit(build_windows_device, static_argnames=("tile", "window"))(
            rulebook, tile=tile, window=w)
        usable = bool(win["use_window"])
        if not usable:
            print(f"W={w}: use_window=False (span overflow) — skipped")
            continue
        dt = timeit(
            lambda f, wt, rl, wb: pallas_conv.subm_conv_windowed(
                f, wt, rl, wb, window=w),
            feats, weights, win["rb_win"], win["win_base"], iters=args.iters)
        print(f"W={w}: fwd {dt*1e3:.2f} ms")
        if hasattr(pallas_conv, "subm_conv_windowed_chunked"):
            for chunk, cslice in [(64, 128), (64, 64), (32, 64), (32, 32),
                                  (128, 128)]:
                if tile % chunk or (3 * (tile // chunk)) % 4 or w < cslice:
                    continue
                try:
                    dt = timeit(
                        lambda f, wt, rl, wb, ch=chunk, cs=cslice:
                        pallas_conv.subm_conv_windowed_chunked(
                            f, wt, rl, wb, window=w, chunk=ch, cslice=cs),
                        feats, weights, win["rb_win"], win["win_base"],
                        iters=args.iters)
                    print(f"W={w} chunked({chunk},{cslice}): "
                          f"fwd {dt*1e3:.2f} ms")
                except Exception as e:  # noqa: BLE001 — sweep survives
                    print(f"W={w} chunked({chunk},{cslice}): FAILED "
                          f"{str(e)[:120]}")
        dt = timeit(
            lambda f, do, rl, wb: pallas_conv.subm_dw_windowed(
                f, do, rl, wb, window=w),
            feats, feats[:, :args.cout], win["rb_win"], win["win_base"],
            iters=args.iters)
        print(f"W={w}: dw  {dt*1e3:.2f} ms")


if __name__ == "__main__":
    main()
