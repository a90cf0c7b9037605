"""Standalone semantic-segmentation demo: one PLY in, one colored PLY out.

TPU-native analog of the reference's MinkowskiEngine demo
(minkowski/demo/scannet.py:100-159): read a point cloud, voxelize at
--voxel_size, run a registered semantic backbone, map the 20-class argmax
back to NYU40 ids and the NYU40 palette, and write `<out>` with one colored
vertex per input point (the reference writes voxel centers; we reproject
through the point->voxel map so the output aligns with the input cloud; pass
--voxel_centers for the reference's behaviour).

    python -m cli.demo_semantic --synthetic --out /tmp/pred.ply
    python -m cli.demo_semantic --ply scene.ply --checkpoint_dir \\
        checkpoints/exp/minkunet --out pred.ply
"""

from __future__ import annotations

import argparse

import numpy as np


def load_ply_points(path: str):
    """PLY -> (coords (N,3) float, colors (N,3) 0..255)."""
    from seggroup_tpu.data.ply import read_ply

    v = read_ply(path)["vertex"]
    coords = np.stack([v["x"], v["y"], v["z"]], 1).astype(np.float64)
    if "red" in v.dtype.names:
        colors = np.stack([v["red"], v["green"], v["blue"]], 1).astype(
            np.float32)
    else:
        colors = np.full((len(coords), 3), 160.0, np.float32)
    return coords, colors


def main():
    p = argparse.ArgumentParser("standalone semantic inference demo")
    p.add_argument("--ply", type=str, default=None, help="input point cloud")
    p.add_argument("--synthetic", action="store_true",
                   help="run on a synthetic scene instead of a PLY")
    p.add_argument("--variant", type=str, default="Res16UNet34C")
    p.add_argument("--checkpoint_dir", type=str, default=None,
                   help="orbax dir from cli.stage2_train_minkunet "
                        "(random weights + a warning otherwise, like the "
                        "reference demo without its downloaded .pth)")
    p.add_argument("--voxel_size", type=float, default=0.02)
    p.add_argument("--conv1_kernel_size", type=int, default=3,
                   help="reference demo weights use 5 (demo/scannet.py:43)")
    p.add_argument("--capacity", type=int, default=2 ** 17)
    p.add_argument("--num_classes", type=int, default=20)
    p.add_argument("--out", type=str, default="pred.ply")
    p.add_argument("--voxel_centers", action="store_true",
                   help="write voxel centers instead of reprojected points")
    args = p.parse_args()

    if not args.ply and not args.synthetic:
        p.error("pass --ply FILE or --synthetic")

    import jax
    import jax.numpy as jnp

    from seggroup_tpu.data.visualize import colorize_labels
    from seggroup_tpu.data.ply import write_ply
    from seggroup_tpu.data.voxel_dataset import make_voxel_batch
    from seggroup_tpu.models import get_model
    from seggroup_tpu.sparse.tensor import SparseTensor
    from seggroup_tpu.utils.jit_cache import enable_persistent_cache

    enable_persistent_cache()

    if args.ply:
        coords, colors = load_ply_points(args.ply)
    else:
        from seggroup_tpu.data.synthetic import make_synthetic_scene

        scene = make_synthetic_scene(seed=0, num_points=20000,
                                     jax_arrays=False)
        coords = np.asarray(scene.points[:, :3], np.float64)
        colors = (np.asarray(scene.points[:, 3:6]) + 1.0) * 127.5

    labels = np.full(len(coords), 255, np.int32)  # unlabeled: inference only
    vb = make_voxel_batch([(coords, colors, labels)], args.capacity,
                          args.voxel_size)
    st = SparseTensor(jnp.asarray(vb.coords), jnp.asarray(vb.feats),
                      jnp.asarray(vb.valid), jnp.asarray(vb.num))

    caps = [args.capacity, args.capacity // 2, args.capacity // 4,
            args.capacity // 8, args.capacity // 8]
    model = get_model(args.variant, out_channels=args.num_classes,
                      level_caps=caps,
                      conv1_kernel_size=args.conv1_kernel_size)

    variables = None
    if args.checkpoint_dir:
        from seggroup_tpu.utils.checkpoint import CheckpointManager

        restored = CheckpointManager(args.checkpoint_dir).restore()
        if restored is not None:
            variables = {"params": restored["params"],
                         "batch_stats": restored["batch_stats"]}
            print(f"loaded checkpoint from {args.checkpoint_dir}")
    if variables is None:
        print("WARNING: random weights (no --checkpoint_dir or empty dir)")
        variables = jax.jit(
            lambda r, s: model.init(r, s, train=False)
        )(jax.random.PRNGKey(0), st)

    logits = np.asarray(
        jax.jit(lambda v, s: model.apply(v, s, train=False))(variables, st))
    vox_pred20 = logits[: int(vb.num)].argmax(1)

    # 20-class -> NYU40 ids -> palette (reference demo VALID_CLASS_IDS +
    # COLOR_MAP, demo/scannet.py:45-87 == the NYU40 palette rows)
    nyu40_of = np.array(
        (1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 14, 16, 24, 28, 33, 34, 36,
         39), np.int64)
    vox_nyu40 = nyu40_of[vox_pred20]

    if args.voxel_centers:
        pts = (np.asarray(vb.coords[: int(vb.num), 1:4], np.float64) + 0.5
               ) * args.voxel_size
        lab = vox_nyu40
    else:
        p2v = vb.point2voxel[0]
        keep = p2v >= 0
        pts = coords[: len(p2v)][keep]
        lab = vox_nyu40[p2v[keep]]
        if (~keep).any():
            print(f"{int((~keep).sum())} points over capacity dropped")

    rgb = colorize_labels(lab, "semantic")
    write_ply(args.out, {
        "x": pts[:, 0].astype(np.float32),
        "y": pts[:, 1].astype(np.float32),
        "z": pts[:, 2].astype(np.float32),
        "red": rgb[:, 0], "green": rgb[:, 1], "blue": rgb[:, 2],
    })
    uniq, cnt = np.unique(lab, return_counts=True)
    top = ", ".join(f"nyu40:{u}={c}" for u, c in
                    sorted(zip(uniq, cnt), key=lambda t: -t[1])[:5])
    print(f"wrote {args.out}: {len(pts)} points, top classes [{top}]")


if __name__ == "__main__":
    main()
