"""KPCNN point-cloud classification evaluation with vote averaging.

Reference parity: kpconv/utils/tester.py:127-215 (test_classification) —
repeated augmented passes over the test set, incremental *mean* of
per-object probabilities across votes (tester.py:195-196), accuracy from
the confusion matrix (tester.py:203-209). The reference evaluates
ModelNet40; without that dataset here the default input is a synthetic
parametric-shape set (sphere/cube/cylinder/plane/torus/cone), or a
user-provided ``--data_root`` with ``clouds.npy`` (object array of (Ni,3)
float32) + ``labels.npy`` (int64).

    python -m cli.stage2_test_classification --synthetic 16 --votes 3
"""

from __future__ import annotations

import argparse
import os

import numpy as np

import cli.stage1_common  # noqa: F401 — honors SEGGROUP_TPU_PLATFORM=cpu
from seggroup_tpu.data import transforms as T
from seggroup_tpu.utils.logging import IOStream

SHAPE_NAMES = ("sphere", "cube", "cylinder", "plane", "torus", "cone")


def make_shape_cloud(cls: int, rng: np.random.Generator, n: int = 512,
                     noise: float = 0.01) -> np.ndarray:
    """Surface-sampled parametric shape, unit scale, class = shape family."""
    u = rng.uniform(0, 2 * np.pi, n)
    v = rng.uniform(-1, 1, n)
    if cls == 0:  # sphere
        phi = np.arccos(v)
        p = np.stack([np.sin(phi) * np.cos(u), np.sin(phi) * np.sin(u),
                      np.cos(phi)], 1)
    elif cls == 1:  # cube surface
        p = rng.uniform(-1, 1, (n, 3))
        face = rng.integers(0, 3, n)
        sign = rng.choice([-1.0, 1.0], n)
        p[np.arange(n), face] = sign
    elif cls == 2:  # cylinder (side + caps)
        p = np.stack([np.cos(u), np.sin(u), v], 1)
        cap = rng.random(n) < 0.25
        r = np.sqrt(rng.random(cap.sum()))
        p[cap, 0] = r * np.cos(u[cap])
        p[cap, 1] = r * np.sin(u[cap])
        p[cap, 2] = rng.choice([-1.0, 1.0], cap.sum())
    elif cls == 3:  # plane
        p = np.stack([rng.uniform(-1, 1, n), rng.uniform(-1, 1, n),
                      np.zeros(n)], 1)
    elif cls == 4:  # torus
        w = rng.uniform(0, 2 * np.pi, n)
        p = np.stack([(1 + 0.35 * np.cos(w)) * np.cos(u),
                      (1 + 0.35 * np.cos(w)) * np.sin(u),
                      0.35 * np.sin(w)], 1)
    else:  # cone
        h = np.sqrt(rng.random(n))  # area-uniform along the slant
        p = np.stack([(1 - h) * np.cos(u), (1 - h) * np.sin(u),
                      2 * h - 1], 1)
    return (p + rng.normal(0, noise, (n, 3))).astype(np.float32)


def vote_augment(coords: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """Per-vote augmentation (the reference's tf_augment_input for
    classification: z-rotation + scale + noise, kpconv common.py:225-293)."""
    c = T.random_rotation_z(coords, rng)
    c = T.random_scale(c, rng, lo=0.9, hi=1.1)
    return c + rng.normal(0, 0.002, c.shape).astype(np.float32)


def main():
    p = argparse.ArgumentParser("KPCNN classification eval (vote accuracy)")
    p.add_argument("--exp_name", type=str, default="exp")
    p.add_argument("--synthetic", type=int, default=16,
                   help="number of synthetic shape clouds (ignored when "
                        "--data_root is given)")
    p.add_argument("--data_root", type=str, default=None,
                   help="dir with clouds.npy (object array of (Ni,3)) and "
                        "labels.npy")
    p.add_argument("--num_classes", type=int, default=len(SHAPE_NAMES))
    p.add_argument("--votes", type=int, default=3)
    p.add_argument("--points_per_cloud", type=int, default=512)
    p.add_argument("--batch_clouds", type=int, default=8)
    p.add_argument("--first_features_dim", type=int, default=32)
    p.add_argument("--dl0", type=float, default=0.08)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    import jax

    from seggroup_tpu.utils.jit_cache import enable_persistent_cache
    enable_persistent_cache()
    import jax.numpy as jnp

    from seggroup_tpu.models.kpconv import KPCNN, build_pyramid
    from seggroup_tpu.utils.checkpoint import CheckpointManager

    io = IOStream(os.path.join("checkpoints", args.exp_name,
                               "kpcnn_test.log"))
    rng = np.random.default_rng(args.seed)

    if args.data_root:
        clouds = list(np.load(os.path.join(args.data_root, "clouds.npy"),
                              allow_pickle=True))
        labels = np.load(os.path.join(args.data_root, "labels.npy"))
    else:
        labels = np.arange(args.synthetic) % args.num_classes
        clouds = [make_shape_cloud(int(c), rng, args.points_per_cloud)
                  for c in labels]
    num_objects = len(clouds)

    B = args.batch_clouds
    n_cap = B * args.points_per_cloud
    caps = [max(n_cap >> i, 64) for i in range(1, 5)]
    model = KPCNN(num_classes=args.num_classes,
                  first_features_dim=args.first_features_dim,
                  dl0=args.dl0, num_batches=B)

    @jax.jit
    def fwd(v, pts, bids, valid):
        pyr = build_pyramid(pts, bids, valid, 5, args.dl0, level_caps=caps)
        feats = jnp.ones((pts.shape[0], 1), jnp.float32)
        logits, _ = model.apply(v, pyr, feats, train=False)
        return logits

    ckpt = CheckpointManager(os.path.join("checkpoints", args.exp_name,
                                          "kpcnn"))
    restored = ckpt.restore()
    variables = None

    # incremental mean of probs across votes (reference tester.py:195-196)
    average_probs = np.zeros((num_objects, args.num_classes))
    average_counts = np.zeros(num_objects)

    while average_counts.min() < args.votes:
        for start in range(0, num_objects, B):
            idx = np.arange(start, min(start + B, num_objects))
            pts = np.zeros((n_cap, 3), np.float32)
            bids = np.zeros(n_cap, np.int32)
            valid = np.zeros(n_cap, bool)
            for j, oi in enumerate(idx):
                c = vote_augment(clouds[oi], rng)
                sl = slice(j * args.points_per_cloud,
                           j * args.points_per_cloud + len(c))
                pts[sl] = c
                bids[sl] = j
                valid[sl] = True
            if variables is None:
                if restored is not None:
                    variables = {"params": restored["params"],
                                 "batch_stats": restored["batch_stats"]}
                    io.cprint(f"loaded checkpoint {ckpt.latest_step()}")
                else:
                    pyr0 = jax.jit(lambda p, b, v: build_pyramid(
                        p, b, v, 5, args.dl0, level_caps=caps))(
                        jnp.asarray(pts), jnp.asarray(bids),
                        jnp.asarray(valid))
                    variables = jax.jit(
                        lambda r, py, f: model.init(r, py, f, train=False))(
                        jax.random.PRNGKey(0), pyr0,
                        jnp.ones((n_cap, 1), jnp.float32))
                    io.cprint("WARNING: random weights")
            logits = np.asarray(fwd(variables, jnp.asarray(pts),
                                    jnp.asarray(bids),
                                    jnp.asarray(valid)))[: len(idx)]
            sm = np.exp(logits - logits.max(1, keepdims=True))
            sm /= sm.sum(1, keepdims=True)
            average_counts[idx] += 1
            average_probs[idx] += ((sm - average_probs[idx])
                                   / average_counts[idx, None])
        pred = average_probs.argmax(1)
        conf = np.zeros((args.num_classes, args.num_classes), np.int64)
        np.add.at(conf, (labels, pred), 1)
        acc = 100.0 * np.trace(conf) / max(conf.sum(), 1)
        io.cprint(f"Vote {average_counts.min():.0f} : "
                  f"Test Accuracy = {acc:.1f}%")

    io.cprint("confusion matrix:")
    for row in conf:
        io.cprint(" ".join(f"{int(x):d}" for x in row))
    io.cprint(f"FINAL accuracy {acc:.2f}% over {num_objects} objects, "
              f"{args.votes} votes")
    io.close()
    return acc


if __name__ == "__main__":
    main()
