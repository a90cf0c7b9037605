"""KPConv model introspection: feature responses, effective receptive
fields, deformed kernel points — PLY outputs for any viewer.

Replaces the reference's three introspection scripts (reference
kpconv/visualize_features.py, visualize_ERFs.py, visualize_deformations.py,
~777 LoC of TF-graph surgery) with three JAX-native modes:

  features      per-point max-response of a chosen block's features, colored
                on the input cloud (reference visualize_features.py top
                activations);
  erf           effective receptive field of one query point: |d logit_sum /
                d input_features| per point — one jax.grad instead of the
                reference's handcrafted gradient ops (visualize_ERFs.py);
  deformations  deformed kernel point positions around chosen query points
                for every deformable layer, via flax intermediates capture
                (visualize_deformations.py reads deformed_KP tensors).

    python -m cli.introspect_kpconv --mode erf --synthetic 1 --out /tmp/erf
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from cli.stage1_common import SceneSource, add_common_args
from cli.stage2_train_minkunet import scene_to_training_tuple
from seggroup_tpu.data.ply import write_ply
from seggroup_tpu.utils.logging import IOStream


def heat_colors(x: np.ndarray) -> np.ndarray:
    """Scalar [0..1] -> blue->red heat, uint8 (N, 3)."""
    x = np.clip(x, 0.0, 1.0)
    r = np.clip(1.5 - np.abs(4 * x - 3), 0, 1)
    g = np.clip(1.5 - np.abs(4 * x - 2), 0, 1)
    b = np.clip(1.5 - np.abs(4 * x - 1), 0, 1)
    return (np.stack([r, g, b], 1) * 255).astype(np.uint8)


def dump_cloud(path, pts, colors):
    write_ply(path, {"x": pts[:, 0].astype(np.float32),
                     "y": pts[:, 1].astype(np.float32),
                     "z": pts[:, 2].astype(np.float32),
                     "red": colors[:, 0], "green": colors[:, 1],
                     "blue": colors[:, 2]})


def main():
    p = argparse.ArgumentParser("KPConv introspection")
    add_common_args(p)
    p.add_argument("--mode", type=str, required=True,
                   choices=["features", "erf", "deformations"])
    p.add_argument("--out", type=str, default="introspect")
    p.add_argument("--point_cap", type=int, default=2 ** 13)
    p.add_argument("--dl0", type=float, default=0.04)
    p.add_argument("--in_radius", type=float, default=2.0)
    p.add_argument("--first_features_dim", type=int, default=64)
    p.add_argument("--num_classes", type=int, default=20)
    p.add_argument("--block", type=str, default=None,
                   help="features mode: intermediates path substring to "
                        "visualize (default: the deepest encoder block)")
    p.add_argument("--query_point", type=int, default=None,
                   help="erf/deformations: input point row (default center)")
    p.add_argument("--num_scenes", type=int, default=1)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from seggroup_tpu.models.kpconv import KPFCNN, build_pyramid
    from seggroup_tpu.utils.checkpoint import CheckpointManager

    io = IOStream(os.path.join("checkpoints", args.exp_name,
                               "introspect.log"))
    os.makedirs(args.out, exist_ok=True)
    source = SceneSource(args)
    n_cap = args.point_cap
    caps = [n_cap // 2, n_cap // 4, n_cap // 8, n_cap // 16]
    model = KPFCNN(num_classes=args.num_classes,
                   first_features_dim=args.first_features_dim, dl0=args.dl0)
    ckpt = CheckpointManager(os.path.join("checkpoints", args.exp_name,
                                          "kpconv"))
    restored = ckpt.restore()
    rng = np.random.default_rng(args.seed)

    def scene_sphere(i):
        scene, extras = source.get(i)
        c, col, lab = scene_to_training_tuple(scene, extras, None,
                                              source.names[i], False)
        center = c[len(c) // 2]
        sel = np.where(((c - center) ** 2).sum(1) < args.in_radius ** 2)[0]
        if len(sel) > n_cap:
            sel = sel[rng.permutation(len(sel))[:n_cap]]
        pts = np.zeros((n_cap, 3), np.float32)
        feats = np.ones((n_cap, 4), np.float32)
        pts[: len(sel)] = c[sel]
        feats[: len(sel), 1:] = col[sel] / 255.0
        valid = np.zeros(n_cap, bool)
        valid[: len(sel)] = True
        return pts, feats, valid, len(sel)

    @jax.jit
    def pyramid(pts, valid):
        return build_pyramid(pts, jnp.zeros(n_cap, jnp.int32), valid, 5,
                             args.dl0, level_caps=caps)

    pts, feats, valid, n = scene_sphere(0)
    pyr0 = pyramid(jnp.asarray(pts), jnp.asarray(valid))
    if restored is not None:
        variables = {"params": restored["params"],
                     "batch_stats": restored["batch_stats"]}
        io.cprint(f"loaded checkpoint {ckpt.latest_step()}")
    else:
        variables = jax.jit(lambda r, py, f: model.init(r, py, f, train=False))(
            jax.random.PRNGKey(0), pyr0, jnp.asarray(feats))
        variables = {"params": variables["params"],
                     "batch_stats": variables["batch_stats"]}
        io.cprint("WARNING: random weights")

    for i in range(min(args.num_scenes, len(source))):
        pts, feats, valid, n = scene_sphere(i)
        name = source.names[i]
        pyr = pyramid(jnp.asarray(pts), jnp.asarray(valid))

        if args.mode == "features":
            @jax.jit
            def fwd_caps(py, f):
                out, mut = model.apply(variables, py, f, train=False,
                                       capture_intermediates=True,
                                       mutable=["intermediates"])
                # ship only per-point max-abs responses, not every tensor,
                # through the device->host transfer
                def response(v):
                    if hasattr(v, "ndim") and v.ndim == 2 and v.shape[0] == n_cap:
                        return jnp.abs(v).max(axis=1)
                    return None
                return jax.tree.map(response, mut["intermediates"],
                                    is_leaf=lambda x: hasattr(x, "ndim"))

            resp_tree = fwd_caps(pyr, jnp.asarray(feats))
            inter = jax.tree_util.tree_flatten_with_path(resp_tree)[0]
            # pick the requested (or deepest same-resolution) feature map
            cands = []
            for path, val in inter:
                if val is None:
                    continue
                pstr = "/".join(str(getattr(k, "key", k)) for k in path)
                v = np.asarray(val)
                if v.ndim == 1 and v.shape[0] == n_cap:
                    if args.block is None or args.block in pstr:
                        cands.append((pstr, v))
            if not cands:
                io.cprint(f"no intermediates match block={args.block!r}")
                return
            pstr, v = cands[-1]
            resp = v[:n]
            resp = resp / max(resp.max(), 1e-9)
            dump_cloud(os.path.join(args.out, f"{name}_features.ply"),
                       pts[:n], heat_colors(resp))
            io.cprint(f"[{name}] features of {pstr} -> "
                      f"{args.out}/{name}_features.ply")

        elif args.mode == "erf":
            q = args.query_point if args.query_point is not None else n // 2

            @jax.jit
            def erf(f):
                def probe(f):
                    logits, _ = model.apply(variables, pyr, f, train=False)
                    return jnp.sum(logits[q])
                return jax.grad(probe)(f)

            g = np.asarray(erf(jnp.asarray(feats)))[:n]
            mag = np.abs(g).sum(1)
            mag = (mag / max(mag.max(), 1e-9)) ** 0.25  # gamma, ERFs are peaky
            colors = heat_colors(mag)
            colors[q] = (255, 255, 255)
            dump_cloud(os.path.join(args.out, f"{name}_erf.ply"),
                       pts[:n], colors)
            io.cprint(f"[{name}] ERF of point {q} -> "
                      f"{args.out}/{name}_erf.ply")

        else:  # deformations
            @jax.jit
            def fwd_caps(py, f):
                return model.apply(variables, py, f, train=False,
                                   mutable=["intermediates"])

            (_o, _r), mut = fwd_caps(pyr, jnp.asarray(feats))
            found = 0
            for path, val in jax.tree_util.tree_flatten_with_path(
                    mut["intermediates"])[0]:
                pstr = "/".join(str(getattr(k, "key", k)) for k in path)
                if "deformed_kp" not in pstr:
                    continue
                kp = np.asarray(val[0] if isinstance(val, tuple) else val)
                q = min(args.query_point or kp.shape[0] // 2, kp.shape[0] - 1)
                layer = pstr.split("/deformed_kp")[0].replace("/", "_")
                kpq = kp[q]  # (P, 3) offsets around the query
                col = np.full((len(kpq), 3), (255, 64, 64), np.uint8)
                dump_cloud(os.path.join(
                    args.out, f"{name}_{layer}_kp.ply"), kpq, col)
                found += 1
            io.cprint(f"[{name}] {found} deformable layers -> {args.out}/")


if __name__ == "__main__":
    main()
