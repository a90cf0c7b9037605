"""Worker for tests/test_multihost.py: one of two jax.distributed processes
on the CPU backend (4 local devices each -> 8-device global mesh), driving a
real MinkUNet DP step over the global 'data' mesh axis.

The reference analog is one DDP rank doing NCCL TCP rendezvous
(seggroup/train.py:83-84); here `initialize_multihost` wraps
jax.distributed.initialize and the same shard_map step runs unchanged on the
global mesh (its pmean/psum ride the cross-process transport).

Invoked as: python tests/_multihost_worker.py <coordinator> <pid> <nprocs>
Prints one line: MULTIHOST_OK loss=<float> procs=<n> devs=<n>
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:  # cross-process CPU collectives (gloo is bundled with jaxlib)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
except Exception:
    pass

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from seggroup_tpu.parallel.dp import (  # noqa: E402
    build_minkunet_dp_step, initialize_multihost, make_mesh, make_optimizer,
    replicate, shard_batch)


def main():
    coordinator, pid, nprocs = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    initialize_multihost(coordinator, num_processes=nprocs, process_id=pid)
    assert jax.process_count() == nprocs, jax.process_count()
    n_dev = jax.device_count()
    assert n_dev == 4 * nprocs, n_dev

    from seggroup_tpu.data.voxel_dataset import IGNORE_LABEL, make_voxel_batch
    from seggroup_tpu.models.minkunet import make_minkunet
    from seggroup_tpu.sparse.plan import build_unet_plan
    from seggroup_tpu.sparse.tensor import SparseTensor

    cap = 512
    caps = [cap, cap // 2, cap // 4, cap // 8, cap // 8]
    model = make_minkunet("Res16UNet14A", out_channels=20, level_caps=caps)

    # identical batches on every process (same seeds), one shard per device
    sts, labels, plans = [], [], []
    for i in range(n_dev):
        rng = np.random.default_rng(i)
        pts = rng.random((400, 3)).astype(np.float32)
        cols = rng.integers(0, 255, (400, 3)).astype(np.float32)
        ls = rng.integers(0, 20, 400).astype(np.int32)
        vb = make_voxel_batch([(pts, cols, ls)], cap, 0.1, rng=rng)
        sts.append(SparseTensor(vb.coords, vb.feats.astype(np.float32),
                                vb.valid, vb.num))
        labels.append(vb.labels)
        plans.append(build_unet_plan(vb.coords, int(vb.num), caps))

    st = jax.tree.map(lambda *x: np.stack(x), *sts)
    labels = np.stack(labels)
    plan = jax.tree.map(lambda *x: np.stack(x), *plans)

    mesh = make_mesh()
    variables = jax.jit(
        lambda r, s, pl: model.init(r, s, train=True, plan=pl)
    )(jax.random.PRNGKey(0),
      jax.tree.map(lambda x: jnp.asarray(x[0]), st), plans[0])
    opt = make_optimizer("sgd", lr=1e-4)
    params = replicate(mesh, variables["params"])
    stats = replicate(mesh, variables["batch_stats"])
    opt_state = replicate(mesh, opt.init(variables["params"]))

    step = build_minkunet_dp_step(model, opt, mesh)
    stb = shard_batch(mesh, st)
    lb = shard_batch(mesh, labels)
    plb = shard_batch(mesh, plan)
    params, stats, opt_state, loss, hist = step(
        params, stats, opt_state, stb, lb, plb)
    params, stats, opt_state, loss, hist = step(
        params, stats, opt_state, stb, lb, plb)
    print(f"MULTIHOST_OK loss={float(loss):.6f} procs={jax.process_count()} "
          f"devs={n_dev}", flush=True)


if __name__ == "__main__":
    main()
