"""Shared plumbing for the stage-1 CLIs (dataset loading, batching, exports)."""

from __future__ import annotations

import os

from seggroup_tpu.utils.jit_cache import enable_persistent_cache

# persistent XLA compile cache: the stage-1 grouping scans and stage-2 UNet
# steps are minutes to compile through the remote helper; cached re-runs
# start in seconds
enable_persistent_cache()

# honor SEGGROUP_TPU_PLATFORM=cpu before any device use (the axon
# sitecustomize overrides JAX_PLATFORMS, so an env var + config flag is the
# only reliable way to select the CPU backend for tests/CI)
if os.environ.get("SEGGROUP_TPU_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["SEGGROUP_TPU_PLATFORM"])

# stage-1 runs at reference f32 semantics: TPU's DEFAULT matmul precision is
# one bf16 MXU pass, whose error perturbs the GNN features feeding the
# grouping THRESHOLD comparisons (dist <= th) that the bit-faithfulness
# contract rests on (reference model.py:218-226 runs true f32 CUDA). The
# stage-1 model is 0.15 M params — HIGHEST costs nothing measurable here.
import jax

jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp
import numpy as np

from seggroup_tpu.data.scannet import ScanNetScenes
from seggroup_tpu.data.synthetic import make_synthetic_scene
from seggroup_tpu.types import Scene


def dump_config(args, name: str):
    """Persist run configuration for provenance/resume (the reference saves
    config.json per run and re-reads it on --resume, minkowski/main.py:40-43;
    kpconv round-trips parameters.txt, utils/config.py:176-313)."""
    import json

    d = os.path.join("checkpoints", args.exp_name)
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, f"{name}.config.json"), "w") as f:
        json.dump(vars(args), f, indent=2, default=str)


def should_stop(exp_name: str) -> bool:
    """Graceful-stop kill-file (the reference stops kpconv training by
    deleting running_PID.txt, utils/trainer.py:217-220; here: CREATE a STOP
    file under checkpoints/<exp>/ to request a clean exit + final save)."""
    return os.path.exists(os.path.join("checkpoints", exp_name, "STOP"))


def add_common_args(p):
    p.add_argument("--exp_name", type=str, default="exp")
    p.add_argument("--data_root", type=str, default="dataset/scannet/prepared")
    p.add_argument("--label_style", type=str, default="manual",
                   choices=["manual", "maxseg", "mainseg", "rand"])
    p.add_argument("--synthetic", type=int, default=0,
                   help="use N synthetic scenes instead of prepared ScanNet")
    p.add_argument("--num_devices", type=int, default=None)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--tensorboard", action="store_true",
                   help="write tensorboard scalars next to the run log "
                        "(reference tensorboardX sites: pointgroup/"
                        "train.py:29-30, minkowski lib/train.py:35)")
    p.add_argument("--fast_knn", action="store_true",
                   help="approximate device top-k inside cluster kNN "
                        "(~2x faster scenes; breaks exact reference parity)")
    p.add_argument("--parallel_grouping", action="store_true",
                   help="use the parallel-rounds merge engine instead of "
                        "the bit-faithful sequential emulation (faster, "
                        "diverges on label-conflict components; see "
                        "docs/ARCHITECTURE.md)")


class SceneSource:
    """Uniform access to prepared-npz or synthetic scenes."""

    def __init__(self, args):
        self.synthetic = args.synthetic > 0
        if self.synthetic:
            self.names = [f"synthetic{i:04d}" for i in range(args.synthetic)]
            self._cache = {}
        else:
            root = os.path.join(args.data_root, args.label_style)
            self.ds = ScanNetScenes(root)
            self.names = self.ds.scene_list

    def __len__(self):
        return len(self.names)

    def get(self, i: int):
        if self.synthetic:
            if i not in self._cache:
                self._cache[i] = (
                    make_synthetic_scene(seed=i, jax_arrays=False), {}
                )
            return self._cache[i]
        return self.ds[i]


# Static-budget buckets for auto cap selection. A small fixed set bounds the
# number of distinct compiled programs (each bucket is one jit specialization,
# cached persistently), while guaranteeing the selected cap covers the
# scene's real sizes so the budget never binds (divergence condition
# docs/ARCHITECTURE.md deviations #2-3; VERDICT r3 item 5).
CLUSTER_CAP_BUCKETS = (1024, 2048, 4096, 8192, 16384)
KNN_WINDOW_BUCKETS = (8192, 16384, 32768, 65536, 131072, 262144)


def pick_bucket(size: int, buckets, minimum: int = 0) -> int:
    """Smallest of {minimum} | buckets covering max(size, minimum); the
    largest candidate if none covers. The caller's minimum is itself a
    candidate so a deliberately small --cluster_cap stays honored on scenes
    it covers (e.g. tiny synthetic CI scenes) and escalates only when
    binding."""
    need = max(int(size), int(minimum))
    for b in sorted({int(minimum), *buckets}):
        if b >= need:
            return b
    return max(buckets)


def host_max_segment_size(scene: Scene) -> int:
    """Largest layer-1 segment, computed on host BEFORE any compile — this is
    exactly the quantity that makes cluster_cap binding (FPS-cloud
    truncation, reference model.py:398-426 analog)."""
    p2s = np.asarray(scene.point2seg)
    sizes = np.bincount(p2s[p2s < scene.num_slots], minlength=1)
    return int(sizes.max())


def group_scenes_by_cap(source, minimum: int,
                        buckets=CLUSTER_CAP_BUCKETS) -> dict[int, list[int]]:
    """scene index -> smallest cluster_cap bucket covering its largest
    layer-1 segment (host-side pre-pass; one compiled program per bucket)."""
    groups: dict[int, list[int]] = {}
    for i in range(len(source)):
        sc, _ = source.get(i)
        cc = pick_bucket(host_max_segment_size(sc), buckets, minimum)
        groups.setdefault(cc, []).append(i)
    return groups


def stack_scenes(scenes) -> Scene:
    return Scene(*(jnp.stack([jnp.asarray(x) for x in cols])
                   for cols in zip(*scenes)))


def batches(source: SceneSource, batch: int, order: np.ndarray):
    """Yield (names, Scene-batch, extras-list); wraps the tail so every batch
    is full (the wrapped duplicates are flagged via the names list)."""
    n = len(order)
    for i in range(0, n, batch):
        idx = [order[(i + j) % n] for j in range(batch)]
        real = min(batch, n - i)
        scenes, extras = [], []
        for k in idx:
            sc, ex = source.get(int(k))
            scenes.append(sc)
            extras.append(ex)
        yield [source.names[int(k)] for k in idx[:real]], stack_scenes(scenes), extras


def export_labels_txt(out_dir: str, stem: str, labels: np.ndarray):
    os.makedirs(out_dir, exist_ok=True)
    # ~10x faster than np.savetxt for 150k-line files
    body = "\n".join(map(str, np.asarray(labels, np.int64).tolist()))
    with open(os.path.join(out_dir, stem + ".txt"), "w") as f:
        f.write(body + "\n")


def export_scene(results_root: str, scene_name: str, stage: str,
                 out, extras: dict, row: int):
    """Write final/layer label txt files in the reference's on-disk layout
    (reference model.py:688-691, 525-605): results/<exp>/<scene>/<stage>/."""
    out_dir = os.path.join(results_root, scene_name, stage)
    unmap = extras.get("unmap")

    def unm(arr):
        arr = np.asarray(arr)
        return arr[unmap] if unmap is not None else arr

    final_sem = unm(out.final_sem[row])
    final_ins = unm(out.final_ins[row])
    export_labels_txt(out_dir, "final.sem", final_sem)
    export_labels_txt(out_dir, "final.ins", final_ins)
    export_labels_txt(out_dir, "final.seg", unm(out.final_root[row]))
    for li in range(out.layer_roots.shape[1]):
        export_labels_txt(out_dir, f"layer_{li+1}.seg", unm(out.layer_roots[row, li]))
        # per-layer sem/ins exports (reference model.py:736-861 writes
        # layer_L.{seg,ins,sem}.txt after every grouping layer)
        export_labels_txt(out_dir, f"layer_{li+1}.sem", unm(out.layer_sem[row, li]))
        export_labels_txt(out_dir, f"layer_{li+1}.ins", unm(out.layer_ins[row, li]))
