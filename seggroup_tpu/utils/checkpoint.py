"""Orbax-backed checkpointing — one system replacing the reference's four
(seggroup .t7 epoch/last pairs train.py:216-220, pointgroup pow2-retention
util/utils.py:85-98, kpconv tf.Saver, minkowski best-val lib/train.py:143-155).
"""

from __future__ import annotations

import os
from typing import Any

import orbax.checkpoint as ocp


def _pow2_or_mult16(step: int) -> bool:
    """The reference's retention predicate (pointgroup util/utils.py:85-98):
    keep checkpoints whose step is a power of two or a multiple of 16."""
    return step % 16 == 0 or (step & (step - 1)) == 0


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5,
                 pow2_retention: bool = False):
        os.makedirs(directory, exist_ok=True)
        opts = dict(max_to_keep=max_to_keep, create=True)
        if pow2_retention:
            # pow2-or-mult16 survivors are kept beyond max_to_keep
            # (reference pointgroup/util/utils.py:85-98)
            opts["should_keep_fn"] = _pow2_or_mult16
        self._mgr = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(**opts),
        )

    def save(self, step: int, state: Any):
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()

    def restore(self, step: int | None = None, template: Any = None) -> Any:
        step = self.latest_step() if step is None else step
        if step is None:
            return None
        if template is not None:
            return self._mgr.restore(
                step, args=ocp.args.StandardRestore(template)
            )
        return self._mgr.restore(step)

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()


def lenient_restore(directory: str, template_params: Any,
                    step: int | None = None,
                    log=print) -> tuple[Any, int, int]:
    """Name-filtered partial weight loading (reference `lenient_weight_loading`
    minkowski/main.py:129-146 and pointgroup `load_model_param`
    util/utils.py:101-110): copy into `template_params` every leaf of the
    checkpoint's params whose path exists in the template AND whose shape
    matches; leave the rest at their fresh-init values. Returns
    (params, n_loaded, n_total_template_leaves)."""
    import flax.traverse_util as trav
    import jax.numpy as jnp

    mgr = CheckpointManager(directory)
    raw = mgr.restore(step)
    if raw is None:
        raise FileNotFoundError(f"no checkpoint under {directory}")
    src = raw.get("params", raw) if isinstance(raw, dict) else raw
    flat_src = trav.flatten_dict(src, sep="/")
    flat_dst = dict(trav.flatten_dict(template_params, sep="/"))
    n_loaded = 0
    for k, v in flat_dst.items():
        if k in flat_src and tuple(flat_src[k].shape) == tuple(v.shape):
            flat_dst[k] = jnp.asarray(flat_src[k], v.dtype)
            n_loaded += 1
        else:
            log(f"lenient_restore: keeping fresh init for {k}")
    return (trav.unflatten_dict(flat_dst, sep="/"), n_loaded, len(flat_dst))
