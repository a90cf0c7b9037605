"""Host-built UNet pyramid plans for the sparse conv engine.

A `plan` is a pytree of per-level rulebooks and stride-2 down maps for a
4-down/4-up sparse UNet (MinkUNet / PointGroup backbone). Voxel coordinates
are known on host at batch-assembly time, so the neighbor joins can run there
in C++ (native.subm_rulebook3 / native.downsample_plan, ~10 ms/level,
overlapped with device compute by utils.prefetch) instead of on device
(~0.75 s per forward at 2^17 voxels). This mirrors where the reference
builds its rulebooks: spconv / MinkowskiEngine construct theirs host-side
too (reference pointgroup voxelize.cpp:59-152, MinkowskiEngine coords
manager) — but here the device never waits for it.

The plan is exactly equivalent to the device-built path (plan=None in
MinkUNet): same lexicographic down-level ordering, same rulebook offset
order; tests/test_sparse_plan.py asserts bit-equality.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from seggroup_tpu import native


def build_unet_plan(coords: np.ndarray, num: int,
                    level_caps: Sequence[int],
                    with_windows: bool = True,
                    window_levels: int | None = None) -> dict:
    """coords: (cap0, 4) int32 (b,x,y,z) with the first `num` rows valid.
    level_caps: per-level capacities, len L+1 for L down steps (MinkUNet: 5).

    Returns a dict pytree (numpy; callers device_put with the batch):
      rulebooks: list of L+1 (cap_l, 27) int32 kernel-3 rulebooks
      down: list of L dicts with coords (cap_{l+1},4), num (), out_row
            (cap_l,), delta (cap_l,) — inputs to strided_conv_down_planned.
      windows: list of L+1 entries — {"rb_win", "win_base", "use_window"}
            for the Pallas fused gather (pallas_conv.TILE/WINDOW sizes), or
            None for a level without windows (the conv then uses the plain
            XLA gather and NO Pallas kernel is compiled for that level).
            use_window is False for a level whose neighbors did not all fit
            their windows (voxels not lexicographically sorted, or
            pathological density) — the conv then falls back to the exact
            global gather.
    window_levels: emit Pallas windows only for the first k levels. Each
            windowed level costs ~3 Mosaic kernel compiles (fwd/dfeats/dw,
            minutes total for a deep UNet through the remote TPU compile
            helper) while the runtime win concentrates in the big top
            levels; deep small levels are cheap either way. None = all
            levels (MinkUNet's 5-level plans); PointGroup's 7-level trainer
            defaults to 3.
    """
    from seggroup_tpu.sparse import pallas_conv

    coords = np.ascontiguousarray(coords, np.int32)
    num = int(num)
    rulebooks = [native.subm_rulebook3(coords, num, len(coords))]
    down = []
    cur, n = coords, num
    for cap_out in level_caps[1:]:
        out_c, m, out_row, delta = native.downsample_plan(cur, n, cap_out)
        down.append({
            "coords": out_c,
            "num": np.int32(m),
            "out_row": out_row,
            "delta": delta,
        })
        rulebooks.append(native.subm_rulebook3(out_c, m, cap_out))
        cur, n = out_c, m
    plan = {"rulebooks": rulebooks, "down": down}
    if with_windows:
        windows = []
        for lvl, rb in enumerate(rulebooks):
            if window_levels is not None and lvl >= window_levels:
                windows.append(None)
            elif (len(rb) % pallas_conv.TILE == 0
                    and len(rb) >= 8 * pallas_conv.TILE):
                base, rb_win, ovf = native.subm_windows(
                    rb, pallas_conv.TILE, pallas_conv.WINDOW)
                windows.append({"rb_win": rb_win, "win_base": base,
                                "use_window": np.bool_(ovf == 0)})
            else:
                windows.append(None)
        plan["windows"] = windows
    return plan
