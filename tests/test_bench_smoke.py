"""bench.py's stage-2 sections run end-to-end at tiny capacities.

The driver executes `python bench.py` unattended at the end of every round;
these smokes catch API rot in the bench pipelines (batch building, packed
wire formats, plan paths, train steps) without TPU-scale shapes. Tiny-cap
compiles are still minutes on CPU, hence slow-marked.
"""

import numpy as np
import pytest

import bench


@pytest.mark.slow
def test_bench_minkunet_section_tiny():
    dev, pipe, dev_packed = bench.stage2_minkunet_s_per_iter(
        capacity=2048, batch_size=2, iters=1)
    assert np.isfinite(dev) and np.isfinite(pipe) and np.isfinite(dev_packed)
    assert dev > 0 and pipe > 0 and dev_packed > 0


@pytest.mark.slow
def test_bench_kpconv_section_tiny():
    s = bench.stage2_kpconv_s_per_iter(point_cap=2 ** 12, batch_size=2,
                                       iters=1)
    assert np.isfinite(s) and s > 0


@pytest.mark.slow
def test_bench_pointgroup_section_tiny():
    dev, pipe = bench.stage2_pointgroup_s_per_iter(
        point_cap=2 ** 13, voxel_cap=2 ** 12, batch_size=2, iters=1)
    assert np.isfinite(dev) and np.isfinite(pipe)
    assert dev > 0 and pipe > 0
