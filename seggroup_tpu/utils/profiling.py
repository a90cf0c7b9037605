"""Profiling / timing utilities.

Replaces the reference's scattered hand-rolled meters (pointgroup
util/utils.py:7-29 AverageMeter, minkowski lib/utils.py Timer, kpconv's TF
Chrome-trace TimeLiner, utils/tester.py:50-73) with one small kit:
`jax.profiler` trace contexts for real device timelines plus host-side
AverageMeter/Timer for loop bookkeeping.
"""

from __future__ import annotations

import contextlib
import time

import jax


class AverageMeter:
    def __init__(self):
        self.reset()

    def reset(self):
        self.val = self.sum = self.count = 0.0

    def update(self, val: float, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum / max(self.count, 1)


class Timer:
    def __init__(self):
        self.t0 = time.time()

    def tic(self):
        self.t0 = time.time()

    def toc(self) -> float:
        return time.time() - self.t0


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a TPU/XLA profile viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region in the device trace."""
    with jax.profiler.TraceAnnotation(name):
        yield
