"""Optimizer + LR-schedule factories (optax), unifying the reference's three
systems: minkowski lib/solvers.py:7-78 (SGD/Adam + Step/Poly/Squared/Exp),
pointgroup util/utils.py:25-29 (step decay), kpconv trainer lr_decays dict.
"""

from __future__ import annotations

import optax


def make_schedule(name: str, base_lr: float, *, max_iter: int = 60000,
                  poly_power: float = 0.9, step_size: int = 20000,
                  step_gamma: float = 0.1, exp_gamma: float = 0.9,
                  exp_step_size: int = 445) -> optax.Schedule:
    if name == "PolyLR":
        return lambda s: base_lr * (1 - s / (max_iter + 1)) ** poly_power
    if name == "SquaredLR":
        return lambda s: base_lr * (1 - s / (max_iter + 1)) ** 2
    if name == "StepLR":
        return lambda s: base_lr * step_gamma ** (s // step_size)
    if name == "ExpLR":
        return lambda s: base_lr * exp_gamma ** (s / exp_step_size)
    if name == "constant":
        return lambda s: base_lr
    raise ValueError(name)


def make_optimizer(name: str, schedule: optax.Schedule, *,
                   momentum: float = 0.9, weight_decay: float = 1e-4,
                   adam_beta1: float = 0.9, adam_beta2: float = 0.999
                   ) -> optax.GradientTransformation:
    if name == "SGD":
        return optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.sgd(schedule, momentum=momentum),
        )
    if name == "Adam":
        return optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.adam(schedule, b1=adam_beta1, b2=adam_beta2),
        )
    raise ValueError(name)
