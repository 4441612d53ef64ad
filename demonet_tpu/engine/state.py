"""Train state + optimizer + LR schedule.

Reference recipe (train.py:59-75, :167-178; engine.py:20-25):
  * SGD, lr 0.02 (8 workers x batch 2), momentum 0.9, weight decay 1e-4
  * MultiStepLR milestones [16, 22], gamma 0.1 (epoch-granular)
  * linear warmup from lr/1000 over min(1000, iters-1) steps, first epoch only

Here the schedule is a single step-indexed optax schedule (warmup + piecewise
decay) so the jitted train step needs no host-side LR mutation, and the state
bundles BatchNorm running statistics alongside params/opt-state the way the
reference checkpoint bundles model+optimizer+scheduler (train.py:191-198).
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import optax
from flax.training import train_state


class TrainState(train_state.TrainState):
    """flax TrainState + BatchNorm running stats."""

    batch_stats: Any = None


def make_lr_schedule(
    base_lr: float,
    steps_per_epoch: int,
    milestones: Sequence[int] = (16, 22),
    gamma: float = 0.1,
    warmup_iters: int = 1000,
    warmup_factor: float = 1.0 / 1000.0,
) -> Callable[[Any], Any]:
    """Linear warmup (engine.py:20-25, misc.py:239-247) + MultiStepLR
    (train.py:171) as one step-indexed schedule."""
    warmup_iters = min(warmup_iters, max(1, steps_per_epoch - 1))
    boundaries = {m * steps_per_epoch: gamma for m in milestones}
    piecewise = optax.piecewise_constant_schedule(base_lr, boundaries)

    def schedule(step):
        import jax.numpy as jnp

        alpha = jnp.minimum(step / warmup_iters, 1.0)
        factor = warmup_factor * (1 - alpha) + alpha
        return piecewise(step) * factor

    return schedule


def make_optimizer(
    learning_rate: Callable | float,
    momentum: float = 0.9,
    weight_decay: float = 1e-4,
) -> optax.GradientTransformation:
    """SGD + momentum + decoupled-at-gradient weight decay, matching torch
    SGD semantics (wd added to the gradient before the momentum buffer)."""
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.sgd(learning_rate, momentum=momentum),
    )


def create_train_state(
    detector,
    rng: jax.Array,
    tx: optax.GradientTransformation,
    batch_size: int = 1,
) -> TrainState:
    variables = detector.init(rng, batch_size=batch_size)
    return TrainState.create(
        apply_fn=detector.model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=tx,
    )
