"""Train state and optimizer.

Reference: AdamW + ReduceLROnPlateau(factor 0.5, patience 2) monitoring the
train loss (`models_MMT_v15_4.py:1213-1220`). Here: optax.adamw wrapped with
a plateau-reduce schedule driven by a loss scalar injected each step, plus
optional global-norm clipping (off by default to match the reference).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from optax import contrib as optax_contrib

from ..utils.config import TrainConfig

Array = jax.Array


class TrainState(NamedTuple):
    step: Array
    params: Any
    opt_state: Any


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformationExtraArgs:
    tx = optax.adamw(
        learning_rate=cfg.learning_rate,
        b1=0.9,
        b2=0.999,
        eps=1e-8,
        weight_decay=cfg.weight_decay,
    )
    # plateau LR reduction equivalent to torch ReduceLROnPlateau; driven by
    # the `value` extra-arg (the monitored loss) passed at update time.
    plateau = optax_contrib.reduce_on_plateau(
        factor=cfg.plateau_factor,
        patience=cfg.plateau_patience,
        cooldown=0,
        accumulation_size=1,
    )
    return optax.chain(tx, plateau)


def create_state(cfg: TrainConfig, params: Any) -> TrainState:
    tx = make_optimizer(cfg)
    return TrainState(jnp.zeros((), jnp.int32), params, tx.init(params))


def apply_grads(
    cfg: TrainConfig, state: TrainState, grads: Any, monitored_loss: Array
) -> TrainState:
    tx = make_optimizer(cfg)
    updates, new_opt = tx.update(
        grads, state.opt_state, state.params, value=monitored_loss
    )
    new_params = optax.apply_updates(state.params, updates)
    return TrainState(state.step + 1, new_params, new_opt)
