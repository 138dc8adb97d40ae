"""Parameter EMA and the SD warmup LR schedule.

Rebuilds the two small *dormant* pieces of the vendored SD tree that are
cheap and generally useful (SURVEY.md §2.8):

  * ``LitEma`` (``ldm/modules/ema.py``): exponential moving average of
    parameters with the warmup-capped decay
    ``min(decay, (1 + updates) / (10 + updates))``.
  * ``LambdaLinearScheduler`` (``ldm/lr_scheduler.py``): linear warmup then
    constant multiplier, as an optax-compatible schedule.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class EmaState(NamedTuple):
    ema: dict
    updates: jax.Array


def ema_init(params) -> EmaState:
    return EmaState(ema=jax.tree_util.tree_map(jnp.asarray, params),
                    updates=jnp.zeros((), jnp.int32))


def ema_update(state: EmaState, params, decay: float = 0.9999) -> EmaState:
    """One EMA step with LitEma's warmup cap."""
    updates = state.updates + 1
    d = jnp.minimum(decay, (1.0 + updates) / (10.0 + updates))
    new = jax.tree_util.tree_map(
        lambda e, p: e - (1.0 - d) * (e - p.astype(e.dtype)),
        state.ema, params)
    return EmaState(ema=new, updates=updates)


def lambda_linear_schedule(base_lr: float, warmup_steps: int,
                           f_start: float = 1e-6, f_max: float = 1.0,
                           f_min: float = 1.0):
    """Linear warmup ``f_start → f_max`` over ``warmup_steps``, then
    constant ``f_min`` (the v1 config's LambdaLinearScheduler shape)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = f_start + (f_max - f_start) * jnp.minimum(
            step / jnp.maximum(warmup_steps, 1), 1.0)
        return base_lr * jnp.where(step < warmup_steps, warm, f_min)

    return schedule
