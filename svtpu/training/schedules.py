"""Pure schedule functions."""
from __future__ import annotations

import jax.numpy as jnp


def temperature_schedule(step, init: float, final: float, anneal_rate: float,
                         num_steps_to_update: int):
    """Gated exponential temperature annealing.

    Matches the reference's stateful schedule
    (``contrastive_RBVAE_train.py:392-405``): the temperature only changes at
    steps that are multiples of ``num_steps_to_update`` (evaluated at that
    step's global-step value) and holds in between; steps before the first
    update keep ``init``. The reference increments ``global_step`` *before*
    reading the schedule, so pass 1-based steps.
    """
    step = jnp.asarray(step)
    n = max(int(num_steps_to_update), 1)
    last_update = (step // n) * n
    decayed = jnp.maximum(final, init * jnp.exp(-anneal_rate * last_update))
    return jnp.where(last_update == 0, init, decayed)
