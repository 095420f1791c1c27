"""Exponential moving average of parameters.

Rebuilds `models/ldm/modules/ema.py` (LitEma) functionally: decay is warmup-
limited to (1 + updates) / (10 + updates), state is a pytree + update count,
the update is jittable.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["EmaState", "ema_init", "ema_update"]


class EmaState(NamedTuple):
    params: dict
    count: jnp.ndarray  # scalar int32


def ema_init(params) -> EmaState:
    return EmaState(params=jax.tree.map(jnp.asarray, params),
                    count=jnp.zeros((), jnp.int32))


def ema_update(state: EmaState, params, decay: float = 0.9999) -> EmaState:
    """one_minus_decay = 1 - min(decay, (1+updates)/(10+updates))
    (ema.py LitEma.forward)."""
    count = state.count + 1
    d = jnp.minimum(decay, (1.0 + count) / (10.0 + count))
    new = jax.tree.map(lambda e, p: e - (1.0 - d) * (e - p),
                       state.params, params)
    return EmaState(params=new, count=count)
